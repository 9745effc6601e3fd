package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing is real — binary schema, partition-parallel
  * batched iteration, typed output Encoders, deterministic repartitioning by
  * content size so one giant blob per partition doesn't OOM an executor.
  * The DECODE step is a clearly-marked STUB (`decodeStub`): the actual
  * image/audio codec libraries are not present in this container, so it
  * derives deterministic fake dimensions from the bytes. Swapping in a real
  * decoder changes only that one function.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      frames: Int,
      checksum: Long
  )

  /** STUB decoder — deterministic fake. Replace with a real codec call
    * (e.g. javax.imageio / ffmpeg bindings) in production; everything else
    * in this module is the real distributed plumbing.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    // cheap deterministic checksum (FNV-1a, the reference's partitioning
    // hash family: internal/streams/paritioned_queue.go:42-48)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < n) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webm"
    MediaMeta(docId, n, fmt,
      width = 16 + (n % 64), height = 16 + ((n * 7) % 64),
      frames = if (fmt == "webm") 1 + (n % 8) else 1,
      checksum = h)
  }

  /** Decode a (doc_id, blob) DataFrame partition-parallel. Batching shape:
    * each partition's iterator is consumed lazily (no per-partition
    * materialization), so arbitrarily large partitions stream through.
    */
  def decode(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
  }

  /** Size-aware repartition: hash big blobs apart so a partition never holds
    * more than ~targetBytes of payload (skew guard for multimodal columns).
    */
  def repartitionBySize(df: DataFrame, numPartitions: Int): DataFrame =
    df.repartition(numPartitions,
      pmod(hash(col("doc_id"), length(col("blob"))), lit(numPartitions)))

  /** Frame sampling over decoded media metadata: up to `maxFrames` evenly
    * strided frame indices per row — sample i of m picks frame
    * (i·frames) div m, so short clips keep every frame and long clips
    * subsample uniformly. Pure Catalyst (sequence + transform + posexplode,
    * whole-stage codegen); the frame EXTRACTION at those indices would sit
    * in the decode stub's place, but the fan-out shape — the expensive,
    * shuffle-relevant part at 100 TB — is the real thing.
    */
  def sampleFrames(meta: DataFrame, maxFrames: Int): DataFrame =
    meta.select(col("doc_id"), col("frames"),
        // frames = 0 (a real decoder's corrupt/empty-media output) must
        // yield ZERO samples — unguarded, sequence(0, -1) would count DOWN
        // to [0, -1] and divide by zero (round-3 review).
        posexplode(expr(
          s"""CASE WHEN frames > 0 THEN
             |  transform(sequence(0, least(frames, $maxFrames) - 1),
             |    i -> CAST((i * frames) DIV least(frames, $maxFrames) AS INT))
             |ELSE array() END"""
            .stripMargin.replace("\n", " ")))
          .as(Seq("sample_idx", "frame_idx")))
      .select("doc_id", "sample_idx", "frame_idx")
}
