package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) sequence packing: assign pack slots to a
  * GROWING corpus without ever re-scanning it. Each batch's exclusive
  * prefix sum (the hierarchical [[SequencePack]] decomposition) is offset
  * by the persisted running token total of all COMMITTED batches, so the
  * packed output is byte-for-byte what a single pack run over the full
  * corpus would emit — IncrementalPackSpec asserts exactly that — while
  * each daily run touches only its own batch.
  *
  * Crash semantics follow the streaming sink's marker protocol
  * (graft.streaming.StreamingPipeline.processNeardupBatch): appends run
  * packs → offsets → COMMIT MARKER (a partition directory of the tiny
  * `pack_batches` table). The base offset is read from the offsets of
  * committed batches ONLY, so a replay after a crash recomputes the same
  * base, re-appends identical pack rows (doc_id is unique — readers
  * dedupe trivially), and converges.
  */
object IncrementalPack {

  val PacksTable = "packs"
  val OffsetTable = "pack_offsets"
  val MarkerTable = "pack_batches"

  /** Running token total after the highest committed batch (0 for none). */
  def committedBase(catalog: graft.sink.TranscriptCatalog): Long = {
    val committed = catalog.listPartitionValues(MarkerTable, "batch_id")
      .map(_.toLong).toSet
    if (committed.isEmpty || !catalog.exists(OffsetTable)) return 0L
    // A replayed batch may have appended its offsets row twice; the row is
    // deterministic (base + sum(tokens)), so duplicates agree and limit 1
    // is safe for any committed batch id.
    val rows = catalog.read(OffsetTable)
      .filter(col("batch_id").isin(committed.toSeq: _*))
      .orderBy(col("batch_id").desc).limit(1)
      .select("total_after").collect()
    rows.headOption.map(_.getLong(0)).getOrElse(0L)
  }

  /** Pack one batch `(doc_id, tokens)` against the committed base and
    * commit it. Replaying a committed batchId is a no-op. Doc ids must be
    * unique across batches and each batch's ids ordered AFTER all
    * committed ones (the daily-ingest contract — ids are ingest-ordered).
    */
  def processBatch(
      catalog: graft.sink.TranscriptCatalog,
      batch: DataFrame,
      batchId: Long,
      budget: Int,
      blockSize: Long = 10000,
      maxTopRows: Long = 4096
  ): Unit = {
    if (catalog.listPartitionValues(MarkerTable, "batch_id")
          .contains(batchId.toString)) return
    val spark = batch.sparkSession
    val base = committedBase(catalog)
    val packed = SequencePack.exclusivePrefixSum(
        batch.select("doc_id", "tokens"), "doc_id", "tokens", "cum",
        blockSize, maxTopRows)
      .withColumn("gcum", col("cum") + base)
      .select(col("doc_id"), col("tokens"),
        expr(s"gcum div $budget").as("pack_id"),
        pmod(col("gcum"), lit(budget.toLong)).as("pack_pos"),
        lit(batchId).as("batch_id"))
    val batchTokens = batch.agg(
      coalesce(sum(col("tokens").cast("bigint")), lit(0L))).head.getLong(0)
    catalog.append(packed, PacksTable)
    import spark.implicits._
    catalog.append(
      Seq((batchId, base, base + batchTokens))
        .toDF("batch_id", "base", "total_after"), OffsetTable)
    // COMMIT POINT — the marker registers the batch id as a partition
    // directory (payload column required by the parquet writer).
    catalog.append(
      spark.range(1).select(lit(batchId).as("batch_id"), lit(1).as("one")),
      MarkerTable, Seq("batch_id"))
  }
}
