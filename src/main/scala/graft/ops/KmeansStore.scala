package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted k-means model sidecar (round-7 verdict item #7): the
  * deterministic [[Similarity.kmeansModel]] fit as a catalog blob, so a
  * session (or a daily job) reuses the committed model instead of
  * refitting per session — at 100 TB the fit is `iters` full passes over
  * the embedding table, while a load is one small blob read.
  *
  * Same lifecycle stance as the Bloom sidecars
  * ([[Decontam.loadOrBuildGramBloom]]): the model is DERIVED state, so
  * the blob embeds the exact inputs it was built from — (nCells, iters,
  * dim) plus a cheap input fingerprint (row count + vec_id sum) — and a
  * load whose current inputs differ, or whose bytes fail to parse,
  * REFITS and republishes instead of trusting the file. The blob write
  * itself is temp+rename atomic ([[graft.sink.TranscriptCatalog.writeBlob]]).
  *
  * The fingerprint deliberately hashes IDS, not vector payloads (one
  * cheap aggregation instead of a full-table checksum pass): an
  * in-place payload mutation under identical ids would not be detected
  * — acceptable because every store in this repo treats committed rows
  * as immutable (appends and partition replaces only).
  */
object KmeansStore {

  val Table = "emb_kmeans_model"
  val Blob = "_kmeans_model"

  /** Cheap input identity: row count and vec_id sum (order-free). */
  def fingerprint(e: DataFrame): String = {
    val r = e.agg(count(lit(1)), sum("vec_id")).head
    s"n=${r.getLong(0)};idsum=${if (r.isNullAt(1)) 0L else r.getLong(1)}"
  }

  private def header(nCells: Int, iters: Int, fp: String): String =
    s"kmeans;v1;nCells=$nCells;iters=$iters;$fp"

  def save(
      catalog: graft.sink.TranscriptCatalog,
      model: Similarity.IvfModel,
      nCells: Int,
      iters: Int,
      fp: String
  ): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    val hb = header(nCells, iters, fp).getBytes("UTF-8")
    dos.writeInt(hb.length); dos.write(hb)
    dos.writeInt(model.centroids.size)
    model.centroids.foreach { case (cell, cv) =>
      dos.writeInt(cell); dos.writeInt(cv.length)
      cv.foreach(dos.writeDouble)
    }
    dos.close()
    catalog.writeBlob(Table, Blob, bos.toByteArray)
  }

  /** The committed model iff its header matches the CURRENT inputs;
    * None on absence, parameter/fingerprint mismatch, or a corrupt blob
    * (derived state — rebuild, never crash).
    */
  def load(
      catalog: graft.sink.TranscriptCatalog,
      nCells: Int,
      iters: Int,
      fp: String
  ): Option[Similarity.IvfModel] =
    catalog.readBlob(Table, Blob).flatMap { bytes =>
      try {
        val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
        val hb = new Array[Byte](in.readInt()); in.readFully(hb)
        if (new String(hb, "UTF-8") != header(nCells, iters, fp)) None
        else {
          val n = in.readInt()
          val cents = (0 until n).map { _ =>
            val cell = in.readInt()
            val dim = in.readInt()
            cell -> Array.fill(dim)(in.readDouble())
          }
          Some(Similarity.IvfModel(cents))
        }
      } catch {
        case scala.util.control.NonFatal(_) => None // corrupt → refit
      }
    }

  /** Load the committed model when current, else fit and publish. The
    * returned model is byte-identical either way ([[Similarity.kmeansModel]]
    * is deterministic and its centroids are already rounded to
    * [[Similarity.CentroidScale]], so serialize→parse round-trips exactly).
    */
  def loadOrFit(
      catalog: graft.sink.TranscriptCatalog,
      e: DataFrame,
      nCells: Int,
      iters: Int
  ): Similarity.IvfModel = {
    val fp = fingerprint(e)
    load(catalog, nCells, iters, fp).getOrElse {
      val model = Similarity.kmeansModel(e, nCells, iters)
      save(catalog, model, nCells, iters, fp)
      model
    }
  }
}
