package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Watermark compaction of the incremental stores' committed-batch state
  * (round-6 verdict item #2 follow-up / #4): every store tracked its
  * committed batches as one marker PARTITION PER BATCH and probed its
  * per-batch state rows with `batch_id.isin(allCommitted)` — at a few
  * years of daily batches that is thousands of literals in every
  * predicate and a linearly growing filesystem listing per micro-batch.
  * The fix is the manifest treatment of
  * [[graft.checkpoint.Checkpoint.compact]] applied to the store tables:
  * batches at or below a WATERMARK are folded into ONE base partition
  * (counts summed — every reader SUMs these rows anyway, so the fold is
  * invisible by construction), their marker partitions are deleted, and
  * the watermark itself is the commit point. Committed-state predicates
  * become `batch_id = <base partition> OR batch_id IN (<recent>)` — one
  * equality plus a bounded isin, whatever the store's age.
  *
  * Shared protocol (each store supplies only its own fold aggregation):
  *
  *   1. fold rows of committed batches in (w_old, w_new] — READ side
  *      still excludes crashed half-written partitions via the committed
  *      set — summed into the base partition `basePartition(w_new)`,
  *      which also absorbs the previous base partition;
  *   2. COMMIT: write the watermark blob (temp+rename atomic);
  *   3. GC: drop folded partitions (including any crashed garbage at or
  *      below w_new — unreplayable anyway, the ascending-commit contract
  *      rejects them), superseded base partitions, and markers ≤ w_new.
  *
  * A crash before (2) leaves the old watermark live and both the old
  * base and the raw partitions intact (re-running compaction recomputes
  * the same fold — overwrite-by-partition is idempotent); a crash after
  * (2) leaves harmless already-folded partitions that the predicates no
  * longer select and the next compaction GC sweeps.
  *
  * The base partition id is VERSIONED by the watermark
  * ([[basePartition]] = -w-2 < -1, never colliding with real batch ids
  * ≥ 0), so step 1's overwrite can never clobber the live base row
  * mid-write: the new base becomes visible only through step 2.
  *
  * The watermark blob is AUTHORITATIVE state (unlike the derived Bloom
  * sidecars, which rebuild on corruption): a corrupt blob fails fast
  * rather than silently resetting — a reset watermark would deselect the
  * base partition and undercount every budget/threshold downstream.
  */
object StoreCompaction {

  val WatermarkBlob = "_batch_watermark"

  /** The folded-state partition id for watermark `w` (strictly below -1,
    * disjoint from real batch ids and from other watermarks' bases).
    */
  def basePartition(w: Long): Long = -w - 2

  /** Committed-batch state of a store: everything at or below
    * `watermark` is committed AND folded; `recent` are the individually
    * marked batches above it.
    */
  final case class CommittedView(watermark: Long, recent: Set[Long]) {
    def isEmpty: Boolean = watermark < 0 && recent.isEmpty
    def contains(batchId: Long): Boolean =
      batchId <= watermark || recent(batchId)
    /** Highest committed id (undefined when isEmpty — guard first). */
    def maxCommitted: Long = if (recent.nonEmpty) recent.max else watermark
    /** The bounded committed-state predicate over a batch_id column:
      * one equality on the base partition plus an isin over the recent
      * ids. `lit(false)` when nothing is committed.
      */
    def statePredicate(batchIdCol: Column): Column = {
      if (isEmpty) lit(false)
      else {
        val baseSel: Column =
          if (watermark >= 0) batchIdCol === lit(basePartition(watermark))
          else lit(false)
        if (recent.isEmpty) baseSel
        else baseSel || batchIdCol.isin(recent.toSeq: _*)
      }
    }
  }

  def readWatermark(
      catalog: graft.sink.TranscriptCatalog,
      markerTable: String
  ): Long =
    catalog.readBlob(markerTable, WatermarkBlob) match {
      case None => -1L
      case Some(bytes) =>
        try new String(bytes, "UTF-8").trim.toLong
        catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalStateException(
              s"corrupt watermark blob for $markerTable — refusing to " +
                "guess: a reset watermark would silently drop the folded " +
                "base state from every committed-batch read", e)
        }
    }

  def writeWatermark(
      catalog: graft.sink.TranscriptCatalog,
      markerTable: String,
      w: Long
  ): Unit =
    catalog.writeBlob(markerTable, WatermarkBlob, w.toString.getBytes("UTF-8"))

  /** The store's committed batches: the watermark blob plus the marker
    * partitions above it (markers at/below the watermark are swept by
    * compaction GC, but a crash window may leave some — they are
    * subsumed by the watermark and filtered here).
    */
  def committedView(
      catalog: graft.sink.TranscriptCatalog,
      markerTable: String
  ): CommittedView = {
    val w = readWatermark(catalog, markerTable)
    val recent = catalog.listPartitionValues(markerTable, "batch_id")
      .map(_.toLong).filter(_ > w).toSet
    CommittedView(w, recent)
  }

  /** Pick the new watermark so that at most `keepRecent` committed
    * batches stay individually tracked; None when already within bounds.
    */
  def foldTarget(view: CommittedView, keepRecent: Int): Option[Long] = {
    require(keepRecent >= 1, "keepRecent must be >= 1")
    if (view.recent.size <= keepRecent) None
    else Some(view.recent.toSeq.sorted.dropRight(keepRecent).max)
  }

  /** GC predicate for a state table's batch_id partitions after the
    * watermark moved to `wNew`: folded real ids, crashed garbage at or
    * below the watermark, and superseded base partitions.
    */
  def gcStatePartition(wNew: Long)(value: String): Boolean = {
    val id = value.toLong
    (id >= 0 && id <= wNew) || (id < -1 && id != basePartition(wNew))
  }

  /** Marker partitions subsumed by the watermark. */
  def gcMarkerPartition(wNew: Long)(value: String): Boolean =
    value.toLong <= wNew
}
