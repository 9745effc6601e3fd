package graft

import org.apache.spark.sql.functions._
import graft.ops.{IncrementalCap, IncrementalLineDedup, IncrementalPack,
  IncrementalSubstringDedup, StoreCompaction}
import graft.sink.TranscriptCatalog

/** Watermark compaction of the incremental stores' committed-batch state
  * (graft.ops.StoreCompaction, round-7): for each store the compacted
  * run must produce VERDICT-IDENTICAL results to an uncompacted twin,
  * the committed-state predicate must stay bounded (base equality +
  * isin over the kept recents only), folded partitions and markers must
  * be GC'd, and replay/ordering semantics must survive the fold.
  */
class StoreCompactionSpec extends SparkSpecBase {
  import spark.implicits._

  // --- the bounded-predicate gate, on the predicate itself ---

  test("statePredicate is one base equality plus a bounded isin") {
    def predicateLiterals(view: StoreCompaction.CommittedView): Set[Long] = {
      val df = spark.range(0).select(col("id").as("batch_id"))
        .filter(view.statePredicate(col("batch_id")))
      df.queryExecution.analyzed.expressions.flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.value.isInstanceOf[Long] => l.value.asInstanceOf[Long]
      }).toSet
    }
    // base partition -9 plus the two recents — NOT the folded history
    predicateLiterals(StoreCompaction.CommittedView(7L, Set(8L, 9L))) shouldBe
      Set(-9L, 8L, 9L)
    // empty view selects nothing
    StoreCompaction.CommittedView(-1L, Set.empty).isEmpty shouldBe true
    // watermark-only view (all batches folded) is just the base equality
    predicateLiterals(StoreCompaction.CommittedView(3L, Set.empty)) shouldBe
      Set(-5L)
  }

  test("foldTarget keeps the newest keepRecent batches") {
    val v = StoreCompaction.CommittedView(-1L, Set(0L, 1L, 2L, 3L))
    StoreCompaction.foldTarget(v, 2) shouldBe Some(1L)
    StoreCompaction.foldTarget(v, 4) shouldBe None
    StoreCompaction.foldTarget(StoreCompaction.CommittedView(5L, Set(6L)), 1) shouldBe None
  }

  test("a corrupt watermark blob fails fast instead of resetting") {
    val catalog = new TranscriptCatalog(tmpDir("wm-corrupt"), spark)
    catalog.writeBlob("cap_batches", StoreCompaction.WatermarkBlob,
      "not-a-long".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      StoreCompaction.readWatermark(catalog, "cap_batches")
    }
    ex.getMessage should include("corrupt watermark")
  }

  // --- IncrementalCap ---

  private def capDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "source")

  private def capVerdicts(catalog: TranscriptCatalog) =
    catalog.read(IncrementalCap.DocsTable)
      .select("doc_id", "source", "keep_rank", "kept", "batch_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  private def runCap(name: String, compactAfterB2: Boolean) = {
    val catalog = new TranscriptCatalog(tmpDir(name), spark)
    val k = 4
    IncrementalCap.processBatch(catalog, capDocs(Seq(1L -> "A", 2L -> "A")), 0L, k)
    IncrementalCap.processBatch(catalog, capDocs(Seq(10L -> "A", 11L -> "A")), 1L, k)
    IncrementalCap.processBatch(catalog, capDocs(Seq(20L -> "A", 21L -> "B")), 2L, k)
    if (compactAfterB2) IncrementalCap.compact(catalog, keepRecent = 1)
    IncrementalCap.processBatch(catalog, capDocs(Seq(30L -> "A", 31L -> "B")), 3L, k)
    (catalog, capVerdicts(catalog))
  }

  test("cap: verdicts are identical before/after compaction; state is GC'd") {
    val (_, plain) = runCap("cap-plain", compactAfterB2 = false)
    val (catalog, compacted) = runCap("cap-compact", compactAfterB2 = true)
    compacted shouldBe plain
    // A spent its budget of 4 in batches 0-1 (folded); batch 3 still sees it
    compacted(30L)._3 shouldBe false
    compacted(31L)._3 shouldBe true
    // folded count partitions and markers are gone; base partition lives
    val base = StoreCompaction.basePartition(1L) // folded {0,1} -> w=1
    catalog.listPartitionValues(IncrementalCap.CountsTable, "batch_id")
      .map(_.toLong).toSet shouldBe Set(base, 2L, 3L)
    catalog.listPartitionValues(IncrementalCap.MarkerTable, "batch_id")
      .map(_.toLong).toSet shouldBe Set(2L, 3L)
    StoreCompaction.readWatermark(catalog, IncrementalCap.MarkerTable) shouldBe 1L
    // replaying a FOLDED batch id is a committed no-op
    val before = capVerdicts(catalog)
    IncrementalCap.processBatch(catalog, capDocs(Seq(99L -> "A")), 0L, 4)
    capVerdicts(catalog) shouldBe before
    // a NEW batch below the watermark is out-of-order... and a replayed id
    // equal to the watermark is a no-op, so probe id 4 then 2 (committed)
    IncrementalCap.processBatch(catalog, capDocs(Seq(40L -> "B")), 4L, 4)
    capVerdicts(catalog)(40L)._3 shouldBe true
    // compact again with room to spare: a no-op
    IncrementalCap.compact(catalog, keepRecent = 3)
    StoreCompaction.readWatermark(catalog, IncrementalCap.MarkerTable) shouldBe 1L
  }

  // --- IncrementalLineDedup ---

  private def lineDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def lineOut(catalog: TranscriptCatalog) =
    catalog.read(IncrementalLineDedup.DocsTable)
      .select(col("doc_id"), col("n_lines"), col("kept_line_count"),
        col("scrub_hash"), col("batch_id").cast("long").as("batch_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq

  private def runLine(name: String, compactAfterB2: Boolean) = {
    val catalog = new TranscriptCatalog(tmpDir(name), spark)
    IncrementalLineDedup.processBatch(catalog,
      lineDocs(Seq(1L -> "x\ny", 2L -> "x\nz")), 0L)
    IncrementalLineDedup.processBatch(catalog, lineDocs(Seq(3L -> "y\nw")), 1L)
    IncrementalLineDedup.processBatch(catalog, lineDocs(Seq(4L -> "w\nv")), 2L)
    if (compactAfterB2) IncrementalLineDedup.compact(catalog, keepRecent = 1)
    // z repeats vs FOLDED history, v vs the kept recent batch, u is fresh
    IncrementalLineDedup.processBatch(catalog, lineDocs(Seq(5L -> "z\nv\nu")), 3L)
    (catalog, lineOut(catalog))
  }

  test("line dedup: scrubs are identical before/after compaction; counts fold once") {
    val (_, plain) = runLine("line-plain", compactAfterB2 = false)
    val (catalog, compacted) = runLine("line-compact", compactAfterB2 = true)
    compacted shouldBe plain
    // doc 5: z (hist, folded) and v (hist, recent) stripped, u kept
    compacted.find(_._1 == 5L).get._3 shouldBe 1L
    val base = StoreCompaction.basePartition(1L)
    catalog.listPartitionValues(IncrementalLineDedup.CountsTable, "batch_id")
      .map(_.toLong).toSet shouldBe Set(base, 2L, 3L)
    // folded totals survived: ONE base row per unit, summed (x appeared
    // twice in batch 0 -> cnt 2)
    val baseRows = catalog.readBucketed(IncrementalLineDedup.CountsTable)
      .filter(col("batch_id") === base)
    baseRows.agg(sum("cnt")).head.getLong(0) shouldBe 6L // x2,y1,z1 + y1,w1
    // the bucketed store read stays exchange-free after compaction: the
    // history aggregation must partial-aggregate on the bucketed scan
    val hist = catalog.readBucketed(IncrementalLineDedup.CountsTable)
      .filter(StoreCompaction.committedView(catalog, IncrementalLineDedup.MarkerTable)
        .statePredicate(col("batch_id")))
      .groupBy("lh").agg(sum("cnt"))
    hist.queryExecution.executedPlan.toString should not include "Exchange"
  }

  // --- IncrementalSubstringDedup ---

  private def runSubstr(name: String, compactAfterB2: Boolean) = {
    val catalog = new TranscriptCatalog(tmpDir(name), spark)
    val rep = "a b c d e f g h" // exactly one k-gram at DefaultK = 8
    val fresh = "p q r s t u v w"
    IncrementalSubstringDedup.processBatch(catalog,
      lineDocs(Seq(1L -> rep, 2L -> rep)), 0L)
    IncrementalSubstringDedup.processBatch(catalog, lineDocs(Seq(3L -> rep)), 1L)
    IncrementalSubstringDedup.processBatch(catalog, lineDocs(Seq(4L -> fresh)), 2L)
    if (compactAfterB2) IncrementalSubstringDedup.compact(catalog, keepRecent = 1)
    // doc 5 repeats the FOLDED gram; doc 6 repeats the recent batch's gram
    IncrementalSubstringDedup.processBatch(catalog,
      lineDocs(Seq(5L -> rep, 6L -> fresh)), 3L)
    val out = catalog.read(IncrementalSubstringDedup.DocsTable)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("kept_tokens").cast("long").as("kept_tokens"),
        col("batch_id").cast("long").as("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    (catalog, out)
  }

  test("substring dedup: scrubs are identical before/after compaction") {
    val (_, plain) = runSubstr("sub-plain", compactAfterB2 = false)
    val (catalog, compacted) = runSubstr("sub-compact", compactAfterB2 = true)
    compacted shouldBe plain
    // both batch-3 docs lost their span (one against folded history, one
    // against the kept recent batch)
    compacted.filter(_._4 == 3L).map(d => d._3 < d._2) shouldBe Seq(true, true)
    val base = StoreCompaction.basePartition(1L)
    catalog.listPartitionValues(IncrementalSubstringDedup.CountsTable, "batch_id")
      .map(_.toLong).toSet shouldBe Set(base, 2L, 3L)
  }

  // --- IncrementalPack ---

  private def packDocs(rows: Seq[(Long, Long)]) = rows.toDF("doc_id", "tokens")

  private def packOut(catalog: TranscriptCatalog) =
    catalog.read(IncrementalPack.PacksTable)
      .select(col("doc_id"), col("tokens").cast("long").as("tokens"),
        col("pack_id"), col("pack_pos"),
        col("batch_id").cast("long").as("batch_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq

  private def runPack(name: String, compactAfterB2: Boolean) = {
    val catalog = new TranscriptCatalog(tmpDir(name), spark)
    IncrementalPack.processBatch(catalog, packDocs(Seq(1L -> 30L, 2L -> 40L)), 0L, budget = 100)
    IncrementalPack.processBatch(catalog, packDocs(Seq(10L -> 50L)), 1L, budget = 100)
    IncrementalPack.processBatch(catalog, packDocs(Seq(20L -> 25L)), 2L, budget = 100)
    if (compactAfterB2) IncrementalPack.compact(catalog, keepRecent = 1)
    IncrementalPack.processBatch(catalog, packDocs(Seq(30L -> 60L)), 3L, budget = 100)
    (catalog, packOut(catalog))
  }

  test("pack: slots are identical before/after compaction; guards survive the fold") {
    val (_, plain) = runPack("pack-plain", compactAfterB2 = false)
    val (catalog, compacted) = runPack("pack-compact", compactAfterB2 = true)
    compacted shouldBe plain
    // running total preserved through the fold: 30+40+50+25+60
    IncrementalPack.committedBase(catalog) shouldBe 205L
    val base = StoreCompaction.basePartition(1L)
    catalog.listPartitionValues(IncrementalPack.OffsetTable, "batch_id")
      .map(_.toLong).toSet shouldBe Set(base, 2L, 3L)
    // the doc-id overlap guard still sees the FOLDED max_doc (10)
    val ex = intercept[IllegalArgumentException] {
      IncrementalPack.processBatch(catalog, packDocs(Seq(5L -> 10L)), 4L, budget = 100)
    }
    ex.getMessage should include("overlaps committed doc-id range")
  }
}
