package graft

import org.apache.spark.sql.functions._
import graft.ops.{IncrementalPack, SequencePack}
import graft.sink.TranscriptCatalog

/** Cross-batch packing (graft.ops.IncrementalPack): batches packed
  * incrementally must equal ONE pack run over the whole corpus, replays
  * must be no-ops, and a crash between the appends and the commit marker
  * must converge on retry.
  */
class IncrementalPackSpec extends SparkSpecBase {
  import spark.implicits._

  private val Budget = 64

  private def batchDf(ids: Range) =
    ids.map(i => (i.toLong, (i % 37) + 1)).toDF("doc_id", "tokens")

  private def packsOf(catalog: TranscriptCatalog): Map[Long, (Long, Long)] =
    catalog.read(IncrementalPack.PacksTable)
      .select("doc_id", "pack_id", "pack_pos").distinct()
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def expectedWhole(ids: Range): Map[Long, (Long, Long)] =
    SequencePack.pack(batchDf(ids), "doc_id", "tokens", Budget, blockSize = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

  test("three incremental batches equal one pack run over the whole corpus") {
    val out = tmpDir("incpack")
    val catalog = new TranscriptCatalog(out, spark)
    IncrementalPack.processBatch(catalog, batchDf(0 until 40), 0L, Budget, blockSize = 8)
    IncrementalPack.processBatch(catalog, batchDf(40 until 55), 1L, Budget, blockSize = 8)
    IncrementalPack.processBatch(catalog, batchDf(55 until 100), 2L, Budget, blockSize = 8)
    packsOf(catalog) shouldBe expectedWhole(0 until 100)
  }

  test("replaying a committed batch is a no-op") {
    val out = tmpDir("incpack-replay")
    val catalog = new TranscriptCatalog(out, spark)
    IncrementalPack.processBatch(catalog, batchDf(0 until 30), 0L, Budget, blockSize = 8)
    val before = catalog.read(IncrementalPack.PacksTable).count()
    IncrementalPack.processBatch(catalog, batchDf(0 until 30), 0L, Budget, blockSize = 8)
    catalog.read(IncrementalPack.PacksTable).count() shouldBe before
  }

  test("a crash before the commit marker converges on retry") {
    val out = tmpDir("incpack-crash")
    val catalog = new TranscriptCatalog(out, spark)
    IncrementalPack.processBatch(catalog, batchDf(0 until 30), 0L, Budget, blockSize = 8)
    // Simulate batch 1 crashing AFTER the packs + offsets appends but
    // BEFORE the marker: replay must use batch 0's base (not the
    // uncommitted offset row) and produce identical rows.
    val base = IncrementalPack.committedBase(catalog)
    val b1 = batchDf(30 until 60)
    val packed = SequencePack.exclusivePrefixSum(
        b1, "doc_id", "tokens", "cum", blockSize = 8, maxTopRows = 4096)
      .withColumn("gcum", col("cum") + base)
      .select(col("doc_id"), col("tokens"),
        expr(s"gcum div $Budget").as("pack_id"),
        pmod(col("gcum"), lit(Budget.toLong)).as("pack_pos"),
        lit(1L).as("batch_id"))
    catalog.overwritePartitions(packed, IncrementalPack.PacksTable, Seq("batch_id"))
    // The offsets row a real crashed attempt would have written — the
    // retry's batch_id-partitioned overwrite REPLACES it with the
    // identical recomputed row.
    val b1Tokens = b1.agg(sum(col("tokens").cast("bigint"))).head.getLong(0)
    catalog.overwritePartitions(Seq((1L, base, base + b1Tokens, 59L))
      .toDF("batch_id", "base", "total_after", "max_doc"),
      IncrementalPack.OffsetTable, Seq("batch_id"))
    // retry
    IncrementalPack.processBatch(catalog, b1, 1L, Budget, blockSize = 8)
    IncrementalPack.processBatch(catalog, batchDf(60 until 100), 2L, Budget, blockSize = 8)
    packsOf(catalog) shouldBe expectedWhole(0 until 100)
    // exactly-once: the crash-replay left zero duplicate pack rows
    val n = catalog.read(IncrementalPack.PacksTable).count()
    n shouldBe catalog.read(IncrementalPack.PacksTable).distinct().count()
    n shouldBe 100L
  }

  test("an out-of-order NEW batch id fails fast instead of corrupting offsets") {
    val out = tmpDir("incpack-order")
    val catalog = new TranscriptCatalog(out, spark)
    IncrementalPack.processBatch(catalog, batchDf(0 until 30), 5L, Budget, blockSize = 8)
    // a batch id BELOW the committed maximum is a contract violation —
    // committedBase would silently pack it against batch 5's total
    val err = intercept[IllegalArgumentException] {
      IncrementalPack.processBatch(catalog, batchDf(30 until 40), 3L, Budget, blockSize = 8)
    }
    err.getMessage should include("out-of-order pack batch")
    // the committed state is untouched and in-order progress still works
    packsOf(catalog) shouldBe expectedWhole(0 until 30)
    IncrementalPack.processBatch(catalog, batchDf(30 until 40), 6L, Budget, blockSize = 8)
    packsOf(catalog) shouldBe expectedWhole(0 until 40)
  }

  test("a batch overlapping the committed doc-id range fails fast") {
    val out = tmpDir("incpack-overlap")
    val catalog = new TranscriptCatalog(out, spark)
    IncrementalPack.processBatch(catalog, batchDf(0 until 30), 0L, Budget, blockSize = 8)
    // doc 29 is already packed; re-sending it under a new batch id would
    // silently interleave slots
    val err = intercept[IllegalArgumentException] {
      IncrementalPack.processBatch(catalog, batchDf(29 until 40), 1L, Budget, blockSize = 8)
    }
    err.getMessage should include("overlaps committed doc-id range")
    packsOf(catalog) shouldBe expectedWhole(0 until 30)
  }
}
