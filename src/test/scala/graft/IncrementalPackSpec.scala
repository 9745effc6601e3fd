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
    catalog.append(packed, IncrementalPack.PacksTable)
    // The offsets row a real crashed attempt would have written — the
    // total is deterministic (base + sum(tokens)), so the retry's
    // duplicate row always AGREES with it.
    val b1Tokens = b1.agg(sum(col("tokens").cast("bigint"))).head.getLong(0)
    catalog.append(Seq((1L, base, base + b1Tokens))
      .toDF("batch_id", "base", "total_after"), IncrementalPack.OffsetTable)
    // retry
    IncrementalPack.processBatch(catalog, b1, 1L, Budget, blockSize = 8)
    IncrementalPack.processBatch(catalog, batchDf(60 until 100), 2L, Budget, blockSize = 8)
    packsOf(catalog) shouldBe expectedWhole(0 until 100)
  }
}
