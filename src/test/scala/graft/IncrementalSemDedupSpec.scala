package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalSemDedup, Similarity}
import graft.sink.TranscriptCatalog

/** Cross-batch semantic dedup (graft.ops.IncrementalSemDedup): planted
  * near-identical copies of stored vectors are dropped, novel vectors are
  * kept, within-batch duplicates resolve transitively, replays are no-ops
  * through every crash window, and the incremental kept set equals the
  * whole-corpus `Similarity.semDedup` on chain-free data.
  */
class IncrementalSemDedupSpec extends SparkSpecBase {

  /** Raw vectors (vec_id, embedding) with ids `idBase..idBase+n-1` and
    * content seeded by `contentBase..` (defaults to the ids) — same
    * arithmetic as Similarity.syntheticVectors. `contentBase` ≠ `idBase`
    * plants COPIES of other ids' content under new ids; `jitter` nudges
    * every element (cos ≈ 1 near-duplicates instead of exact).
    */
  private def rawVectors(
      idBase: Long,
      n: Int,
      contentBase: Long = -1,
      jitter: Boolean = false
  ): DataFrame = {
    val cb = if (contentBase >= 0) contentBase else idBase
    val j = if (jitter) " * 1.0001f + 0.0003f" else ""
    spark.range(0, n.toLong, 1, 4).toDF("i")
      .select((col("i") + idBase).as("vec_id"), expr(
        s"""transform(sequence(1, 64),
           |  k -> (CAST(pmod(hash(i + ${cb}L, k), 1000) AS FLOAT) / 500.0 - 1.0)$j)"""
          .stripMargin.replace("\n", " ")).as("embedding"))
  }

  private def keptIds(catalog: TranscriptCatalog): Seq[Long] =
    catalog.read(IncrementalSemDedup.KeptTable)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq

  test("cross-batch copies drop, novel vectors keep, replay is a no-op everywhere") {
    val out = tmpDir("semdedup-inc")
    val catalog = new TranscriptCatalog(out, spark)
    val b0 = rawVectors(0, 20)
    IncrementalSemDedup.publishIndex(catalog, Similarity.prepare(b0), nCells = 8)
    IncrementalSemDedup.processBatch(catalog, b0, 0L, storeBuckets = 4)
    // mutually dissimilar synthetic bases: all 20 kept
    keptIds(catalog) shouldBe (0L until 20L)
    // batch 1: jittered copies of vectors 0..9 under NEW ids 100..109
    // (cos ~ 1 -> dropped via the store) + novel vectors 1000..1009
    val copies = rawVectors(100, 10, contentBase = 0, jitter = true)
    val novel = rawVectors(1000, 10)
    IncrementalSemDedup.processBatch(catalog, copies.unionByName(novel), 1L,
      storeBuckets = 4)
    keptIds(catalog) shouldBe ((0L until 20L) ++ (1000L until 1010L))
    // replay of the committed batch: untouched tables
    val nKept = catalog.read(IncrementalSemDedup.KeptTable).count()
    val nStore = catalog.read(IncrementalSemDedup.StoreTable).count()
    IncrementalSemDedup.processBatch(catalog, copies.unionByName(novel), 1L,
      storeBuckets = 4)
    catalog.read(IncrementalSemDedup.KeptTable).count() shouldBe nKept
    catalog.read(IncrementalSemDedup.StoreTable).count() shouldBe nStore
    // crash window: marker dropped after the store append — the replay
    // finds its own vectors in the store, keeps nothing, touches nothing
    catalog.dropPartitions(IncrementalSemDedup.MarkerTable, "batch_id", _ == "1")
    IncrementalSemDedup.processBatch(catalog, copies.unionByName(novel), 1L,
      storeBuckets = 4)
    keptIds(catalog) shouldBe ((0L until 20L) ++ (1000L until 1010L))
    catalog.read(IncrementalSemDedup.KeptTable).count() shouldBe nKept
  }

  test("within-batch duplicates resolve transitively to one representative") {
    val out = tmpDir("semdedup-inc-within")
    val catalog = new TranscriptCatalog(out, spark)
    val bases = rawVectors(0, 8)
    IncrementalSemDedup.publishIndex(catalog, Similarity.prepare(bases), nCells = 4)
    // one batch: base 0 + two near-copies of it under higher ids
    val c1 = rawVectors(50, 1, contentBase = 0, jitter = true)
    val c2 = rawVectors(60, 1, contentBase = 0, jitter = true)
    IncrementalSemDedup.processBatch(catalog,
      rawVectors(0, 1).unionByName(c1).unionByName(c2), 0L, storeBuckets = 4)
    keptIds(catalog) shouldBe Seq(0L)
  }

  test("incremental kept set equals whole-corpus semDedup on chain-free batches") {
    val out = tmpDir("semdedup-inc-equiv")
    val catalog = new TranscriptCatalog(out, spark)
    val all = rawVectors(0, 12)
      .unionByName(rawVectors(100, 6, contentBase = 0, jitter = true))
    IncrementalSemDedup.publishIndex(catalog,
      Similarity.prepare(rawVectors(0, 12)), nCells = 4)
    IncrementalSemDedup.processBatch(catalog,
      all.filter(col("vec_id") < 8), 0L, storeBuckets = 4)
    IncrementalSemDedup.processBatch(catalog,
      all.filter(col("vec_id") >= 8), 1L, storeBuckets = 4)
    val full = Similarity.semDedup(Similarity.prepare(all),
        catalog.read(IncrementalSemDedup.CentsTable), minCos = 0.95)
      .filter(col("is_kept")).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    keptIds(catalog) shouldBe full
  }

  test("the kept-vector store joins exchange-free on its cell bucketing") {
    val out = tmpDir("semdedup-inc-plan")
    val catalog = new TranscriptCatalog(out, spark)
    val b0 = rawVectors(0, 20)
    IncrementalSemDedup.publishIndex(catalog, Similarity.prepare(b0), nCells = 8)
    IncrementalSemDedup.processBatch(catalog, b0, 0L, storeBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // both planners' thresholds: AQE re-plans small joins to broadcast at
    // runtime via its OWN threshold, which would erase the exchange this
    // gate counts (the production store is far past any broadcast size)
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val st = IncrementalSemDedup.store(catalog, 4)
        .select(col("cell"), col("v").as("sv"), col("nrm").as("sn"))
      // copies of stored content so the join result is non-empty — AQE
      // otherwise replaces the whole join with EmptyRelation and there is
      // no exchange left to count
      val batch = Similarity.assignCellBroadcast(
          Similarity.prepare(rawVectors(100, 10, contentBase = 0, jitter = true)),
          catalog.read(IncrementalSemDedup.CentsTable))
        .select(col("cell"), col("vec_id"), col("v"), col("nrm"))
      val joined = batch.join(st, Seq("cell"))
        .filter(expr("aggregate(zip_with(v, sv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
          / (col("nrm") * col("sn")) >= 0.95)
        .select("vec_id").distinct()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // one cell exchange (the batch side) — the bucketed store provides
      // its own hash partitioning; the distinct adds the vec_id exchange
      "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size shouldBe 1
      plan should include("Bucketed: true")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("an uncommitted index is refused") {
    val out = tmpDir("semdedup-inc-noindex")
    val catalog = new TranscriptCatalog(out, spark)
    val err = intercept[IllegalArgumentException] {
      IncrementalSemDedup.processBatch(catalog, rawVectors(0, 4), 0L)
    }
    err.getMessage should include("publishIndex")
  }
}
