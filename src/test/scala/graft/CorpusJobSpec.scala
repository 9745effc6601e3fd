package graft

import org.apache.spark.sql.functions._
import graft.app.{CorpusConfig, CorpusJob}
import graft.sink.TranscriptCatalog

/** The corpus release JOB (graft.app.CorpusJob): pinned to the catalog
  * queries' constants it reproduces the oracled corpus_export_split /
  * corpus_stats chain byte-for-byte, a run without an eval set skips
  * decontamination exactly, and reruns converge (idempotent overwrite).
  */
class CorpusJobSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  // The catalog queries' constants (OpsQueries): quality ≥ 0.4, 2×1
  // MinHash banding, en=4000 / other=1500 token budgets, 512-token
  // packs, prefix sums forced to recurse (blockSize 25, maxTopRows 8).
  private val catalogCfg = CorpusConfig(
    qualityMin = 0.4, minhashBands = 2, minhashRows = 1,
    budgets = Map("en" -> 4000L), budgetDefault = 1500L,
    packBudget = 512, blockSize = 25, maxTopRows = 8)

  private def docsAll = spark.read.parquet(s"$dir/documents.parquet")
  private def train = docsAll.filter(col("doc_id") < 450)
  private def eval = docsAll.filter(col("doc_id") >= 450)

  test("the job reproduces the oracled export chain at the catalog constants") {
    val out = tmpDir("corpusjob-identity")
    CorpusJob.run(spark, train, Some(eval), out, catalogCfg)
    val catalog = new TranscriptCatalog(out, spark)

    val jobPacks = catalog.read("release_packs")
      .select("doc_id", "pack_id", "seg_off", "seg_len", "pack_pos")
      .collect().map(_.toString).sorted
    val oraclePacks = OpsQueries.queries("corpus_export_split")(spark, dir)
      .select("doc_id", "pack_id", "seg_off", "seg_len", "pack_pos")
      .collect().map(_.toString).sorted
    jobPacks shouldBe oraclePacks

    val jobFunnel = catalog.read("release_funnel")
      .collect().map(_.toString).sorted
    val oracleFunnel = OpsQueries.queries("corpus_stats")(spark, dir)
      .collect().map(_.toString).sorted
    jobFunnel shouldBe oracleFunnel
  }

  test("under --token-counter bpe the job's mix equals corpus_export_bpe") {
    val out = tmpDir("corpusjob-bpe")
    CorpusJob.run(spark, train, Some(eval), out,
      catalogCfg.copy(tokenCounter = "bpe"))
    val jobMix = new TranscriptCatalog(out, spark).read("release_docs")
      .select(col("doc_id"), col("lang"), col("tokens").cast("long"))
      .collect().map(_.toString).sorted
    val oracleMix = OpsQueries.queries("corpus_export_bpe")(spark, dir)
      .select(col("doc_id"), col("lang"), col("tokens").cast("long"))
      .collect().map(_.toString).sorted
    jobMix shouldBe oracleMix
    jobMix.length should be > 0
    // the BPE budget cut lands differently from the whitespace cut: the
    // subword counter spends budget faster, so the mix is a different set
    val outWs = tmpDir("corpusjob-ws-twin")
    CorpusJob.run(spark, train, Some(eval), outWs, catalogCfg)
    val wsMix = new TranscriptCatalog(outWs, spark).read("release_docs")
      .select(col("doc_id"), col("lang"), col("tokens").cast("long"))
      .collect().map(_.toString).sorted
    jobMix should not equal wsMix
  }

  test("without an eval set the decontamination stage passes everything through") {
    val out = tmpDir("corpusjob-noeval")
    val result = CorpusJob.run(spark, train, None, out, catalogCfg)
    result.metrics("docs_decontam") shouldBe result.metrics("docs_neardup")
    result.metrics("tokens_decontam") shouldBe result.metrics("tokens_neardup")
    // and WITH the eval set it strictly gates (the sf0.001 corpus plants
    // cross-split contamination)
    val out2 = tmpDir("corpusjob-eval")
    val gated = CorpusJob.run(spark, train, Some(eval), out2, catalogCfg)
    gated.metrics("docs_decontam") should be < result.metrics("docs_decontam")
  }

  test("the funnel is monotone and the packs tile the mixed tokens exactly") {
    val out = tmpDir("corpusjob-funnel")
    val result = CorpusJob.run(spark, train, Some(eval), out, catalogCfg)
    val m = result.metrics
    m("docs_train") should be >= m("docs_quality")
    m("docs_quality") should be >= m("docs_exact_dedup")
    m("docs_exact_dedup") should be >= m("docs_neardup")
    m("docs_neardup") should be >= m("docs_decontam")
    m("docs_decontam") should be >= m("docs_mixed")
    val catalog = new TranscriptCatalog(out, spark)
    val segSum = catalog.read("release_packs")
      .agg(sum("seg_len")).collect()(0).getLong(0)
    val mixedTokens = catalog.read("release_docs")
      .agg(sum("tokens")).collect()(0).getLong(0)
    segSum shouldBe mixedTokens
    // every pack except the last holds exactly packBudget tokens
    val packTotals = catalog.read("release_packs")
      .groupBy("pack_id").agg(sum("seg_len").as("t"))
      .orderBy("pack_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    packTotals.dropRight(1).foreach(_._2 shouldBe 512L)
  }

  test("pre-gate scrubs shrink the funnel's token counts, never its doc count") {
    val base = tmpDir("corpusjob-noscrub")
    val noScrub = CorpusJob.run(spark, train, None, base, catalogCfg)
    val out = tmpDir("corpusjob-scrub")
    val scrubbed = CorpusJob.run(spark, train, None, out,
      catalogCfg.copy(scrubLines = true, scrubSpans = true))
    // the sf0.001 corpus plants repeated boilerplate, so the scrubs bite
    scrubbed.metrics("tokens_train") should be < noScrub.metrics("tokens_train")
    scrubbed.metrics("docs_train") shouldBe noScrub.metrics("docs_train")
    // and the release still packs exactly
    val catalog = new TranscriptCatalog(out, spark)
    val segSum = catalog.read("release_packs")
      .agg(sum("seg_len")).collect()(0).getLong(0)
    val mixedTokens = catalog.read("release_docs")
      .agg(sum("tokens")).collect()(0).getLong(0)
    segSum shouldBe mixedTokens
  }

  test("a rerun converges byte-identically (idempotent overwrite)") {
    val out = tmpDir("corpusjob-rerun")
    val r1 = CorpusJob.run(spark, train, Some(eval), out, catalogCfg)
    val catalog = new TranscriptCatalog(out, spark)
    def snapshot() = Seq("release_docs", "release_packs", "release_funnel")
      .map(t => t -> catalog.read(t).collect().map(_.toString).sorted.toSeq)
      .toMap
    val s1 = snapshot()
    val r2 = CorpusJob.run(spark, train, Some(eval), out, catalogCfg)
    r2.metrics shouldBe r1.metrics
    snapshot() shouldBe s1
  }

  test("--rep-policy quality keeps the highest-quality member of a near-dup cluster") {
    import spark.implicits._
    // base: diverse words (high quality); doc 1 appends junk repetition
    // (lower diversity → lower score), doc 2 appends fresh words. With
    // 32×1 banding the shared base shingles make them near-dup candidates.
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, "en", s"$base junk junk junk junk junk junk"),
      (2L, "en", s"$base fresh extra tokens appended here today"),
      (3L, "en", (101 to 140).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    // guards: the quality ordering and the banding collision the test
    // relies on actually hold for this corpus
    val q = corpus.select(col("doc_id"),
        graft.parse.QualityScore.scoreCol("text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(2L) > q(1L), s"planted quality ordering broke: $q")
    val pairs = graft.ops.MinHash.candidatePairs(
      graft.ops.IncrementalDedup.shingles(corpus, "text").select("doc_id", "toks"),
      "doc_id", "toks", 32, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup pair not banded: $pairs")

    val cfg = CorpusConfig(qualityMin = 0.0, minhashBands = 32, minhashRows = 1)
    def keptWith(policy: String): Set[Long] = {
      val out = tmpDir(s"corpusjob-rep-$policy")
      CorpusJob.run(spark, corpus, None, out, cfg.copy(repPolicy = policy))
      new TranscriptCatalog(out, spark).read("release_docs")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    keptWith("minlabel") shouldBe Set(1L, 3L) // min-label keeps doc 1
    keptWith("quality") shouldBe Set(2L, 3L)  // quality keeps doc 2
    intercept[IllegalArgumentException] {
      keptWith("bogus")
    }.getMessage should include("rep policy")
  }
}
