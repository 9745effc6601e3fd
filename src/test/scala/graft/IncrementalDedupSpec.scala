package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalDedup
import graft.sink.TranscriptCatalog

/** Cross-run incremental near-dup (VERDICT round-2 item #2): run 2 must drop
  * new-batch docs that near-duplicate docs kept by run 1, consulting only the
  * persisted signature STORE (never re-reading run 1's documents).
  */
class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val Bands = 2
  private val Rows = 1

  // 3-shingle sets via the shared tokenizer (same convention as
  // OpsQueries.docShingles).
  private def toks(texts: Seq[(Long, String)]) =
    IncrementalDedup.shingles(texts.toDF("doc_id", "text"), "text")

  test("run 2 drops near-dups of run 1's corpus via the persisted store") {
    val out = tmpDir("inc-dedup")
    val catalog = new TranscriptCatalog(out, spark)

    // Run 1: fresh corpus — everything kept, signatures persisted.
    val day1 = toks(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a completely different document about spark physical plans"))
    val (kept1, dropped1, sigs1) = IncrementalDedup.dedupBatch(
      day1, IncrementalDedup.signatures(day1.limit(0), "doc_id", "toks", Bands, Rows),
      "doc_id", "toks", Bands, Rows)
    kept1.count() shouldBe 2L
    dropped1.count() shouldBe 0L
    catalog.append(sigs1, "signatures")

    // Run 2: one exact replay of doc 1, one near-dup of doc 2 (shared
    // shingles ⇒ shared minima), one fresh doc, one token-less doc.
    val day2 = toks(Seq(
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "a completely different document about spark physical plans indeed",
      12L -> "entirely novel content regarding duckdb oracle checks",
      13L -> "too short"))
    val store = catalog.read("signatures")
    val (kept2, dropped2, sigs2) = IncrementalDedup.dedupBatch(
      day2, store, "doc_id", "toks", Bands, Rows)
    dropped2.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(10L, 11L)
    kept2.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(12L, 13L)
    catalog.append(sigs2, "signatures")

    // Run 3: a replay of run 2's KEPT doc now collides with the grown store.
    val day3 = toks(Seq(
      20L -> "entirely novel content regarding duckdb oracle checks"))
    val (kept3, dropped3, _) = IncrementalDedup.dedupBatch(
      day3, catalog.read("signatures"), "doc_id", "toks", Bands, Rows)
    kept3.count() shouldBe 0L
    dropped3.select("doc_id").collect().map(_.getLong(0)) shouldBe Array(20L)
    // the store only ever holds KEPT docs' signatures
    catalog.read("signatures").select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 12L)
  }

  test("q_incremental_neardup matches the within-corpus pair set at the split point") {
    // Every batch doc flagged is_dup must share a band with SOME history doc
    // — cross-check against dd_minhash_lsh's pair set restricted to
    // (history, batch) pairs.
    val dir = "/root/testdata/sf0.01"
    val res = OpsQueries.queries("q_incremental_neardup")(spark, dir)
    val flagged = res.filter(col("is_dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pairs = OpsQueries.queries("dd_minhash_lsh")(spark, dir)
      .filter(col("doc_a") < 250 && col("doc_b") >= 250)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    flagged shouldBe pairs
    res.count() shouldBe 250L
  }
}
