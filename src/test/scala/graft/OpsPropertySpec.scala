package graft

import org.apache.spark.sql.functions._

/** Property bounds for the round-4 training-data operators (each is also
  * DuckDB-oracle-matched in CORRECTNESS; these pin the semantic invariants
  * the oracle equality alone doesn't make explicit).
  */
class OpsPropertySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("corpus_stats: the funnel is monotone and consistent with corpus_export") {
    val st = SparkEntry.queries("corpus_stats")(spark, dir)
      .collect().sortBy(_.getAs[Int]("stage_ord"))
    st.map(_.getAs[String]("stage")).toSeq shouldBe
      Seq("train", "quality", "exact_dedup", "neardup", "decontam", "mixed")
    // each stage can only drop docs and tokens, never add
    st.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"),
          s"${b.getAs[String]("stage")} grew docs")
        assert(b.getAs[Long]("n_tokens") <= a.getAs[Long]("n_tokens"),
          s"${b.getAs[String]("stage")} grew tokens")
      case _ =>
    }
    // the funnel's terminal stage IS the export's doc set
    val exported = SparkEntry.queries("corpus_export")(spark, dir)
      .select("doc_id").distinct().count()
    st.last.getAs[Long]("n_docs") shouldBe exported
  }

  test("emb_quantize: reconstruction error never exceeds the half-step bound") {
    // Symmetric int8 quantization: |x - q·scale| ≤ scale/2 by construction
    // (floor(x/scale + 0.5) rounds to the nearest step).
    val q = OpsQueries.queries("emb_quantize")(spark, dir)
    q.filter(col("max_err") > col("scale") * 0.5 + 1e-9).count() shouldBe 0L
    q.count() shouldBe 500L
  }

  test("tx_scrub2: every injected email/phone/card span is actually detected") {
    // The regression this pins: with card-before-phone redaction order the
    // card regex ate the phone's last 4 digits across the span boundary
    // and n_phones was 0 for every doc while the oracle (mirroring the
    // same defect) stayed green.
    val r = OpsQueries.queries("tx_scrub2")(spark, dir)
    r.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1 || col("n_ccs") =!= 1)
      .count() shouldBe 0L
    r.count() shouldBe 500L
  }

  test("tx_sample_strat: hash sampling is deterministic and near the target rates") {
    val s1 = OpsQueries.queries("tx_sample_strat")(spark, dir)
      .collect().map(_.getLong(0)).sorted
    val s2 = OpsQueries.queries("tx_sample_strat")(spark, dir)
      .collect().map(_.getLong(0)).sorted
    s1 shouldBe s2 // content-stable hash ⇒ identical sample every run
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val en = docs.filter(col("lang") === "en").count().toDouble
    val enKept = OpsQueries.queries("tx_sample_strat")(spark, dir)
      .filter(col("lang") === "en").count().toDouble
    // md5 buckets are uniform; 50% target with binomial slack
    (enKept / en) shouldBe 0.50 +- 0.12
  }

  test("tx_pack: the hierarchical prefix sum equals a sequential scan") {
    val rows = OpsQueries.queries("tx_pack")(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    var cum = 0L
    rows.foreach { case (_, tokens, packId, packPos) =>
      packId shouldBe cum / 512
      packPos shouldBe cum % 512
      cum += tokens
    }
  }

  test("tx_tfidf: exactly the top-3 terms per doc, ranks 1..3, scores descending") {
    val rows = OpsQueries.queries("tx_tfidf")(spark, dir)
      .select("doc_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.map(_._2).sorted shouldBe (1 to rs.length)
      rs.length should be <= 3
      rs.sortBy(_._2).map(_._3).toSeq.sliding(2).foreach { w =>
        if (w.length == 2) w(0) should be >= w(1)
      }
    }
  }
}
