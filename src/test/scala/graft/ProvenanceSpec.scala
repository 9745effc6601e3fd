package graft

import org.apache.spark.sql.functions._

/** Provenance symmetry for the line/substring dedup families (round-7
  * verdict item #5): the provenance queries must be pure re-projections
  * of the frames their strip/span siblings already compute — same
  * over-threshold sets, occurrence totals that reconcile exactly with
  * what the strips removed, and a well-formed top-k rank.
  */
class ProvenanceSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("dd_line_provenance reconciles exactly with dd_line_dedup's strip") {
    val prov = OpsQueries.queries("dd_line_provenance")(spark, dir)
      .localCheckpoint()
    val scrub = OpsQueries.queries("dd_line_dedup")(spark, dir)
    // total stripped unit occurrences == total occurrences of the
    // over-threshold units (the projection identity: both sides read the
    // same unit frame)
    val stripped = scrub.agg(sum(col("n_lines") - col("kept_line_count")))
      .head.getLong(0)
    val provTotal = prov.select("lh", "cnt").distinct()
      .agg(sum("cnt")).head.getLong(0)
    provTotal shouldBe stripped
    stripped should be > 0L
    // rank is dense from 1 to min(n_docs, 5) per unit
    prov.groupBy("lh").agg(
        count(lit(1)).as("rows"), max("rk").as("mx"), min("rk").as("mn"),
        first("n_docs").as("nd"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("rows") ||
        col("rows") =!= least(col("nd"), lit(5)))
      .count() shouldBe 0L
    // where every carrier is listed (n_docs <= 5), per-doc occurrences
    // sum back to the unit's total
    prov.filter(col("n_docs") <= 5)
      .groupBy("lh").agg(first("cnt").as("cnt"), sum("occ").as("s"))
      .filter(col("cnt") =!= col("s")).count() shouldBe 0L
  }

  test("dd_substring_provenance is a re-projection of the spans' dup frame") {
    val prov = OpsQueries.queries("dd_substring_provenance")(spark, dir)
      .localCheckpoint()
    val spans = OpsQueries.queries("dd_substring_spans")(spark, dir)
    // recompute the untruncated dup/carrier frame the spans query uses
    val g = graft.ops.SubstringDedup.positionedGrams(
      spark.read.parquet(s"$dir/documents.parquet"), "text")
    val dup = g.groupBy("gh").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("gh").localCheckpoint()
    val carriers = g.join(dup, Seq("gh"), "left_semi")
      .select("doc_id").distinct()
    // the provenance gram set IS the duplicated-gram set (rk=1 always
    // survives the top-5 cut)
    prov.select("gh").distinct().count() shouldBe dup.count()
    // carrier docs of duplicated grams are exactly the docs with spans
    carriers.join(spans.select("doc_id").distinct(), Seq("doc_id"), "full")
      .filter(col("doc_id").isNull).count() shouldBe 0L
    carriers.count() shouldBe spans.select("doc_id").distinct().count()
    // all provenance carriers have spans (the truncated side is a subset)
    prov.select("doc_id").distinct()
      .join(spans.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .count() shouldBe 0L
    // per-gram occurrence totals reconcile where all carriers are listed
    prov.filter(col("n_docs") <= 5)
      .groupBy("gh").agg(first("cnt").as("cnt"), sum("occ").as("s"))
      .filter(col("cnt") =!= col("s")).count() shouldBe 0L
    prov.count() should be > 0L
  }
}
