package graft

import org.apache.spark.sql.functions._

/** tx_split_assign (leakage-safe train/val/test split): exhaustive and
  * disjoint, verbatim duplicate texts always land in the same split
  * (the content-keyed property an id-keyed split lacks), and the split
  * is deterministic across runs.
  */
class SplitAssignSpec extends SparkSpecBase {
  import spark.implicits._

  test("exhaustive partition; duplicates share a split; deterministic") {
    val dir = tmpDir("splitassign")
    // 200 unique texts plus 3 verbatim copies of one of them under
    // different doc ids — the leakage trap
    val rows = (0 until 200).map(i => (i.toLong, s"unique document number $i with words")) ++
      Seq(500L, 501L, 502L).map(id => (id, "unique document number 7 with words"))
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val got = OpsQueries.queries("tx_split_assign")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.size shouldBe 203 // every doc assigned exactly once
    got.values.toSet.subsetOf(Set("train", "val", "test")) shouldBe true
    // all four verbatim copies of doc 7's text share one split
    Set(7L, 500L, 501L, 502L).map(got) should have size 1
    // majority lands in train at a 90/5/5 bucket cut
    got.values.count(_ == "train") should be > 150

    val again = OpsQueries.queries("tx_split_assign")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    again shouldBe got
  }
}
