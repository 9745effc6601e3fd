package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** tx_cap_source (per-source frequency capping): at most k docs survive
  * per source, selected by the deterministic md5-derived order, and the
  * hierarchical prefix-count rank equals the classic window row_number
  * reference at test scale (where the window is still runnable).
  */
class CapSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("capsource")
    rows.toDF("doc_id", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("skewed source is capped at k, small sources keep everything, rank matches the window reference") {
    // one crawl domain holds 200 docs (the skew case the window-free rank
    // exists for), one holds 3
    val rows = (0 until 200).map(i => (i.toLong, "big")) ++
      Seq((1000L, "small"), (1001L, "small"), (1002L, "small"))
    val dir = writeDocs(rows)
    val got = OpsQueries.queries("tx_cap_source")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    got.count(_._2 == "big") shouldBe 10
    got.count(_._2 == "small") shouldBe 3
    got.foreach { case (_, _, rank) => rank should be < 10L }

    // the hierarchical rank equals row_number() - 1 over the same order
    val ord = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 10), 16, 10) AS BIGINT)" +
        " * 4194304 + pmod(doc_id, 4194304)")
    val ref = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), ord.as("ord"))
      .withColumn("keep_rank",
        row_number().over(Window.partitionBy("source").orderBy("ord")) - 1)
      .filter(col("keep_rank") < 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3).toLong))
    got.sorted shouldBe ref.sorted
  }

  test("the cap is deterministic across runs") {
    val dir = writeDocs((0 until 50).map(i => (i.toLong, s"s${i % 2}")))
    val a = OpsQueries.queries("tx_cap_source")(spark, dir).collect().map(_.toString).sorted
    val b = OpsQueries.queries("tx_cap_source")(spark, dir).collect().map(_.toString).sorted
    a shouldBe b
  }
}
