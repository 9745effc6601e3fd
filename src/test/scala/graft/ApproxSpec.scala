package graft

import org.apache.spark.sql.functions._

/** HLL++ approximate distinct: accuracy vs exact, and the scale property
  * that motivates it (fixed-size sketch state, mergeable across partials).
  */
class ApproxSpec extends SparkSpecBase {

  test("approx_count_distinct is within 2% of exact at rsd=0.01") {
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      withClue(s"$k: approx=$a exact=$n") {
        math.abs(a - n).toDouble / n should be <= 0.02
      }
    }
  }

  test("plan is a two-phase (partial/final) aggregate — sketch merges map-side") {
    val p = SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    p should include("partial_approx_count_distinct")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }
}
