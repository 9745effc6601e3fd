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

  test("approx percentiles sit within a ±2% quantile band of the exact distribution") {
    val dir = "/root/testdata/sf0.01"
    // rank error ≤ n/accuracy ⇒ the approx p-quantile must lie between the
    // exact (p−ε)- and (p+ε)-quantiles; assert with ε = 2% (accuracy=10000
    // guarantees 0.01% here — the band is deliberately loose).
    val bands = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.48, 0.52, 0.88, 0.92))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    SparkEntry.queries("q_approx_percentiles")(spark, dir).collect().foreach { r =>
      val b = bands(r.getString(0))
      val (p50, p90) = (r.getDouble(1), r.getDouble(2))
      withClue(s"${r.getString(0)}: p50=$p50 p90=$p90 band=$b") {
        p50 should (be >= b(0) and be <= b(1))
        p90 should (be >= b(2) and be <= b(3))
      }
    }
  }

  test("approx-percentile plan keeps fixed-size sketch state below the exchange") {
    val p = SparkEntry.queries("q_approx_percentiles")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // partial sketch before the exchange: the GK summaries merge map-side,
    // so no reducer ever buffers a group's raw values (the exact
    // `percentile` failure mode this query exists to avoid)
    p should include("partial_percentile_approx")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should not include "Window"
  }

  test("quantile buckets agree with exact ntile away from boundaries (≥99%)") {
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q_quantile_bucket")(spark, dir)
      .select("event_id", "tile")
    val exact = SparkEntry.queries("q_ntile")(spark, dir)
      .select(col("event_id"), col("tile").as("tile_exact"))
    val joined = approx.join(exact, Seq("event_id")).persist()
    val n = joined.count()
    val agree = joined.filter(col("tile") === col("tile_exact")).count()
    // disagreement is confined to within-rank-error boundary ties
    withClue(s"agree=$agree/$n") {
      agree.toDouble / n should be >= 0.99
    }
    // and buckets are balanced: each (event_type, tile) holds 25% ± 2%
    val sizes = SparkEntry.queries("q_quantile_bucket")(spark, dir)
      .groupBy("event_type", "tile").count()
      .groupBy("event_type")
      .agg((max("count") - min("count")).as("spread"),
        sum("count").as("total"))
      .collect()
    sizes.foreach { r =>
      withClue(s"${r.getString(0)}: spread=${r.getLong(1)} total=${r.getLong(2)}") {
        r.getLong(1).toDouble / r.getLong(2) should be <= 0.02
      }
    }
    joined.unpersist()
  }

  test("quantile-bucket plan has no Window and broadcasts the boundary table") {
    val p = SparkEntry.queries("q_quantile_bucket")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    p should not include "Window"
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }
}
