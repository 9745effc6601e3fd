package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bucketed range join: must equal the naive range predicate exactly
  * (including boundary inclusivity and intervals spanning many buckets)
  * while planning as an EQUI join, never a nested loop.
  */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("bucketed join equals the naive range join (multi-bucket spans, boundaries)") {
    val facts = Seq(
      (1L, ts("2025-12-28T10:00:00Z")), // == short-interval start (inclusive)
      (2L, ts("2025-12-28T10:02:00Z")), // == short-interval end (inclusive), also in long
      (3L, ts("2025-12-28T10:02:01Z")), // 1s past the short end -> long interval only
      (4L, ts("2025-12-28T10:07:30Z")), // inside the long interval only
      (5L, ts("2025-12-28T09:59:59Z"))  // before everything -> no match
    ).toDF("event_id", "ts")
    val intervals = Seq(
      (ts("2025-12-28T10:00:00Z"), ts("2025-12-28T10:02:00Z")), // 2 min
      (ts("2025-12-28T10:01:00Z"), ts("2025-12-28T10:20:00Z"))  // 19 min: spans many 120s buckets
    ).toDF("inc_start", "inc_end")

    val bucketed = RangeJoin.bucketed(facts, "ts", intervals,
        "inc_start", "inc_end", bucketWidthSec = 120)
      .select("event_id", "inc_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val naive = facts.crossJoin(intervals)
      .filter(col("ts") >= col("inc_start") && col("ts") <= col("inc_end"))
      .select("event_id", "inc_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    bucketed shouldBe naive
    bucketed.map(_._1) shouldBe Set(1L, 2L, 3L, 4L)
    // past-the-end boundary: event 3 must match ONLY the long interval
    bucketed.filter(_._1 == 3L).map(_._2) shouldBe Set(ts("2025-12-28T10:01:00Z"))
  }

  test("each matching (fact, interval) pair is emitted exactly once") {
    // A fact inside a 10-bucket interval must still match once, not 10×.
    val facts = Seq((1L, ts("2025-12-28T10:05:00Z"))).toDF("event_id", "ts")
    val intervals = Seq(
      (ts("2025-12-28T10:00:00Z"), ts("2025-12-28T10:20:00Z"))
    ).toDF("inc_start", "inc_end")
    RangeJoin.bucketed(facts, "ts", intervals, "inc_start", "inc_end", 120)
      .count() shouldBe 1L
  }

  test("plan is an equi join on the bucket, never a nested loop") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val incidents = events.filter(col("event_type") === "error")
      .select(col("ts").as("inc_start"),
        (col("ts") + expr("INTERVAL 2 MINUTES")).as("inc_end"))
    val p = RangeJoin.bucketed(events.select("event_id", "ts"), "ts",
        incidents, "inc_start", "inc_end", 120)
      .queryExecution.executedPlan.toString
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }
}
