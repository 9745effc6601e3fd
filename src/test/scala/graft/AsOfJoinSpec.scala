package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** Value-level semantics of the union-window as-of join: most recent prior
  * payload, equal-timestamp rows visible, null when no dim precedes, and a
  * single-shuffle plan (no join operator at all).
  */
class AsOfJoinSpec extends SparkSpecBase {

  private def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("as-of picks the latest right row at or before each left ts") {
    import spark.implicits._
    val facts = Seq(("e1", "u1", ts(5)), ("e2", "u1", ts(10)),
      ("e3", "u1", ts(20)), ("e4", "u2", ts(1)), ("e5", "u3", ts(9)))
      .toDF("event_id", "user_id", "ts")
    val dims = Seq(("u1", ts(5), 1.0), ("u1", ts(15), 2.0), ("u2", ts(3), 9.0))
      .toDF("user_id", "ts", "status_value")
    val out = AsOfJoin.asof(facts, dims, Seq("user_id"), "ts", Seq("status_value"))
      .select("event_id", "status_value")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    out("e1") shouldBe Some(1.0) // equal ts: dim at 10:05 visible
    out("e2") shouldBe Some(1.0) // before the 10:15 dim
    out("e3") shouldBe Some(2.0) // after it
    out("e4") shouldBe None      // dim only at 10:03, fact at 10:01
    out("e5") shouldBe None      // key with no dims at all
  }

  test("plan is one window over a union — no join operator") {
    import spark.implicits._
    val facts = Seq(("e1", "u1", ts(5))).toDF("event_id", "user_id", "ts")
    val dims = Seq(("u1", ts(3), 1.0)).toDF("user_id", "ts", "status_value")
    val plan = AsOfJoin.asof(facts, dims, Seq("user_id"), "ts", Seq("status_value"))
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should include("Window")
  }
}
