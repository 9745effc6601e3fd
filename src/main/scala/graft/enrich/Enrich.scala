package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Broadcast-join enrich stage: attach tool/role lookup metadata to parsed
  * turns. The dimension tables are tiny → always `broadcast()` so the join
  * is a BroadcastHashJoin (no shuffle of the fact side), which is the only
  * plan that survives a 100× scale-up of the fact table.
  *
  * Reference analog: the UA-family lookup is a function application
  * (reference: internal/ingestors/batch_summarizer.go:88-96); the north rule
  * promotes it to a metadata join.
  */
object Enrich {

  /** Tool metadata dimension (fixed literals; FIXTURES.md §4). */
  def toolMeta(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("search", "retrieval", false),
      ("bash", "execution", true),
      ("edit", "mutation", true),
      ("read", "retrieval", false),
      ("web", "retrieval", false),
      ("none", "none", false)
    ).toDF("tool", "tool_kind", "is_privileged")
  }

  /** Role metadata dimension (fixed literals; FIXTURES.md §4). */
  def roleMeta(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("system", 0),
      ("user", 1),
      ("assistant", 2),
      ("tool", 3)
    ).toDF("role", "role_rank")
  }

  /** Left broadcast-join both dimensions onto the parsed turns. */
  def enrich(parsed: DataFrame, spark: SparkSession): DataFrame =
    parsed
      .join(broadcast(toolMeta(spark)), Seq("tool"), "left")
      .join(broadcast(roleMeta(spark)), Seq("role"), "left")
      .withColumn("tool_kind", coalesce(col("tool_kind"), lit("unknown")))
      .withColumn("is_privileged", coalesce(col("is_privileged"), lit(false)))
      .withColumn("role_rank", coalesce(col("role_rank"), lit(-1)))
}
