package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

import graft.parse.TranscriptParse
import graft.route.Router
import graft.enrich.Enrich

/** Structured-Streaming variant of the pipeline: the incremental analog of
  * the reference's always-on ingest service (reference: internal/app/app.go,
  * internal/streams/partial_insight_consumer.go:46-114). The reference has
  * at-least-once delivery with idempotent dedup and no late-data handling
  * (reference README.md:18,172); here the same semantics are expressed as
  * `dropDuplicates` over a watermarked stream (state-bounded exact dedup)
  * plus update-mode windowed aggregation.
  *
  * The batch pipeline remains the primary path (per BASELINE.json north
  * rule); this module exists so a user of the reference's streaming surface
  * has the equivalent operator set: stream parse → enrich → route →
  * windowed rollup.
  */
object StreamingPipeline {

  /** Parse + enrich + route a streaming transcript DataFrame (same Catalyst
    * expressions as the batch path — they are stream-safe: stateless
    * projections/filters only).
    */
  def transform(
      spark: SparkSession,
      stream: DataFrame,
      watermark: String = "2 minutes",
      routes: Seq[Router.Route] = Router.defaultRoutes
  ): DataFrame = {
    val withWm = stream.withWatermark("ts", watermark)
      // at-least-once → exactly-once: state-bounded dedup on the stable key
      // (D1 analog; watermark bounds the dedup state store)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
    val (valid, _) = TranscriptParse.parseKeepText(withWm)
    Enrich.enrich(valid, spark)
      .withColumn("route", Router.routeColumn(routes))
  }

  /** Windowed per-(conv, tool) counts with watermarked tumbling windows —
    * the streaming form of the batch rollup (A1+A4 as update-mode state).
    */
  def windowedCounts(transformed: DataFrame, windowSize: String = "1 minute"): DataFrame =
    transformed
      .groupBy(window(col("ts"), windowSize).as("w"), col("conv_id"), col("tool"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("conv_id"), col("tool"), col("cnt"))

  /** Write the routed stream to per-route parquet sinks (K1/K2 analog):
    * one query, partitioned by route, exactly-once via checkpointed commits.
    */
  def routedSink(
      transformed: DataFrame,
      path: String,
      checkpoint: String
  ): DataStreamWriter[Row] =
    transformed.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("route")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
}
