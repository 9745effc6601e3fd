package graft.app

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.Rollup
import graft.checkpoint.Checkpoint
import graft.enrich.Enrich
import graft.model.PipelineConfig
import graft.parse.TranscriptParse
import graft.route.Router
import graft.sink.TranscriptCatalog

/** End-to-end transcript pipeline: ingest → dedup → parse → enrich → route →
  * rollup, with checkpoint/resume and per-partition lineage + metrics.
  *
  * One logical plan per phase; Catalyst inserts the partial/final aggregate
  * split and exchanges (reference hand-builds these:
  * internal/ingestors/batch_summarizer.go:28-85 +
  * internal/streams/partial_insight_producer.go:49-90 +
  * internal/aggregators/aggregate_rolluper.go:21-48).
  *
  * Resume granularity = minute-window partitions of the input: a rerun skips
  * windows recorded in the checkpoint manifest, and the aggregate sink is
  * written with dynamic partition overwrite so replays of uncommitted
  * windows converge (idempotent, reference: file_storage.go:113-192).
  */
object PipelineJob {

  final case class Result(
      metrics: Map[String, Long],
      routeCounts: Map[String, Long],
      processedWindows: Seq[String]
  )

  def run(
      spark: SparkSession,
      raw: DataFrame,
      catalogRoot: String,
      config: PipelineConfig = PipelineConfig(),
      runId: String = "run-0",
      routes: Seq[Router.Route] = Router.defaultRoutes
  ): Result = {
    val catalog = new TranscriptCatalog(catalogRoot, spark)
    val checkpointDir = s"$catalogRoot/_checkpoint"
    val committed = Checkpoint.read(checkpointDir).map(_.committedSet).getOrElse(Set.empty)
    val prior = Checkpoint.read(checkpointDir)

    // --- ingest + resume filter (partition = minute window key) ---
    val withWindow = raw
      .withColumn("window_start", Rollup.windowStart(col("ts"), config.windowSize))
      .withColumn("window_key", Rollup.windowKey(col("window_start"), config.windowSize))
    val windowKeys = withWindow.select("window_key").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val todo = windowKeys.filterNot(committed)
    if (todo.isEmpty)
      return Result(prior.map(_.metrics).getOrElse(Map.empty), Map.empty, Nil)
    val scoped =
      if (todo.size == windowKeys.size) withWindow
      else withWindow.filter(col("window_key").isin(todo: _*))

    // --- D1 row-level dedup (idempotency analog of the reference's
    //     create-if-not-exists batch guard, log_batch_store.go:42-59) ---
    val deduped = scoped.dropDuplicates("conv_id", "turn_idx")

    // --- parse (keep text through routing so sinks carry the raw turn) ---
    val (parsed0, quarantine) = TranscriptParse.parseKeepText(deduped, config.maxTextLen)
    val obs = new Observation(s"parse-$runId")
    val parsed = parsed0.observe(obs, count(lit(1)).as("rows_parsed"))

    // --- enrich (broadcast dims) ---
    val enriched = Enrich.enrich(parsed, spark)

    // --- route fan-out: ONE pass, write partitioned by (route, window_key) ---
    val routed = enriched.withColumn("route", Router.routeColumn(routes))
    catalog.overwritePartitions(routed, "routed", Seq("route", "window_key"))
    val routeCounts = catalog.read("routed")
      .groupBy("route").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // --- quarantine sink (error rows with code column, E1 analog) ---
    val quarantined = quarantine.count()
    if (quarantined > 0)
      catalog.overwritePartitions(
        quarantine.withColumn("window_key",
          coalesce(col("window_key"), lit("invalid"))),
        "quarantine", Seq("window_key"))

    // --- rollup: read back the routed table scoped to this run's windows
    //     (partition-pruned scan — the isin on the partition column prunes
    //     directories) and aggregate without the wide text column.
    //     A5 incremental semantics: each window is recomputed wholesale and
    //     dynamic partition overwrite replaces exactly those windows, so
    //     aggregate state for committed windows is never touched and replays
    //     of uncommitted windows converge (idempotent upsert, K2 analog). ---
    val forAgg = catalog.read("routed").drop("text")
      .filter(col("window_key").isin(todo: _*))
    val exploded = Rollup.explodedRollup(forAgg, config.windowSize, config.saltBuckets)
      .withColumn("window_key", Rollup.windowKey(col("window_start"), config.windowSize))
    catalog.overwritePartitions(exploded, "aggregates", Seq("window_key"))

    val rowsParsed = obs.get("rows_parsed").asInstanceOf[Long]
    val aggRows = catalog.read("aggregates").count()

    // --- per-partition lineage + metrics → atomic manifest commit ---
    val perWindow = catalog.read("routed")
      .filter(col("window_key").isin(todo: _*))
      .groupBy("window_key").count().collect()
      .map(r => Checkpoint.PartitionLineage(r.getString(0), r.getLong(1)))
    val priorParts = prior.map(_.committedPartitions).getOrElse(Nil)
      .filterNot(p => todo.contains(p.partition))
    val metrics = Map(
      "rows_parsed" -> rowsParsed,
      "rows_quarantined" -> quarantined,
      "rows_routed" -> routeCounts.values.sum,
      "agg_rows" -> aggRows,
      "windows_processed" -> todo.size.toLong
    ) ++ routeCounts.map { case (k, v) => s"route_$k" -> v }
    Checkpoint.write(checkpointDir,
      Checkpoint.Manifest(runId, priorParts ++ perWindow, metrics))

    Result(metrics, routeCounts, todo)
  }
}
