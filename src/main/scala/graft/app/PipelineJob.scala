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

  /** Wall-clock per pipeline phase, recorded into the metrics map (ms). */
  private final class PhaseTimer {
    private val phases = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def apply[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      phases(name) = (System.nanoTime() - t0) / 1000000
      r
    }
    def metrics: Map[String, Long] =
      phases.map { case (k, v) => s"phase_ms_$k" -> v }.toMap
  }

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

    // --- ingest + resume filter (partition = minute window key).
    //     No pre-scan: committed windows are filtered out inline (their rows
    //     drop right after the scan projection), and the set of windows this
    //     run actually processed is read back from the written routed state.
    //     This keeps every run at exactly one pass over the input. ---
    val withWindow = raw
      .withColumn("window_start", Rollup.windowStart(col("ts"), config.windowSize))
      .withColumn("window_key", Rollup.windowKey(col("window_start"), config.windowSize))
    val timer = new PhaseTimer
    val committedSeq = committed.toSeq.sorted
    val scoped =
      if (committed.isEmpty) withWindow
      else withWindow.filter(!col("window_key").isin(committedSeq: _*))

    // --- D1 row-level dedup (idempotency analog of the reference's
    //     create-if-not-exists batch guard, log_batch_store.go:42-59) ---
    val obsIn = new Observation(s"ingest-$runId")
    // Sort-based dedup (row_number over the key) instead of dropDuplicates:
    // dropDuplicates is a hash aggregate whose per-key buffer carries EVERY
    // column (first() of the wide text column in a 50M-entry hash map —
    // measured 2x slowdown from spills at 50M turns); the window form
    // shuffles once and external-SORTS, which spills sequentially.
    val dedupWindow = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id", "turn_idx").orderBy("ts")
    val deduped =
      (if (config.dedup)
        scoped.withColumn("__rn", row_number().over(dedupWindow))
          .filter(col("__rn") === 1).drop("__rn")
      else scoped)
        .observe(obsIn, count(lit(1)).as("rows_deduped"))

    // --- parse (keep text through routing so sinks carry the raw turn) ---
    val (parsed0, quarantine) = TranscriptParse.parseKeepText(deduped, config.maxTextLen)
    val obs = new Observation(s"parse-$runId")
    val parsed = parsed0.observe(obs, count(lit(1)).as("rows_parsed"))

    // --- enrich (broadcast dims) ---
    val enriched = Enrich.enrich(parsed, spark)

    // --- route fan-out: ONE pass, write partitioned by (route, window_key).
    //     The pre-write repartition on the partition columns consolidates
    //     output files: without it every map task writes a file into every
    //     (route, window) directory — routes × windows × tasks small files,
    //     which collapses under its own metadata weight at scale. ---
    val routed = enriched.withColumn("route", Router.routeColumn(routes))
      .repartition(config.shufflePartitions, col("route"), col("window_key"))
    timer("route_write") {
      catalog.overwritePartitions(routed, "routed", Seq("route", "window_key"))
    }

    // One read-back computes route counts AND per-window lineage for THIS
    // run's windows only (partition-pruned + column-pruned scan — an
    // incremental run must never rescan the whole history table).
    val routeWindowCounts = timer("route_counts") {
      val routedNow = catalog.read("routed")
      (if (committed.isEmpty) routedNow
       else routedNow.filter(!col("window_key").isin(committedSeq: _*)))
        .groupBy("route", "window_key").count().collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    }
    val todo = routeWindowCounts.map(_._2).distinct.sorted.toSeq
    val routeCounts = routeWindowCounts.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._3).sum }
    val perWindow = routeWindowCounts.groupBy(_._2).toSeq
      .map { case (w, v) => Checkpoint.PartitionLineage(w, v.map(_._3).sum) }

    // --- quarantine sink (error rows with code column, E1 analog).
    //     Count derived from the two observations on the SAME pass
    //     (post-dedup rows minus valid rows) — no re-scan; the quarantine
    //     write itself only runs on the rare error path. ---
    // A zero-task write (everything already committed) never fires the
    // CollectMetrics nodes — default the observations to 0 in that case.
    val rowsParsed =
      obs.getAsJava.getOrDefault("rows_parsed", 0L).asInstanceOf[Long]
    val quarantined =
      obsIn.getAsJava.getOrDefault("rows_deduped", 0L).asInstanceOf[Long] - rowsParsed
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
    val aggRows = if (todo.isEmpty) 0L else {
      val forAgg = catalog.read("routed").drop("text")
        .filter(col("window_key").isin(todo: _*))
      val obsAgg = new Observation(s"agg-$runId")
      val exploded = Rollup.explodedRollup(forAgg, config.windowSize, config.saltBuckets)
        .withColumn("window_key", Rollup.windowKey(col("window_start"), config.windowSize))
        .observe(obsAgg, count(lit(1)).as("agg_rows"))
      timer("rollup_write") {
        catalog.overwritePartitions(exploded, "aggregates", Seq("window_key"))
      }
      obsAgg.get("agg_rows").asInstanceOf[Long]
    }

    // --- per-partition lineage + metrics → atomic manifest commit.
    //     `perWindow` covers this run's windows (measured from the routed
    //     table's actual written state); prior runs' lineage is carried
    //     forward. The manifest is written only after the aggregate write
    //     succeeds — it is the transaction's commit point. ---
    val priorParts = prior.map(_.committedPartitions).getOrElse(Nil)
      .filterNot(p => todo.contains(p.partition))
    val metrics = Map(
      "rows_parsed" -> rowsParsed,
      "rows_quarantined" -> quarantined,
      "rows_routed" -> routeCounts.values.sum,
      "agg_rows" -> aggRows,
      "windows_processed" -> todo.size.toLong
    ) ++ routeCounts.map { case (k, v) => s"route_$k" -> v } ++ timer.metrics
    Checkpoint.write(checkpointDir,
      Checkpoint.Manifest(runId, (priorParts ++ perWindow).sortBy(_.partition), metrics))

    // M1 analog: the reference exposes counters via GET /metrics
    // (internal/shared/metrics/metrics.go:41-50); the batch engine's read
    // surface is a queryable metrics table, one row per (run, metric).
    import spark.implicits._
    catalog.append(
      metrics.toSeq.sortBy(_._1).map { case (k, v) => (runId, k, v) }
        .toDF("run_id", "metric", "value"),
      "metrics")

    Result(metrics, routeCounts, todo)
  }
}
