package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed two-phase aggregation — the core of the pipeline.
  *
  * Reference semantics being re-expressed:
  *  - W1 tumbling window truncate, UTC (reference: internal/models/window_size.go:26-35,
  *    internal/ingestors/batch_summarizer.go:38)
  *  - A1 partial aggregation (map-side combine) per batch
  *    (reference: internal/ingestors/batch_summarizer.go:28-85)
  *  - X1 hash-partitioned exchange (reference: internal/streams/paritioned_queue.go:42-48)
  *  - A4 final merge — a commutative monoid: pointwise map sum
  *    (reference: internal/aggregators/aggregate_rolluper.go:21-48)
  *  - A5 incremental get–merge–upsert (reference: internal/aggregators/aggregation_service.go:26-49)
  *
  * In Spark, A1+X1+A4 are one `groupBy().count()` — Catalyst inserts
  * HashAggregate(partial) → Exchange → HashAggregate(final) automatically.
  * The explicit SALTED variant defeats hot-key skew (a few conversations
  * owning a large share of turns at 10^12-turn scale): stage 1 groups by
  * (keys, salt) so a hot key's rows spread over `saltBuckets` reducers;
  * stage 2 merges the (at most saltBuckets) sub-counts per key. The
  * reference bakes in the opposite hazard — its exchange key is only the
  * minute bucket, collapsing all customers in a minute onto one partition
  * (reference: internal/streams/partial_insight_producer.go:67,
  * internal/models/window_size.go:51-61).
  */
object Rollup {

  /** W1: tumbling-window start (UTC truncate). windowSize: "minute"|"hour". */
  def windowStart(ts: Column, windowSize: String): Column =
    date_trunc(windowSize, ts)

  /** W2: window-key formatting (reference: internal/models/window_size.go:37-49):
    * minute → yyyyMMdd'T'HHmm'Z', hour → yyyyMMdd'T'HH'Z'.
    */
  def windowKey(ws: Column, windowSize: String): Column = windowSize match {
    case "minute" => date_format(ws, "yyyyMMdd'T'HHmm'Z'")
    case "hour"   => date_format(ws, "yyyyMMdd'T'HH'Z'")
    case other    => throw new IllegalArgumentException(s"invalid window size: $other")
  }

  /** Per-(window, conv_id, dims...) counts with explicit two-stage salting.
    *
    * Returns one row per (window_start, conv_id, dims..., cnt). The salt is
    * derived from a high-cardinality column (turn_idx) so a single hot
    * (window, conv) key fans out over `saltBuckets` stage-1 reducers.
    */
  def saltedCounts(
      df: DataFrame,
      dims: Seq[String],
      windowSize: String = "minute",
      saltBuckets: Int = 16,
      saltSource: Column = col("turn_idx")
  ): DataFrame = {
    val keys = Seq("window_start", "conv_id") ++ dims
    df.withColumn("window_start", windowStart(col("ts"), windowSize))
      .withColumn("salt", pmod(hash(saltSource), lit(saltBuckets)))
      .groupBy((keys :+ "salt").map(col): _*)
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("partial_cnt").as("cnt"))
  }

  /** Unsalted variant (lets Catalyst's partial/final split do the work) —
    * used where the key already contains high-cardinality components.
    */
  def counts(df: DataFrame, dims: Seq[String], windowSize: String = "minute"): DataFrame = {
    val keys = Seq("window_start", "conv_id") ++ dims
    df.withColumn("window_start", windowStart(col("ts"), windowSize))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Exploded relational aggregate: one row per (conv, window, dim, key, cnt),
    * for dim ∈ {tool, role} — the columnar-friendly layout of the reference's
    * two count maps (RequestsByPath / RequestsByUserAgent analog,
    * reference: internal/models/batch_summary.go:49-52).
    */
  def explodedRollup(
      parsed: DataFrame,
      windowSize: String = "minute",
      saltBuckets: Int = 16,
      dimCols: Seq[(String, Column)] = Seq(
        "tool" -> col("tool"),
        "role" -> col("role"))
  ): DataFrame = {
    val withDims = parsed
      .withColumn("window_start", windowStart(col("ts"), windowSize))
      .select(
        col("conv_id"), col("window_start"), col("turn_idx"),
        explode(array(dimCols.map { case (d, c) =>
          struct(lit(d).as("dim"), c.cast("string").as("key"))
        }: _*)).as("dk"))
      .select(col("conv_id"), col("window_start"), col("turn_idx"),
        col("dk.dim").as("dim"), col("dk.key").as("key"))
    withDims
      .withColumn("salt", pmod(hash(col("turn_idx")), lit(saltBuckets)))
      .groupBy("conv_id", "window_start", "dim", "key", "salt")
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy("conv_id", "window_start", "dim", "key")
      .agg(sum("partial_cnt").as("cnt"))
      .withColumn("window_size", lit(windowSize))
  }

  /** Sink-boundary map-valued form: reconstruct the reference's
    * `map[string]int64` aggregate shape with deterministic (sorted) key
    * order (reference sorts too: internal/ingestors/batch_summarizer.go:68-73).
    * Input: exploded rollup rows. Output: one row per (conv, window) with one
    * map column per dim.
    */
  def mapValued(exploded: DataFrame, dims: Seq[String] = Seq("tool", "role")): DataFrame = {
    val pivoted = dims.map { d =>
      map_from_entries(
        array_sort(collect_list(when(col("dim") === d,
          struct(col("key"), col("cnt"))))))
        .as(s"counts_by_$d")
    }
    exploded.groupBy("conv_id", "window_start", "window_size")
      .agg(pivoted.head, pivoted.tail: _*)
  }

  /** Scalable exact distinct-count per key: pre-distinct on (keys, value)
    * spreads the value space across the cluster before counting — the
    * distinct analog of the salted rollup. `countDistinct` would pull every
    * distinct value of a hot key into one reducer's hash set; this shape
    * never materializes a per-key value set anywhere.
    */
  def distinctCounts(
      df: DataFrame,
      valueCol: String,
      dims: Seq[String] = Nil,
      windowSize: String = "minute"
  ): DataFrame = {
    val keys = Seq("window_start", "conv_id") ++ dims
    df.withColumn("window_start", windowStart(col("ts"), windowSize))
      .select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"n_distinct_$valueCol"))
  }

  /** A5 incremental merge: existing aggregate rows ∪ new partial rows →
    * re-aggregate. Both inputs in exploded layout
    * (conv_id, window_start, window_size, dim, key, cnt). The merge is the
    * commutative-monoid pointwise sum the reference proves in
    * aggregate_rolluper_test.go:104-161.
    */
  def mergePartials(existing: DataFrame, partials: DataFrame): DataFrame = {
    val cols = Seq("conv_id", "window_start", "window_size", "dim", "key", "cnt")
    existing.select(cols.map(col): _*)
      .unionByName(partials.select(cols.map(col): _*))
      .groupBy("conv_id", "window_start", "window_size", "dim", "key")
      .agg(sum("cnt").as("cnt"))
  }

  /** Stable intra-conversation turn ordering (north-rule invariant):
    * row_number + lag over (conv_id, turn_idx).
    */
  def withTurnOrder(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    df.withColumn("turn_rank", row_number().over(w))
      .withColumn("prev_role", lag("role", 1).over(w))
  }
}
