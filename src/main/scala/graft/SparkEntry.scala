package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the operator catalog: log-pipeline operators
  * (graft.Queries, DuckDB-oracle-checked on the events/TPC-H tables),
  * training-data ops (graft.OpsQueries, oracle-checked on documents/
  * embeddings), and transcript-pipeline queries over the deterministic
  * generator (graft.PipelineQueries, rows-only).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pipeline's core shape: minute-windowed two-phase count aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy(date_trunc("minute", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (generator-backed queries mirror their index
    * arithmetic via generate_series — no table reads). Omitted only for
    * sketch-based and iterative queries (approx_distinct/percentiles,
    * quantile buckets, IVF) → driver records rows-only; each of those has
    * a value-level or error-bound spec instead.
    */
  def oracleSql: Map[String, String] =
    Queries.oracleSql.map { case (k, v) => k -> materializeCtes(v) }

  /** Add DuckDB `AS MATERIALIZED` hints to every named CTE (round-6
    * verdict item #1b). Purely a planner hint — results are unchanged —
    * but it is the difference between the oracle pass finishing in
    * seconds and timing out: DuckDB INLINES plain CTEs, so a recursive
    * closure (`reach`) re-evaluates its `edges` input — and the whole
    * shingle/minhash/quality chain feeding it — on EVERY iteration
    * (measured: q_corpus_incremental 357 s inlined → 2.3 s materialized
    * at sf0.01, identical rows). The recursive working tables themselves
    * (`…reach(id, r)`) cannot take the hint and are skipped, as are named
    * `WINDOW w AS (...)` clauses (same `name AS (` shape, not a CTE).
    */
  private[graft] def materializeCtes(sql: String): String =
    if (!sql.toUpperCase.startsWith("WITH")) sql
    else """(?i)(WINDOW\s+)?(\w+)(\(id, r\))?\s+AS\s+\(""".r.replaceAllIn(sql, m =>
      if (m.group(1) != null || m.group(3) != null)
        scala.util.matching.Regex.quoteReplacement(m.matched)
      else s"${m.group(2)} AS MATERIALIZED (")
}
