package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.Rollup
import graft.enrich.Enrich
import graft.gen.TranscriptGen
import graft.parse.TranscriptParse
import graft.route.Router

/** Transcript-pipeline operator queries over the deterministic generated
  * transcript table (pure index math — identical rows every run, so the
  * parquet dumps are stable across reruns). Because the generators are
  * index arithmetic, their goldens ARE expressible in SQL: `oracleSql`
  * below mirrors each query over generate_series (no table reads), and
  * value-level goldens additionally live in the ScalaTest specs
  * (Scenario001Spec, PipelineSpec).
  */
object PipelineQueries {

  private val N = 100000L
  private def transcript(s: SparkSession): DataFrame =
    TranscriptGen.generate(s, N, 16, 5000)

  /** The PARSED valid transcript frame, memoized per session (round-8):
    * four pipe_* queries ran the identical generate → grok-parse pass;
    * now the first pays and the rest read the checkpointed rows. The
    * generator is pure index math and the parse deterministic, so
    * memoization cannot change any result (same contract as
    * OpsQueries' docShingles-family memos). pipe_quarantine keeps its
    * own pass — it parses a MUTATED transcript (injected bad rows).
    */
  private val parsedCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]
  private def parsedValid(s: SparkSession): DataFrame = {
    parsedCache.keySet.removeIf(_.sparkContext.isStopped)
    parsedCache.computeIfAbsent(s, k =>
      TranscriptParse.parse(transcript(k))._1.localCheckpoint())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full parse → salted exploded rollup (the pipeline's aggregate output).
    "pipe_rollup" -> ((s: SparkSession, _: String) => {
      Rollup.explodedRollup(parsedValid(s))
    }),

    // Parse → broadcast enrich → router fan-out counts.
    "pipe_routes" -> ((s: SparkSession, _: String) => {
      Router.routeCounts(Enrich.enrich(parsedValid(s), s), Router.defaultRoutes)
    }),

    // Stable (conv_id, turn_idx) ordering invariant: row_number/lag window.
    "pipe_turn_order" -> ((s: SparkSession, _: String) => {
      Rollup.withTurnOrder(parsedValid(s))
        .select("conv_id", "turn_idx", "turn_rank", "role", "prev_role")
    }),

    // Quarantine routing on injected invalid rows (every 97th turn_idx run
    // gets a null text → ING_1000).
    "pipe_quarantine" -> ((s: SparkSession, _: String) => {
      val withBad = transcript(s).withColumn("text",
        when(pmod(col("turn_idx"), lit(97)) === 96, lit(null).cast("string"))
          .otherwise(col("text")))
      val (_, quarantine) = TranscriptParse.parse(withBad)
      quarantine.groupBy("error_code").agg(count(lit(1)).as("cnt"))
    }),

    // Map-valued sink form (reference WindowAggregateResult shape).
    // Dumped with the map columns serialized to canonical JSON (keys are
    // already sorted by mapValued) — the driver's rows-only check sorts the
    // frame in pandas, which cannot sort raw map/dict columns.
    "pipe_map_valued" -> ((s: SparkSession, _: String) => {
      Rollup.mapValued(Rollup.explodedRollup(parsedValid(s)))
        .select(col("conv_id"), col("window_start"), col("window_size"),
          to_json(col("counts_by_tool")).as("counts_by_tool"),
          to_json(col("counts_by_role")).as("counts_by_role"))
    }),

    // Multimodal decode plumbing over documents-as-blobs: mapPartitions
    // batch shape + typed output; decode itself is the documented stub.
    "mm_decode_stub" -> ((s: SparkSession, dir: String) => {
      val blobs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      graft.ops.Multimodal.decode(s,
        graft.ops.Multimodal.repartitionBySize(blobs, 8)).toDF()
    }),

    // Scenario-001 golden rollup (reference e2e oracle: 64,000 entries +
    // 2,000 duplicate batches -> 4 windows x 8 keys x 4000; values asserted
    // byte-exactly in Scenario001Spec; here the aggregate itself is dumped).
    // window_start is dumped as its ISO instant STRING: the oracle runs the
    // generator's index arithmetic in pure SQL, and a string key keeps the
    // two engines' timestamp physical types out of the comparison.
    "scenario001_agg" -> ((s: SparkSession, _: String) => {
      import graft.gen.Scenario001
      import graft.parse.{LogParse, UserAgentFamily}
      val deduped = Scenario001.generate(s).dropDuplicates("batch_id", "entry_idx")
      val (valid, _) = LogParse.parse(deduped)
      valid
        .withColumn("window_start", Rollup.windowStart(col("ts"), "minute"))
        .withColumn("path_key", LogParse.pathKey(col("method"), col("path")))
        .withColumn("ua_family", UserAgentFamily.family(col("userAgent")))
        .select(col("customer_id"),
          date_format(col("window_start"), "yyyy-MM-dd'T'HH:mm:ssXXX")
            .as("window_start"),
          explode(array(
            struct(lit("path").as("dim"), col("path_key").as("key")),
            struct(lit("ua").as("dim"), col("ua_family").as("key")))).as("dk"))
        .select(col("customer_id"), col("window_start"),
          col("dk.dim").as("dim"), col("dk.key").as("key"))
        .groupBy("customer_id", "window_start", "dim", "key")
        .agg(count(lit(1)).as("cnt"))
    })
  )

  /** Shared DuckDB mirror of `TranscriptGen.generate(100000, _, 5000)`:
    * the same index arithmetic (conv split, turn_idx, role cycle, tool
    * assignment, error marker, minute bucket) over generate_series.
    * Text construction is NOT mirrored — the grok-extracted fields
    * (tool_invoked, has_error) are recovered from the same index rules the
    * generator used to embed their markers.
    */
  private val genSqlDuck: String =
    """g AS (SELECT i AS id FROM generate_series(0, 99999) t(i)),
      |b AS (SELECT id,
      |  CASE WHEN id < 10000 THEN 'conv-hot-' || CAST(id % 4 AS VARCHAR)
      |       ELSE 'conv-' || lpad(CAST((id - 10000) // 40 AS VARCHAR), 6, '0') END AS conv_id,
      |  CASE WHEN id < 10000 THEN CAST(id // 4 AS INT) ELSE CAST((id - 10000) % 40 AS INT) END AS turn_idx
      |  FROM g),
      |r AS (SELECT id, conv_id, turn_idx,
      |  CASE WHEN turn_idx % 8 = 6 THEN 'system' WHEN turn_idx % 8 = 7 THEN 'tool'
      |       WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role FROM b),
      |x AS (SELECT *,
      |  CASE WHEN role = 'assistant' AND turn_idx % 3 = 1
      |       THEN (['search', 'bash', 'edit', 'read', 'web'])[CAST((id * 7 + turn_idx) % 5 AS INT) + 1]
      |       ELSE 'none' END AS tool FROM r)""".stripMargin.replace("\n", " ")

  /** DuckDB oracles for the generator-backed queries that ARE expressible in
    * pure SQL (round-2 review item #8, extended to the whole pipe_* family):
    * all mirror the generators' index arithmetic over generate_series — no
    * table reads.
    */
  def oracleSql: Map[String, String] = Map(
    "pipe_turn_order" ->
      s"""WITH $genSqlDuck
         |SELECT conv_id, turn_idx,
         |  CAST(row_number() OVER w AS INT) AS turn_rank, role,
         |  lag(role) OVER w AS prev_role
         |FROM x WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)""".stripMargin.replace("\n", " "),
    "pipe_routes" ->
      s"""WITH $genSqlDuck
         |SELECT CASE WHEN id % 17 = 0 THEN 'errors'
         |            WHEN tool IN ('bash', 'edit') THEN 'privileged_tools'
         |            WHEN tool <> 'none' THEN 'tool_calls'
         |            WHEN role = 'user' THEN 'user_turns'
         |            WHEN role = 'assistant' THEN 'assistant_turns'
         |            ELSE 'other' END AS route, count(*) AS cnt
         |FROM x GROUP BY 1""".stripMargin.replace("\n", " "),
    // Minute window: the base instant (1766944800) is minute-aligned and
    // intra-minute seconds stay < 60, so date_trunc('minute', ts) =
    // base + (id // rowsPerMinute) minutes. epoch_ms (not to_timestamp):
    // the Spark dump reads back as a NAIVE parquet TIMESTAMP.
    "pipe_rollup" ->
      s"""WITH $genSqlDuck,
         |w AS (SELECT conv_id, epoch_ms((1766944800 + (id // 5000) * 60) * 1000) AS window_start, tool, role FROM x),
         |ex AS (
         |  SELECT conv_id, window_start, 'tool' AS dim, tool AS key FROM w
         |  UNION ALL
         |  SELECT conv_id, window_start, 'role' AS dim, role AS key FROM w)
         |SELECT conv_id, window_start, dim, key, count(*) AS cnt, 'minute' AS window_size
         |FROM ex GROUP BY 1, 2, 3, 4""".stripMargin.replace("\n", " "),
    // Map-valued sink form: Spark dumps to_json of a key-sorted map —
    // byte-identical to a '{"k":v,...}' string_agg ordered by key.
    "pipe_map_valued" ->
      s"""WITH $genSqlDuck,
         |w AS (SELECT conv_id, epoch_ms((1766944800 + (id // 5000) * 60) * 1000) AS window_start, tool, role FROM x),
         |ex AS (
         |  SELECT conv_id, window_start, 'tool' AS dim, tool AS key FROM w
         |  UNION ALL
         |  SELECT conv_id, window_start, 'role' AS dim, role AS key FROM w),
         |agg AS (SELECT conv_id, window_start, dim, key, count(*) AS cnt FROM ex GROUP BY 1, 2, 3, 4)
         |SELECT conv_id, window_start, 'minute' AS window_size,
         |  '{' || string_agg(CASE WHEN dim = 'tool' THEN '"' || key || '":' || cnt END, ',' ORDER BY key) || '}' AS counts_by_tool,
         |  '{' || string_agg(CASE WHEN dim = 'role' THEN '"' || key || '":' || cnt END, ',' ORDER BY key) || '}' AS counts_by_role
         |FROM agg GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    // Unique entries after (batch_id, entry_idx) dedup correspond
    // BIJECTIVELY to p = 0..63999: p = ((b-1)·20 + i·3201) mod 64000 and
    // gcd-style argument (3201 ≡ 1 mod 20) make the stride interleave a
    // permutation — so the rollup is fully determined by bucket = p mod 64
    // (minute = bucket/16, path = (bucket%16)/4, ua = bucket%4, and the
    // UA strings map 1:1 onto families Chrome/Firefox/Googlebot/curl).
    "scenario001_agg" ->
      """WITH e AS (SELECT i % 64 AS bucket FROM generate_series(0, 63999) t(i)),
        |d AS (SELECT bucket // 16 AS mi, (bucket % 16) // 4 AS pi, bucket % 4 AS ui FROM e),
        |k AS (
        |  SELECT mi, 'path' AS dim,
        |    'GET ' || (['/', '/about', '/careers', '/contact'])[pi + 1] AS key FROM d
        |  UNION ALL
        |  SELECT mi, 'ua' AS dim,
        |    (['Chrome', 'Firefox', 'Googlebot', 'curl'])[ui + 1] AS key FROM d)
        |SELECT 'cus-axon' AS customer_id,
        |  (['2025-12-28T18:03:00Z', '2025-12-28T18:04:00Z',
        |    '2025-12-28T18:05:00Z', '2025-12-28T18:06:00Z'])[mi + 1] AS window_start,
        |  dim, key, count(*) AS cnt
        |FROM k GROUP BY 1, 2, 3, 4""".stripMargin.replace("\n", " "),
    // TranscriptGen index math: hot rows are id < N/10 with
    // turn_idx = id/4; rest have turn_idx = (id - N/10) % 40 < 97. The
    // injected null-text rule (turn_idx % 97 = 96) therefore only fires on
    // hot rows, each classified ING_1000 (missing required field).
    "pipe_quarantine" ->
      """SELECT 'ING_1000' AS error_code, count(*) AS cnt
        |FROM generate_series(0, 99999) t(i)
        |WHERE i < 10000 AND ((i // 4) % 97) = 96""".stripMargin.replace("\n", " ")
  )
}
