package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact port of the reference's e2e scenario-001 generator arithmetic
  * (reference: tests/e2e/scenarios/001_basic_minute_rollup/scenario.go:21-33,
  * 325-383): 64,000 unique log entries over minutes {18:03..18:06} × paths
  * {/, /about, /careers, /contact} × UAs {Chrome, Firefox, Googlebot, curl},
  * sent as 3,200 batches of 20 with stride interleaving, plus duplicate
  * batches (same idempotency key + identical content) that dedup must drop.
  *
  * Pure index math (seedless), built as Catalyst expressions over
  * `spark.range` → distributed generation. Golden expectation: 4 minute
  * windows, each with every path key and every UA family at exactly 4,000
  * (reference: tests/e2e/scenarios/001_basic_minute_rollup/expected/
  * window_aggregate_result_2025-12-28T18-03Z.json:5-16 and siblings).
  */
object Scenario001 {

  val totalEntries = 64000
  val itemsPerBatch = 20
  val batchCount: Int = totalEntries / itemsPerBatch // 3200
  val stride: Int = batchCount + 1 // 3201 (scenario.go:372)
  val duplicateBatches = 2000
  val dateUTC = "2025-12-28"
  val customerId = "cus-axon"

  val minutes = Seq("18:03", "18:04", "18:05", "18:06")
  val paths = Seq("/", "/about", "/careers", "/contact")
  val userAgents = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "curl/7.88.1"
  )

  /** Raw ingest rows incl. duplicate batches:
    * (batch_id, customer_id, entry_idx, receivedAt, method, path, userAgent,
    * is_duplicate). `receivedAt` is the wire-format string → exercises the
    * two-format timestamp parse (P3).
    */
  def generate(spark: SparkSession, numPartitions: Int = 16): DataFrame = {
    val totalSends = (batchCount + duplicateBatches) * itemsPerBatch
    val df = spark.range(0, totalSends, 1, numPartitions).toDF("id")

    val sendIdx = (col("id") / itemsPerBatch).cast("long")
    val i = pmod(col("id"), lit(itemsPerBatch))
    val isDup = sendIdx >= batchCount
    // Duplicate sends replay batches 1..2000 with identical content.
    val b = when(isDup, sendIdx - batchCount + 1).otherwise(sendIdx + 1)

    // scenario.go:370-377 stride interleave
    val p = pmod((b - 1) * itemsPerBatch + i * stride, lit(totalEntries))
    val bucket = pmod(p, lit(64))
    val round = (p / 64).cast("long")

    val minuteIdx = (bucket / 16).cast("int")
    val combo = pmod(bucket, lit(16))
    val pathIdx = (combo / 4).cast("int")
    val uaIdx = pmod(combo, lit(4)).cast("int")

    val seconds = pmod(round, lit(60))
    val millis = pmod(bucket * 17 + round, lit(1000))

    val minuteArr = array(minutes.map(lit): _*)
    val pathArr = array(paths.map(lit): _*)
    val uaArr = array(userAgents.map(lit): _*)

    val receivedAt = concat(
      lit(dateUTC), lit("T"), element_at(minuteArr, minuteIdx + 1), lit(":"),
      format_string("%02d", seconds), lit("."), format_string("%03d", millis), lit("Z"))

    df.select(
      format_string("batch-%06d", b).as("batch_id"),
      lit(customerId).as("customer_id"),
      i.cast("int").as("entry_idx"),
      receivedAt.as("receivedAt"),
      lit("GET").as("method"),
      element_at(pathArr, pathIdx + 1).as("path"),
      element_at(uaArr, uaIdx + 1).as("userAgent"),
      isDup.as("is_duplicate"))
  }
}
