package graft

import org.apache.spark.sql.functions._
import graft.parse.{LogParse, UserAgentFamily}
import graft.agg.Rollup

/** Ports of the reference summarizer unit tests
  * (reference: internal/ingestors/batch_summarizer_test.go).
  */
class SummarizerSpec extends SparkSpecBase {
  import spark.implicits._

  private def uaFamilies(uas: Seq[String]): Seq[String] =
    uas.toDF("ua").select(UserAgentFamily.family(col("ua")).as("fam"))
      .as[String].collect().toSeq

  test("UA family: pinned browsers (batch_summarizer_test.go:12-92)") {
    uaFamilies(Seq(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
      "curl/7.88.1"
    )) shouldBe Seq("Chrome", "Firefox", "Googlebot", "curl")
  }

  test("UA family: unknown UA falls back to token before '/' (test.go:94-135)") {
    uaFamilies(Seq("SomeUnknownUserAgent/1.0")) shouldBe Seq("SomeUnknownUserAgent")
  }

  test("UA family: no-slash UA falls back to original string") {
    uaFamilies(Seq("weird agent")) shouldBe Seq("weird agent")
  }

  test("path key: lowercase method is uppercased (test.go:137-184)") {
    val df = Seq(("get", "/")).toDF("method", "path")
    df.select(LogParse.pathKey(col("method"), col("path")).as("k"))
      .as[String].collect() shouldBe Array("GET /")
  }

  test("window truncate is UTC-normalized (test.go:186-235)") {
    // Same instant expressed with a -08:00 offset truncates to the same
    // UTC minute window.
    val df = Seq("2025-12-21T14:21:30.000Z", "2025-12-21T06:21:30.000-08:00")
      .toDF("receivedAt")
    val ws = df.select(
      Rollup.windowStart(LogParse.parseTimestamp(col("receivedAt")), "minute").as("w"))
      .distinct().collect()
    ws.length shouldBe 1
    ws.head.getTimestamp(0).toInstant.toString shouldBe "2025-12-21T14:21:00Z"
  }

  test("two-format timestamp parse (ingestion_service.go:250-265)") {
    val df = Seq(
      "2025-12-28T18:03:05.123Z", // ISO-8601 with millis
      "2025-12-28T18:03:05Z",     // RFC3339
      "not-a-timestamp"
    ).toDF("receivedAt")
    val parsed = df.select(LogParse.parseTimestamp(col("receivedAt")).as("ts")).collect()
    parsed(0).getTimestamp(0).toInstant.toString shouldBe "2025-12-28T18:03:05.123Z"
    parsed(1).getTimestamp(0).toInstant.toString shouldBe "2025-12-28T18:03:05Z"
    parsed(2).isNullAt(0) shouldBe true
  }

  test("window key formats (window_size.go:37-49)") {
    val df = Seq("2025-12-28T18:03:05.123Z").toDF("s")
      .select(LogParse.parseTimestamp(col("s")).as("ts"))
    val minuteKey = df.select(
      Rollup.windowKey(Rollup.windowStart(col("ts"), "minute"), "minute")).head.getString(0)
    val hourKey = df.select(
      Rollup.windowKey(Rollup.windowStart(col("ts"), "hour"), "hour")).head.getString(0)
    minuteKey shouldBe "20251228T1803Z"
    hourKey shouldBe "20251228T18Z"
  }

  test("validation matrix routes bad rows to quarantine (ingestion_service_test.go:94-156)") {
    val rows = Seq(
      ("2025-12-28T18:03:05.123Z", "GET", "/", "curl/7.88.1"),         // valid
      (null, "GET", "/", "curl/7.88.1"),                                // missing ts
      ("bogus", "GET", "/", "curl/7.88.1"),                             // bad ts
      ("2025-12-28T18:03:05.123Z", "GET", "/" + "x" * 2049, "curl"),    // path too long
      ("2025-12-28T18:03:05.123Z", "GET", "/", "u" * 1025)              // UA too long
    ).toDF("receivedAt", "method", "path", "userAgent")
    val (valid, quarantine) = LogParse.parse(rows)
    valid.count() shouldBe 1
    quarantine.count() shouldBe 4
    quarantine.select("error_code").as[String].collect().sorted shouldBe
      Array("ING_1000", "ING_1001", "ING_1001", "ING_1001")
  }
}
