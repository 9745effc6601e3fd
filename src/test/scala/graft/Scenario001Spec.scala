package graft

import org.apache.spark.sql.functions._
import graft.gen.Scenario001
import graft.parse.{LogParse, UserAgentFamily}
import graft.agg.Rollup

/** Golden end-to-end oracle ported from the reference e2e scenario 001
  * (reference: tests/e2e/scenarios/001_basic_minute_rollup/): 64,000 entries
  * + 2,000 duplicate batches must roll up to exactly 4 minute windows with
  * every path key and every UA family at 4,000 — duplicates must not inflate
  * counts.
  */
class Scenario001Spec extends SparkSpecBase {
  import spark.implicits._

  test("scenario-001 golden: 4 windows x (4 paths + 4 UA families) x 4000") {
    val raw = Scenario001.generate(spark)
    raw.count() shouldBe (3200 + 2000) * 20L

    // D1 batch dedup: duplicate batches carry the same batch_id and content;
    // (batch_id, entry_idx) identifies a physical entry exactly once.
    val deduped = raw.dropDuplicates("batch_id", "entry_idx")
    deduped.count() shouldBe 64000L

    val (valid, quarantine) = LogParse.parse(deduped)
    quarantine.count() shouldBe 0L

    val agg = valid
      .withColumn("window_start", Rollup.windowStart(col("ts"), "minute"))
      .withColumn("path_key", LogParse.pathKey(col("method"), col("path")))
      .withColumn("ua_family", UserAgentFamily.family(col("userAgent")))
      .select(col("customer_id"), col("window_start"),
        explode(array(
          struct(lit("path").as("dim"), col("path_key").as("key")),
          struct(lit("ua").as("dim"), col("ua_family").as("key")))).as("dk"))
      .select(col("customer_id"), col("window_start"),
        col("dk.dim").as("dim"), col("dk.key").as("key"))
      .groupBy("customer_id", "window_start", "dim", "key")
      .agg(count(lit(1)).as("cnt"))
      .collect()

    agg.length shouldBe 4 * 8 // 4 windows x (4 path keys + 4 UA families)
    agg.foreach { r =>
      r.getString(0) shouldBe "cus-axon"
      r.getLong(4) shouldBe 4000L
    }
    val windows = agg.map(_.getTimestamp(1).toInstant.toString).distinct.sorted
    windows shouldBe Array(
      "2025-12-28T18:03:00Z", "2025-12-28T18:04:00Z",
      "2025-12-28T18:05:00Z", "2025-12-28T18:06:00Z")
    val pathKeys = agg.filter(_.getString(2) == "path").map(_.getString(3)).distinct.sorted
    pathKeys shouldBe Array("GET /", "GET /about", "GET /careers", "GET /contact")
    val uaKeys = agg.filter(_.getString(2) == "ua").map(_.getString(3)).distinct.sorted
    uaKeys shouldBe Array("Chrome", "Firefox", "Googlebot", "curl").sorted
  }
}
