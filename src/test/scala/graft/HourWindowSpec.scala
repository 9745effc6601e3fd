package graft

import org.apache.spark.sql.functions._
import graft.app.PipelineJob
import graft.gen.TranscriptGen
import graft.model.PipelineConfig
import graft.sink.TranscriptCatalog

/** Hour-window config coverage (reference window sizes: minute|hour,
  * internal/models/window_size.go:8-13) + the no-dedup fast path.
  */
class HourWindowSpec extends SparkSpecBase {

  test("hour windows: keys use the hour format; totals preserved") {
    val out = tmpDir("pipe-hour")
    val raw = TranscriptGen.generate(spark, 10000, 4) // 10 minutes of data
    val res = PipelineJob.run(spark, raw, out,
      PipelineConfig(windowSize = "hour"), "h1")
    res.processedWindows shouldBe Seq("20251228T18Z")
    val agg = new TranscriptCatalog(out, spark).read("aggregates")
    agg.filter(col("dim") === "tool").agg(sum("cnt")).head.getLong(0) shouldBe 10000L
    agg.select("window_size").distinct().head.getString(0) shouldBe "hour"
  }

  test("dedup=false path: unique input yields identical aggregates, one less shuffle") {
    val outA = tmpDir("pipe-dedup-on")
    val outB = tmpDir("pipe-dedup-off")
    val raw = TranscriptGen.generate(spark, 5000, 4)
    PipelineJob.run(spark, raw, outA, PipelineConfig(), "a")
    PipelineJob.run(spark, raw, outB, PipelineConfig(dedup = false), "b")
    def canon(dir: String) = new TranscriptCatalog(dir, spark).read("aggregates")
      .orderBy("window_key", "conv_id", "dim", "key")
      .collect().map(_.toString).toSeq
    canon(outB) shouldBe canon(outA)
  }
}
