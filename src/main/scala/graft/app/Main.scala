package graft.app

import org.apache.spark.sql.SparkSession
import graft.gen.TranscriptGen
import graft.model.PipelineConfig

/** spark-submit entry point for the transcript pipeline.
  *
  * Usage (also runnable via `sbt "runMain graft.app.Main ..."`):
  *   graft.app.Main --input <parquet dir | gen:N> --out <catalog root>
  *     [--run-id ID] [--window minute|hour] [--salt N] [--master local[N]]
  *
  * `--input gen:N` generates an N-turn deterministic transcript in-flight
  * (pure Catalyst expressions — distributed, no driver loop).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = opts.getOrElse("--input", "gen:100000")
    val out = opts.getOrElse("--out", sys.error("--out <catalog root> is required"))
    val runId = opts.getOrElse("--run-id", s"run-${System.currentTimeMillis()}")
    val window = opts.getOrElse("--window", "minute")
    val salt = opts.getOrElse("--salt", "16").toInt
    val masterOpt = opts.get("--master")

    val builder = SparkSession.builder()
      .appName("graft-transcript-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Small splits so a many-core local run can parallelize the scan even
      // on modest inputs (cluster default 128m is tuned for HDFS-scale files).
      .config("spark.sql.files.maxPartitionBytes", "16m")
    var cores = 32
    masterOpt.foreach { m =>
      builder.master(m)
      cores = "local\\[(\\d+)\\]".r.findFirstMatchIn(m).map(_.group(1).toInt).getOrElse(32)
      builder.config("spark.sql.shuffle.partitions", cores.toString)
    }
    // Spill/shuffle to tmpfs when available: this sandbox's disk is heavily
    // throttled (I/O-wait dominates), which would hide real CPU scaling.
    if (sys.env.get("SPARK_LOCAL_DIRS").isEmpty &&
        new java.io.File("/dev/shm").isDirectory)
      builder.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rowsPerMinute = opts.getOrElse("--rows-per-minute", "1000").toLong
    // --write-input: materialize the generated transcript as parquet and exit
    // (bench prep: both scaling runs then read identical bytes).
    opts.get("--write-input").foreach { genSpec =>
      TranscriptGen.generate(spark, genSpec.toLong,
          spark.sparkContext.defaultParallelism * 4, rowsPerMinute)
        .write.mode("overwrite").parquet(out)
      spark.stop()
      return
    }
    val raw = input match {
      case s if s.startsWith("gen:") =>
        TranscriptGen.generate(spark, s.stripPrefix("gen:").toLong,
          spark.sparkContext.defaultParallelism, rowsPerMinute)
      case path => spark.read.parquet(path)
    }

    val t0 = System.nanoTime()
    val dedup = opts.getOrElse("--dedup", "on") != "off"
    val result = PipelineJob.run(spark, raw, out,
      PipelineConfig(windowSize = window, saltBuckets = salt,
        shufflePartitions = cores, dedup = dedup), runId)
    val sec = (System.nanoTime() - t0) / 1e9

    val turns = result.metrics.getOrElse("rows_parsed", 0L)
    println(f"pipeline run=$runId windows=${result.processedWindows.size} " +
      f"turns=$turns sec=$sec%.2f turns_per_sec=${turns / math.max(sec, 1e-9)}%.0f")
    result.metrics.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"  metric $k=$v") }
    spark.stop()
  }
}
