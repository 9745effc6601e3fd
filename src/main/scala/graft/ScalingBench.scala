package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism-level scaling evidence (BASELINE.json north rule: ≥0.8
  * throughput scaling efficiency from N to 4N executors; no real cluster in
  * this sandbox ⇒ local[N] vs local[4N] on identical input — see
  * BASELINE.md).
  *
  * Runs the identical end-to-end pipeline (read parquet → dedup → parse →
  * enrich → route → rollup → sinks) over the SAME pre-generated multi-file
  * parquet input at both parallelism levels and reports turns/sec + the
  * scaling efficiency (T_N / T_4N) / 4.
  *
  * Usage: runMain graft.ScalingBench [nTurns] [nLow] [outFile]
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nTurns = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nLow = args.lift(1).map(_.toInt).getOrElse(8)
    val nHigh = nLow * 4
    val outFile = args.lift(2).getOrElse("/root/repo/BENCH_SCALING.json")

    val inputDir = java.nio.file.Files.createTempDirectory("graft-scale-in").toString

    // Pre-generate the input once, split into 4*nHigh files so both levels
    // read the same bytes with enough splits to parallelize.
    locally {
      val s = session(nHigh)
      graft.gen.TranscriptGen.generate(s, nTurns, nHigh * 4, nTurns / 30)
        .write.mode("overwrite").parquet(inputDir)
      s.stop()
    }

    def runAt(cores: Int): Double = {
      val s = session(cores)
      val out = java.nio.file.Files.createTempDirectory(s"graft-scale-$cores").toString
      // Warmup pass on a slice (JIT, codegen) — not measured.
      s.read.parquet(inputDir).limit(10000).count()
      val t0 = System.nanoTime()
      graft.app.PipelineJob.run(s, s.read.parquet(inputDir), out,
        graft.model.PipelineConfig(shufflePartitions = cores), s"scale-$cores")
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      sec
    }

    val secLow = runAt(nLow)
    val secHigh = runAt(nHigh)
    val tputLow = nTurns / secLow
    val tputHigh = nTurns / secHigh
    val efficiency = (tputHigh / tputLow) / (nHigh.toDouble / nLow)

    val json =
      f"""{"n_turns":$nTurns,"cores_low":$nLow,"cores_high":$nHigh,""" +
        f""""sec_low":$secLow%.2f,"sec_high":$secHigh%.2f,""" +
        f""""turns_per_sec_low":$tputLow%.0f,"turns_per_sec_high":$tputHigh%.0f,""" +
        f""""scaling_efficiency":$efficiency%.3f}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
  }
}
