package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism-level scaling evidence (BASELINE.json north rule: ≥0.8
  * throughput scaling efficiency from N to 4N executors; no real cluster in
  * this sandbox ⇒ local[N] vs local[4N] on identical input — see BASELINE.md).
  *
  * Method notes (measured on this host):
  *  - The sandbox VM advertises 32 CPUs but sustains only ~19 cores of
  *    parallel throughput (SMT/steal), and its disk is heavily throttled
  *    (I/O-wait dominated). So the bench (a) defaults to N=2 vs 4N=8 — both
  *    inside the machine's true parallel capacity, exactly like N and 4N
  *    executor containers on a real cluster would be, (b) keeps input,
  *    shuffle and sinks on tmpfs so the measurement is compute-bound like a
  *    production NVMe-backed executor, and (c) interleaves repeated runs of
  *    both levels and reports medians to damp host noise.
  *
  * Usage: runMain graft.ScalingBench [nTurns] [nLow] [reps=5] [outFile]
  */
object ScalingBench {

  private val shm = new java.io.File("/dev/shm").isDirectory
  private def tmpRoot = if (shm) "/dev/shm" else "/tmp"

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", s"$tmpRoot/graft-scaling-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0 // true median for even n
  }

  def main(args: Array[String]): Unit = {
    val nTurns = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nLow = args.lift(1).map(_.toInt).getOrElse(2)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val nHigh = nLow * 4
    val outFile = args.lift(3).getOrElse("/root/repo/BENCH_SCALING.json")

    // Heap gate (round-2 review item #7 — was a warning, now a refusal):
    // at the default 8 GiB JVM an 80M-turn run went GC-bound and
    // superlinear at BOTH levels (measured 2026-08-16), corrupting the
    // ratio. ~6M turns/GiB is the observed safe ceiling for this pipeline;
    // an under-heaped run measures the garbage collector, not Spark, so it
    // must not be able to produce a BENCH_SCALING.json at all.
    // Override only with SPARK_GRAFT_ALLOW_SMALL_HEAP=1 (leaves a visible
    // trace in the invocation, unlike an ignored warning).
    val heapGiB = Runtime.getRuntime.maxMemory.toDouble / (1L << 30)
    require(
      nTurns <= heapGiB * 6e6 ||
        sys.env.get("SPARK_GRAFT_ALLOW_SMALL_HEAP").contains("1"),
      f"$nTurns%d turns needs ≥ ${nTurns / 6e6}%.0f GiB heap (have " +
        f"$heapGiB%.0f GiB) — set SPARK_DRIVER_MEM (e.g. 40g), or " +
        "SPARK_GRAFT_ALLOW_SMALL_HEAP=1 to measure GC anyway.")

    val inputDir = s"$tmpRoot/graft-scale-input"

    // Pre-generate the input once, split into enough files that even the
    // high-parallelism level gets full splits.
    locally {
      val s = session(nHigh)
      graft.gen.TranscriptGen.generate(s, nTurns, nHigh * 8, nTurns / 30)
        .write.mode("overwrite").parquet(inputDir)
      s.stop()
    }

    def runAt(cores: Int, tag: String): Double = {
      val s = session(cores)
      val out = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(tmpRoot), s"graft-scale-$tag").toString
      val t0 = System.nanoTime()
      graft.app.PipelineJob.run(s, s.read.parquet(inputDir), out,
        graft.model.PipelineConfig(shufflePartitions = cores), s"scale-$tag")
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(new java.io.File(out))
      sec
    }

    // Warmup both levels (JIT/codegen caches), then interleave measured reps.
    runAt(nHigh, "warm-h")
    val (lows, highs) = (1 to reps).map { i =>
      (runAt(nLow, s"low-$i"), runAt(nHigh, s"high-$i"))
    }.unzip

    val secLow = median(lows)
    val secHigh = median(highs)
    val tputLow = nTurns / secLow
    val tputHigh = nTurns / secHigh
    // Primary metric: median of PER-PAIR efficiencies over STALL-TRIMMED
    // pairs. Each (low, high) pair runs back-to-back, so slow-host
    // intervals hit both runs of a pair and cancel in the ratio;
    // median-of-medians would compare runs from different host-noise
    // regimes. Trim rule (PRE-REGISTERED before any round-3 measurement,
    // round-2 review item #7): a pair is a host stall iff its total
    // wall-clock (low+high) exceeds 1.5 × the median pair total — the rule
    // looks only at duration, never at the efficiency value, so it cannot
    // cherry-pick the ratio. Untrimmed median, IQR, and every raw reading
    // are reported alongside.
    val pairEff = lows.zip(highs).map { case (l, h) => (l / h) / (nHigh.toDouble / nLow) }
    val pairTotals = lows.zip(highs).map { case (l, h) => l + h }
    val totalMed = median(pairTotals)
    val keep = pairTotals.map(_ <= 1.5 * totalMed)
    val kept = pairEff.zip(keep).collect { case (e, true) => e }
    val efficiency = median(kept)
    val efficiencyUntrimmed = median(pairEff)
    val sortedEff = pairEff.sorted
    def quantile(q: Double): Double = {
      val pos = q * (sortedEff.size - 1)
      val lo = sortedEff(pos.toInt)
      val hi = sortedEff(math.min(pos.toInt + 1, sortedEff.size - 1))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val (q1, q3) = (quantile(0.25), quantile(0.75))
    val efficiencyOfMedians = (tputHigh / tputLow) / (nHigh.toDouble / nLow)

    val json =
      f"""{"n_turns":$nTurns,"cores_low":$nLow,"cores_high":$nHigh,"reps":$reps,""" +
        f""""heap_gib":$heapGiB%.0f,""" +
        f""""sec_low_median":$secLow%.2f,"sec_high_median":$secHigh%.2f,""" +
        f""""sec_low_all":[${lows.map(x => f"$x%.2f").mkString(",")}],""" +
        f""""sec_high_all":[${highs.map(x => f"$x%.2f").mkString(",")}],""" +
        f""""turns_per_sec_low":$tputLow%.0f,"turns_per_sec_high":$tputHigh%.0f,""" +
        f""""pair_efficiencies":[${pairEff.map(x => f"$x%.3f").mkString(",")}],""" +
        f""""pairs_trimmed_as_stalls":${keep.count(_ == false)},""" +
        f""""scaling_efficiency":$efficiency%.3f,""" +
        f""""scaling_efficiency_untrimmed":$efficiencyUntrimmed%.3f,""" +
        f""""scaling_efficiency_iqr":[$q1%.3f,$q3%.3f],""" +
        f""""scaling_efficiency_min":${pairEff.min}%.3f,""" +
        f""""scaling_efficiency_mean":${pairEff.sum / pairEff.size}%.3f,""" +
        f""""scaling_efficiency_of_medians":$efficiencyOfMedians%.3f}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
  }
}
