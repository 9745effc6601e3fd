package graft

import org.apache.spark.sql.SparkSession

/** Targeted A/B benchmark main: times a comma-separated list of catalog
  * queries (SPARK_GRAFT_QUERIES) for SPARK_GRAFT_REPS reps each, with a
  * fixed pure-CPU burn control per rep so host drift between two
  * invocations (e.g. two binaries built from different commits) is
  * quantified instead of argued. Prints one JSON line.
  *
  * This is the control-experiment harness VERDICT r3 asked for to
  * adjudicate cross-round per-query timing moves on a noisy host.
  */
object BenchOne {

  /** THE bench session config — one definition shared by `Bench` and
    * `BenchOne` so the full-catalog bench and the A/B harness can never
    * drift apart on master/shuffle/AQE/tmpfs settings (which would
    * silently invalidate cross-harness comparisons).
    */
  def benchSession(cpus: String): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("SPARK_LOCAL_DIRS").isEmpty &&
        new java.io.File("/dev/shm").isDirectory)
      builder.config("spark.local.dir", "/dev/shm/graft-bench-local")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Fixed CPU-bound work, same shape at every commit: md5 over a range.
    * Wall-clock of this burn is the host-speed yardstick.
    */
  def burn(spark: SparkSession): Unit =
    spark.range(0, 40000000L, 1, 32)
      .selectExpr("sum(length(md5(cast(id AS string)))) AS s")
      .collect()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "dd_minhash_lsh")
      .split(",").toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = benchSession(cpus)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // Warmup: one burn + one run of each query (JIT, codegen, parquet
    // footers) — not measured.
    burn(spark)
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())

    val results = (1 to reps).map { _ =>
      val b = time(burn(spark))
      val qs = names.map(n => n -> time(SparkEntry.queries(n)(spark, sfDir).count()))
      (b, qs)
    }
    val burns = results.map(_._1)
    val perQ = names.map { n =>
      val ts = results.map(_._2.toMap.apply(n))
      "\"" + n + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString(",")
    println(
      f"""{"burn":[${burns.map(b => f"$b%.3f").mkString(",")}],$perQ,"sf":"$sfDir"}""")
    spark.stop()
  }
}
