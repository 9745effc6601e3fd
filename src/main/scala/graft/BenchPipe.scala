package graft

/** Pipeline-only A/B benchmark main (round-6 verdict item #2): times the
  * full transcript pipeline (PipelineJob.run) for SPARK_GRAFT_REPS reps,
  * stamping BOTH a pure-CPU burn and a disk write/fsync burn per rep, so
  * an e2e timing move between two binaries (or two host windows) can be
  * attributed: CPU drift moves `burn`, an I/O-degraded window moves
  * `disk_burn`, and a code regression moves `pipe` while both controls
  * hold still. Prints one JSON line.
  *
  * This file is copied verbatim into the comparison worktree (e.g. the
  * round-5 commit) so both binaries run the IDENTICAL harness and the
  * only difference is the pipeline code under test.
  */
object BenchPipe {

  /** Timed disk write/fsync loop on the real (throttled) disk, the I/O
    * counterpart of [[BenchOne.burn]]: 64 MiB in 1 MiB writes with an
    * fsync per 8 MiB, deleted afterwards. Wall-clock is the host-I/O
    * yardstick — it moves with the disk windows that `host_burn` (CPU
    * only) is documented to miss.
    */
  def diskBurn(dir: String = "/tmp"): Double = {
    val f = java.io.File.createTempFile("graft-disk-burn", ".bin", new java.io.File(dir))
    val buf = new Array[Byte](1 << 20)
    java.util.Arrays.fill(buf, 0x5a.toByte)
    val t0 = System.nanoTime()
    val out = new java.io.FileOutputStream(f)
    try {
      var i = 0
      while (i < 64) {
        out.write(buf)
        if ((i & 7) == 7) out.getFD.sync()
        i += 1
      }
    } finally out.close()
    val sec = (System.nanoTime() - t0) / 1e9
    f.delete()
    sec
  }

  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val label = sys.env.getOrElse("SPARK_GRAFT_LABEL", "head")
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "2000000").toLong
    val spark = BenchOne.benchSession(cpus)

    val tmpRoot = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    // One shared input for every rep (and across harness invocations, so
    // interleaved A/B runs read the exact same bytes): keyed by turn count.
    val pipeIn = s"$tmpRoot/graft-benchpipe-input-$nTurns"
    if (!new java.io.File(pipeIn, "_SUCCESS").exists())
      graft.gen.TranscriptGen.generate(spark, nTurns, cpus.toInt * 4, nTurns / 20)
        .write.mode("overwrite").parquet(pipeIn)

    def onePipe(): Double = {
      val out = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(tmpRoot), "graft-benchpipe").toString
      val t0 = System.nanoTime()
      graft.app.PipelineJob.run(spark, spark.read.parquet(pipeIn), out,
        graft.model.PipelineConfig(shufflePartitions = cpus.toInt), "bench")
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      sec
    }

    // Warmup (JIT + codegen + parquet footers), not measured.
    BenchOne.burn(spark); diskBurn(); onePipe()

    val rows = (1 to reps).map { _ =>
      val b = { val t0 = System.nanoTime(); BenchOne.burn(spark); (System.nanoTime() - t0) / 1e9 }
      val d = diskBurn()
      val p = onePipe()
      (b, d, p)
    }
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(
      s"""{"label":"$label","turns":$nTurns,"burn":${arr(rows.map(_._1))},"disk_burn":${arr(rows.map(_._2))},"pipe":${arr(rows.map(_._3))}}""")
    spark.stop()
  }
}
