package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every operator query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A `pipeline_e2e` pseudo-query times the full transcript pipeline
  * (generate → dedup → parse → enrich → route → rollup → sinks) end-to-end.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session config shared with the BenchOne A/B harness — one definition
    // so the two harnesses can never drift apart.
    val spark = BenchOne.benchSession(cpus)

    // Warmup: JIT + codegen + parquet-footer caches, not measured — one
    // query per input table family (events / embeddings / documents), so
    // whichever query runs first in each family doesn't absorb the
    // session's one-time warm-up cost (measured ~3-4 s of JIT on the first
    // higher-order-function query).
    SparkEntry.queries("q_agg_minute_counts")(spark, sfDir).count()
    SparkEntry.queries("ann_topk_bruteforce")(spark, sfDir).count()
    SparkEntry.queries("tx_tokens")(spark, sfDir).count()

    // Host-drift yardstick (round-3 advice): a fixed pure-CPU burn timed
    // inside every bench run, so cross-round comparisons can be
    // host-speed-adjusted per run instead of argued per round. Runs first
    // (after warmup) so query scheduling noise never contaminates it.
    val burnT0 = System.nanoTime()
    BenchOne.burn(spark)
    val burnSec = (System.nanoTime() - burnT0) / 1e9
    // Disk counterpart (round-6 verdict item #2): the CPU burn misses
    // host-I/O windows, which BENCH.md documents as 2-4x board-wide
    // swings. A timed write/fsync loop makes those windows detectable in
    // the artifact instead of argued from anecdote.
    val diskBurnSec = BenchPipe.diskBurn()

    // A failed query must never masquerade as a fast timing: record a
    // success flag per query and surface the failed names in the output.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    // End-to-end pipeline throughput over a pre-written parquet transcript
    // (tmpfs when available — the sandbox disk is I/O-throttled and would
    // measure the disk, not the engine).
    val tmpRoot = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val pipeIn = s"$tmpRoot/graft-bench-input"
    val pipeOut = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(tmpRoot), "graft-bench").toString
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "2000000").toLong
    graft.gen.TranscriptGen.generate(spark, nTurns, cpus.toInt * 4, nTurns / 20)
      .write.mode("overwrite").parquet(pipeIn)
    val t0 = System.nanoTime()
    graft.app.PipelineJob.run(spark, spark.read.parquet(pipeIn), pipeOut,
      graft.model.PipelineConfig(shufflePartitions = cpus.toInt), "bench")
    val pipeSec = (System.nanoTime() - t0) / 1e9

    // host_burn is a pseudo-entry: the control burn's seconds, excluded
    // from the total (it measures the HOST, not the engine).
    val all = results :+ (("pipeline_e2e", pipeSec, true))
    val allWithBurn = all :+ (("host_burn", burnSec, true)) :+
      (("disk_burn", diskBurnSec, true))
    // A failed query's wall time is time-to-exception, not a measurement:
    // report it as -1 and EXCLUDE it from the total, so a regression to
    // failure can never read as a speedup (round-2 advice).
    val qs = allWithBurn.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val failed = all.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = all.collect { case (_, v, true) => v }.sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // The JSON line goes to stdout AND to a file the driver can lift
    // verbatim (round-4 verdict item #8: the captured stdout tail was
    // truncated once, zeroing the round's bench artifact).
    val benchFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "BENCH_LOCAL.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(benchFile), line + "\n")
    println(line)
    spark.stop()
  }
}
