package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for a named list of catalog queries into
  * per-query text files — the round-8 optimization evidence
  * (`plans/r08/<query>_<tag>.txt`). Unlike PlanDump (which curates
  * PLANS.md), this runs the SAME queries before/after a change so the
  * judge can diff plan shapes. Session-memoized upstream frames are
  * materialized by running each query once before dumping, so the dumped
  * plan is the steady-state one the bench measures.
  *
  * Usage: runMain graft.PlanDumpR08 <outDir> <tag> <query1,query2,...>
  */
object PlanDumpR08 {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDumpR08 <outDir> <tag> <q1,q2,...>")
    val Array(outDir, tag, list) = args
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    list.split(",").foreach { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, sf).count() // materialize session memos first
      val plan = fn(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$tag.txt"), plan)
      println(s"dumped $q -> $outDir/${q}_$tag.txt")
    }
    spark.stop()
  }
}
