package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 measurement harness (guide §1.4/§1.5): isolates the phases of
  * the most expensive composed queries with noop-sink timing and labeled
  * jobs, WITHOUT touching the frozen `graft.Bench`. Evidence cited in
  * OPTIMIZATION_r08.md; not part of the driver contract.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchOne.benchSession(cpus)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def phase(name: String)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      body
      println(f"PHASE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    import graft.ops.{ConnectedComponents, IncrementalDedup}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // --- corpus_build FIRST-TOUCH, phase by phase (mode=corpus_build):
    //     what the alphabetically-first corpus query pays to build every
    //     session memo the rest of the catalog then reuses ---
    if (sys.env.get("SPARK_GRAFT_PROFILE").contains("corpus_build")) {
      var dm: DataFrame = null
      phase("docMeta pass (qual+md5+scrub+tok)") {
        // OpsQueries' shared projection — the profile times the EXACT
        // pass the session memo builds, not a re-inlined copy.
        dm = OpsQueries.docMetaFrame(docs).localCheckpoint()
      }
      var tok: DataFrame = null
      phase("docShingles pass + checkpoint") {
        tok = IncrementalDedup.shingles(docs, "text").select("doc_id", "toks")
          .localCheckpoint()
      }
      var pairs: DataFrame = null
      phase("docPairs band + materialize") {
        pairs = graft.ops.MinHash.candidatePairs(tok, "doc_id", "toks", 2, 1)
      }
      var qc: DataFrame = null
      phase("qualityClustered (subset CC)") {
        val meta = dm.filter(col("quality") >= 0.4).select("doc_id", "h")
        val exactKeep = graft.ops.Materialize.stable(
          meta.groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id"),
          reliable = false)
        val p = pairs
          .join(exactKeep.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
          .join(exactKeep.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
        val comps = ConnectedComponents.resolve(p, "id_a", "id_b")
          .withColumnRenamed("id", "doc_id")
        qc = exactKeep.join(comps, Seq("doc_id"), "left").localCheckpoint()
      }
      phase("corpus_build tail (join+ckpt)") {
        val meta = dm.filter(col("quality") >= 0.4)
          .select("doc_id", "quality", "scrub_hash")
        val kept = qc
          .filter(col("label").isNull || col("label") === col("doc_id"))
          .select("doc_id")
        meta.join(kept, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("scrub_hash"),
            round(col("quality"), 4).as("quality"))
          .localCheckpoint()
      }
      // NOTE: the phases above build LOCAL frames — OpsQueries' private
      // session memos are still cold here, so this catalog run is a
      // FIRST-TOUCH time (it pays the real memo builds); the steady-state
      // numbers come from BenchOne reps, whose warmup populates the memos.
      val tq0 = System.nanoTime()
      SparkEntry.queries("corpus_build")(spark, sfDir).count()
      println(f"PHASE catalog corpus_build (first-touch) ${(System.nanoTime() - tq0) / 1e9}%8.3f s")
      spark.stop()
      return
    }

    // --- q_corpus_incremental, phase by phase (fresh session state) ---
    val q = docs.withColumn("quality", graft.parse.QualityScore.scoreCol("text"))
      .filter(col("quality") >= 0.4)
      .withColumn("h", md5(col("text")))
      .select("doc_id", "h")
      .persist()
    phase("quality+hash pass")(noop(q))
    val tok = IncrementalDedup.shingles(docs, "text").select("doc_id", "toks")
      .localCheckpoint()
    phase("shingles materialize")(())
    val pairs = graft.ops.MinHash.candidatePairs(tok, "doc_id", "toks", 2, 1)
    phase("banding pairs")(noop(pairs))
    var histKept: DataFrame = null
    phase("hist corpusKeepIds (CC #1)") {
      val exactKeep = q.filter(col("doc_id") < 250)
        .groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id")
      val p = pairs
        .join(exactKeep.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
        .join(exactKeep.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      val comps = ConnectedComponents.resolve(p, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      histKept = exactKeep.join(comps, Seq("doc_id"), "left")
        .filter(col("label").isNull || col("label") === col("doc_id"))
        .select("doc_id").localCheckpoint()
    }
    var store: DataFrame = null
    phase("store signatures") {
      store = IncrementalDedup.signatures(
        tok.join(histKept, Seq("doc_id"), "left_semi"), "doc_id", "toks", 2, 1)
      noop(store)
    }
    var crossDups: DataFrame = null
    var batchToks: DataFrame = null
    phase("batch exact + cross dups") {
      val batch = q.filter(col("doc_id") >= 250)
      val batchExact = batch.groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id")
      batchToks = tok.join(batchExact, Seq("doc_id"), "left_semi")
      val batchSigs = IncrementalDedup.signatures(batchToks, "doc_id", "toks", 2, 1)
      crossDups = IncrementalDedup.duplicateIds(batchSigs, store, "doc_id")
        .localCheckpoint()
    }
    phase("within-batch CC (#2) + final") {
      val kept0 = batchToks.join(crossDups, Seq("doc_id"), "left_anti")
      val wp = pairs
        .join(kept0.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
        .join(kept0.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      val withinDrop = ConnectedComponents.resolve(wp, "id_a", "id_b")
        .filter(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      val keptIds = kept0.select("doc_id")
        .join(withinDrop, Seq("doc_id"), "left_anti")
        .withColumn("__kept", lit(true))
      noop(q.filter(col("doc_id") >= 250).select("doc_id")
        .join(keptIds, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("__kept"), lit(false)).as("is_kept")))
    }

    // --- the catalog query end-to-end for reference ---
    val t0 = System.nanoTime()
    SparkEntry.queries("q_corpus_incremental")(spark, sfDir).count()
    println(f"PHASE catalog q_corpus_incremental ${(System.nanoTime() - t0) / 1e9}%8.3f s (memoized shingles/pairs warm)")
    spark.stop()
  }
}
