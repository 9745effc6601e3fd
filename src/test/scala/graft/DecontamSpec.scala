package graft

import org.apache.spark.sql.functions._
import graft.ops.Decontam
import graft.sink.TranscriptCatalog

/** The persisted decontamination gate (graft.ops.Decontam): containment
  * semantics, cross-session store re-registration, the exchange-free
  * store-side plan, and exact equivalence with the oracled
  * dd_decontam_ngram catalog query.
  */
class DecontamSpec extends SparkSpecBase {
  import spark.implicits._

  private val evalSentence =
    "the secret eval answer is exactly forty two point five units"

  test("containment: a training page EMBEDDING an eval sentence is flagged") {
    val out = tmpDir("decontam-store")
    val catalog = new TranscriptCatalog(out, spark)
    Decontam.publishEvalSet(catalog,
      Seq(900L -> evalSentence).toDF("doc_id", "text"), nBuckets = 4)
    val train = Seq(
      1L -> s"a big page of many words $evalSentence and much more text after",
      2L -> "an unrelated page with entirely different words in it today",
      3L -> "short page").toDF("doc_id", "text")
    val store = Decontam.evalGramStore(catalog, nBuckets = 4)
    Decontam.contaminatedIds(train, store)
      .collect().map(_.getLong(0)) shouldBe Array(1L)
  }

  test("the store survives a new session: re-registered, still bucketed, still exchange-free") {
    val out = tmpDir("decontam-bucketed")
    val catalog = new TranscriptCatalog(out, spark)
    Decontam.publishEvalSet(catalog,
      Seq(900L -> evalSentence).toDF("doc_id", "text"), nBuckets = 4)
    // Simulate a new session: drop the registration, re-register over files.
    spark.sql(s"DROP TABLE ${catalog.bucketedName(Decontam.GramTable)}")
    val store = Decontam.evalGramStore(catalog, nBuckets = 4)
    val train = Seq(
      1L -> s"padding words before $evalSentence padding words after here",
      2L -> "nothing shared with the eval set in this document at all")
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hits = Decontam.contaminatedIds(train, store)
      hits.collect().map(_.getLong(0)) shouldBe Array(1L)
      val plan = hits.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // one gh exchange (the batch side) — the bucketed store provides its
      // own hash partitioning; the id-distinct exchange is the other one.
      "Exchange hashpartitioning\\(gh".r.findAllIn(plan).size shouldBe 1
      plan should include("Bucketed: true")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("store gate equals the oracled dd_decontam_ngram on the real corpus") {
    val dir = "/root/testdata/sf0.01"
    val out = tmpDir("decontam-corpus")
    val catalog = new TranscriptCatalog(out, spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Decontam.publishEvalSet(catalog, docs.filter(col("doc_id") >= 450))
    val store = Decontam.evalGramStore(catalog)
    val viaStore = Decontam
      .contaminatedIds(docs.filter(col("doc_id") < 450), store)
      .collect().map(_.getLong(0)).toSet
    val viaCatalogQuery = OpsQueries.queries("dd_decontam_ngram")(spark, dir)
      .filter(col("is_contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    viaStore shouldBe viaCatalogQuery
  }
}
