package graft

import org.apache.spark.sql.functions._
import graft.parse.QualityScore

/** The hashed-vocab linear quality classifier (graft.parse.QualityScore):
  * labeled separation between natural prose and boilerplate/spam, plus the
  * bucket-arithmetic identity between the Scala precompute and the runtime
  * Catalyst expression (the thing that would silently skew every score if
  * the two hash paths ever diverged).
  */
class QualityScoreSpec extends SparkSpecBase {
  import spark.implicits._

  private val goodDocs = Seq(
    "the analysis of the query plan shows that a broadcast join is chosen " +
      "for the smaller table and the rows are pruned at the scan so we " +
      "observe a clear improvement in the shuffle volume and it is stable " +
      "across repeated runs of the same pipeline on this cluster for now",
    "we describe a method for training on deduplicated data and it is " +
      "based on the removal of repeated lines from the corpus with a " +
      "careful treatment of the boundary cases that arise when a document " +
      "is split into units of a fixed width by the segmentation pass",
    "in this report we compare the throughput of the engine at two levels " +
      "of parallelism and we find that the scaling efficiency is above the " +
      "bar that was set by the published baseline for a cluster of this " +
      "size with the usual caveats about noisy neighbors and caching")

  private val badDocs = Seq(
    // keyword-stuffed spam
    ("click subscribe free buy promo casino winner " * 9).trim,
    // all-stopword filler
    "the a the a the a the of and to in is it",
    // lorem-ipsum boilerplate
    ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 7).trim,
    // fragment
    "error code 17 retry")

  private def scores(texts: Seq[String]): Seq[Double] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(QualityScore.scoreCol("text").as("q"))
      .collect().map(_.getDouble(0)).toSeq

  test("labeled separation: prose scores above the 0.4 gate, boilerplate below") {
    val good = scores(goodDocs)
    val bad = scores(badDocs)
    withClue(s"good=$good bad=$bad") {
      all(good) should be >= 0.5
      all(bad) should be < 0.4
      good.min should be > bad.max
    }
  }

  test("runtime bucket arithmetic matches the Scala precompute") {
    // one-word docs: lexCol must equal the inlined weight of that word's
    // bucket — positive vocab, negative vocab, and a neutral word
    val probes = Seq("the", "of", "click", "lorem", "zebra", "quasar")
    val got = probes.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
      .select(col("text"), QualityScore.lexCol("text").as("lex"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    probes.foreach { w =>
      got(w) shouldBe QualityScore.weights(QualityScore.bucketOf(w))
    }
  }

  test("the weight table is integer-valued (order-exact summation invariant)") {
    all(QualityScore.weights) shouldBe a[java.lang.Double]
    QualityScore.weights.foreach(w => w shouldBe w.floor)
    // and the vocab actually landed: at least one +, one - bucket
    QualityScore.weights.max should be >= 1.0
    QualityScore.weights.min should be <= -2.0
  }
}
