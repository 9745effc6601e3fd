package graft

import org.apache.spark.sql.functions._

/** dd_containment (asymmetric n-gram containment pairs): a short doc
  * quoted verbatim inside a longer page is caught in the short→long
  * direction even when symmetric Jaccard is tiny, and the
  * document-frequency prune removes boilerplate grams before the
  * all-pairs join.
  */
class ContainmentSpec extends SparkSpecBase {
  import spark.implicits._

  /** Write a documents.parquet the catalog query can read. */
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("containment")
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[(Long, Long), (Long, Double)] =
    OpsQueries.queries("dd_containment")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap

  test("subsumption is caught in the short→long direction only") {
    // 40 distinct words; the short doc is a verbatim 12-word excerpt, so
    // every one of its 5 8-grams appears in the long doc (containment 1.0)
    // while the long doc shares only 5 of its 33 grams (≈0.15 < 0.5).
    val longWords = (1 to 40).map(i => s"w$i").mkString(" ")
    val shortWords = (10 to 21).map(i => s"w$i").mkString(" ")
    val dir = writeDocs(Seq(1L -> longWords, 2L -> shortWords))
    val pairs = run(dir)
    pairs.keySet shouldBe Set((2L, 1L))
    val (shared, containment) = pairs((2L, 1L))
    shared shouldBe 5L
    containment shouldBe 1.0
  }

  test("the DF prune removes boilerplate grams before the pair join") {
    // 25 docs (> maxDf = 20) share one identical 8-gram; everything else
    // is unique filler, so WITHOUT the prune every pair would share a
    // gram. With it the boilerplate gram is dropped and no pair survives.
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = (0 until 25).map { d =>
      val filler = (1 to 10).map(i => s"u${d}x$i").mkString(" ")
      (d.toLong, s"$boiler $filler")
    }
    run(writeDocs(docs)) shouldBe empty
  }

  test("identical twins contain each other in both directions") {
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val pairs = run(writeDocs(Seq(1L -> text, 2L -> text, 3L -> "different words only here")))
    pairs.keySet shouldBe Set((1L, 2L), (2L, 1L))
    pairs.values.foreach { case (_, c) => c shouldBe 1.0 }
  }
}
