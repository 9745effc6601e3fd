package graft

import graft.ops.SubstringDedup

/** Exact substring-span dedup (graft.ops.SubstringDedup): a verbatim
  * span shared across docs is reported at its maximal extent in BOTH
  * docs, unique text yields nothing, within-doc repetition is flagged
  * twice, and per-doc spans never overlap.
  */
class SubstringDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("a shared 12-token span is reported at its maximal extent in both docs") {
    val span = words("s", 12)
    val a = (words("a", 3) ++ span ++ words("x", 2)).mkString(" ")
    val b = (words("b", 1) ++ span ++ words("y", 3)).mkString(" ")
    val out = SubstringDedup.spans(Seq(1L -> a, 2L -> b).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    out shouldBe Array((1L, 4, 12), (2L, 2, 12))
  }

  test("fully unique corpora yield no spans; docs shorter than k yield no rows") {
    val docs = Seq(
      1L -> words("u", 20).mkString(" "),
      2L -> words("v", 20).mkString(" "),
      3L -> words("w", 5).mkString(" ") // shorter than k=8: no grams at all
    ).toDF("doc_id", "text")
    SubstringDedup.spans(docs).count() shouldBe 0L
  }

  test("within-doc repetition flags both occurrences as separate spans") {
    val phrase = words("p", 8)
    val doc = (phrase ++ words("f", 9) ++ phrase).mkString(" ")
    val out = SubstringDedup.spans(Seq(1L -> doc).toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    out shouldBe Array((1, 8), (18, 8))
  }

  test("a long shared span merges its gram hits into one maximal span") {
    val span = words("m", 20)
    val docs = Seq(
      1L -> (words("c", 2) ++ span).mkString(" "),
      2L -> (span ++ words("d", 4)).mkString(" ")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.spans(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    out shouldBe Array((1L, 3, 20), (2L, 1, 20))
  }

  test("scrub cuts exactly the spanned tokens and fingerprints the survivors") {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val span = words("s", 12)
    val a = (words("a", 3) ++ span ++ words("x", 2)).mkString(" ")
    val b = (words("b", 1) ++ span ++ words("y", 3)).mkString(" ")
    val clean = words("u", 9).mkString(" ")
    val out = graft.ops.SubstringDedup.scrub(
        Seq(1L -> a, 2L -> b, 3L -> clean).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    out(1L) shouldBe ((17, 5, md5((words("a", 3) ++ words("x", 2)).mkString(" "))))
    out(2L) shouldBe ((16, 4, md5((words("b", 1) ++ words("y", 3)).mkString(" "))))
    out(3L) shouldBe ((9, 9, md5(clean)))
  }

  test("a doc that is one whole duplicated span scrubs to the empty fingerprint") {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val phrase = words("p", 10).mkString(" ")
    val out = graft.ops.SubstringDedup.scrub(
        Seq(1L -> phrase, 2L -> phrase).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    out(1L) shouldBe ((10, 0, md5("")))
    out(2L) shouldBe ((10, 0, md5("")))
  }

  test("per-doc spans are disjoint with gaps > k between them") {
    val p1 = words("g", 8)
    val p2 = words("h", 8)
    // doc 1 carries both phrases separated by unique filler; docs 2/3
    // each share one phrase
    val docs = Seq(
      1L -> (p1 ++ words("z", 10) ++ p2).mkString(" "),
      2L -> (words("q", 2) ++ p1).mkString(" "),
      3L -> (p2 ++ words("r", 2)).mkString(" ")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.spans(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val doc1 = spans.filter(_._1 == 1L).map(s => (s._2, s._3)).sortBy(_._1)
    doc1 shouldBe Array((1, 8), (19, 8))
    // disjointness: each span ends before the next begins
    doc1.sliding(2).foreach {
      case Array((s1, l1), (s2, _)) => assert(s1 + l1 <= s2)
      case _ =>
    }
  }

  test("scrubText cuts the spans from the cased token stream, other columns intact") {
    val span = words("s", 12)
    val a = (Seq("Aa", "BB", "cC") ++ span ++ Seq("X1", "X2")).mkString(" ")
    val b = (Seq("bZ") ++ span ++ Seq("Y1", "Y2", "Y3")).mkString(" ")
    val clean = "U1 U2 U3 U4 U5 U6 U7 U8 U9"
    val out = graft.ops.SubstringDedup.scrubText(
        Seq((1L, "en", a), (2L, "fr", b), (3L, "de", clean))
          .toDF("doc_id", "lang", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    out(1L) shouldBe (("en", "Aa BB cC X1 X2"))
    out(2L) shouldBe (("fr", "bZ Y1 Y2 Y3"))
    out(3L) shouldBe (("de", clean))
    // identity with the hash-only scrub: lowered scrubbed text hashes to
    // each doc's scrub fingerprint
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val direct = graft.ops.SubstringDedup.scrub(
        Seq((1L, a), (2L, b), (3L, clean)).toDF("doc_id", "text"))
      .select("doc_id", "scrub_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, (_, t)) => md5(t.toLowerCase) shouldBe direct(id) }
  }
}
