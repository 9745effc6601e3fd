package graft

import graft.ops.LineDedup

/** Line-level cross-corpus dedup (graft.ops.LineDedup): planted
  * boilerplate lines are stripped everywhere, unique lines survive,
  * within-doc repetition counts toward the corpus threshold, and long
  * lines segment into 8-word units.
  */
class LineDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("planted boilerplate is stripped from every doc; unique lines survive") {
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      1L -> s"alpha beta gamma\n$boiler",
      2L -> s"delta epsilon zeta\n$boiler",
      3L -> boiler, // pure boilerplate: everything stripped
      4L -> "eta theta iota"
    ).toDF("doc_id", "text")
    val out = LineDedup.scrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    out(1L)._1 shouldBe 2L; out(1L)._2 shouldBe 1L
    out(2L)._1 shouldBe 2L; out(2L)._2 shouldBe 1L
    out(3L) shouldBe ((1L, 0L, md5("")))
    out(4L) shouldBe ((1L, 1L, md5(md5("eta theta iota"))))
    // the kept fingerprint is the md5 over kept unit hashes in order
    out(1L)._3 shouldBe md5(md5("alpha beta gamma"))
    out(1L)._3 should not be out(2L)._3
  }

  test("within-doc repetition counts toward the corpus threshold") {
    val docs = Seq(
      1L -> "kappa lambda mu\nkappa lambda mu", // self-repeated: both stripped
      2L -> "nu xi omicron"
    ).toDF("doc_id", "text")
    val out = LineDedup.scrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(1L) shouldBe ((2L, 0L))
    out(2L) shouldBe ((1L, 1L))
  }

  test("a higher threshold keeps lines under it") {
    val boiler = "shared header line"
    val docs = Seq(
      1L -> s"$boiler\nunique one",
      2L -> s"$boiler\nunique two"
    ).toDF("doc_id", "text")
    val strict = LineDedup.scrub(docs, maxOccurrences = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    strict(1L) shouldBe 1L
    val lax = LineDedup.scrub(docs, maxOccurrences = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    lax(1L) shouldBe 2L
  }

  test("long lines segment into 8-word units in document order") {
    val words = (1 to 10).map(i => s"w$i") // 10 words -> units of 8 + 2
    val docs = Seq(1L -> words.mkString(" ")).toDF("doc_id", "text")
    val units = LineDedup.unitHashes(docs).collect()
      .map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    units.length shouldBe 2
    units(0)._2 shouldBe md5(words.take(8).mkString(" "))
    units(1)._2 shouldBe md5(words.drop(8).mkString(" "))
    val out = LineDedup.scrub(docs).collect().head
    out.getLong(1) shouldBe 2L
    out.getLong(2) shouldBe 2L
    out.getString(3) shouldBe md5(units.map(_._2).mkString(" "))
  }

  test("scrubText emits the surviving units as text, case preserved, other columns intact") {
    val boiler = "Subscribe To Our Newsletter"
    val docs = Seq(
      (1L, "en", s"Alpha BETA gamma\n$boiler"),
      (2L, "fr", s"delta Epsilon zeta\n$boiler"),
      (3L, "en", boiler), // pure boilerplate: everything stripped
      (4L, "de", "Eta theta Iota")
    ).toDF("doc_id", "lang", "text")
    val out = LineDedup.scrubText(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    out(1L) shouldBe (("en", "Alpha BETA gamma"))
    out(2L) shouldBe (("fr", "delta Epsilon zeta"))
    out(3L) shouldBe (("en", ""))
    out(4L) shouldBe (("de", "Eta theta Iota"))
    // identity with the hash-only scrub: the lowered rebuilt text's unit
    // hashes reproduce each doc's scrub fingerprint
    val rescored = LineDedup.scrub(LineDedup.scrubText(docs).filter($"text" =!= ""))
      .select("doc_id", "scrub_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = LineDedup.scrub(docs)
      .select("doc_id", "scrub_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rescored.foreach { case (id, h) => h shouldBe direct(id) }
  }
}
