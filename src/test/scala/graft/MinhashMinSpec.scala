package graft

import org.apache.spark.sql.functions._
import graft.functions.MinhashMin

/** The codegen'd MinHash signature row (graft.functions.MinhashMin) must
  * be BIT-IDENTICAL to the array_min(transform(...)) HOF fold it
  * replaced — oracle-pinned: the banding joins and every stored
  * signature row key on these exact hex strings.
  */
class MinhashMinSpec extends SparkSpecBase {

  private def hof(salt: String) =
    expr(s"array_min(transform(toks, w -> md5(concat(w, '$salt'))))")

  test("bit-identical to the HOF fold on adversarial token arrays") {
    val rows = spark.range(0, 3000, 1, 8).select(
      expr("""transform(sequence(0, CAST(pmod(hash(id), 30) AS INT)),
        k -> CASE pmod(hash(id, k), 5)
          WHEN 0 THEN ''
          WHEN 1 THEN concat('tok ', hash(id, k))
          WHEN 2 THEN 'héllo✓ wörld'
          WHEN 3 THEN repeat('z', 40)
          ELSE concat('w', pmod(hash(id, k), 9)) END)""").as("toks"))
    for (salt <- Seq("s1", "s2", "s7")) {
      val cmp = rows.select(
        MinhashMin.minhashMin(col("toks"), salt).as("fast"), hof(salt).as("ref"))
      cmp.filter(col("fast") =!= col("ref")).count() shouldBe 0
      cmp.filter(col("fast").isNull =!= col("ref").isNull).count() shouldBe 0
    }
  }

  test("null semantics: null array, empty array, null elements skipped") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        (array('b', 'a', 'c')),
        (CAST(NULL AS ARRAY<STRING>)),
        (array()),
        (array(CAST(NULL AS STRING))),
        (array('x', CAST(NULL AS STRING), 'y')) AS t(toks)""")
    val out = df.select(
      MinhashMin.minhashMin(col("toks"), "s1").as("fast"), hof("s1").as("ref"))
      .collect()
    out.foreach { r =>
      r.isNullAt(0) shouldBe r.isNullAt(1)
      if (!r.isNullAt(0)) r.getString(0) shouldBe r.getString(1)
    }
    out(1).isNullAt(0) shouldBe true // null array
    out(2).isNullAt(0) shouldBe true // empty array
    out(3).isNullAt(0) shouldBe true // all-null array
    out(4).isNullAt(0) shouldBe false // nulls skipped
  }

  test("interpreted eval agrees with codegen and with commons md5") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val a = ArrayData.toArrayData(Array(
      UTF8String.fromString("beta"), UTF8String.fromString("alpha")))
    val e = MinhashMin(Literal.create(a,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)), "s1")
    val expect = Seq("betas1", "alphas1").map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.min
    e.eval(null).toString shouldBe expect
  }
}
