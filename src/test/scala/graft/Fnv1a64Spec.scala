package graft

import org.apache.spark.sql.functions._
import graft.functions.Fnv1a64
import graft.functions.Fnv1a64.fnv1a64

/** Native FNV-1a 64 Catalyst expression: known test vectors, codegen vs
  * interpreted parity, string/binary inputs, SQL registration.
  * Reference semantics: internal/streams/paritioned_queue.go:42-48 (Go
  * hash/fnv New64a).
  */
class Fnv1a64Spec extends SparkSpecBase {
  import spark.implicits._

  // Published FNV-1a 64 test vectors (public domain reference values).
  private val vectors = Seq(
    "" -> java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16),
    "a" -> java.lang.Long.parseUnsignedLong("af63dc4c8601ec8c", 16),
    "foobar" -> java.lang.Long.parseUnsignedLong("85944171f73967e8", 16)
  )

  test("matches published FNV-1a 64 vectors (scala impl)") {
    vectors.foreach { case (s, want) =>
      Fnv1a64.hash(s.getBytes("UTF-8")) shouldBe want
    }
  }

  test("expression over string column (codegen path) matches vectors") {
    val got = vectors.map(_._1).toDF("s")
      .select(col("s"), fnv1a64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vectors.foreach { case (s, want) => got(s) shouldBe want }
  }

  test("binary input equals string input on UTF-8 bytes") {
    val df = Seq("conv-000001", "minute-03").toDF("s")
    df.select((fnv1a64(col("s")) === fnv1a64(col("s").cast("binary"))).as("eq"))
      .collect().forall(_.getBoolean(0)) shouldBe true
  }

  test("SQL registration: fnv1a64 usable in spark.sql and matches Column API") {
    Fnv1a64.register(spark)
    spark.sql("SELECT fnv1a64('foobar') AS h").head.getLong(0) shouldBe
      java.lang.Long.parseUnsignedLong("85944171f73967e8", 16)
  }

  test("reference partition routing: fnv1a64(bucketId) pmod 8 is stable") {
    // The reference routes PartialInsightEvents by FNV-1a(bucketID) % 8
    // (partial_insight_producer.go:67, paritioned_queue.go:42-48).
    val parts = (0 until 60).map(m => f"minute-$m%02d").toDF("bucket")
      .select(pmod(fnv1a64(col("bucket")), lit(8)).as("p"))
      .distinct().collect().map(_.getLong(0))
    parts.foreach { p => p should (be >= 0L and be < 8L) }
  }

  test("matches the multimodal stub checksum (same FNV family)") {
    val bytes = "hello world".getBytes("UTF-8")
    graft.ops.Multimodal.decodeStub(1L, bytes).checksum shouldBe Fnv1a64.hash(bytes)
  }
}
