package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** IVF ANN vs brute force: recall on the provided embeddings table. */
class SimilaritySpec extends SparkSpecBase {

  private lazy val e = Similarity.prepare(
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"))

  test("brute-force top-k is deterministic and self-consistent") {
    val a = Similarity.bruteForceTopK(e, 0, 10).collect().map(_.getLong(0))
    val b = Similarity.bruteForceTopK(e, 0, 10).collect().map(_.getLong(0))
    a shouldBe b
    a.length shouldBe 10
  }

  test("IVF assignment covers every vector exactly once") {
    val (_, assign) = Similarity.buildIvf(spark, e, nCells = 16)
    assign.count() shouldBe e.count()
    assign.select("vec_id").distinct().count() shouldBe e.count()
    assign.select("cell").distinct().count() should be <= 16L
  }

  test("IVF top-k achieves reasonable recall vs brute force at nprobe=8/16") {
    val exact = Similarity.bruteForceTopK(e, 0, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfTopK(spark, e, 0, 10, nCells = 16, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    // probing half the cells on random embeddings: expect >= 40% of the
    // exact top-10 (random data is a worst case for IVF; structured
    // embeddings cluster far better)
    (exact intersect approx).size should be >= 4
    approx.size shouldBe 10
  }
}
