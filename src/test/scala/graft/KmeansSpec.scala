package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Deterministic k-means (Similarity.kmeansModel): Lloyd iterations
  * monotonically improve the quantization objective, the IVF build is
  * the iters=1 special case, and diversity sampling covers every
  * non-empty cell with the per-cell cap.
  */
class KmeansSpec extends SparkSpecBase {

  private lazy val e: DataFrame =
    Similarity.prepare(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
      .localCheckpoint()

  /** Sum over vectors of (1 - cos to own centroid) under `m` — the
    * spherical quantization objective Lloyd descends.
    */
  private def cosObjective(m: Similarity.IvfModel): Double = {
    val centsNorm = m.centroids.map { case (c, cv) =>
      c -> math.sqrt(cv.map(x => x * x).sum)
    }.toMap
    val rows = e.select(col("vec_id"), Similarity.assignCell(m).as("cell"),
        col("v"), col("nrm")).collect()
    rows.map { r =>
      val cell = r.getInt(1)
      val v = r.getSeq[Double](2)
      val cv = m.centroids(cell)._2
      val dotv = v.zip(cv).map { case (a, b) => a * b }.sum
      1.0 - dotv / (r.getDouble(3) * centsNorm(cell))
    }.sum
  }

  test("more Lloyd iterations never worsen the quantization objective") {
    val m1 = Similarity.kmeansModel(e, 16, iters = 1)
    val m3 = Similarity.kmeansModel(e, 16, iters = 3)
    // rounding to 6dp perturbs each step by ~1e-6 per component; the
    // slack covers it without masking a real regression
    cosObjective(m3) should be <= cosObjective(m1) + 1e-3
  }

  test("the IVF build is exactly kmeansModel(iters = 1)") {
    val ivf = Similarity.buildIvfModel(e, 16)
    val km = Similarity.kmeansModel(e, 16, iters = 1)
    ivf.centroids.map(_._1) shouldBe km.centroids.map(_._1)
    ivf.centroids.zip(km.centroids).foreach { case ((_, a), (_, b)) =>
      a.toSeq shouldBe b.toSeq
    }
  }

  test("diversity sampling takes at most 2 per cell and covers every non-empty cell") {
    val out = OpsQueries.queries("emb_diverse_sample")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    out.groupBy(_._2).foreach { case (_, rows) =>
      rows.length should be <= 2
      rows.map(_._3).sorted.toSeq shouldBe (1 to rows.length)
    }
    val nonEmpty = OpsQueries.queries("emb_kmeans")(spark, "/root/testdata/sf0.001")
      .filter(col("n_members") > 0).count()
    out.map(_._2).distinct.length.toLong shouldBe nonEmpty
  }
}
