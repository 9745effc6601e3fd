package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]` → cast to
  * double): brute-force cosine top-k as the exact baseline and an IVF
  * (inverted-file) index as the scale path — centroids from a deterministic
  * one-iteration Lloyd refinement of seed vectors, probe only the nprobe
  * nearest cells.
  *
  * All DataFrame ops: assignment is a broadcast cross-join against the
  * (tiny) centroid table + argmin; centroid update is an element-wise mean
  * via posexplode + groupBy(position). At 10^9 vectors the only all-data
  * passes are the two assignment projections — no O(n²) anywhere.
  */
object Similarity {

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")

  /** Vectors as (vec_id, v: array<double>, nrm). */
  def prepare(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(dot("v", "v")))

  /** Exact cosine top-k against the vector with id `queryId`. */
  def bruteForceTopK(e: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= queryId).crossJoin(broadcast(q))
      .withColumn("cos_sim", dot("v", "qv") / (col("nrm") * col("qn")))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cos_sim"))
  }

  /** IVF index: deterministic centroids (seeds = lowest `nCells` vec_ids,
    * one Lloyd iteration), returns (centroids, assignments).
    */
  def buildIvf(spark: SparkSession, e: DataFrame, nCells: Int): (DataFrame, DataFrame) = {
    val seeds = e.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))

    def assign(cents: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("d").desc, col("cell").asc)
      e.crossJoin(broadcast(cents))
        .withColumn("d", dot("v", "cv") / col("nrm")) // cosine numerator scale-free per vec
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    }

    val a0 = assign(seeds)
    // one Lloyd step: element-wise mean per cell
    val cents1 = a0
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg("x").as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("cell"), expr("transform(ps, p -> p.m)").as("cv"))
    val a1 = assign(cents1)
    (cents1, a1.select("vec_id", "cell"))
  }

  /** IVF-probed approximate top-k: search only the `nprobe` cells nearest
    * to the query vector.
    */
  def ivfTopK(
      spark: SparkSession,
      e: DataFrame,
      queryId: Long,
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4
  ): DataFrame = {
    val (cents, assign) = buildIvf(spark, e, nCells)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val probeCells = cents.crossJoin(broadcast(q))
      .withColumn("d", dot("cv", "qv"))
      .orderBy(col("d").desc).limit(nprobe)
      .select("cell")
    e.join(assign, "vec_id")
      .join(broadcast(probeCells), "cell") // prune to probed cells
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", dot("v", "qv") / (col("nrm") * col("qn")))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cos_sim"))
  }
}
