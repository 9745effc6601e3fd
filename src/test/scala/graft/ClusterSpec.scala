package graft

import org.apache.spark.sql.functions._
import graft.ops.ConnectedComponents

/** Connected-components cluster resolution over near-dup candidate pairs:
  * transitive chains must collapse to one representative (VERDICT round-2
  * item #1 — pairs alone don't make a deduped corpus).
  */
class ClusterSpec extends SparkSpecBase {
  import spark.implicits._

  private def resolve(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.resolve(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 3-doc transitive chain collapses to one representative") {
    // A–B, B–C ⇒ {A,B,C} all labeled A even though (A,C) was never a pair.
    resolve(Seq((1L, 2L), (2L, 3L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("independent components keep independent representatives") {
    resolve(Seq((1L, 2L), (2L, 3L), (7L, 8L), (20L, 21L), (21L, 22L), (20L, 22L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
        20L -> 20L, 21L -> 20L, 22L -> 20L)
  }

  test("a long path (diameter 9) converges through multiple propagation rounds") {
    val chain = (1L to 9L).map(i => (i, i + 1))
    resolve(chain) shouldBe (1L to 10L).map(_ -> 1L).toMap
  }

  test("pointer doubling: a 400-node chain converges in O(log n) rounds") {
    // Pure propagation needs diameter (=399) rounds; resolve() throws if
    // not converged within maxIters, so capping at 16 ≈ 2·log2(400) proves
    // the doubling actually compresses paths geometrically.
    val chain = (1L to 399L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = ConnectedComponents.resolve(chain, "id_a", "id_b", maxIters = 16)
    labels.select("label").distinct().collect().map(_.getLong(0)) shouldBe Array(1L)
    labels.count() shouldBe 400L
  }

  test("labels are direction-independent (pair order never matters)") {
    resolve(Seq((5L, 2L), (9L, 5L))) shouldBe Map(2L -> 2L, 5L -> 2L, 9L -> 2L)
  }

  test("reliable checkpoint mode resolves identically (round-3 verdict #3)") {
    // reliable = true swaps localCheckpoint (executor-local, lost on
    // executor failure) for a reliable checkpoint to the context's
    // checkpoint dir — the survivable mode for multi-hour iterative jobs.
    val dir = tmpDir("cc-reliable-ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = ((1L to 50L).map(i => (i, i + 1)) ++ Seq((80L, 90L))).toDF("id_a", "id_b")
    val labels = ConnectedComponents
      .resolve(pairs, "id_a", "id_b", reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels shouldBe ((1L to 51L).map(_ -> 1L) ++ Seq(80L -> 80L, 90L -> 80L)).toMap
    // the checkpoint dir actually received RDD checkpoint data
    val wrote = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .findFirst().isPresent
    wrote shouldBe true
  }

  test("random graphs match a union-find reference (property check, fixed seeds)") {
    // Deterministic pseudo-random graphs vs a driver-side union-find: the
    // distributed min-label + pointer-doubling must agree with the
    // textbook sequential algorithm on every component assignment.
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id representative per component
      val rep = (0 until n).groupBy(find).map { case (r, ms) => r -> ms.min }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> rep(find(v.toInt)).toLong).toMap
    }
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(20)
      val edges = Seq.fill(15 + rnd.nextInt(25)) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      withClue(s"seed=$seed n=$n edges=${edges.size}: ") {
        resolve(edges) shouldBe unionFind(n, edges)
      }
    }
  }

  test("empty pair set yields an empty (not crashing) label table") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    ConnectedComponents.resolve(empty, "id_a", "id_b").count() shouldBe 0L
  }

  test("dd_cluster_resolve emits one kept representative per cluster over documents") {
    val df = OpsQueries.queries("dd_cluster_resolve")(spark, "/root/testdata/sf0.01")
      .persist()
    val n = df.count()
    n shouldBe 500L
    // representative invariants: rep ≤ member, rep is itself kept, and the
    // kept count equals the number of distinct clusters
    df.filter(col("cluster_rep") > col("doc_id")).count() shouldBe 0L
    val reps = df.select("cluster_rep").distinct().count()
    df.filter(col("is_kept")).count() shouldBe reps
    // consistency with the pairwise output: every candidate pair ends up in
    // the same cluster
    val pairs = OpsQueries.queries("dd_minhash_lsh")(spark, "/root/testdata/sf0.01")
    val lab = df.select(col("doc_id"), col("cluster_rep"))
    val inconsistent = pairs
      .join(lab.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("cluster_rep", "ra"), Seq("doc_a"))
      .join(lab.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("cluster_rep", "rb"), Seq("doc_b"))
      .filter(col("ra") =!= col("rb")).count()
    inconsistent shouldBe 0L
    df.unpersist()
  }
}
