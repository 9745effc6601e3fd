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

  test("broadcast-centroid assignment matches the literal-centroid assignment") {
    val model = Similarity.buildIvfModel(e, nCells = 16)
    import spark.implicits._
    val cents = model.centroids.map { case (c, cv) => (c, cv.toSeq) }
      .toDF("cell", "cv")
    val lit = e.select(col("vec_id"), Similarity.assignCell(model).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bc = Similarity.assignCellBroadcast(e, cents)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    bc shouldBe lit
  }

  test("broadcast IVF with nprobe = nCells reproduces brute force exactly") {
    // Probing every cell makes IVF candidate-complete: the top-k must be
    // IDENTICAL to brute force regardless of what the centroids are.
    val exact = Similarity.bruteForceTopK(e, 0, 10).collect().map(_.getLong(0))
    val full = Similarity.ivfTopKBroadcast(e, 0, 10, nCells = 16, nprobe = 16)
      .collect().map(_.getLong(0))
    full shouldBe exact
  }

  test("reliable checkpoint mode: IVF results are identical (round-3 verdict #3)") {
    // Every materialization site in the IVF build/query path honors the
    // reliable flag (executor-loss-survivable checkpoints); results must
    // not depend on the mode.
    spark.sparkContext.setCheckpointDir(tmpDir("ivf-reliable-ckpt"))
    val default = Similarity.ivfTopKBroadcast(e, 0, 10, nCells = 16, nprobe = 4)
      .collect().map(_.getLong(0))
    val rel = Similarity.ivfTopKBroadcast(e, 0, 10, nCells = 16, nprobe = 4,
      reliable = true).collect().map(_.getLong(0))
    rel shouldBe default
  }

  test("batch ANN: 10 queries, candidate-complete probe == per-query brute force") {
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val batch = Similarity.ivfTopKBatch(e, queries, k = 5, nCells = 16, nprobe = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    batch.keySet shouldBe (0L until 10L).toSet
    (0L until 10L).foreach { q =>
      val exact = Similarity.bruteForceTopK(e, q, 5).collect().map(_.getLong(0)).toSeq
      withClue(s"query $q") { batch(q) shouldBe exact }
    }
  }

  test("batch ANN at partial probe keeps k rows per query and useful recall") {
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val res = Similarity.ivfTopKBatch(e, qs, k = 5, nCells = 16, nprobe = 8)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    res.keySet shouldBe (0L until 10L).toSet
    res.values.foreach(_.size shouldBe 5)
    val recalls = (0L until 10L).map { q =>
      val exact = Similarity.bruteForceTopK(e, q, 5).collect().map(_.getLong(0)).toSet
      (exact intersect res(q)).size.toDouble / 5
    }
    withClue(s"recalls=$recalls") {
      recalls.sum / recalls.size should be >= 0.4
    }
  }

  test("DataFrame-built IVF scales past literal centroids (nCells=512, synthetic 5000)") {
    val syn = Similarity.syntheticVectors(spark, 5000, partitions = 8).persist()
    val cents = Similarity.buildIvfTable(syn, nCells = 512)
    cents.count() shouldBe 512L
    val assigned = Similarity.assignCellBroadcast(syn, cents)
    assigned.count() shouldBe 5000L
    assigned.select("cell").distinct().count() should be > 256L
    // candidate-complete equivalence holds at 512 cells too
    val exact = Similarity.bruteForceTopK(syn, 0, 10).collect().map(_.getLong(0))
    val full = Similarity.ivfTopKBroadcast(syn, 0, 10, nCells = 512, nprobe = 512,
      centsOpt = Some(cents)).collect().map(_.getLong(0))
    full shouldBe exact
    syn.unpersist()
  }

  test("semDedup: planted near-identical duplicates cluster with their base at high recall") {
    // The SemDeDup contract: vectors at VERY high cosine (true semantic
    // duplicates) land in the same IVF cell and collapse to one
    // representative. Plant one jittered copy per base (cos ≈ 1) and
    // require ≥ 90% of the planted pairs to share a cluster — the only
    // misses allowed are near-ties where the tiny jitter flips the argmax
    // cell on a boundary vector.
    val base = Similarity.syntheticVectors(spark, 200, partitions = 4)
    val copies = base.select((col("vec_id") + 1000L).as("vec_id"),
      expr("transform(v, x -> x * 1.0001 + 0.0003)").as("embedding"))
    val all = Similarity.prepare(
      base.select(col("vec_id"), col("v").as("embedding"))
        .unionByName(copies)).persist()
    val cents = Similarity.buildIvfTable(all, nCells = 16)
    val res = Similarity.semDedup(all, cents, minCos = 0.95).collect()
    res.length shouldBe 400
    val rep = res.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // representative invariants: reps are min-ids and is_kept marks them
    rep.foreach { case (id, rp) => rp should be <= id }
    res.filter(_.getBoolean(2)).map(_.getLong(0)).toSet shouldBe rep.values.toSet
    val clustered = (0L until 200L).count(i => rep(i) == rep(i + 1000L))
    withClue(s"clustered=$clustered of 200") {
      clustered.toDouble / 200 should be >= 0.9
    }
    all.unpersist()
  }

  test("semDedup cells are similarity-correlated: near-dup coverage beats the background rate") {
    // The provided embeddings hold NO high-cosine pairs (max < 0.6), so
    // same-cell recall of cos >= 0.4 pairs cannot be high in absolute
    // terms — what the cells must show is ENRICHMENT: a near-dup pair
    // shares a cell far more often than a random pair does. The reference
    // set is the COMPLETE brute-force cos >= 0.4 pair set (a superset of
    // the lossy emb_neardup_banded LSH candidates, so this bounds the
    // banded coverage too); measured ~3.8x background on this corpus,
    // gated at >= 2x.
    val cents = Similarity.buildIvfTable(e, nCells = 16)
    val cellOf = Similarity.assignCellBroadcast(e, cents)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n = cellOf.size
    // background: probability a uniformly random pair shares a cell
    val bySize = cellOf.values.groupBy(identity).map(_._2.size.toDouble)
    val background = bySize.map(s => s * (s - 1)).sum / (n.toDouble * (n - 1))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    val truth = a.join(b, col("ia") < col("ib"))
      .filter(expr("aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        / (col("na") * col("nb")) >= 0.4)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    truth.length should be > 0
    val covered = truth.count { case (x, y) => cellOf(x) == cellOf(y) }
    val coverage = covered.toDouble / truth.length
    withClue(s"coverage=$coverage background=$background pairs=${truth.length}") {
      coverage should be >= background * 2
    }
  }
}
