package graft

import org.apache.spark.sql.functions._
import graft.ops.{Lsh, MinHash}

/** The LSH / MinHash knobs must move recall and candidate volume the right
  * way (round-1 review item #4): more bands ⇒ more candidates (higher
  * recall), more bits/rows per band ⇒ fewer candidates (tighter pruning).
  */
class ParamSpec extends SparkSpecBase {

  private lazy val e = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    .persist()

  private def lshCandidates(nBands: Int, rBits: Int): Long = {
    val banded = e.select(col("vec_id"),
      posexplode(Lsh.bands(col("v"), nBands, rBits)).as(Seq("band_idx", "band_val")))
    val a = banded.select(col("vec_id").as("va"), col("band_idx"), col("band_val"))
    val b = banded.select(col("vec_id").as("vb"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val")).filter(col("va") < col("vb"))
      .select("va", "vb").distinct().count()
  }

  test("masks are deterministic, nonzero, and reproduce the 4-bit head") {
    Lsh.masks(4) shouldBe Seq(32, 16, 8, 4)
    Lsh.masks(12).distinct.size shouldBe 12
    Lsh.masks(12).foreach(m => assert(m > 0 && m < 64))
    an[IllegalArgumentException] should be thrownBy Lsh.masks(64)
  }

  test("every sign row is balanced (±1 in equal counts)") {
    Lsh.masks(12).foreach { m =>
      Lsh.signs(m).sum shouldBe 0.0
    }
  }

  test("LSH: more bands => more candidates; more bits per band => fewer") {
    val c2 = lshCandidates(2, 6)
    val c4 = lshCandidates(4, 6)
    val c4tight = lshCandidates(4, 10)
    withClue(s"c2=$c2 c4=$c4 c4tight=$c4tight") {
      c4 should be >= c2
      c4tight should be < c4
      // pruning actually prunes: far below all-pairs
      val n = e.count()
      c4 should be < n * (n - 1) / 4
    }
  }

  test("LSH recall of true near-dups grows with band count") {
    // ground truth: all pairs with cosine >= 0.4 (brute force on 500 vecs)
    val withNrm = e.withColumn("nrm",
      expr("sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"))
    val a = withNrm.select(col("vec_id").as("va"), col("v").as("xa"), col("nrm").as("na"))
    val b = withNrm.select(col("vec_id").as("vb"), col("v").as("xb"), col("nrm").as("nb"))
    val truth = a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("cos",
        expr("aggregate(zip_with(xa, xb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)") /
          (col("na") * col("nb")))
      .filter(col("cos") >= 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data must contain near-dup pairs")

    // The sf0.01 embeddings are near-random (max pair cosine ≈ 0.55, so
    // "near-dups" here sit at θ ≈ 66°): per-bit collision ≈ 0.63, hence
    // 3-bit bands (0.25/band) — 8 bands ⇒ ~90% expected recall.
    def found(nBands: Int): Set[(Long, Long)] = {
      val banded = e.select(col("vec_id"),
        posexplode(Lsh.bands(col("v"), nBands, 3)).as(Seq("band_idx", "band_val")))
      val x = banded.select(col("vec_id").as("va"), col("band_idx"), col("band_val"))
      val y = banded.select(col("vec_id").as("vb"), col("band_idx"), col("band_val"))
      x.join(y, Seq("band_idx", "band_val")).filter(col("va") < col("vb"))
        .select("va", "vb").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(truth)
    }
    val r1 = found(1).size
    val r8 = found(8).size
    withClue(s"truth=${truth.size} recall1=$r1 recall8=$r8") {
      r8 should be >= r1
      r8.toDouble / truth.size should be >= 0.5
    }
  }

  test("MinHash: token-less docs never become candidates (null-signature guard)") {
    // Round-2 advice: a <3-word doc has an empty shingle set → null
    // signature minima; concat_ws would silently drop the nulls and give
    // EVERY short doc the same md5('') band hash, pairing all of them
    // (O(n_short²) blowup + divergence from the null-equality oracle).
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.empty[String]),      // short doc: no shingles
      (2L, Seq.empty[String]),      // another short doc — must NOT pair with 1
      (3L, null.asInstanceOf[Seq[String]]), // null token array
      (4L, Seq("a b c", "b c d")),  // real doc, identical to 5
      (5L, Seq("a b c", "b c d"))
    ).toDF("doc_id", "toks")
    val pairs = MinHash.candidatePairs(docs, "doc_id", "toks", 2, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((4L, 5L))
  }

  test("hot-band cap bounds a degenerate constant-text corpus (round-3 verdict #4)") {
    // The adversarial case banding cannot survive unguarded: a corpus of
    // IDENTICAL texts puts every doc in the same band bucket on every
    // band, and the self-join emits all n(n-1)/2 pairs — the quadratic
    // blowup banding exists to avoid. The maxBucket knob drops such
    // buckets (trading recall for survival); default off preserves the
    // exact oracle semantics.
    import spark.implicits._
    val docs = graft.ops.IncrementalDedup.shingles(
      (1L to 60L).map(i => (i, "the same exact sentence every single time"))
        .toDF("doc_id", "text"), "text")
    MinHash.candidatePairs(docs, "doc_id", "toks", 2, 1)
      .count() shouldBe 60L * 59 / 2
    MinHash.candidatePairs(docs, "doc_id", "toks", 2, 1, maxBucket = Some(10))
      .count() shouldBe 0L
    // a mixed corpus: the cap removes only the hot bucket's pairs, and
    // normal-bucket pairs survive
    val mixed = graft.ops.IncrementalDedup.shingles(
      ((1L to 60L).map(i => (i, "the same exact sentence every single time")) ++
        Seq(100L -> "a perfectly ordinary pair of near duplicate docs",
            101L -> "a perfectly ordinary pair of near duplicate docs"))
        .toDF("doc_id", "text"), "text")
    MinHash.candidatePairs(mixed, "doc_id", "toks", 2, 1, maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((100L, 101L))
  }

  test("SimHash 4x16 banding captures EVERY pair within hamming 3 (pigeonhole)") {
    val dir = "/root/testdata/sf0.01"
    val cand = OpsQueries.queries("dd_simhash_neardup")(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp = OpsQueries.queries("dd_simhash")(spark, dir).localCheckpoint()
    val a = fp.select(col("doc_id").as("doc_a"), col("simhash").as("fa"))
    val b = fp.select(col("doc_id").as("doc_b"), col("simhash").as("fb"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= 3)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hamming ≤ 3 over 4 bands ⇒ at least one band untouched ⇒ candidate
    truth.diff(cand) shouldBe empty
  }

  test("MinHash banding: more bands => more candidates; more rows => fewer") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        expr("""CASE WHEN size(ws) >= 3 THEN
          array_distinct(transform(sequence(1, size(ws) - 2),
            i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                                element_at(ws, i + 2))))
          ELSE array() END""").as("toks"))
      .persist()
    val b2r1 = MinHash.candidatePairs(docs, "doc_id", "toks", 2, 1).count()
    val b4r1 = MinHash.candidatePairs(docs, "doc_id", "toks", 4, 1).count()
    val b2r2 = MinHash.candidatePairs(docs, "doc_id", "toks", 2, 2).count()
    docs.unpersist()
    withClue(s"b2r1=$b2r1 b4r1=$b4r1 b2r2=$b2r2") {
      b4r1 should be >= b2r1
      b2r2 should be <= b2r1
    }
  }
}
