package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication — the "remove verbatim repeated spans"
  * pass of Lee et al. 2022 (Deduplicating Training Data Makes Language
  * Models Better): any token span of length ≥ k that occurs more than
  * once ANYWHERE in the corpus is reported as a duplicated span, merged
  * to maximal extents per document. Whole-doc and line-unit dedup
  * ([[LineDedup]]) both miss a verbatim paragraph pasted mid-page; this
  * pass catches exactly that, and its span output is what a scrub stage
  * cuts out of the training text.
  *
  * The suffix-array construction of the paper is a single-machine
  * algorithm; the distributed re-expression is positioned k-gram
  * hashing: a span of length L ≥ k occurs twice iff all of its L-k+1
  * constituent k-grams occur twice, so duplicated-k-gram positions are
  * exactly the cover of duplicated spans, and merging consecutive
  * positions (gap ≤ k, i.e. covers overlap or touch) reconstructs the
  * maximal spans. k is both the detection threshold and the positional
  * resolution.
  *
  * Scale shape: the one text pass emits (doc_id, pos, md5(k-gram)) —
  * gram TEXT never leaves the map task. The corpus-wide occurrence
  * count is one partial-aggregated shuffle of hashes; the position
  * filter is a semi-join against the (small) duplicated-hash set; the
  * span merge is a per-document window (key cardinality = corpus size,
  * fully parallel). Nothing is O(n²) and no driver loop exists.
  */
object SubstringDedup {

  /** Span-detection threshold in tokens (the value the catalog oracle
    * mirrors). Lee et al. use 50 BPE tokens on web corpora; the small
    * synthetic testdata uses the decontamination family's 8.
    */
  val DefaultK = 8

  /** (doc_id, pos, gh): md5 of the k-gram starting at 1-based token
    * position `pos`, for every position — POSITIONED, not distinct
    * (the positions are the point; [[Decontam.gramHashes]] is the
    * membership-only sibling). Docs shorter than k tokens carry no rows.
    */
  // The gram array is the codegen'd graft.functions.WordGramHashes
  // expression — bit-identical to the transform(...) HOF it replaced
  // (round-8; WordGramHashesSpec gates the equivalence).
  def positionedGrams(df: DataFrame, textCol: String = "text", k: Int = DefaultK): DataFrame =
    df.select(col("doc_id"), split(lower(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col("doc_id"), posexplode(
        graft.functions.WordGramHashes.wordGramHashes(
          col("__ws"), k, distinct = false))
        .as(Seq("pos0", "gh")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("gh"))

  /** Maximal duplicated spans: one row per (doc, maximal span) as
    * (doc_id, span_start, span_tokens), span_start 1-based. A k-gram
    * counts as duplicated when its corpus-wide occurrence count is
    * ≥ `minOccurrences` (within-doc repeats count — a doc that repeats
    * its own paragraph gets both copies flagged, the same contract as
    * the paper's self-repetition handling). Spans are disjoint per doc
    * by construction (runs are separated by gaps > k).
    */
  def spans(
      df: DataFrame,
      textCol: String = "text",
      k: Int = DefaultK,
      minOccurrences: Int = 2
  ): DataFrame =
    spansFromGrams(positionedGrams(df, textCol, k), k, minOccurrences)

  /** [[spans]] against a precomputed positioned-gram frame — the form the
    * catalog queries use so a session's single memoized gram pass feeds
    * the whole substring family (round-8).
    */
  def spansFromGrams(
      grams: DataFrame,
      k: Int = DefaultK,
      minOccurrences: Int = 2
  ): DataFrame = {
    // duplicated-hash set: tiny (boilerplate + planted dups), the
    // build side of the semi-join below
    val dup = grams.groupBy("gh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minOccurrences)
      .select("gh")
    spansFromHits(grams.join(dup, Seq("gh"), "left_semi").select("doc_id", "pos"), k)
  }

  /** Merge duplicated-k-gram hit positions `(doc_id, pos)` into maximal
    * spans `(doc_id, span_start, span_tokens)`: a new run starts when
    * the gap to the previous hit exceeds k (covers neither overlap nor
    * touch); run_id = running count of starts, per doc. Shared by the
    * whole-corpus [[spans]] and the cross-batch
    * [[IncrementalSubstringDedup]] (which derives its hit set against a
    * persisted historical count store instead of the corpus-wide count).
    */
  def spansFromHits(hits: DataFrame, k: Int = DefaultK): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val runs = hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byPos) > k, 1).otherwise(0))
      .withColumn("run_id", sum("brk").over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy("doc_id", "run_id")
      .agg(min("pos").as("span_start"), max("pos").as("last_pos"))
      .select(col("doc_id"), col("span_start"),
        (col("last_pos") + lit(k - 1) - col("span_start") + 1).as("span_tokens"))
  }

  /** The scrub pass over [[spans]]: per doc, cut every duplicated span
    * out of the token stream and emit (doc_id, n_tokens, kept_tokens,
    * scrub_hash) — scrub_hash is md5 over the SURVIVING tokens in
    * document order (md5("") when everything was cut), the hash a
    * downstream exact-dedup or text rewrite keys on. Docs without spans
    * pass through whole.
    *
    * Shape: spans per doc are few and small (start, len) pairs, so they
    * aggregate to ONE array column per affected doc and join back to the
    * text by doc_id — the cut itself is a row-local higher-order array
    * filter (token kept iff no span covers its position), codegen'd, no
    * token-level explode and no second corpus-wide shuffle.
    */
  def scrub(
      df: DataFrame,
      textCol: String = "text",
      k: Int = DefaultK,
      minOccurrences: Int = 2
  ): DataFrame =
    scrubFromSpans(df, spans(df, textCol, k, minOccurrences), textCol)

  /** The cut stage of [[scrub]] against an externally-derived span set
    * (shared with [[IncrementalSubstringDedup]]). */
  def scrubFromSpans(
      df: DataFrame,
      spanRows: DataFrame,
      textCol: String = "text"
  ): DataFrame = {
    val spanArrays = spanRows
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_tokens").as("l")))
        .as("sp"))
    df.select(col("doc_id"), split(lower(col(textCol)), " ").as("__ws"))
      .join(spanArrays, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("__ws")).as("n_tokens"),
        expr(
          """CASE WHEN sp IS NULL THEN __ws ELSE
            |  transform(
            |    filter(zip_with(__ws, sequence(1, size(__ws)),
            |        (w, i) -> named_struct('w', w, 'i', i)),
            |      p -> NOT exists(sp, s -> p.i >= s.s AND p.i < s.s + s.l)),
            |    p -> p.w)
            |END""".stripMargin.replace("\n", " ")).as("__kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("__kept")).as("kept_tokens"),
        md5(concat_ws(" ", col("__kept"))).as("scrub_hash"))
  }

  /** [[scrub]]'s TEXT-emitting twin: `textCol` is REPLACED by the token
    * stream with every duplicated span cut (original case — span
    * positions come from lowered grams, but lowercasing never moves a
    * whitespace boundary, so the cased token array aligns
    * position-for-position), all other columns pass through. The form a
    * release pipeline chains into downstream stages; whitespace
    * normalizes to single spaces (the corpus tokenization convention
    * throughout), and a fully-cut doc becomes "". Same row-local
    * zip_with/filter cut as [[scrub]] — no token-level explode; the
    * span arrays join back by doc_id, the one text-bearing join.
    */
  def scrubText(
      df: DataFrame,
      textCol: String = "text",
      k: Int = DefaultK,
      minOccurrences: Int = 2
  ): DataFrame = {
    val spanArrays = spans(df, textCol, k, minOccurrences)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_tokens").as("l")))
        .as("__sp"))
    df.withColumn("__ws", split(col(textCol), " "))
      .join(spanArrays, Seq("doc_id"), "left")
      .withColumn(textCol, expr(
        """CASE WHEN __sp IS NULL THEN concat_ws(' ', __ws) ELSE
          |  concat_ws(' ', transform(
          |    filter(zip_with(__ws, sequence(1, size(__ws)),
          |        (w, i) -> named_struct('w', w, 'i', i)),
          |      p -> NOT exists(__sp, s -> p.i >= s.s AND p.i < s.s + s.l)),
          |    p -> p.w))
          |END""".stripMargin.replace("\n", " ")))
      .drop("__ws", "__sp")
  }
}
