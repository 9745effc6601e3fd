package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram containment decontamination — the release-gate check that flags
  * any training document CONTAINING a long-enough n-gram of a held-out
  * eval document (an eval answer embedded in a larger page; whole-doc
  * MinHash misses it because Jaccard against the big doc is tiny).
  *
  * The eval set changes rarely and the training corpus arrives daily, so
  * the eval side persists as a BUCKETED gram-hash store (the
  * signature-store pattern, `graft.ops.IncrementalDedup`): `publishEvalSet`
  * writes the distinct md5(n-gram) hashes bucketed by hash, and every
  * later ingest's `contaminatedIds` semi-join reads the store side
  * exchange-free — only the batch's (doc_id, hash) rows ever shuffle.
  * DecontamSpec plan-gates exactly that.
  */
object Decontam {

  /** Default word-n-gram length (the value the catalog oracles use). */
  val DefaultN = 8

  val GramTable: String = "eval_grams"
  val GramSchemaDdl: String = "gh STRING"
  val GramBucketCols: Seq[String] = Seq("gh")

  /** (doc_id, gh) — distinct md5 hashes of each doc's n-grams. Docs with
    * fewer than `n` words carry no rows. One Generate + projection; the
    * gram strings themselves never leave the map task.
    */
  def gramHashes(df: DataFrame, textCol: String, n: Int = DefaultN): DataFrame =
    df.select(col("doc_id"), split(lower(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= n)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(__ws) - ${n - 1}), i -> md5(concat_ws(' ', slice(__ws, i, $n)))))"))
        .as("gh"))

  /** Publish (append) an eval set's distinct gram hashes to the bucketed
    * store. Re-publishing an overlapping eval set only costs duplicate
    * hash rows — the semi-join semantics are unchanged.
    */
  def publishEvalSet(
      catalog: graft.sink.TranscriptCatalog,
      evalDocs: DataFrame,
      textCol: String = "text",
      n: Int = DefaultN,
      nBuckets: Int = 16
  ): Unit = {
    catalog.ensureBucketed(GramTable, GramSchemaDdl, GramBucketCols, nBuckets)
    catalog.appendBucketed(
      gramHashes(evalDocs, textCol, n).select("gh").distinct(),
      GramTable, GramBucketCols, nBuckets)
  }

  /** The persisted eval-gram store (registered on first use). */
  def evalGramStore(
      catalog: graft.sink.TranscriptCatalog,
      nBuckets: Int = 16
  ): DataFrame = {
    catalog.ensureBucketed(GramTable, GramSchemaDdl, GramBucketCols, nBuckets)
    catalog.readBucketed(GramTable)
  }

  /** Ids of `docs` containing ANY stored eval n-gram. The store is the
    * big side and provides its own hash partitioning (bucketed by gh);
    * only the batch's narrow gram rows exchange.
    */
  def contaminatedIds(
      docs: DataFrame,
      store: DataFrame,
      textCol: String = "text",
      n: Int = DefaultN
  ): DataFrame =
    gramHashes(docs, textCol, n)
      .join(store.select("gh"), Seq("gh"), "left_semi")
      .select("doc_id").distinct()
}
