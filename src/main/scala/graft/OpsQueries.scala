package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Training-data pipeline operators over the `documents` and `embeddings`
  * tables: deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine near-dup), similarity search (brute-force cosine top-k,
  * LSH-bucketed ANN), text analysis (quality, language-ID, token counting,
  * fingerprinting), and multimodal binary plumbing.
  *
  * Every operator is pure Catalyst expressions (codegen'd higher-order array
  * functions — no UDFs) with a DuckDB oracle that mirrors the semantics
  * exactly. Hashing is md5-based because md5 is the deterministic hash both
  * engines share; MinHash takes lexicographic minima of hex digests, which
  * is order-isomorphic to numeric minima of the underlying 128-bit values.
  */
object OpsQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** 3-word shingle set of a text column (guarded for <3-word docs).
    * Kept as a reference for the single-expression form; the DataFrame
    * helper below materializes the word split once instead.
    */
  private val shinglesExpr =
    """CASE WHEN size(split(lower(text), ' ')) >= 3 THEN
      |  array_distinct(transform(
      |    sequence(1, size(split(lower(text), ' ')) - 2),
      |    i -> concat_ws(' ', element_at(split(lower(text), ' '), i),
      |                        element_at(split(lower(text), ' '), i + 1),
      |                        element_at(split(lower(text), ' '), i + 2))))
      |ELSE array() END""".stripMargin.replace("\n", " ")

  /** (doc_id, toks) with the word split materialized in its own projection
    * so `split(lower(text))` is evaluated once per row, not once per shingle
    * element (CollapseProject keeps non-cheap exprs from being inlined).
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        expr("""CASE WHEN size(ws) >= 3 THEN
          array_distinct(transform(sequence(1, size(ws) - 2),
            i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                                element_at(ws, i + 2))))
          ELSE array() END""").as("toks"))

  private val shinglesSqlDuck =
    """CASE WHEN len(string_split(lower(text), ' ')) >= 3 THEN
      |  list_distinct(list_transform(
      |    generate_series(1, len(string_split(lower(text), ' ')) - 2),
      |    i -> string_split(lower(text), ' ')[i] || ' ' ||
      |         string_split(lower(text), ' ')[i + 1] || ' ' ||
      |         string_split(lower(text), ' ')[i + 2]))
      |ELSE [] END""".stripMargin.replace("\n", " ")

  private val SimhashBits = 16

  /** dot(a, b) for double arrays via sequential fold (deterministic order). */
  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")

  /** 4-bit LSH bucket of a double-array column `v`: sign bits of dots with 4
    * fixed ±1-block hyperplanes (Hadamard-style), computed via slice sums.
    */
  private def lshBucket: Column = {
    def sliceSum(start: Int, len: Int): Column =
      expr(s"aggregate(slice(v, $start, $len), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    val p0 = sliceSum(1, 32) - sliceSum(33, 32)
    val p1 = sliceSum(1, 16) - sliceSum(17, 16) + sliceSum(33, 16) - sliceSum(49, 16)
    val p2 = (0 until 4).map(k => sliceSum(16 * k + 1, 8) - sliceSum(16 * k + 9, 8)).reduce(_ + _)
    val p3 = (0 until 8).map(k => sliceSum(8 * k + 1, 4) - sliceSum(8 * k + 5, 4)).reduce(_ + _)
    when(p0 > 0, 1).otherwise(0) + when(p1 > 0, 2).otherwise(0) +
      when(p2 > 0, 4).otherwise(0) + when(p3 > 0, 8).otherwise(0)
  }

  /** DuckDB mirror of [[lshBucket]] over a DOUBLE[] column `v`. */
  private def lshBucketSqlDuck: String = {
    def ss(a: Int, b: Int) = s"list_sum(v[$a:$b])"
    val p0 = s"${ss(1, 32)} - ${ss(33, 64)}"
    val p1 = s"${ss(1, 16)} - ${ss(17, 32)} + ${ss(33, 48)} - ${ss(49, 64)}"
    val p2 = (0 until 4).map(k =>
      s"${ss(16 * k + 1, 16 * k + 8)} - ${ss(16 * k + 9, 16 * k + 16)}").mkString(" + ")
    val p3 = (0 until 8).map(k =>
      s"${ss(8 * k + 1, 8 * k + 4)} - ${ss(8 * k + 5, 8 * k + 8)}").mkString(" + ")
    s"(CASE WHEN $p0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN $p1 > 0 THEN 2 ELSE 0 END) + " +
      s"(CASE WHEN $p2 > 0 THEN 4 ELSE 0 END) + (CASE WHEN $p3 > 0 THEN 8 ELSE 0 END)"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- DD1: exact dedup via content hash ---
    "dd_exact_dup" -> ((s: SparkSession, dir: String) => {
      docs(s, dir).groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("cnt"), min("doc_id").as("keep_doc"))
    }),

    // --- DD2: n-gram (3-shingle) Jaccard near-dup pairs, MinHash-pruned:
    //     candidates come from a MinHash band equi-join (linear-ish work, the
    //     production-scale pattern), then exact Jaccard verifies each
    //     candidate. An all-pairs Jaccard would be O(n²·|shingles|) — dead at
    //     100 TB; this is O(n·|shingles|) + O(candidates). ---
    "dd_ngram_jaccard" -> ((s: SparkSession, dir: String) => {
      // Persist: O(n_docs) rows; without it the join pushes IsNotNull(sig)
      // into the scan and re-evaluates the whole shingle+md5 tree
      // (interpreted!) once per join side — measured 10× slower.
      val tok = docShingles(s, dir).persist()
      // Per-row MinHash via array fold — NO explode, NO groupBy shuffle;
      // only the two 32-char minima ever leave the map task.
      val sig = tok.select(col("doc_id"),
        expr("array_min(transform(toks, w -> md5(concat(w, 's1'))))").as("b1"),
        expr("array_min(transform(toks, w -> md5(concat(w, 's2'))))").as("b2"))
        .persist()
      val a = sig.select(col("doc_id").as("doc_a"), col("b1"), col("b2"))
      val b = sig.select(col("doc_id").as("doc_b"), col("b1").as("c1"),
        col("b2").as("c2"))
      val cand1 = a.join(b, col("b1") === col("c1") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      val cand2 = a.join(b, col("b2") === col("c2") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      val cand = cand1.union(cand2).distinct()
      // Exact Jaccard verification only on the (few) candidates.
      val res = cand
        .join(tok.select(col("doc_id").as("doc_a"), col("toks").as("ta")), Seq("doc_a"))
        .join(tok.select(col("doc_id").as("doc_b"), col("toks").as("tb")), Seq("doc_b"))
        .withColumn("jacc",
          round(size(array_intersect(col("ta"), col("tb"))).cast("double") /
            size(array_union(col("ta"), col("tb"))), 4))
        .filter(col("jacc") >= 0.5)
        .select("doc_a", "doc_b", "jacc")
        // Eagerly materialize the (small) verified-pair result with lineage
        // truncated, so the shingle/signature caches can be released NOW
        // instead of leaking for the rest of the session.
        .localCheckpoint()
      tok.unpersist()
      sig.unpersist()
      res
    }),

    // --- DD3: MinHash + LSH banding (2 hash bands; candidates = docs
    //     sharing a band minimum; equi-join per band, union, distinct) ---
    "dd_minhash_lsh" -> ((s: SparkSession, dir: String) => {
      val sig = docShingles(s, dir).select(col("doc_id"),
        expr("array_min(transform(toks, w -> md5(concat(w, 's1'))))").as("b1"),
        expr("array_min(transform(toks, w -> md5(concat(w, 's2'))))").as("b2"))
        .persist() // break lineage so band joins don't re-run the md5 tree
      val a = sig.select(col("doc_id").as("doc_a"), col("b1"), col("b2"))
      val b = sig.select(col("doc_id").as("doc_b"), col("b1").as("c1"),
        col("b2").as("c2"))
      val p1 = a.join(b, col("b1") === col("c1") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      val p2 = a.join(b, col("b2") === col("c2") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      val res = p1.union(p2).distinct().localCheckpoint()
      sig.unpersist()
      res
    }),

    // --- DD4: SimHash fingerprint (16-bit, md5-derived bit hashes) ---
    "dd_simhash" -> ((s: SparkSession, dir: String) => {
      val words = docs(s, dir).select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("w"))
        .withColumn("h", md5(col("w")))
      val bitSums = (0 until SimhashBits).map { i =>
        sum(when(expr(s"ascii(substring(h, ${i + 1}, 1)) % 2") === 1, 1)
          .otherwise(-1)).as(s"v$i")
      }
      val summed = words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val fp = (0 until SimhashBits).map { i =>
        when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      summed.select(col("doc_id"), fp.as("simhash"))
    }),

    // --- DD5: embedding-cosine near-dup pairs (brute force; the LSH
    //     bucket op below is the scale path) ---
    "emb_neardup_cosine" -> ((s: SparkSession, dir: String) => {
      // LSH-bucketed near-dup: candidates = vectors sharing the 4-hyperplane
      // LSH bucket (equi-join — O(n²/buckets) pairs instead of O(n²)), then
      // exact cosine verifies each candidate. Norms precomputed per vector so
      // a candidate pair costs exactly one 64-element dot product.
      val e = emb(s, dir).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("nrm", sqrt(dot("v", "v")))
        .withColumn("bucket", lshBucket)
      val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na"), col("bucket"))
      val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb"), col("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("cos_sim", dot("va", "vb") / (col("na") * col("nb")))
        .filter(col("cos_sim") >= 0.4)
        .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 6).as("cos_sim"))
    }),

    // --- ANN1: brute-force cosine top-k against a fixed query vector ---
    "ann_topk_bruteforce" -> ((s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .withColumn("cos_sim",
          dot("v", "qv") / (sqrt(dot("v", "v")) * sqrt(dot("qv", "qv"))))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"))
    }),

    // --- ANN2: LSH bucket assignment (4 fixed ±1-block hyperplanes via
    //     slice sums — the bucketed-join scale path for ANN) ---
    "ann_lsh_buckets" -> ((s: SparkSession, dir: String) => {
      emb(s, dir).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .select(col("vec_id"), lshBucket.as("bucket"))
    }),

    // --- ANN3: IVF-probed approximate top-k (inverted-file index: Lloyd-
    //     refined deterministic centroids, probe nprobe nearest cells).
    //     No SQL oracle (iterative centroid refinement isn't expressible as
    //     one DuckDB query) — recall vs brute force asserted in
    //     SimilaritySpec. ---
    "ann_ivf_topk" -> ((s: SparkSession, dir: String) => {
      val e = Similarity.prepare(emb(s, dir))
      Similarity.ivfTopK(s, e, queryId = 0, k = 10, nCells = 16, nprobe = 8)
        .select(col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"))
    }),

    // --- TX1: quality scoring (length / stopword ratios) ---
    "tx_quality" -> ((s: SparkSession, dir: String) => {
      val ws = split(lower(col("text")), " ")
      val nWords = size(ws)
      val stops = expr("size(filter(split(lower(text), ' '), w -> w IN ('the', 'a')))")
      docs(s, dir).select(
        col("doc_id"),
        nWords.as("n_words"),
        round(col("n_chars").cast("double") / nWords, 4).as("avg_word_span"),
        round(stops.cast("double") / nWords, 4).as("stop_ratio"),
        round(least(lit(1.0), nWords.cast("double") / 50) *
          (lit(1.0) - stops.cast("double") / nWords), 4).as("quality"))
    }),

    // --- TX2: language-ID heuristic (stopword n-gram evidence) with a
    //     confusion matrix vs the labeled lang column ---
    "tx_langid" -> ((s: SparkSession, dir: String) => {
      val pred = when(col("text").rlike(" (the|a) "), lit("en"))
        .when(col("text").rlike("[à-ÿ]"), lit("latin-ext"))
        .otherwise(lit("unknown"))
      docs(s, dir).groupBy(col("lang"), pred.as("lang_pred"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // --- TX3: token counting (whitespace + BPE-ish regex tokens) ---
    "tx_tokens" -> ((s: SparkSession, dir: String) => {
      docs(s, dir).select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
          .as("re_tokens"))
    }),

    // --- TX4: document fingerprint (canonicalized-vocabulary hash) ---
    "tx_fingerprint" -> ((s: SparkSession, dir: String) => {
      docs(s, dir).select(
        col("doc_id"),
        md5(array_join(array_sort(array_distinct(split(lower(col("text")), " "))), " "))
          .as("fingerprint"))
    }),

    // --- MM1: multimodal binary-column plumbing: treat content as an opaque
    //     blob; "decode" is a clearly-marked deterministic stub (the real
    //     decoder libs are absent in this container) but the schema,
    //     byte-length accounting and derived metadata are real ---
    "mm_binary_meta" -> ((s: SparkSession, dir: String) => {
      val blob = col("text").cast("binary")
      val nBytes = length(blob)
      docs(s, dir).select(
        col("doc_id"),
        nBytes.as("n_bytes"),
        (lit(16) + pmod(nBytes, lit(64))).as("width"),
        (lit(16) + pmod(nBytes * 7, lit(64))).as("height"),
        (lit(1) + pmod(nBytes, lit(8))).as("frames"))
    })
  )

  def oracleSql: Map[String, String] = {
    val simhashSums = (0 until SimhashBits).map { i =>
      s"sum(CASE WHEN ascii(substring(h, ${i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v$i"
    }.mkString(", ")
    val simhashFp = (0 until SimhashBits).map { i =>
      s"(CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    Map(
      "dd_exact_dup" ->
        "SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keep_doc FROM documents GROUP BY 1",
      "dd_ngram_jaccard" ->
        s"""WITH tok AS (SELECT doc_id, $shinglesSqlDuck AS toks FROM documents),
           |sig AS (SELECT doc_id, list_min(list_transform(toks, w -> md5(w || 's1'))) AS b1, list_min(list_transform(toks, w -> md5(w || 's2'))) AS b2 FROM tok),
           |cand AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
           |  UNION
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b ON a.b2 = b.b2 AND a.doc_id < b.doc_id)
           |SELECT c.doc_a, c.doc_b,
           |  round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) / len(list_distinct(ta.toks || tb.toks)), 4) AS jacc
           |FROM cand c JOIN tok ta ON ta.doc_id = c.doc_a JOIN tok tb ON tb.doc_id = c.doc_b
           |WHERE round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) / len(list_distinct(ta.toks || tb.toks)), 4) >= 0.5""".stripMargin.replace("\n", " "),
      "dd_minhash_lsh" ->
        s"""WITH tok AS (SELECT doc_id, $shinglesSqlDuck AS toks FROM documents),
           |sig AS (SELECT doc_id, list_min(list_transform(toks, w -> md5(w || 's1'))) AS b1, list_min(list_transform(toks, w -> md5(w || 's2'))) AS b2 FROM tok)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
           |UNION
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b ON a.b2 = b.b2 AND a.doc_id < b.doc_id""".stripMargin.replace("\n", " "),
      "dd_simhash" ->
        s"""WITH w AS (SELECT doc_id, md5(unnest(string_split(lower(text), ' '))) AS h FROM documents),
           |b AS (SELECT doc_id, $simhashSums FROM w GROUP BY doc_id)
           |SELECT doc_id, $simhashFp AS simhash FROM b""".stripMargin.replace("\n", " "),
      "emb_neardup_cosine" ->
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |eb AS (SELECT vec_id, v, $lshBucketSqlDuck AS bucket FROM e)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |  round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
           |FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4""".stripMargin.replace("\n", " "),
      "ann_topk_bruteforce" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          |SELECT e.vec_id,
          |  round(list_dot_product(e.v, q.qv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
          |FROM e, q WHERE e.vec_id <> 0
          |ORDER BY list_dot_product(e.v, q.qv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC, e.vec_id ASC
          |LIMIT 10""".stripMargin.replace("\n", " "),
      "ann_lsh_buckets" ->
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
           |SELECT vec_id, $lshBucketSqlDuck AS bucket FROM e""".stripMargin.replace("\n", " "),
      "tx_quality" ->
        """SELECT doc_id,
          |  len(string_split(lower(text), ' ')) AS n_words,
          |  round(CAST(n_chars AS DOUBLE) / len(string_split(lower(text), ' ')), 4) AS avg_word_span,
          |  round(CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('the', 'a'))) AS DOUBLE) / len(string_split(lower(text), ' ')), 4) AS stop_ratio,
          |  round(least(1.0, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 50) * (1.0 - CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('the', 'a'))) AS DOUBLE) / len(string_split(lower(text), ' '))), 4) AS quality
          |FROM documents""".stripMargin.replace("\n", " "),
      "tx_langid" ->
        """SELECT lang, CASE WHEN regexp_matches(text, ' (the|a) ') THEN 'en'
          |  WHEN regexp_matches(text, '[à-ÿ]') THEN 'latin-ext'
          |  ELSE 'unknown' END AS lang_pred, count(*) AS cnt
          |FROM documents GROUP BY 1, 2""".stripMargin.replace("\n", " "),
      "tx_tokens" ->
        """SELECT doc_id, len(string_split_regex(text, '\s+')) AS ws_tokens,
          |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS re_tokens
          |FROM documents""".stripMargin.replace("\n", " "),
      "tx_fingerprint" ->
        "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint FROM documents",
      "mm_binary_meta" ->
        """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
          |  16 + octet_length(encode(text)) % 64 AS width,
          |  16 + (octet_length(encode(text)) * 7) % 64 AS height,
          |  1 + octet_length(encode(text)) % 8 AS frames
          |FROM documents""".stripMargin.replace("\n", " ")
    )
  }
}
