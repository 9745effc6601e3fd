package graft

import org.apache.spark.sql.functions._
import graft.ops.{Banding, IncrementalDedup, MinHash}

/** The hot-bucket guard under an ADVERSARIAL corpus (round-4 verdict item
  * #4): near-constant texts put (nearly) every doc into one band bucket, so
  * the uncapped band self-join emits O(n²) candidate pairs — exactly the
  * quadratic blowup banding exists to avoid. The cap must bound the
  * candidate count, surface the logged drop, and thread through the
  * COMPOSED pipelines (corpusKeepIds and the streaming nightly batch), not
  * just the raw pair operator.
  */
class HotBucketSpec extends SparkSpecBase {
  import spark.implicits._

  // 200 docs sharing one 40-word base text, each with a unique tail word:
  // the shingle sets differ only at the tail, so the MinHash minima (over
  // the ~38 shared shingles) collide for almost every doc — one hot bucket.
  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  private lazy val adversarial = (0L until 200L)
    .map(i => (i, s"$base tail$i"))
    .toDF("doc_id", "text")
    .localCheckpoint()

  private lazy val tok = IncrementalDedup.shingles(adversarial, "text")
    .select("doc_id", "toks").localCheckpoint()

  test("uncapped banding on the adversarial corpus is quadratic; the cap bounds it") {
    val uncapped = MinHash.candidatePairs(tok, "doc_id", "toks", 2, 1).count()
    uncapped should be >= (190L * 189L / 2) // ~n²/2 — the blowup is real
    val capped = MinHash.candidatePairs(tok, "doc_id", "toks", 2, 1,
      maxBucket = Some(10)).count()
    // every bucket that survives holds <= 10 ids → <= 45 pairs per bucket
    capped should be <= (2L * 45L)
    Banding.lastHotBucketDrops.get() should be >= 1L
  }

  test("corpusKeepIds threads the cap: survives the adversarial corpus, trading recall") {
    val meta = adversarial.select(col("doc_id"), md5(col("text")).as("h"))
    // Uncapped: one giant near-dup cluster → a single representative.
    val uncapped = OpsQueries.corpusKeepIds(meta, tok).count()
    uncapped shouldBe 1L
    // Capped: the hot bucket is dropped, near-dup evidence vanishes, and
    // (recall traded for survival) every exact-distinct doc is kept.
    val capped = OpsQueries.corpusKeepIds(meta, tok,
      maxBucket = Some(10)).count()
    capped should be >= 190L
    Banding.lastHotBucketDrops.get() should be >= 1L
  }

  test("a capped run refuses a shared superset pair frame") {
    val meta = adversarial.select(col("doc_id"), md5(col("text")).as("h"))
    an[IllegalArgumentException] should be thrownBy
      OpsQueries.corpusKeepIds(meta, tok,
        pairsAll = Some(Seq((1L, 2L)).toDF("id_a", "id_b")),
        maxBucket = Some(10))
  }

  test("the nightly streaming batch accepts the cap and stays bounded") {
    val root = tmpDir("hotbucket-catalog")
    graft.streaming.StreamingPipeline.processNeardupBatch(
      adversarial, batchId = 0L, catalogRoot = root,
      bands = 2, rows = 1, maxBucket = Some(10))
    val catalog = new graft.sink.TranscriptCatalog(root, spark)
    // With the hot bucket dropped there are (almost) no within-batch
    // pairs, so (almost) all docs are kept — and the job finished instead
    // of emitting ~20k pairs through connected components.
    catalog.read("docs_kept").count() should be >= 190L
    Banding.lastHotBucketDrops.get() should be >= 1L
  }
}
