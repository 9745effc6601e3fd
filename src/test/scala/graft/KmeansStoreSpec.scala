package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{KmeansStore, Similarity}
import graft.sink.TranscriptCatalog

/** The persisted k-means sidecar (graft.ops.KmeansStore): fit→save→load
  * round-trips the model exactly, a committed model is REUSED instead of
  * refit, and staleness (changed inputs or parameters) or corruption
  * triggers a refit — the derived-state lifecycle of the Bloom sidecars.
  */
class KmeansStoreSpec extends SparkSpecBase {

  private def vectors(n: Int, contentShift: Long = 0L): DataFrame =
    Similarity.prepare(
      spark.range(0, n.toLong, 1, 4).toDF("i")
        .select(col("i").as("vec_id"), expr(
          s"""transform(sequence(1, 16),
             |  k -> (CAST(pmod(hash(i + ${contentShift}L, k), 1000) AS FLOAT) / 500.0 - 1.0))"""
            .stripMargin.replace("\n", " ")).as("embedding")))

  private def flat(m: Similarity.IvfModel): Seq[(Int, Seq[Double])] =
    m.centroids.map { case (c, v) => (c, v.toSeq) }

  test("fit → save → load round-trips the model exactly") {
    val catalog = new TranscriptCatalog(tmpDir("kmstore-rt"), spark)
    val e = vectors(80)
    val fitted = KmeansStore.loadOrFit(catalog, e, nCells = 4, iters = 2)
    val loaded = KmeansStore.load(catalog, 4, 2, KmeansStore.fingerprint(e))
    loaded.isDefined shouldBe true
    flat(loaded.get) shouldBe flat(fitted)
    flat(fitted) shouldBe flat(Similarity.kmeansModel(e, 4, 2))
  }

  test("a committed model is reused, not refit") {
    val catalog = new TranscriptCatalog(tmpDir("kmstore-reuse"), spark)
    val e = vectors(80)
    val first = KmeansStore.loadOrFit(catalog, e, nCells = 4, iters = 2)
    // same ids, different payloads: the id-only fingerprint matches, so
    // loadOrFit returns the COMMITTED model — proof it loaded rather than
    // refit (and the documented limitation of the cheap fingerprint)
    val mutated = vectors(80, contentShift = 7L)
    flat(KmeansStore.loadOrFit(catalog, mutated, 4, 2)) shouldBe flat(first)
  }

  test("changed inputs or parameters refit; a corrupt blob refits") {
    val catalog = new TranscriptCatalog(tmpDir("kmstore-stale"), spark)
    val e = vectors(80)
    val m0 = KmeansStore.loadOrFit(catalog, e, nCells = 4, iters = 2)
    // more rows -> new fingerprint -> refit
    val e2 = vectors(96)
    val m1 = KmeansStore.loadOrFit(catalog, e2, nCells = 4, iters = 2)
    flat(m1) should not equal flat(m0)
    flat(m1) shouldBe flat(Similarity.kmeansModel(e2, 4, 2))
    // different parameters under the same data -> refit
    flat(KmeansStore.loadOrFit(catalog, e2, nCells = 4, iters = 3)) shouldBe
      flat(Similarity.kmeansModel(e2, 4, 3))
    // corruption is derived-state: refit, never crash
    catalog.writeBlob(KmeansStore.Table, KmeansStore.Blob,
      "garbage".getBytes("UTF-8"))
    flat(KmeansStore.loadOrFit(catalog, e2, nCells = 4, iters = 2)) shouldBe
      flat(Similarity.kmeansModel(e2, 4, 2))
  }
}
