package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalDedup
import graft.sink.TranscriptCatalog
import graft.streaming.StreamingPipeline

/** Crash-safety of the legacy-store migration and the persisted bucket
  * spec (round-4 ADVICE items, high + medium + low): a crash at ANY point
  * of the migration must leave a state from which the retry converges with
  * the full dedup history intact, a mismatched bucket registration must
  * fail fast instead of silently mis-joining, and the per-batch legacy
  * probe must be a single marker check once the store is known-current.
  */
class CatalogMigrationSpec extends SparkSpecBase {
  import spark.implicits._

  private val Store = IncrementalDedup.StoreTable
  private val Stage = s"${Store}__migrating"

  /** A legacy-format store: plain un-bucketed signature appends + the old
    * in-store batch marker row (doc_id = -1). Returns (root, catalog).
    */
  private def legacyStore(tag: String): (String, TranscriptCatalog) = {
    val out = tmpDir(tag)
    val catalog = new TranscriptCatalog(out, spark)
    val doc1 = Seq(1L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    val sigs = IncrementalDedup
      .signatures(IncrementalDedup.shingles(doc1, "text"), "doc_id", "toks", 2, 1)
      .withColumn("batch_id", lit(0L))
      .unionByName(spark.range(1).select(
        lit(-1L).as("doc_id"), lit(-1).as("band_idx"),
        lit(null).cast("string").as("band_hash"), lit(0L).as("batch_id")))
    catalog.append(sigs, Store)
    (out, catalog)
  }

  private def storeDocIds(catalog: TranscriptCatalog): Seq[Long] =
    catalog.read(Store).select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq

  test("crash after staging, before the store delete: retry resumes and does not duplicate") {
    val (out, catalog) = legacyStore("mig-crash-prestage")
    // Simulate the crash state: stage written, store still legacy, no marker.
    catalog.overwritePartitions(catalog.read(Store), Stage, Nil)
    StreamingPipeline.migrateLegacyNeardupStore(spark, out, storeBuckets = 4) shouldBe true
    storeDocIds(catalog) shouldBe Seq(1L)
    catalog.read(Store).count() shouldBe 2L // 2 bands × 1 doc, marker rows gone
    catalog.listPartitionValues("batches", "batch_id") shouldBe Seq("0")
    catalog.exists(StreamingPipeline.StoreFormatMarker) shouldBe true
    catalog.exists(Stage) shouldBe false
  }

  test("crash after the store delete: retry rebuilds the FULL history from the stage") {
    // THE advice scenario: previously this state re-detected "empty store =
    // not legacy" and silently lost the entire dedup history.
    val (out, catalog) = legacyStore("mig-crash-postdelete")
    catalog.overwritePartitions(catalog.read(Store), Stage, Nil)
    catalog.deleteTable(Store)
    StreamingPipeline.migrateLegacyNeardupStore(spark, out, storeBuckets = 4) shouldBe true
    storeDocIds(catalog) shouldBe Seq(1L)
    catalog.listPartitionValues("batches", "batch_id") shouldBe Seq("0")
    // and the history still dedups: a near-dup of doc 1 is dropped
    val doc10 = Seq(10L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    StreamingPipeline.processNeardupBatch(doc10, 1L, out, 2, 1, storeBuckets = 4)
    // nothing kept ⇒ the batch_id-partitioned overwrite wrote no data file
    // (an empty dynamic overwrite touches no partition at all)
    catalog.dataFileNames("docs_kept") shouldBe empty
  }

  test("crash MID-staging (uncommitted stage debris): retry restages from the intact store") {
    val (out, catalog) = legacyStore("mig-crash-midstage")
    // Simulate a crashed staging write: partial stage files, no _SUCCESS.
    catalog.overwritePartitions(catalog.read(Store).limit(1), Stage, Nil)
    val success = new org.apache.hadoop.fs.Path(s"$out/$Stage/_SUCCESS")
    success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(success, false)
    catalog.committed(Stage) shouldBe false
    StreamingPipeline.migrateLegacyNeardupStore(spark, out, storeBuckets = 4) shouldBe true
    // The full history survived — the truncated debris was NOT trusted.
    storeDocIds(catalog) shouldBe Seq(1L)
    catalog.read(Store).count() shouldBe 2L
    catalog.listPartitionValues("batches", "batch_id") shouldBe Seq("0")
  }

  test("crash after a partial rebuild: retry wipes the partial store and converges") {
    val (out, catalog) = legacyStore("mig-crash-partial")
    catalog.overwritePartitions(catalog.read(Store), Stage, Nil)
    catalog.deleteTable(Store)
    // partial rebuild: only ONE of the two band rows made it
    IncrementalDedup.appendSignaturesRaw(catalog,
      catalog.read(Stage).filter(col("doc_id") =!= -1L && col("band_idx") === 0),
      nBuckets = 4)
    StreamingPipeline.migrateLegacyNeardupStore(spark, out, storeBuckets = 4) shouldBe true
    catalog.read(Store).count() shouldBe 2L // not 3 — the partial row was wiped
  }

  test("crash between the format marker and stage cleanup: next call cleans up, migrates nothing") {
    val (out, catalog) = legacyStore("mig-crash-postmarker")
    StreamingPipeline.migrateLegacyNeardupStore(spark, out, storeBuckets = 4) shouldBe true
    // simulate the leftover stage of a crash right after the marker write
    catalog.overwritePartitions(catalog.read(Store), Stage, Nil)
    StreamingPipeline.migrateLegacyNeardupStore(spark, out, storeBuckets = 4) shouldBe false
    catalog.exists(Stage) shouldBe false
    storeDocIds(catalog) shouldBe Seq(1L)
  }

  test("a fresh (non-legacy) root writes the format marker once; later probes are marker-only") {
    val out = tmpDir("mig-fresh")
    val catalog = new TranscriptCatalog(out, spark)
    StreamingPipeline.migrateLegacyNeardupStore(spark, out) shouldBe false
    catalog.exists(StreamingPipeline.StoreFormatMarker) shouldBe true
    // a second call must not re-list the store — observable contract: it
    // returns false and leaves everything untouched even if we now drop a
    // legacy-looking file into the store directory
    val doc = Seq(5L -> "some words for a store row").toDF("doc_id", "text")
    catalog.append(IncrementalDedup
      .signatures(IncrementalDedup.shingles(doc, "text"), "doc_id", "toks", 2, 1)
      .withColumn("batch_id", lit(9L)), Store)
    StreamingPipeline.migrateLegacyNeardupStore(spark, out) shouldBe false
  }

  test("a mismatched bucket registration fails fast against the persisted spec") {
    val out = tmpDir("bucket-spec")
    val catalog = new TranscriptCatalog(out, spark)
    catalog.ensureBucketed(Store, IncrementalDedup.StoreSchemaDdl,
      IncrementalDedup.StoreBucketCols, nBuckets = 4)
    val err = intercept[IllegalArgumentException] {
      catalog.ensureBucketed(Store, IncrementalDedup.StoreSchemaDdl,
        IncrementalDedup.StoreBucketCols, nBuckets = 16)
    }
    err.getMessage should include("bucket spec mismatch")
    intercept[IllegalArgumentException] {
      catalog.ensureBucketed(Store, IncrementalDedup.StoreSchemaDdl,
        Seq("band_idx"), nBuckets = 4)
    }
    // the matching registration still works
    noException should be thrownBy catalog.ensureBucketed(
      Store, IncrementalDedup.StoreSchemaDdl,
      IncrementalDedup.StoreBucketCols, nBuckets = 4)
  }

  test("a corrupt bucket spec raises a descriptive error, not a MatchError") {
    val out = tmpDir("bucket-spec-corrupt")
    val catalog = new TranscriptCatalog(out, spark)
    catalog.ensureBucketed(Store, IncrementalDedup.StoreSchemaDdl,
      IncrementalDedup.StoreBucketCols, nBuckets = 4)
    // Truncate the spec the way a crashed non-atomic write would have
    // (the write itself is temp+rename now, so this is belt-and-braces).
    val p = new org.apache.hadoop.fs.Path(s"$out/$Store/_bucket_spec")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true); o.write("band_hash".getBytes("UTF-8")); o.close()
    val err = intercept[IllegalStateException] {
      catalog.ensureBucketed(Store, IncrementalDedup.StoreSchemaDdl,
        IncrementalDedup.StoreBucketCols, nBuckets = 4)
    }
    err.getMessage should include("corrupt bucket spec")
    err.getMessage should include(Store)
  }
}
