package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.checkpoint.Checkpoint
import graft.checkpoint.Checkpoint.{Manifest, PartitionLineage}

/** Manifest serialization + watermark compaction laws. */
class CheckpointSpec extends AnyFunSuite with Matchers {

  private def pl(w: String, rows: Long) = PartitionLineage(w, rows)

  test("write/read round-trips watermark, foldedRows, lineage, and metrics") {
    val dir = Files.createTempDirectory("ckpt").toString
    val m = Manifest("run \"x\"", Seq(pl("20260101T0001Z", 5), pl("20260101T0002Z", 7)),
      Map("rows_parsed" -> 12L, "agg_rows" -> 3L),
      watermark = "20251231T2359Z", foldedRows = 99L)
    Checkpoint.write(dir, m)
    Checkpoint.read(dir) shouldBe Some(m)
  }

  test("manifests without watermark fields (round-1 format) read with defaults") {
    val dir = Files.createTempDirectory("ckpt-old").toString
    Files.writeString(java.nio.file.Paths.get(dir, "manifest.json"),
      """{"runId":"r1","committedPartitions":[{"partition":"20260101T0001Z","rows":5}],"metrics":{"rows_parsed":5}}""")
    val m = Checkpoint.read(dir).get
    m.watermark shouldBe ""
    m.foldedRows shouldBe 0L
    m.committedSet shouldBe Set("20260101T0001Z")
  }

  test("manifests without quarantinePartitions (pre-round-3) read as quarantineKnown=false") {
    // "Absent field" and "empty list" must stay distinguishable: the
    // upgrade path adopts existing quarantine partitions only when the
    // manifest genuinely predates the field (round-3 advice).
    val dir = Files.createTempDirectory("ckpt-noquar").toString
    Files.writeString(java.nio.file.Paths.get(dir, "manifest.json"),
      """{"runId":"r1","watermark":"","foldedRows":0,"committedPartitions":[],"metrics":{}}""")
    Checkpoint.read(dir).get.quarantineKnown shouldBe false

    val dir2 = Files.createTempDirectory("ckpt-emptyquar").toString
    Checkpoint.write(dir2, Manifest("r2", Nil, Map.empty))
    val m2 = Checkpoint.read(dir2).get
    m2.quarantineKnown shouldBe true
    m2.quarantinePartitions shouldBe Nil
  }

  test("compact folds oldest windows, keeps the newest, accumulates rows") {
    val m = Manifest("r", (1 to 10).map(i => pl(f"20260101T00$i%02dZ", i.toLong)),
      Map.empty, watermark = "", foldedRows = 0L)
    val c = Checkpoint.compact(m, maxWindows = 3)
    c.committedPartitions.map(_.partition) shouldBe
      Seq("20260101T0008Z", "20260101T0009Z", "20260101T0010Z")
    c.watermark shouldBe "20260101T0007Z"
    c.foldedRows shouldBe (1 to 7).sum.toLong
    // idempotent when already small enough
    Checkpoint.compact(c, maxWindows = 3) shouldBe c
  }

  test("compact never moves the watermark backwards") {
    val m = Manifest("r", Seq(pl("20260101T0001Z", 1), pl("20260101T0002Z", 1)),
      Map.empty, watermark = "20260101T0009Z", foldedRows = 0L)
    Checkpoint.compact(m, maxWindows = 1).watermark shouldBe "20260101T0009Z"
  }
}
