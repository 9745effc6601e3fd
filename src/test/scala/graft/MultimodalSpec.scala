package graft

import graft.ops.Multimodal

/** Frame-sampling semantics: even stride, full coverage of short clips,
  * and zero samples (not a divide-by-zero fan-out) for frames = 0 — the
  * corrupt/empty-media case a real decoder produces (round-3 review).
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("sampleFrames: even stride, short-clip coverage, frames=0 yields no rows") {
    val meta = Seq((1L, 10), (2L, 3), (3L, 0)).toDF("doc_id", "frames")
    val out = Multimodal.sampleFrames(meta, maxFrames = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // 10 frames, 4 samples: indices (i·10) div 4 = 0, 2, 5, 7
    out.filter(_._1 == 1L).map(_._3).sorted shouldBe Array(0, 2, 5, 7)
    // 3 frames ≤ maxFrames: every frame kept
    out.filter(_._1 == 2L).map(_._3).sorted shouldBe Array(0, 1, 2)
    // corrupt/empty media: zero samples
    out.filter(_._1 == 3L) shouldBe empty
  }
}
