package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared band-bucket self-join every LSH-family near-dup operator ends
  * in (MinHash bands, SimHash 16-bit bands, embedding sign-bucket bands):
  * candidates = id pairs sharing any (band_idx, band value) bucket.
  *
  * Carries the production HOT-BUCKET guard: a degenerate band value — a
  * corpus of constant texts, zero-vector embeddings, an all-null feature —
  * puts n docs in ONE bucket and the self-join emits n²/2 pairs from it,
  * which is the quadratic blowup banding exists to avoid. `maxBucket`
  * drops buckets holding more than that many ids (logged), bounding any
  * bucket's contribution to maxBucket²/2 pairs. Default OFF: the catalog
  * queries are exact-oracled, and a dropped bucket trades recall for
  * survival — a knob the operator owner must turn deliberately.
  */
object Banding {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Hot buckets dropped by the most recent capped `candidatePairs` call —
    * the logged drop count as a testable surface (a production deployment
    * would export it through the metrics sink; specs assert on it here).
    */
  val lastHotBucketDrops = new java.util.concurrent.atomic.AtomicLong(0)

  /** Candidate pairs (id_a < id_b) from a banded frame
    * `(idCol, band_idx, bandValCol)`. Only ids and band values cross the
    * self-join shuffle. `maxBucket`: see object doc.
    */
  def candidatePairs(
      banded: DataFrame,
      idCol: String,
      bandValCol: String = "band_val",
      maxBucket: Option[Int] = None
  ): DataFrame = {
    val keep = maxBucket match {
      case Some(cap) =>
        // The hot set is tiny by construction (buckets beyond the cap), so
        // it broadcast-anti-joins; materialized eagerly so the count can be
        // logged without re-running the aggregation.
        val hot = banded.groupBy("band_idx", bandValCol)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > cap)
          .select("band_idx", bandValCol)
          .localCheckpoint()
        val nHot = hot.count()
        lastHotBucketDrops.set(nHot)
        if (nHot > 0)
          log.warn(s"dropping $nHot hot band bucket(s) holding > $cap ids each")
        banded.join(broadcast(hot), Seq("band_idx", bandValCol), "left_anti")
      case None => banded
    }
    val a = keep.select(col(idCol).as("id_a"), col("band_idx"), col(bandValCol))
    val b = keep.select(col(idCol).as("id_b"), col("band_idx"), col(bandValCol))
    a.join(b, Seq("band_idx", bandValCol))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }
}
