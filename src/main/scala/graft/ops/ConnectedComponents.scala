package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-components resolution over a near-duplicate candidate-pair set:
  * turns pairwise matches (A–B, B–C) into transitive clusters ({A,B,C} →
  * representative A), so a dedup pipeline can emit a deduped CORPUS (keep one
  * doc per cluster), not just pairs — the same `keep_doc = min(doc_id)`
  * contract the exact-dedup operator has, generalized to the transitive
  * closure.
  *
  * Algorithm: iterative min-label propagation WITH pointer doubling,
  * expressed as plain join/agg rounds — label(v) starts as v and each round
  * becomes the min label over {v} ∪ N(v), then is path-compressed to
  * label(label(v)) (one self-join: label values are themselves vertex ids,
  * so the label table indexes its own second hop). Scale shape per round:
  * two equi-joins of the (id, label) table plus one partial-aggregated
  * groupBy(min) — ids and labels only, no payloads. Propagation alone needs
  * DIAMETER rounds; doubling compresses chains geometrically, giving
  * O(log diameter) rounds — the same asymptotics as the alternating
  * large-star/small-star contraction (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") with less per-round machinery. Real near-dup
  * clusters are star-like (diameter ≤ ~3, 2-3 rounds); the log bound is for
  * the adversarial revision-chain corpora web data does contain.
  *
  * Convergence is detected with a single tiny aggregate, not a join: labels
  * only ever DECREASE under min-propagation, so the label sum strictly
  * decreases iff any label changed; equal sums ⇒ fixpoint. The sum is taken
  * in decimal(38,0) so id magnitude can never overflow it.
  *
  * Each round's label table is localCheckpoint'ed: iterative self-referencing
  * DataFrames otherwise grow their lineage (and plan-compile time) linearly
  * with rounds.
  */
object ConnectedComponents {

  /** Resolve components of the undirected pair set `pairs(aCol, bCol)`.
    * Returns (id, label) for every id that appears in a pair, where `label`
    * is the minimum id of its connected component. Ids absent from `pairs`
    * are singletons — callers left-join and coalesce(label, id).
    *
    * `reliable = true` switches per-round materialization from
    * localCheckpoint to a reliable checkpoint (see [[Materialize]]) so a
    * multi-hour run survives executor loss; requires
    * `sparkContext.setCheckpointDir`.
    */
  def resolve(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 64,
      reliable: Boolean = false
  ): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    // Init folds propagation round 1 in: label(v) = min({v} ∪ N(v)) comes
    // straight off the edge list with one groupBy — one fewer loop round
    // (each round is a fixed per-round scheduling cost at small scale).
    // stableLazy: every materialization below is immediately probed by
    // labelSum, so the checkpoint rides the probe's job (round-8 — one
    // driver action per round instead of two).
    var labels = Materialize.stableLazy(
      edges.groupBy("src")
        .agg(least(col("src"), min(col("dst"))).as("label"))
        .withColumnRenamed("src", "id"),
      reliable)

    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)

    // One min-label propagation step, composed LAZILY (no action):
    // label'(v) = min over {v} ∪ N(v) of current labels.
    def propagate(cur: DataFrame): DataFrame =
      edges
        .join(cur.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label"))
        .unionByName(cur)
        .groupBy("id").agg(min("label").as("label"))

    // One propagate + pointer-doubling round, composed LAZILY (no action).
    // Pointer doubling: label(v) ← label(label(v)). Every label value is
    // itself a vertex id present in `propagated` (labels are mins over
    // vertex ids), so the table indexes its own second hop; the left join
    // + coalesce is only null-insurance. Labels only decrease, so the
    // hop can never regress.
    def round(cur: DataFrame): DataFrame = {
      val propagated = propagate(cur)
      val hop = propagated
        .select(col("id").as("__l"), col("label").as("label2"))
      propagated
        .join(hop, propagated("label") === hop("__l"), "left")
        .select(propagated("id"), coalesce(col("label2"), col("label")).as("label"))
    }

    // null sum ⇔ no vertices (empty pair set) — done before any iteration;
    // this doubles as the emptiness check so no separate isEmpty job runs.
    var prevSum = labelSum(labels)
    if (prevSum == null) { edges.unpersist(); return labels }

    // Cheap fixpoint probe FIRST (round-8): one propagate-only step, no
    // hop — about half the exchanges of a full round and a quarter of the
    // fused double round. Sound as a convergence certificate: at a
    // fixpoint of `propagate`, label(v) ≤ label(u) across every edge in
    // BOTH directions (edges are symmetrized), so labels are constant per
    // component, and since each component's min vertex has label ≤ its own
    // id while labels never leave the component's id set, that constant is
    // the component min — i.e. fully resolved. Near-dup candidate graphs
    // are clique-like and `labels` already folds propagation round 1, so
    // MOST resolves confirm the fixpoint here at the probe's cost; deeper
    // graphs carry the probe's progress into the doubled rounds below.
    var converged = false
    var it = 0
    val probe = Materialize.stableLazy(propagate(labels), reliable)
    val probeSum = labelSum(probe)
    converged = probeSum.compareTo(prevSum) == 0
    prevSum = probeSum
    labels = probe
    it += 1
    while (!converged && it < maxIters) {
      // TWO rounds per materialization + convergence probe (round-3 verdict
      // item #6): at small scale each probe costs fixed driver/scheduling
      // overhead comparable to the round itself, and labels are monotone
      // non-increasing, so an unchanged sum across a fused double-round
      // still proves the fixpoint exactly. Worst case one extra no-op round
      // of joins; halves the materializations + driver aggregates.
      val next = Materialize.stableLazy(round(round(labels)), reliable)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      it += 2
    }
    edges.unpersist() // before the require: a throw must not leak the cache
    require(converged, s"connected components did not converge in $maxIters rounds")
    labels
  }
}
