package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed map-merge aggregator: the reference's rollup merge law —
  * pointwise `agg[k] += v` over `map[string]int64`, inserting keys on first
  * sight (reference: internal/aggregators/aggregate_rolluper.go:33-47,
  * laws proven by aggregate_rolluper_test.go:13-161) — as a Spark
  * `Aggregator[IN, BUF, OUT]`.
  *
  * This exists for sink-schema fidelity when aggregating already-map-valued
  * rows (e.g. re-rolling up the map-valued sink without exploding). The
  * preferred path for raw data remains the exploded relational layout +
  * built-in `sum` (SURVEY.md §7.3), which stays inside whole-stage codegen;
  * this Aggregator is the documented exception, not the hot path.
  */
object MapMergeAggregator
    extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  /** Commutative monoid op: pointwise sum (associativity + commutativity are
    * what let Spark apply it in partial/final stages in any order).
    */
  private def plus(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  override def reduce(buf: Map[String, Long], row: Map[String, Long]): Map[String, Long] =
    plus(buf, row)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    plus(b1, b2)

  /** Deterministic (sorted-key) output — the reference sorts its keys on
    * serialization too (batch_summarizer.go:68-73).
    */
  override def finish(reduction: Map[String, Long]): Map[String, Long] =
    scala.collection.immutable.SortedMap.from(reduction)

  private val mapEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def bufferEncoder: Encoder[Map[String, Long]] = mapEncoder

  override def outputEncoder: Encoder[Map[String, Long]] = mapEncoder

  /** Column form usable in untyped `agg(...)`: `map_merge(col)`. */
  val asUdaf = udaf(this)
}
