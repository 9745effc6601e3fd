package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless interval (range) join: match facts to EVERY interval containing
  * their timestamp. Spark's built-in plan for a pure range predicate is a
  * BroadcastNestedLoopJoin — O(|facts| × |intervals|) comparisons, dead at
  * 100 TB unless one side is tiny.
  *
  * The scale shape here is BUCKETING: quantize time into buckets of
  * `bucketWidthSec`; each interval explodes into one row per bucket it
  * overlaps (≈ len/width + 1 rows — choose the width near the typical
  * interval length so this stays ~2×), each fact maps to exactly ONE
  * bucket, and the join becomes a hash-partitioned EQUI join on bucket with
  * the exact range predicate as a residual filter. Because a fact has a
  * single bucket row, a matching (fact, interval) pair meets exactly once —
  * no dedup pass needed.
  *
  * This is the interval-join strategy streaming/OLAP engines implement
  * natively (e.g. Flink's interval join state buckets); composed here from
  * sequence/explode + join, so Catalyst still handles partial aggregation,
  * AQE skew handling, and pushdown around it.
  */
object RangeJoin {

  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Inner-join `facts` (event time `tsCol`) with `intervals`
    * ([startCol, endCol], inclusive on both ends — SQL BETWEEN semantics).
    * Output: fact columns ++ interval columns, one row per containing
    * interval.
    */
  def bucketed(
      facts: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long
  ): DataFrame = {
    val w = bucketWidthSec * 1000000L
    val f = facts.withColumn("__bucket", floor(us(col(tsCol)) / w))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(us(col(startCol)) / w), floor(us(col(endCol)) / w))))
    f.join(iv, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
