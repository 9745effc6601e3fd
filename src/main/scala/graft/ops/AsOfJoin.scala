package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-table as-of (point-in-time) join: attach to each left row the most
  * recent right-side payload with right.ts <= left.ts within the same key —
  * the classic "enrich facts with dimension history" shape.
  *
  * Implemented as union + ignore-nulls `last` over ONE (key, ts) window —
  * a single shuffle of |L| + |R| rows. The naive alternative (range join
  * `l.key = r.key AND r.ts <= l.ts` + per-row max) explodes to
  * O(|L|·|R| / keys) intermediate rows per key, which is quadratic for hot
  * keys at 10^12-turn scale; the union-window form never materializes a
  * pair.
  *
  * Tie semantics: a right row AT the left row's timestamp is visible
  * (right sorts before left at equal ts), matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` — which is exactly the oracle used for
  * `q_asof_join`.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (null when no right row
    *   precedes the left row). The payload travels as one struct so all its
    *   columns always come from the SAME right row.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftExtra = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val pType = right.select(struct(payload.map(col): _*).as("__p")).schema("__p").dataType

    val lDf = left.select(
      (keys :+ tsCol).map(col) ++
        leftExtra.map(col) ++
        Seq(lit(null).cast(pType).as("__p"), lit(1).as("__tag")): _*)
    val rDf = right.select(
      (keys :+ tsCol).map(col) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("__p"), lit(0).as("__tag")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    lDf.unionByName(rDf)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.toSeq.map(col) ++
        payload.map(p => col("__last").getField(p).as(p)): _*)
  }
}
