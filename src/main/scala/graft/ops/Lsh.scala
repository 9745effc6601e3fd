package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parameterized sign-random-projection LSH over fixed-dim double-array
  * vectors, with multi-band banding for near-duplicate candidate pruning.
  *
  * Hyperplanes are Hadamard rows: row `mask` has sign (-1)^popcount(i & mask)
  * at position i. Every nonzero mask gives a balanced ±1 row, distinct masks
  * are mutually orthogonal, and the rows are inlined as ±1 literal arrays —
  * so a bucket/band assignment is a pure codegen'd projection (no join, no
  * shuffle, no stored hyperplane table). The first four masks (32, 16, 8, 4)
  * reproduce the round-1 fixed 4-bit bucket.
  *
  * Scale story (round-1 review item): bucket width and band count are the
  * knobs that keep candidate generation sub-quadratic — candidates per band
  * ≈ n²/2^rBits, recall grows with nBands. 2^rBits must exceed n/afew to
  * stay linear; both are now caller-chosen instead of hard-coded at 16
  * buckets.
  *
  * Reference analog: the partitioned-exchange hashing idea of
  * internal/streams/paritioned_queue.go:42-48, applied to vector space.
  */
object Lsh {

  val DefaultDim = 64

  /** Deterministic mask sequence; masks must be nonzero and < dim. */
  def masks(bits: Int): Seq[Int] = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    val head = Seq(32, 16, 8, 4)
    (head ++ (1 to 63).filterNot(head.contains)).take(bits)
  }

  /** ±1 sign row of a Hadamard mask. */
  def signs(mask: Int, dim: Int = DefaultDim): Array[Double] =
    Array.tabulate(dim)(i => if (Integer.bitCount(i & mask) % 2 == 1) -1.0 else 1.0)

  /** Signed projection of vector column `v` onto the mask's ±1 row —
    * a sequential fold, so DuckDB's list_dot_product reproduces it
    * float-for-float.
    */
  def signedDot(v: Column, mask: Int, dim: Int = DefaultDim): Column =
    // typedLit: the sign row is ONE Literal plan node (array(lit...) would
    // add dim nodes per mask and blow up optimizer time at high bit counts).
    // dot_exact (round-8): the codegen'd exact fold — bit-identical to the
    // aggregate(zip_with(...)) form it replaces, but inside the codegen
    // span instead of nBands·rBits interpreted lambdas per row.
    graft.functions.DotExact.dotExact(v, typedLit(signs(mask, dim).toSeq))

  /** `bits`-bit sign bucket of `v` (single band). */
  def bucket(v: Column, bits: Int, dim: Int = DefaultDim): Column =
    masks(bits).zipWithIndex.map { case (m, b) =>
      when(signedDot(v, m, dim) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** `nBands` band buckets of `rBits` bits each, as an array column —
    * candidates for near-dup = pairs sharing ANY (band_idx, band_value).
    */
  def bands(v: Column, nBands: Int, rBits: Int, dim: Int = DefaultDim): Column = {
    val ms = masks(nBands * rBits)
    array((0 until nBands).map { j =>
      ms.slice(j * rBits, (j + 1) * rBits).zipWithIndex.map { case (m, b) =>
        when(signedDot(v, m, dim) > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }: _*)
  }

  // --- DuckDB mirrors (generated from the SAME masks, so the oracle tracks
  //     any parameter change automatically) ---

  def signsSqlDuck(mask: Int, dim: Int = DefaultDim): String =
    signs(mask, dim).map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  def signedDotSqlDuck(vExpr: String, mask: Int, dim: Int = DefaultDim): String =
    s"list_dot_product($vExpr, ${signsSqlDuck(mask, dim)})"

  def bucketSqlDuck(vExpr: String, bits: Int, dim: Int = DefaultDim): String =
    masks(bits).zipWithIndex.map { case (m, b) =>
      s"(CASE WHEN ${signedDotSqlDuck(vExpr, m, dim)} > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)") // disjoint bits, so + == OR;
    // cast because the Spark side is LongType and the compare is dtype-aware

  def bandSqlDuck(vExpr: String, nBands: Int, rBits: Int, band: Int,
      dim: Int = DefaultDim): String = {
    val ms = masks(nBands * rBits).slice(band * rBits, (band + 1) * rBits)
    ms.zipWithIndex.map { case (m, b) =>
      s"(CASE WHEN ${signedDotSqlDuck(vExpr, m, dim)} > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")
  }
}
