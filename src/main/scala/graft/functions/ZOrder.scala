package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering values for multi-dimensional data layout.
  *
  * Sorting a 100 TB corpus by ONE column makes parquet row-group min/max
  * stats prune range predicates on that column and nothing else; a query
  * that also filters a second dimension scans everything. Interleaving the
  * bits of several linearly-quantized columns produces a single sort key
  * whose consecutive runs are small HYPER-RECTANGLES of the original space —
  * every interleaved column gets tight per-file/row-group stats, so
  * multi-dimensional range predicates prune (the layout behind
  * Delta/Iceberg's OPTIMIZE ZORDER, built here from plain codegen'd
  * column expressions — no UDF, no shuffle beyond the caller's own sort).
  *
  * Quantization is linear min/max (one narrow aggregate for the bounds,
  * computed once on the driver) — deterministic and exactly reproducible in
  * SQL, unlike quantile-based binning. Skewed columns trade some balance
  * for that determinism; at `bits`=12 a 4096-way grid keeps even heavy skew
  * separable.
  */
object ZOrder {

  /** Linear quantization of `c` into `[0, 2^bits)` given closed bounds
    * `[mn, mx]` (doubles, driver-computed). Nulls and a degenerate range
    * (mx <= mn) map to bucket 0; out-of-range values clamp.
    */
  def quantize(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"quantize: bits $bits out of [1,31]")
    val levels = (1L << bits) - 1
    if (mx <= mn) lit(0L)
    else least(lit(levels), greatest(lit(0L),
      floor((coalesce(c.cast("double"), lit(mn)) - mn) / (mx - mn) * levels)
        .cast("long")))
  }

  /** Bit-interleave already-quantized columns (each in `[0, 2^bits)`):
    * output bit `b*n + i` is bit `b` of column `i`. A pure OR-fold of
    * shift/mask terms — whole-stage codegen keeps it branch-free.
    */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty, "interleave: no columns")
    require(bits * qs.size <= 63,
      s"interleave: $bits bits × ${qs.size} columns exceeds a signed 64-bit key")
    val n = qs.size
    val terms =
      for (b <- 0 until bits; i <- 0 until n)
        yield shiftleft(shiftright(qs(i), b).bitwiseAND(1L), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Append a z-value column over `cols` (numeric; bounds from ONE narrow
    * min/max aggregate). The caller sorts or range-partitions by `outCol`
    * and drops it before writing.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 12,
      outCol: String = "__z"): DataFrame = {
    require(cols.nonEmpty, "withZValue: no columns")
    val bounds = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        .head, cols.flatMap(c =>
        Seq(min(col(c).cast("double")), max(col(c).cast("double")))).tail: _*)
      .head()
    val qs = cols.zipWithIndex.map { case (c, i) =>
      val mn = if (bounds.isNullAt(2 * i)) 0.0 else bounds.getDouble(2 * i)
      val mx = if (bounds.isNullAt(2 * i + 1)) 0.0 else bounds.getDouble(2 * i + 1)
      quantize(col(c), mn, mx, bits)
    }
    df.withColumn(outCol, interleave(qs, bits))
  }
}
