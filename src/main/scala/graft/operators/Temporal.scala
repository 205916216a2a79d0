package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch temporal operators over event tables: sessionization and as-of
  * joins. Spark ships neither as a primitive; both are re-expressed here in
  * the single-shuffle window form that scales (the alternative — a range
  * theta-join — explodes to |L|×|R| candidate pairs and cannot survive a
  * 100 TB event log).
  *
  * The streaming counterparts (gap sessionization over
  * `mapGroupsWithState`) live in [[graft.streaming.StreamingOps]]; these are
  * the batch/backfill versions of the same semantics.
  */
object Temporal {

  /** Gap-based sessionization: within each `keyCol` partition ordered by
    * (`tsCol`, tie-breakers), a new session starts when the gap from the
    * previous event exceeds `maxGap` (same unit as `tsCol`). Session ids
    * are 0-based per key. One shuffle on the key; two windows over the same
    * ordering collapse into a single sort.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, maxGap: Long,
      tieBreak: Seq[Column] = Nil, sessionCol: String = "session_id"): DataFrame = {
    val order = col(tsCol) +: tieBreak
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapBreak = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(w) > maxGap, 1L).otherwise(0L)
    df.withColumn(sessionCol, sum(gapBreak).over(wRun) - 1L)
  }

  /** Floor division as a column (Spark's `div` truncates toward zero, which
    * mis-buckets negative domains; this matches Math.floorDiv).
    */
  private def floorDiv(a: Column, b: Long): Column = {
    val q = a.divide(lit(b)).cast("long") // truncated quotient
    when(a % b =!= 0 && a < 0, q - 1L).otherwise(q)
  }

  /** Pure range (interval-containment) join — points × the intervals that
    * contain them, with NO equality key (or an optional one via `keys`).
    * The naive theta join is a nested-loop cross product — |L|×|R| pair
    * candidates cannot survive a 100 TB event log — so this bucketizes the
    * domain by `bucketWidth`: each point lands in exactly one bucket, each
    * interval explodes to the buckets it touches, the join becomes a plain
    * equi-join shuffle on (keys…, bucket), and exact containment filters
    * after. Pick `bucketWidth` on the order of the typical interval length
    * (≈1–2 buckets per interval); an interval wider than
    * `maxBucketsPerInterval` buckets raises instead of silently exploding.
    * Bounds are inclusive on both ends; each qualifying pair emerges
    * exactly once (one bucket per point). Point/interval column names must
    * not collide (except `keys`, which join).
    */
  def rangeJoin(points: DataFrame, ptCol: String, intervals: DataFrame,
      startCol: String, endCol: String, bucketWidth: Long,
      keys: Seq[String] = Nil, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    val pb = points.withColumn("__bucket", floorDiv(col(ptCol), bucketWidth))
    val b0 = floorDiv(col(startCol), bucketWidth)
    val b1 = floorDiv(col(endCol), bucketWidth)
    val guarded = when(b1 - b0 >= maxBucketsPerInterval,
      raise_error(concat(
        lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval " +
          s"buckets of width $bucketWidth ([" ), col(startCol).cast("string"),
        lit(", "), col(endCol).cast("string"),
        lit("]) — widen bucketWidth or split the interval"))))
      .otherwise(sequence(b0, b1))
    val ib = intervals.withColumn("__bucket", explode(guarded))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Observed bucket-occupancy of a prospective [[rangeJoin]] configuration.
    * `candidatePairs` is the exact number of (point, interval) pairs the
    * bucketized equi-join materializes BEFORE the containment filter — the
    * operator's true cost. A too-SMALL `bucketWidth` trips the loud
    * `maxBucketsPerInterval` guard; a too-LARGE one fails nothing but
    * silently degrades toward a within-bucket cross join, which is exactly
    * what these numbers surface: `candidatePairs` approaching
    * points × intervals (with everything in one bucket) means the width is
    * orders of magnitude too wide.
    */
  final case class RangeJoinStats(points: Long, intervals: Long,
      pointBuckets: Long, intervalBuckets: Long,
      maxPointsPerBucket: Long, maxIntervalsPerBucket: Long,
      candidatePairs: Long) {
    /** Fraction of the all-pairs cross join the bucketing actually avoids —
      * 0.0 is a perfect prune, 1.0 is a degenerate width doing |L|×|R| work.
      */
    def crossJoinFraction: Double =
      if (points == 0 || intervals == 0) 0.0
      else candidatePairs.toDouble / (points.toDouble * intervals.toDouble)
    def describe: String =
      f"rangeJoin occupancy: $points points over $pointBuckets buckets " +
        f"(max $maxPointsPerBucket/bucket), $intervals intervals over " +
        f"$intervalBuckets buckets (max $maxIntervalsPerBucket/bucket); " +
        f"$candidatePairs candidate pairs = ${crossJoinFraction * 100}%.2f%% " +
        "of the cross join" +
        (if (crossJoinFraction > 0.5)
          " — bucketWidth is far wider than the data spread; shrink it toward the typical interval length"
        else "")
  }

  /** One-pass occupancy report for a [[rangeJoin]] configuration (two
    * narrow histogram aggregates + a bucket-keyed join of the two
    * histograms — never the candidate pairs themselves, so it is safe to
    * run at full scale BEFORE committing to a width). Same bucket mapping
    * and interval guard as the join it diagnoses.
    */
  def rangeJoinDiagnostics(points: DataFrame, ptCol: String, intervals: DataFrame,
      startCol: String, endCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): RangeJoinStats = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    val ph = points.groupBy(floorDiv(col(ptCol), bucketWidth).as("__bucket"))
      .agg(count(lit(1)).as("__np"))
    val b0 = floorDiv(col(startCol), bucketWidth)
    val b1 = floorDiv(col(endCol), bucketWidth)
    val guarded = when(b1 - b0 >= maxBucketsPerInterval,
      raise_error(lit(s"rangeJoinDiagnostics: interval spans more than " +
        s"$maxBucketsPerInterval buckets of width $bucketWidth")))
      .otherwise(sequence(b0, b1))
    val ih = intervals.withColumn("__bucket", explode(guarded))
      .groupBy("__bucket").agg(count(lit(1)).as("__ni"))
    val joined = ph.join(ih, Seq("__bucket"), "full_outer")
      .agg(
        sum(coalesce(col("__np"), lit(0L)) * coalesce(col("__ni"), lit(0L))).as("pairs"),
        count(when(col("__np").isNotNull, 1)).as("pb"),
        count(when(col("__ni").isNotNull, 1)).as("ib"),
        max(coalesce(col("__np"), lit(0L))).as("mp"),
        max(coalesce(col("__ni"), lit(0L))).as("mi"))
      .head()
    RangeJoinStats(
      points = points.count(), intervals = intervals.count(),
      pointBuckets = joined.getLong(1), intervalBuckets = joined.getLong(2),
      maxPointsPerBucket = joined.getLong(3),
      maxIntervalsPerBucket = joined.getLong(4),
      candidatePairs = if (joined.isNullAt(0)) 0L else joined.getLong(0))
  }

  /** As-of join with pandas-`merge_asof` semantics: for every left row,
    * the single nearest right row on the same `keys` (left join: unmatched
    * lefts keep nulls). Right columns `rightCols` arrive suffixed.
    *
    *  - `direction = "backward"` (default): most recent right with
    *    `rts <= lts` — ANSI ASOF.
    *  - `"forward"`: earliest right with `rts >= lts`.
    *  - `"nearest"`: whichever of the two is closer by |lts − rts|;
    *    equal distances prefer backward (deterministic).
    *  - `tolerance`: discard a match farther than this from the left ts
    *    (requires a numeric ts column — derive epoch micros first;
    *    "nearest" needs the same arithmetic).
    *
    * Physical shape — the union-window trick: tag both inputs, union them,
    * and per key take the running "last right payload seen" in
    * (ts, tag) order (right sorts before left on equal ts, so same-instant
    * rights match both directions). ONE shuffle on the join keys — no
    * range cross product, no per-left probe; "nearest" adds a second SORT
    * over the same exchange (descending pass), never a second shuffle.
    * Skew behaves like any window over the same key.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightCols: Seq[String], suffix: String = "_asof",
      direction: String = "backward", tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoin direction must be backward|forward|nearest, got '$direction'")
    if (tolerance.isDefined || direction == "nearest") {
      val dt = left.schema(tsCol).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"asofJoin tolerance/nearest needs a numeric ts column (epoch micros), " +
          s"got $dt — derive one with unix_micros() first")
      tolerance.foreach(t => require(t >= 0, s"negative tolerance $t"))
    }
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(col): _*).as("__l")
    val rStruct = struct(rightCols.map(col): _*).as("__r")
    val keyCols = keys.map(col)
    val nullL = lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType)
    val nullR = lit(null).cast(right.select(struct(rightCols.map(col): _*)).schema.head.dataType)

    val l2 = left.select(keyCols :+ col(tsCol).as("__ts") :+ lit(1).as("__tag") :+
      lStruct :+ nullR.as("__r"): _*)
    val r2 = right.select(keyCols :+ col(tsCol).as("__ts") :+ lit(0).as("__tag") :+
      nullL.as("__l") :+ rStruct: _*)
    val unioned = l2.unionByName(r2)

    def running(w: org.apache.spark.sql.expressions.WindowSpec) = (
      last(col("__r"), ignoreNulls = true).over(w),
      last(when(col("__tag") === 0, col("__ts")), ignoreNulls = true).over(w))
    val wB = Window.partitionBy(keyCols: _*).orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols: _*).orderBy(col("__ts").desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Null a candidate out past the tolerance; dist is ≥ 0 by construction.
    def gated(rm: Column, rts: Column): Column = tolerance match {
      case Some(t) => when(rts.isNotNull &&
        abs(col("__ts") - rts) <= t, rm)
      case None => rm
    }
    val (rmB, rtsB) = running(wB)
    val (rmF, rtsF) = running(wF)
    val matched = (direction match {
      case "backward" => unioned.withColumn("__rm", gated(rmB, rtsB))
      case "forward" => unioned.withColumn("__rm", gated(rmF, rtsF))
      case "nearest" =>
        unioned
          .withColumn("__rmb", gated(rmB, rtsB)).withColumn("__rtb", rtsB)
          .withColumn("__rmf", gated(rmF, rtsF)).withColumn("__rtf", rtsF)
          .withColumn("__rm",
            when(col("__rmb").isNull, col("__rmf"))
              .when(col("__rmf").isNull, col("__rmb"))
              .when(col("__rtf") - col("__ts") < col("__ts") - col("__rtb"),
                col("__rmf"))
              .otherwise(col("__rmb"))) // ties and backward-closer
    }).filter(col("__tag") === 1)
    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      rightCols.map(c => col("__rm").getField(c).as(c + suffix))
    matched.select(out: _*)
  }
}
