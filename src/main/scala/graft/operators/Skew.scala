package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and layout utilities for large joins.
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when a handful of hot keys dominate (e.g. a null-ish
  * default key holding 10% of 100 TB): the skewed side gets a random salt in
  * [0, n), the other side is exploded n×, and the join key becomes
  * (key, salt) — hot keys spread over n reducers.
  */
object Skew {

  /** Equi-join `left` (skewed) with `right` on `key`, salting `saltFactor`
    * ways. Correct for inner joins; `right` must be the smaller side (it is
    * replicated saltFactor×).
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner", "saltedEquiJoin supports inner joins")
    val salted = left.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-safe `COUNT(DISTINCT value)` per key: the two-shuffle rewrite.
    *
    * The naive `groupBy(keys).agg(countDistinct(value))` plan keeps the
    * distinct set per key, so every (key, value) pair of a hot key lands on
    * that key's single reducer — a key holding 10% of 100 TB puts 10 TB of
    * pairs on one task, and no map-side partial can shrink a distinct set
    * it can't see whole. Rewritten as `distinct(keys, value)` →
    * `groupBy(keys).count()`, the FIRST shuffle hashes on (key, value) —
    * uniform whenever values vary, no hot reducer — and the SECOND carries
    * only map-side partial counts (one row per key per map task), so the
    * hot key's reducer sums a few thousand longs instead of holding 10 TB.
    * Same two-exchange budget AQE can't fix for the naive form (AQE splits
    * skewed JOIN partitions, not skewed aggregate state).
    */
  def skewSafeDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
      alias: String = "n_distinct"): DataFrame =
    df.select((keys :+ valueCol).map(col): _*).distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(alias))

  /** Write a DataFrame as a bucketed, sorted table: repeated equi-joins on
    * `key` against tables bucketed the same way need no exchange (co-located
    * join) — the layout lever for join-heavy pipelines at scale.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
