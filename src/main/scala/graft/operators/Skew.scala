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
