package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Schema tripwire for the driver's gate tables.
  *
  * Round 7 shipped six crashing queries because `events.ts` silently changed
  * from int64 epoch-nanos to TIMESTAMP_NTZ under the repo and the failure
  * surfaced as six scattered runtime errors instead of one named cause.
  * This pins the expected schema of every table the oracle gates read, so
  * the next drift fails as "events.ts: expected timestamp_ntz, got bigint"
  * — once, up front, in both the spec suite and the Verify preamble.
  */
object GateTables {

  val expected: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Column-level diff (nullability ignored — parquet round-trips it
    * unreliably and no gate depends on it). Pure, so the spec can pin the
    * message shape without touching the filesystem.
    */
  private[graft] def diffSchema(table: String, exp: StructType,
      actual: StructType): Seq[String] = {
    val act = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = exp.fields.filterNot(f => act.contains(f.name))
      .map(f => s"$table.${f.name}: expected ${f.dataType.simpleString}, MISSING")
    val extra = actual.fields.filterNot(f => exp.fieldNames.contains(f.name))
      .map(f => s"$table.${f.name}: UNEXPECTED column of ${f.dataType.simpleString}")
    val changed = exp.fields.flatMap { f =>
      act.get(f.name).filter(_ != f.dataType).map(dt =>
        s"$table.${f.name}: expected ${f.dataType.simpleString}, got ${dt.simpleString}")
    }
    (missing ++ changed ++ extra).toSeq
  }

  /** Drift report over every gate table under `dir` — empty when all 10
    * match. An unreadable table reports as one line rather than throwing, so
    * a Verify preamble sees every problem at once.
    */
  def drift(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, exp) =>
      try diffSchema(table, exp, spark.read.parquet(s"$dir/$table.parquet").schema)
      catch {
        case e: Exception => Seq(s"$table: unreadable (${e.getMessage})")
      }
    }
}
