package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: stage-level timing of the minhash dedup pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingle explode + 64 min-aggs") {
      val ex = d.select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
        .withColumn("sh64", xxhash64(col("s")))
      val aggs = (0 until 64).map(i => min(xxhash64(col("sh64"), lit(i))).as(s"h$i"))
      ex.groupBy("id").agg(aggs.head, aggs.tail: _*).count()
    }
    time("candidates (bucket join)") {
      Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5).count()
    }
    time("full dedup (pairs + CC + anti-join)") {
      Dedup.dropDuplicatesByPairs(d, "doc_id",
        Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5)).count()
    }
    time("simhash pairs") {
      Dedup.simhashPairs(d, "text", "doc_id", maxDist = 3).count()
    }
    time("simhash full dedup") {
      Dedup.dropDuplicatesByPairs(d, "doc_id",
        Dedup.simhashPairs(d, "text", "doc_id", maxDist = 3)).count()
    }
    spark.stop()
  }
}
