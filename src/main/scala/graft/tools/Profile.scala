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
    val only = sys.env.get("SPARK_GRAFT_PROFILE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def time[T](label: String)(f: => T): Unit =
      if (only.forall(_.exists(label.startsWith))) {
        val t0 = System.nanoTime(); f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("shingle explode + 64 min-aggs") {
      val ex = d.select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
        .withColumn("sh64", xxhash64(col("s")))
      val aggs = (0 until 64).map(i => min(xxhash64(col("sh64"), lit(i))).as(s"h$i"))
      ex.groupBy("id").agg(aggs.head, aggs.tail: _*).count()
    }
    time("verified pairs (collapsed)") {
      Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5).count()
    }
    time("CC only (given pairs)") {
      val pairs = Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5)
        .transform(graft.core.Persist.stage(_))
      pairs.count()
      val t0 = System.nanoTime()
      Dedup.keepAfterConnectedComponents(
        d.select(col("doc_id").cast("long").as("id")), pairs).count()
      println(f"  (cc after materialized pairs: ${(System.nanoTime()-t0)/1e9}%.2f s)")
    }
    time("full dedup (pairs + CC + anti-join)") {
      Dedup.dropDuplicatesByPairs(d, "doc_id",
        Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5)).count()
    }
    time("neardup: window+collapse") {
      import org.apache.spark.sql.expressions.Window
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumnRenamed("embedding", "__vec_emb")
      val w = Window.partitionBy("__fp")
      val marked = e.select(col("vec_id").cast("long").as("id"),
          col("__vec_emb").as("vec"))
        .withColumn("__fp", xxhash64(col("vec")))
        .withColumn("__rep", min(col("id")).over(w))
      println(s"  marked=${marked.count()}")
      val base = marked.filter(col("id") === col("__rep")).select("id", "vec")
      println(s"  distinct=${base.count()}")
    }
    time("neardup: full route") {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumnRenamed("embedding", "__vec_emb")
      val n = graft.operators.EmbedOps.neardupPairs(e, "__vec_emb".stripPrefix("__vec_"), "vec_id",
        threshold = 0.45).count()
      println(s"  pairs=$n")
    }
    time("simhash signature only") {
      d.select(graft.functions.MinHashExpr.simhash64(
        split(lower(trim(col("text"))), "\\s+")).as("h")).count()
    }
    time("simhash candidate count") {
      val h = d.select(col("doc_id").cast("long").as("id"),
          graft.functions.MinHashExpr.simhash64(
            split(lower(trim(col("text"))), "\\s+")).as("h"))
        .withColumn("chunk", explode(array((0 until 4).map(i =>
          struct(lit(i).as("i"),
            shiftright(col("h"), i * 16).bitwiseAND(0xFFFFL).as("v"))): _*)))
      h.cache(); h.count()
      val a = h.toDF("id1", "h1", "c1")
      val b = h.toDF("id2", "h2", "c2")
      val n = a.join(b, col("c1") === col("c2") && col("id1") < col("id2")).count()
      println(s"  candidates(pre-dedup)=$n")
      h.unpersist()
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
