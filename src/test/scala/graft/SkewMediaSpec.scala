package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.functions.MultimodalOps

class SkewMediaSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin matches the plain join result") {
    val left = (0 until 1000).map(i => (if (i < 900) 1L else i.toLong, i)).toDF("k", "v")
    val right = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).count()
    val salted = Skew.saltedEquiJoin(left, right, "k", saltFactor = 4).count()
    assert(salted == plain)
    assert(salted == 901)
  }

  test("bucketed tables join without a shuffle exchange") {
    Seq("graft_buck_a", "graft_buck_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val a = (0 until 100).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (0 until 100).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    Skew.writeBucketed(a, "graft_buck_a", "k", 4)
    Skew.writeBucketed(b, "graft_buck_b", "k", 4)
    val joined = spark.table("graft_buck_a").join(spark.table("graft_buck_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(joined.count() == 100)
    // Co-located: no Exchange between the bucketed scans and the join.
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("AQE splits a skewed join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // One hot key carrying nearly all the bytes; payload must stay
      // incompressible or the shuffle bytes drop under the skew threshold.
      val rng = new scala.util.Random(7)
      val left = (0 until 40000).map(i =>
        (if (i % 20 != 0) 1L else i.toLong, rng.alphanumeric.take(120).mkString))
        .toDF("k", "payload")
      val right = (0 until 2000).map(i => (i.toLong, s"r$i")).toDF("k", "name")
      val joined = left.join(right, "k")
      joined.collect() // execute THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected a skew-split join:\n${plan.take(3000)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("skewSafeDistinctCount equals countDistinct under heavy key skew") {
    // 9000 rows on one hot key (900 distinct values), 100 singletons.
    val rows = (0 until 9000).map(i => ("hot", (i % 900).toLong)) ++
      (0 until 100).map(i => (s"k$i", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val safe = Skew.skewSafeDistinctCount(df, Seq("k"), "v", "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = df.groupBy("k").agg(countDistinct($"v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(safe == naive)
    assert(safe("hot") == 900L)
  }

  test("skewSafeDistinctCount's first exchange hashes on (key, value)") {
    val df = (0 until 100).map(i => ("k", i.toLong)).toDF("k", "v")
    val plan = Skew.skewSafeDistinctCount(df, Seq("k"), "v", "n")
      .queryExecution.executedPlan.toString
    // The distinct stage must partition on BOTH columns — that is the
    // whole point of the rewrite (no hot-key reducer).
    assert(plan.contains("hashpartitioning(k") && plan.contains("v#"),
      s"expected a (k, v) exchange in:\n$plan")
  }

  test("resolveMediaRefs handles base64 and file refs on executors") {
    val tmp = java.nio.file.Files.createTempFile("graftimg", ".bin")
    java.nio.file.Files.write(tmp, "IMAGEBYTES".getBytes("UTF-8"))
    val b64 = java.util.Base64.getEncoder.encodeToString("INLINE".getBytes("UTF-8"))
    val df = Seq(
      (1L, s"file://$tmp"),
      (2L, s"base64:$b64"),
      (3L, "not-a-ref-\u0000")).toDF("id", "ref")
    val out = MultimodalOps.resolveMediaRefs(df, "ref")
    val m = out.select("id", "media_bytes_raw").as[(Long, Array[Byte])].collect().toMap
    assert(new String(m(1L), "UTF-8") == "IMAGEBYTES")
    assert(new String(m(2L), "UTF-8") == "INLINE")
    assert(m(3L).isEmpty) // unresolvable → empty, never a task failure
  }
}
