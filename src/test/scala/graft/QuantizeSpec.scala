package graft

import org.apache.spark.sql.functions._
import graft.embed.{IvfIndex, Quantize}
import graft.operators.EmbedOps

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val rows = for (i <- 0 until 120) yield {
      val g = i % 8
      val v = Array.tabulate(16) { d =>
        val base = if (d == g) 1.0f else 0.0f
        base + 0.01f * (((i * 31 + d * 7) % 11) - 5)
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("id", EmbedOps.vecCol("emb"))
  }

  test("sq8 reconstruction error is bounded by scale/2 per component") {
    val v = col(EmbedOps.vecCol("emb"))
    val q = vecs
      .withColumn("scale", Quantize.sq8Scale(v))
      .withColumn("codes", Quantize.sq8Codes(v, col("scale")))
      .withColumn("dq", Quantize.sq8Dequant(col("codes"), col("scale")))
      .withColumn("maxErr", array_max(zip_with(v, col("dq"),
        (a, b) => abs(a.cast("double") - b))))
      .select(max(col("maxErr") / col("scale"))).as[Double].head()
    assert(q <= 0.5 + 1e-9, s"max |v - dq|/scale = $q")
  }

  test("codes stay in the int8 range and all-zero vectors survive") {
    val zero = Seq((999L, Seq.fill(16)(0.0f))).toDF("id", EmbedOps.vecCol("emb"))
    val v = col(EmbedOps.vecCol("emb"))
    val df = vecs.union(zero)
      .withColumn("scale", Quantize.sq8Scale(v))
      .withColumn("codes", Quantize.sq8Codes(v, col("scale")))
    val bounds = df.select(
      array_min(col("codes")).cast("int"), array_max(col("codes")).cast("int"))
      .as[(Int, Int)].collect()
    assert(bounds.forall { case (lo, hi) => lo >= -127 && hi <= 127 })
    val zeroCodes = df.filter($"id" === 999L)
      .select(array_max(transform(col("codes"), c => abs(c.cast("int"))))).as[Int].head()
    assert(zeroCodes == 0)
  }

  /** Driver-side reference of the exact quantized math (scale = max|v|/127,
    * HALF_UP integer codes, dequantized double cosine, ties → lowest id):
    * the spec the Spark path and the DuckDB oracle must both reproduce.
    */
  private def sq8RefTopK(rows: Seq[(Long, Seq[Float])], qv: Seq[Float], k: Int): Seq[Long] = {
    val q = qv.map(_.toDouble)
    def halfUp(x: Double): Double =
      if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)
    def cos(a: Seq[Double]): Double = {
      val dot = a.lazyZip(q).map(_ * _).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(q.map(x => x * x).sum)
      dot / (na * nb)
    }
    rows.map { case (id, v) =>
      val scale = math.max(v.map(x => math.abs(x.toDouble)).max / 127.0, 1e-30)
      (id, cos(v.map(x => halfUp(x.toDouble / scale) * scale)))
    }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
  }

  test("quantized brute-force top-k matches the driver-side quantized reference") {
    val rows = vecs.as[(Long, Seq[Float])].collect().toSeq
    val qv = rows.find(_._1 == 3L).get._2
    val quantized = Quantize.quantize(vecs, "emb")
    val sq = Quantize.searchQuantized(quantized, "emb", qv, k = 10,
      tieBreak = Seq(col("id"))).select("id").as[Long].collect()
    assert(sq.toSeq == sq8RefTopK(rows, qv, 10))
    // And the quantized ranking stays close to the float-exact one: int8
    // error is ~0.4% of max|v| per component, so recall@10 is high even on
    // jittered near-ties.
    val exact = EmbedOps.semSearchVec(vecs, "emb", qv, 10, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    val recall = sq.toSet.intersect(exact.toSet).size.toDouble / exact.length
    assert(recall >= 0.8, s"recall vs exact $recall")
  }

  test("IVF-SQ8 save/load/search: pruned probe scan on codes, full probe exact") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 4, seed = 7)
    val path = java.nio.file.Files.createTempDirectory("ivf_sq8").toString
    IvfIndex.save(indexed, model, "emb", "id", path, sq8 = true)
    val (loaded, lModel) = IvfIndex.load(spark, path)
    assert(loaded.columns.contains(Quantize.codesCol("emb")))
    assert(!loaded.columns.contains(EmbedOps.vecCol("emb")))

    val qv = vecs.filter($"id" === 5).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val q = IvfIndex.search(loaded, lModel, "emb", qv, k = 5, nProbe = 1,
      tieBreak = Seq(col("id")))
    // The probe filter must still prune partitions — quantization changes the
    // payload, not the layout.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(IvfIndex.cellCol),
      s"expected partition filter on ${IvfIndex.cellCol} in:\n$plan")
    assert(q.count() == 5)

    // Full probe = quantized brute force: must match the driver-side
    // reference of the quantized math exactly (nProbe = nCells scans all).
    val rows = vecs.as[(Long, Seq[Float])].collect().toSeq
    val full = IvfIndex.search(loaded, lModel, "emb", qv, k = 10, nProbe = 4,
      tieBreak = Seq(col("id"))).select("id").as[Long].collect()
    assert(full.toSeq == sq8RefTopK(rows, qv, 10))
  }
}
