package graft

import org.apache.spark.sql.functions._
import graft.embed.{IvfIndex, PqModel, ProductQuantizer => PQ}
import graft.operators.EmbedOps

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 160 synthetic 16-dim vectors in 8 well-separated directional clusters
  // (IvfSpec's construction) — PQ codebooks should capture the cluster
  // structure per subspace.
  private def vecs = {
    val rows = for (i <- 0 until 160) yield {
      val g = i % 8
      val v = Array.tabulate(16) { d =>
        val base = if (d == g) 1.0f else 0.0f
        base + 0.01f * (((i * 31 + d * 7) % 11) - 5)
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("id", EmbedOps.vecCol("emb"))
  }

  test("fit is deterministic and shapes the codebooks (m x ksub x dsub)") {
    val a = PQ.fit(vecs, "emb", m = 4, ksub = 8, seed = 7)
    val b = PQ.fit(vecs.orderBy(rand(99)), "emb", m = 4, ksub = 8, seed = 7)
    assert(a.m == 4 && a.ksub == 8 && a.dsub == 4 && a.dim == 16)
    // Pure function of the vector multiset: input order must not matter.
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)
  }

  test("encode emits m codes in [0, ksub); reconstruction error is small on clustered data") {
    val model = PQ.fit(vecs, "emb", m = 4, ksub = 8, seed = 7)
    val q = PQ.quantize(vecs, "emb", model)
    val codes = q.select(PQ.codesCol("emb")).as[Seq[Short]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    // Relative reconstruction error well under the cluster separation.
    val err = PQ.quantize(vecs, "emb", model)
      .join(vecs, "id")
      .select(EmbedOps.cosineSim(
        PQ.reconstructExpr(col(PQ.codesCol("emb")), model),
        col(EmbedOps.vecCol("emb"))).as("cos"))
      .agg(min("cos")).as[Double].head()
    assert(err > 0.95, s"min reconstruction cosine $err")
  }

  test("ADC lookup kernel equals the reconstruction cosine to 1e-9") {
    val model = PQ.fit(vecs, "emb", m = 4, ksub = 8, seed = 7)
    val q = PQ.quantize(vecs, "emb", model)
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val diff = q.select(abs(
        PQ.adcCosineToQuery(col(PQ.codesCol("emb")), model, qv) -
        PQ.reconstructCosineToQuery(col(PQ.codesCol("emb")), model, qv)).as("d"))
      .agg(max("d")).as[Double].head()
    assert(diff < 1e-9, s"ADC vs reconstruction drift $diff")
  }

  test("quantized search recalls the exact top-k on clustered data") {
    val model = PQ.fit(vecs, "emb", m = 4, ksub = 8, seed = 7)
    val q = PQ.quantize(vecs, "emb", model)
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val pq = PQ.search(q, "emb", model, qv, k = 10, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    val exact = EmbedOps.semSearchVec(vecs, "emb", qv, 10, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    val recall = pq.toSet.intersect(exact.toSet).size.toDouble / exact.length
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF-PQ save/load round-trips codes, codebooks, and coarse centroids; probes prune") {
    val (indexed, ivf) = IvfIndex.build(vecs, "emb", nCells = 4, seed = 7)
    val model = PQ.fit(indexed, "emb", m = 4, ksub = 8, seed = 7)
    val quantized = PQ.quantize(indexed, "emb", model)
    val path = java.nio.file.Files.createTempDirectory("pq").toString
    PQ.save(quantized, model, Some(ivf), "emb", "id", path)
    indexed.unpersist()
    val (loaded, lModel, lIvf) = PQ.load(spark, path)
    assert(loaded.count() == 160)
    assert(lModel.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq)
    assert(lIvf.isDefined && lIvf.get.centroids.zip(ivf.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    // Partition pruning: an nProbe=1 search must read fewer rows than the corpus.
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val probed = PQ.search(loaded, "emb", lModel, qv, k = 10,
      ivf = lIvf, nProbe = 1, tieBreak = Seq(col("id")))
    assert(probed.count() <= 10)
    // The pruned scan equals the exhaustive-probe scan restricted to that cell.
    val full = PQ.search(loaded, "emb", lModel, qv, k = 10,
      ivf = lIvf, nProbe = 4, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    assert(full.length == 10)
    // The probe filter must reach the parquet scan as a partition filter —
    // unprobed cells' code files are never opened (the IVF-PQ 100 TB path).
    val plan = PQ.search(loaded, "emb", lModel, qv, k = 10,
      ivf = lIvf, nProbe = 1, tieBreak = Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(IvfIndex.cellCol),
      s"expected partition filter on ${IvfIndex.cellCol} in:\n$plan")
  }

  test("dimension mismatch fails loudly in ADC") {
    val model = PQ.fit(vecs, "emb", m = 4, ksub = 8, seed = 7)
    intercept[IllegalArgumentException] {
      PQ.adcCosineToQuery(col("x"), model, Seq.fill(8)(0.1f))
    }
  }

  test("non-divisible subspace count fails loudly in fit") {
    intercept[IllegalArgumentException] {
      PQ.fit(vecs, "emb", m = 5, ksub = 8, seed = 7)
    }
  }
}
