package graft

import org.apache.spark.sql.functions._
import graft.embed.IvfIndex
import graft.operators.EmbedOps

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // Tallies how many texts reach the embedder — local[*] tasks share the
  // JVM, so the companion counter observes executor-side calls.
  private def countingEmbedder(dim: Int) = CountingEmbedder(dim)

  // 120 synthetic vectors in 8 well-separated directional clusters: cluster g
  // points mostly along axis g with small deterministic jitter.
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

  test("build assigns every row a cell in [0, nCells)") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    assert(model.nCells == 8)
    val cells = indexed.select(IvfIndex.cellCol).as[Int].collect()
    assert(cells.length == 120)
    assert(cells.forall(c => c >= 0 && c < 8))
  }

  test("recommendProbesForFetch picks a PARTIAL tier on clustered data " +
      "and hardNegativesIvf's auto route reproduces the exhaustive " +
      "mining with full over-fetch delivery") {
    val labeled = vecs.withColumn("label", col("id") % 3)
    val (indexed, model) = IvfIndex.build(labeled, "emb", nCells = 8, seed = 7)
    val anchors = labeled.filter(col("id") < 6)
    // Each anchor's exact top-10 lives inside its own directional
    // cluster — one probed cell recovers it, so the cheapest tier
    // meeting targetRecall = 1.0 must be strictly partial.
    val (probes, recall) = EmbedOps.recommendProbesForFetch(
      indexed, model, "emb", anchors, "id", nFetch = 10, targetRecall = 1.0)
    assert(probes < model.nCells, s"expected a partial tier, got $probes")
    assert(recall == 1.0, s"measured recall $recall")
    def mine(np: Int) = EmbedOps.hardNegativesIvf(
        anchors, indexed, model, "emb", "id", "label",
        k = 3, nFetch = 10, nProbe = np, targetRecall = 1.0)
      .select("anchor_id", "neg_id", "neg_label")
      .as[(Long, Long, Long)].collect().toSet
    val auto = mine(0) // nProbe = 0 → the recommended tier
    assert(auto == mine(model.nCells),
      "auto tier diverged from exhaustive mining")
    // Over-fetch sufficiency at the recommended tier: every anchor
    // receives its full k negatives.
    val perAnchor = auto.groupBy(_._1).view.mapValues(_.size).toMap
    assert((0L until 6L).forall(perAnchor.get(_).contains(3)), perAnchor)
    auto.foreach { case (a, _, nl) => assert(nl != a % 3) }
  }

  test("recommendProbesForFetch falls through LOUDLY to the exhaustive " +
      "tier when no partial tier meets the target, and recallReport " +
      "still tunes quantized (SQ8) indexes") {
    val labeled = vecs.withColumn("label", col("id") % 3)
    val (indexed, model) = IvfIndex.build(labeled, "emb", nCells = 8, seed = 7)
    // nFetch = 120 spans EVERY cluster, so no partial tier can reach
    // recall 1.0 — the pick must land on the exhaustive tier (and it is
    // the warned branch, not a silent find over a trivially-1.0 row).
    val (probes, recall) = EmbedOps.recommendProbesForFetch(
      indexed, model, "emb", labeled.filter(col("id") < 4), "id",
      nFetch = 120, targetRecall = 1.0)
    assert(probes == model.nCells, s"expected exhaustive, got $probes")
    assert(recall == 1.0)
    // SQ8 path: a loaded codes+scale index (no raw vector column) tunes
    // through the per-query pruned-search form instead of refusing.
    val path = java.nio.file.Files.createTempDirectory("graft_sq8_rr")
      .toString + "/idx"
    IvfIndex.save(indexed, model, "emb", "id", path, sq8 = true)
    val (loaded, lModel) = IvfIndex.load(spark, path)
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb"))
      .as[Seq[Float]].head()
    val rep = IvfIndex.recallReport(loaded, lModel, "emb",
        Seq((3L, qv)), k = 10, nProbes = Seq(1, 8), idCol = "id")
      .orderBy("n_probe")
      .select("n_probe", "recall").as[(Int, Double)].collect()
    assert(rep.last == ((8, 1.0)), rep.toSeq.toString)
    assert(rep.head._2 >= 0.0 && rep.head._2 <= 1.0)
  }

  test("search with nProbe = nCells equals exact brute-force top-k") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val ivf = IvfIndex.search(indexed, model, "emb", qv, k = 10, nProbe = 8,
      tieBreak = Seq(col("id"))).select("id").as[Long].collect()
    val exact = EmbedOps.semSearchVec(vecs, "emb", qv, 10, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    assert(ivf.toSeq == exact.toSeq)
  }

  test("search with nProbe = 1 recovers the query's own cluster (high recall)") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val ivf = IvfIndex.search(indexed, model, "emb", qv, k = 10, nProbe = 1,
      tieBreak = Seq(col("id"))).select("id").as[Long].collect()
    val exact = EmbedOps.semSearchVec(vecs, "emb", qv, 10, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    val recall = ivf.toSet.intersect(exact.toSet).size.toDouble / exact.length
    assert(recall >= 0.9, s"recall $recall")
  }

  test("save/load round-trips cells and centroids; probe scan prunes partitions") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 4, seed = 7)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(indexed, model, "emb", "id", path)
    val (loaded, lModel) = IvfIndex.load(spark, path)
    assert(lModel.nCells == 4)
    assert(lModel.centroids.zip(model.centroids).forall { case (a, b) => a.sameElements(b) })
    assert(loaded.count() == 120)

    val qv = vecs.filter($"id" === 5).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val probed = lModel.rankCells(qv).take(1)
    // Partition pruning: the probe filter over the cell-partitioned parquet
    // must reach the scan as a partition filter, reading only 1 of 4 dirs.
    val q = loaded.filter(col(IvfIndex.cellCol)
        .isin(probed.map(Integer.valueOf).toSeq: _*))
      .withColumn("s", EmbedOps.cosineSim(col(EmbedOps.vecCol("emb")), lit(qv.toArray)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(IvfIndex.cellCol),
      s"expected partition filter on ${IvfIndex.cellCol} in:\n$plan")
    assert(q.count() < 120)
  }

  test("search over a loaded index prunes cell partitions at the scan") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 4, seed = 7)
    val path = java.nio.file.Files.createTempDirectory("ivf_search").toString
    IvfIndex.save(indexed, model, "emb", "id", path)
    val (loaded, lModel) = IvfIndex.load(spark, path)
    val qv = vecs.filter($"id" === 5).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    val q = IvfIndex.search(loaded, lModel, "emb", qv, k = 5, nProbe = 1,
      tieBreak = Seq(col("id")))
    // The probe filter must reach the parquet scan as a partition filter —
    // the property that makes IVF the 100 TB path (unprobed cells' files are
    // never opened).
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(IvfIndex.cellCol),
      s"expected partition filter on ${IvfIndex.cellCol} in:\n$plan")
    assert(q.count() == 5)
  }

  test("sample-based KMeans fit still assigns all rows; full-probe search stays exact") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 4, seed = 7,
      fitSampleFraction = 0.5)
    assert(indexed.count() == 120)
    assert(model.nCells == 4)
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb")).as[Seq[Float]].head()
    // Exactness at nProbe = nCells is independent of where the sampled fit
    // placed the centroids — every cell is scanned.
    val ivf = IvfIndex.search(indexed, model, "emb", qv, k = 10, nProbe = 4,
      tieBreak = Seq(col("id"))).select("id").as[Long].collect()
    val exact = EmbedOps.semSearchVec(vecs, "emb", qv, 10, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    assert(ivf.toSeq == exact.toSeq)
  }

  test("append grows a saved index in place: search sees new vectors, pruning retained") {
    val path = java.nio.file.Files.createTempDirectory("ivf_append").toString + "/idx"
    val base = vecs.filter($"id" < 60)
    val extra = vecs.filter($"id" >= 60)
    val (indexed, model) = IvfIndex.build(base, "emb", nCells = 8, seed = 7)
    IvfIndex.save(indexed, model, "emb", "id", path)
    indexed.unpersist()
    IvfIndex.append(extra, "emb", "id", path)
    val (loaded, lModel) = IvfIndex.load(spark, path)
    assert(loaded.count() == 120)
    // Full-probe search over the grown index equals brute force over ALL rows.
    val qv = vecs.filter($"id" === 100).select(EmbedOps.vecCol("emb"))
      .as[Seq[Float]].head()
    val got = IvfIndex.search(loaded, lModel, "emb", qv, k = 5, nProbe = 8,
      tieBreak = Seq(col("id"))).select("id").as[Long].collect().toSeq
    val exact = EmbedOps.semSearchVec(vecs, "emb", qv, 5, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect().toSeq
    assert(got == exact, s"$got vs $exact")
    assert(got.contains(100L), "an appended vector must be findable")
    // The appended layout is still cell-partitioned (pruned probes).
    val dirs = new java.io.File(path + "/cells").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith(IvfIndex.cellCol + "=")))
    // Guards: wrong dimension and missing index fail loudly.
    val bad = Seq((999L, Seq.fill(8)(0.1f))).toDF("id", EmbedOps.vecCol("emb"))
    intercept[IllegalArgumentException] { IvfIndex.append(bad, "emb", "id", path) }
    intercept[IllegalArgumentException] {
      IvfIndex.append(extra, "emb", "id", path + "_nowhere")
    }
    // An empty batch is a no-op, not a spurious dim-mismatch (vecDimOf
    // would otherwise fall back to the session embedder's dim).
    IvfIndex.append(vecs.filter($"id" < 0), "emb", "id", path)
    assert(IvfIndex.load(spark, path)._1.count() == 120)
  }

  test("delete tombstones ids; append of a tombstoned id refused; compact reclaims") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_del").toString
    val path = s"$tmp/idx"
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    IvfIndex.save(indexed, model, "emb", "id", path)
    // Delete ids 0..9; load must not return them.
    val delBatch = vecs.filter($"id" < 10)
    assert(IvfIndex.delete(delBatch, "id", path) == 10L)
    val (loaded, _) = IvfIndex.load(spark, path)
    val ids = loaded.select("id").as[Long].collect().toSet
    assert(ids.size == 110 && !ids.exists(_ < 10))
    // Idempotent: replaying the same delete converges (content-token dir).
    assert(IvfIndex.delete(delBatch, "id", path) == 10L)
    assert(IvfIndex.load(spark, path)._1.count() == 110)
    // Re-appending a tombstoned id is refused loudly.
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(vecs.filter($"id" === 3), "emb", "id", path)
    }
    assert(e.getMessage.contains("tombstoned"), e.getMessage)
    // Appending FRESH ids still works under tombstones.
    IvfIndex.append(
      vecs.filter($"id" < 5).withColumn("id", $"id" + 1000), "emb", "id", path)
    assert(IvfIndex.load(spark, path)._1.count() == 115)
    // Compaction: dest is tombstone-free and equal; src untouched.
    IvfIndex.compactDeletes(spark, path, s"$tmp/compacted")
    val (compacted, _) = IvfIndex.load(spark, s"$tmp/compacted")
    assert(compacted.count() == 115)
    assert(!graft.core.MetaIo.exists(spark, s"$tmp/compacted/tombstones"))
    assert(graft.core.MetaIo.exists(spark, s"$path/tombstones"))
    // The freed id can be appended at dest.
    IvfIndex.append(vecs.filter($"id" === 3), "emb", "id", s"$tmp/compacted")
    assert(IvfIndex.load(spark, s"$tmp/compacted")._1.count() == 116)
  }

  test("cosine fails loudly on a dimension-mismatched query vector") {
    val (_, model) = IvfIndex.build(vecs, "emb", nCells = 4, seed = 7)
    intercept[IllegalArgumentException] {
      model.rankCells(Seq(1.0f, 2.0f)) // 2-dim query vs 16-dim centroids
    }
  }

  test("buildWithCentroids assigns by the supplied quantizer; recallReport " +
      "is monotone in nProbe and exactly 1.0 at nProbe = nCells") {
    // Bring-your-own quantizer: unit axis vectors as centroids — cluster g
    // rows must land in cell g (their axis dominates the L2 argmin).
    val cents = Array.tabulate(8)(g =>
      Array.tabulate(16)(d => if (d == g) 1.0f else 0.0f))
    val (indexed, model) = IvfIndex.buildWithCentroids(vecs, "emb", cents)
    assert(model.nCells == 8)
    val byCell = indexed.select("id", IvfIndex.cellCol).as[(Long, Int)]
      .collect()
    assert(byCell.forall { case (id, c) => c == (id % 8) })
    val qs = Seq(3L, 14L).map { id =>
      id -> vecs.filter($"id" === id).select(EmbedOps.vecCol("emb"))
        .as[Seq[Float]].head()
    }
    val rep = IvfIndex.recallReport(indexed, model, "emb", qs, k = 10,
        nProbes = Seq(1, 2, 8), idCol = "id")
      .as[(Long, Int, Double)].collect()
    assert(rep.length == 6)
    for ((qid, _) <- qs) {
      val tiers = rep.filter(_._1 == qid).sortBy(_._2).map(_._3)
      assert(tiers.zip(tiers.tail).forall { case (a, b) => a <= b },
        s"recall not monotone for $qid: ${tiers.toSeq}")
      assert(tiers.last == 1.0)
    }
    // Empty inputs are refused, not an empty frame.
    intercept[IllegalArgumentException] {
      IvfIndex.recallReport(indexed, model, "emb", Nil, 10, Seq(1), "id")
    }
  }

  test("searchBatch equals per-query search at the same nProbe; collisions " +
      "and bad probe counts are refused") {
    val (indexed, model) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    val qids = Seq(3L, 14L, 25L)
    val queries = vecs.filter($"id".isin(qids: _*))
      .select($"id".as("qid"), col(EmbedOps.vecCol("emb")).as("qvec"))
    val batch = IvfIndex.searchBatch(indexed, model, "emb", queries,
        "qid", "qvec", k = 5, nProbe = 2, tieBreak = Seq(col("id")))
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (q <- qids) {
      val qv = vecs.filter($"id" === q).select(EmbedOps.vecCol("emb"))
        .as[Seq[Float]].head()
      val single = IvfIndex.search(indexed, model, "emb", qv, k = 5,
          nProbe = 2, tieBreak = Seq(col("id")))
        .select("id").as[Long].collect().toSet
      assert(batch(q) == single, s"batch != single for query $q")
    }
    // Query columns colliding with the index frame are refused loudly.
    val colliding = vecs.filter($"id" === 3L)
      .select($"id", col(EmbedOps.vecCol("emb")).as("qvec"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.searchBatch(indexed, model, "emb", colliding, "id", "qvec",
        k = 5, nProbe = 2)
    }
    assert(e.getMessage.contains("colliding"), e.getMessage)
    intercept[IllegalArgumentException] {
      IvfIndex.searchBatch(indexed, model, "emb", queries, "qid", "qvec",
        k = 5, nProbe = 0)
    }
  }

  test("searchSharded merges per-shard top-k exactly; describe reports " +
      "occupancy and tombstones") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_shard_spec").toString
    Seq(0, 1).foreach { par =>
      val (idx, m) = IvfIndex.build(vecs.filter($"id" % 2 === par), "emb",
        nCells = 4, seed = 7 + par)
      IvfIndex.save(idx, m, "emb", "id", s"$tmp/s$par")
      idx.unpersist()
    }
    val qv = vecs.filter($"id" === 3).select(EmbedOps.vecCol("emb"))
      .as[Seq[Float]].head()
    val sharded = IvfIndex.searchSharded(spark, Seq(s"$tmp/s0", s"$tmp/s1"),
        "emb", qv, k = 10, nProbe = 4, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect().toSeq
    val exact = EmbedOps.semSearchVec(vecs, "emb", qv, 10,
        tieBreak = Seq(col("id")))
      .select("id").as[Long].collect().toSeq
    assert(sharded == exact)
    val info = IvfIndex.describe(spark, s"$tmp/s0")
    assert(info.nCells == 4 && info.dim == 16 && info.rows == 60 &&
      info.tombstoned == 0L && info.maxCellRows <= 60)
    assert(info.emptyCells == 0 && info.minCellRows >= 1)
    IvfIndex.delete(vecs.filter($"id" === 0), "id", s"$tmp/s0")
    val after = IvfIndex.describe(spark, s"$tmp/s0")
    assert(after.rows == 59 && after.tombstoned == 1L)
    // A collapsed quantizer must read as SKEW, not as uniformity: with a
    // far-away second/third centroid every row lands in cell 0, and
    // describe reports the empty cells and a zero min occupancy.
    val farCents = Array(
      Array.fill(16)(0.1f),
      Array.fill(16)(100f),
      Array.fill(16)(-100f))
    val (collapsed, cm) = IvfIndex.buildWithCentroids(vecs, "emb", farCents)
    IvfIndex.save(collapsed, cm, "emb", "id", s"$tmp/collapsed")
    val skew = IvfIndex.describe(spark, s"$tmp/collapsed")
    assert(skew.emptyCells == 2 && skew.minCellRows == 0L &&
      skew.maxCellRows == 120L, skew.toString)
    intercept[IllegalArgumentException] {
      IvfIndex.searchSharded(spark, Nil, "emb", qv, 10, 4)
    }
  }

  test("lloydChunkCap bounds the driver partial buffers to ~64 MB and is " +
      "a pure function of (k, dim)") {
    import graft.embed.IvfIndex
    // Small k·dim keeps the full 64-way parallel fit.
    assert(IvfIndex.lloydChunkCap(8, 8) == 64)
    assert(IvfIndex.lloydChunkCap(64, 128) == 64)
    // The cells-route cap (k=1024, dim=768): 64 chunks would be ~400 MB of
    // partials; the cap shrinks the chunk count so partials stay bounded.
    assert(IvfIndex.lloydChunkCap(1024, 768) < 64)
    for ((k, d) <- Seq((1024, 768), (4096, 1024), (1, 1), (512, 64), (1024, 4096)))
      assert(IvfIndex.lloydChunkCap(k, d).toLong * k * d * 8 <= (64L << 20) ||
        IvfIndex.lloydChunkCap(k, d) == 1,
        s"cap must bound partials for k=$k dim=$d")
  }

  test("deterministic across rebuilds with the same seed") {
    val (i1, m1) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    val (i2, m2) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    assert(m1.centroids.zip(m2.centroids).forall { case (a, b) => a.sameElements(b) })
    val a1 = i1.select("id", IvfIndex.cellCol).as[(Long, Int)].collect().sortBy(_._1)
    val a2 = i2.select("id", IvfIndex.cellCol).as[(Long, Int)].collect().sortBy(_._1)
    assert(a1.sameElements(a2))
  }

  test("describe reports quantizer staleness: a same-distribution append " +
      "holds the drift ratio near 1, a drifted append trips the retrain " +
      "recommendation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift_spec").toString
    val (idx, m) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    IvfIndex.save(idx, m, "emb", "id", s"$tmp/idx")
    idx.unpersist()
    val base = IvfIndex.describe(spark, s"$tmp/idx")
    assert(base.fitMeanSqDist > 0 && base.curMeanSqDist > 0)
    assert(math.abs(base.driftRatio - 1.0) < 0.2, base.toString)
    assert(!base.retrainRecommended)
    // Same distribution, new ids: the ratio must stay under the
    // recommendation threshold.
    val sameDist = vecs.withColumn("id", col("id") + 1000)
    IvfIndex.append(sameDist, "emb", "id", s"$tmp/idx")
    val same = IvfIndex.describe(spark, s"$tmp/idx")
    assert(!same.retrainRecommended, same.toString)
    // Drifted appends: vectors far off every trained centroid (constant
    // 3.0 in every coordinate — no cluster direction) must push the
    // sampled mean assignment distance well past 1.5× the fit reference.
    val drifted = vecs.withColumn("id", col("id") + 2000)
      .withColumn(EmbedOps.vecCol("emb"),
        expr(s"transform(${EmbedOps.vecCol("emb")}, x -> CAST(3.0 AS FLOAT))"))
    IvfIndex.append(drifted, "emb", "id", s"$tmp/idx")
    val after = IvfIndex.describe(spark, s"$tmp/idx")
    assert(after.driftRatio >= IvfIndex.RetrainDriftRatio, after.toString)
    assert(after.retrainRecommended, after.toString)
    // SQ8: fit reference and current value share the DEQUANTIZED
    // representation, so a fresh SQ8 index reads ratio ≈ 1 — never the
    // codec's reconstruction error masquerading as drift.
    val (idx8, m8) = IvfIndex.build(vecs, "emb", nCells = 8, seed = 7)
    IvfIndex.save(idx8, m8, "emb", "id", s"$tmp/idx8", sq8 = true)
    idx8.unpersist()
    val sq8Info = IvfIndex.describe(spark, s"$tmp/idx8")
    assert(math.abs(sq8Info.driftRatio - 1.0) < 0.2 &&
      !sq8Info.retrainRecommended, sq8Info.toString)
  }

  test("recommendProbesForFetch embeds ONLY the sampled anchors (sample " +
      "first, embed after) and the hardNegativesIvf auto path embeds " +
      "each anchor exactly once") {
    val (indexed, model) = IvfIndex.build(
      vecs.withColumn("label", col("id") % 3), "emb", nCells = 8, seed = 7)
    // Text anchors — the embedder must run to vectorize them.
    val anchors = (0 until 50).map(i => (i.toLong, s"anchor text $i", i % 3))
      .toDF("id", "emb", "label")
    graft.core.Sem.withEmbedder(countingEmbedder(16)) {
      CountingEmbedder.embedded.set(0L)
      EmbedOps.recommendProbesForFetch(
        indexed, model, "emb", anchors, "id", nFetch = 5, targetRecall = 0.5)
      val sampledOnly = CountingEmbedder.embedded.get()
      assert(sampledOnly == 16L,
        s"recommend embedded $sampledOnly anchors — must embed only the " +
          "16-row sample, never the full frame")
      CountingEmbedder.embedded.set(0L)
      EmbedOps.hardNegativesIvf(anchors, indexed, model, "emb", "id",
        "label", k = 2, nFetch = 5, nProbe = 0, targetRecall = 0.5).count()
      val once = CountingEmbedder.embedded.get()
      assert(once == 50L,
        s"auto mining embedded $once texts for 50 anchors — the staged " +
          "frame must feed both the recall sample and the mining")
    }
    intercept[IllegalArgumentException](
      EmbedOps.hardNegativesIvf(anchors, indexed, model, "emb", "id",
        "label", k = 2, nFetch = 5, nProbe = -1))
  }
}

/** [[graft.embed.HashingEmbedder]] plus a JVM-global tally of embedded
  * texts — the observable for sample-then-embed plan assertions.
  */
object CountingEmbedder {
  val embedded = new java.util.concurrent.atomic.AtomicLong(0L)
}
final case class CountingEmbedder(dim: Int) extends graft.embed.Embedder {
  private val inner = graft.embed.HashingEmbedder(dim)
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    CountingEmbedder.embedded.addAndGet(texts.size.toLong)
    inner.embed(texts)
  }
}
