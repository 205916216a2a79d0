package graft

import org.apache.spark.sql.functions._
import graft.embed.HashingEmbedder
import graft.operators.EmbedOps

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "machine learning models and neural networks"),
    (2L, "deep neural networks for machine learning"),
    (3L, "cooking pasta with tomato sauce"),
    (4L, "recipe for tomato pasta sauce"),
    (5L, "quantum chromodynamics lattice gauge theory")
  ).toDF("id", "text")

  test("semIndex appends a normalized embedding column") {
    val idx = corpus.semIndex("text")
    assert(idx.columns.contains("__vec_text"))
    val v = idx.filter($"id" === 1).select("__vec_text").as[Seq[Float]].head()
    assert(v.length == 64)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-5)
  }

  test("semSearch ranks the lexically-closest doc first") {
    val hit = corpus.semSearch("text", "neural networks for machine learning", k = 2,
        tieBreak = Seq(col("id")))
      .select("id").as[Long].collect()
    assert(hit.toSet.subsetOf(Set(1L, 2L)))
  }

  test("semSimJoin returns k matches per left row with _scores") {
    val right = Seq((10L, "neural network learning"), (11L, "pasta sauce recipe"),
      (12L, "gauge theory")).toDF("rid", "rtext")
    val out = corpus.semSimJoin(right, "text", "rtext", k = 1)
    assert(out.count() == 5)
    assert(out.columns.contains("_scores"))
    val m = out.select("id", "rid").as[(Long, Long)].collect().toMap
    assert(m(1L) == 10L && m(2L) == 10L)
    assert(m(3L) == 11L && m(4L) == 11L)
    assert(m(5L) == 12L)
  }

  test("semClusterBy groups similar texts") {
    val out = corpus.semClusterBy("text", nClusters = 3)
    val byId = out.select("id", "cluster_id").as[(Long, Int)].collect().toMap
    assert(byId(1L) == byId(2L))
    assert(byId(3L) == byId(4L))
    assert(byId(1L) != byId(3L))
  }

  test("semClusterBy sampled fit is partitioning-independent " +
      "(content-hash membership, not per-partition Bernoulli)") {
    // 120 rows across three lexical families; fitSampleFraction < 1 forces
    // the sampled-fit path. df.sample would seed per partition, so the two
    // layouts below would draw different fit samples and could produce
    // different centroids; content-hash membership is a pure function of
    // the vector multiset, so the assignment must be bit-identical.
    val big = (0 until 120).map { i =>
      val t = i % 3 match {
        case 0 => s"neural network training run $i gradient descent"
        case 1 => s"tomato pasta recipe $i olive oil basil"
        case _ => s"quantum lattice gauge simulation $i"
      }
      (i.toLong, t)
    }.toDF("id", "text")
    def assignments(parts: Int) =
      big.repartition(parts).semClusterBy("text", nClusters = 3,
          fitSampleFraction = 0.5)
        .select("id", "cluster_id").as[(Long, Int)].collect().toMap
    assert(assignments(1) == assignments(7))
  }

  test("semDedup drops one of a near-identical pair") {
    val withDup = corpus.union(Seq((6L, "machine learning models and neural networks"))
      .toDF("id", "text"))
    val out = withDup.semDedup("text", "id", threshold = 0.95)
    val kept = out.select("id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(6L))
    assert(kept.size == 5)
  }

  test("semIndexSave / semLoadIndex round-trips vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graftidx").toString
    corpus.semIndexSave("text", "id", s"$dir/idx")
    val loaded = corpus.semLoadIndex("text", "id", s"$dir/idx")
    assert(loaded.columns.contains("__vec_text"))
    assert(loaded.filter($"__vec_text".isNull).count() == 0)
  }

  test("semSearchPrefix: candidates = n equals exact search; bad stage " +
      "sizes refused") {
    val qv = EmbedOps.semIndex(corpus, "text")
      .filter($"id" === 2).select("__vec_text").as[Seq[Float]].head()
    // With the candidate pool covering the whole corpus, stage 2's exact
    // rerank must reproduce exact search regardless of the prefix cut.
    val staged = EmbedOps.semSearchPrefix(corpus, "text", qv, k = 3,
        prefixDim = 8, candidates = 5, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect().toSeq
    val exact = EmbedOps.semSearchVec(corpus, "text", qv, 3,
        tieBreak = Seq(col("id")))
      .select("id").as[Long].collect().toSeq
    assert(staged == exact)
    intercept[IllegalArgumentException] {
      EmbedOps.semSearchPrefix(corpus, "text", qv, k = 3, prefixDim = 999,
        candidates = 5)
    }
    intercept[IllegalArgumentException] {
      EmbedOps.semSearchPrefix(corpus, "text", qv, k = 3, prefixDim = 8,
        candidates = 2)
    }
  }

  test("semPartitionBy writes _lotus_partition_id") {
    val out = corpus.semPartitionBy("text", 2)
    assert(out.columns.contains("_lotus_partition_id"))
    assert(out.select("_lotus_partition_id").distinct().count() == 2)
  }

  test("HashingEmbedder is deterministic") {
    val e = HashingEmbedder(32)
    assert(e.embedOne("hello world").toSeq == e.embedOne("hello world").toSeq)
  }

  test("neardupPairs LSH path plans an equi-join on band keys, not all-pairs") {
    val pairs = EmbedOps.neardupPairs(corpus, "text", "id", threshold = 0.95,
      useLsh = Some(true))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // The exact-identical pair must share every band and survive verification.
    val withDup = corpus.union(Seq((6L, "machine learning models and neural networks"))
      .toDF("id", "text"))
    val found = EmbedOps.neardupPairs(withDup, "text", "id", threshold = 0.95,
        useLsh = Some(true))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 6L)))
  }

  test("neardupPairs default routing is scale-safe: large inputs avoid the cross join") {
    // lshRowThreshold = 0 makes every input "large": the auto-routed plan
    // must be the band-bucket equi-join, never a broadcast cross product.
    val auto = corpus.neardupPairs("text", "id", threshold = 0.95, lshRowThreshold = 0L)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // Small inputs still take the exact path and find the same near-dup.
    val small = corpus.union(Seq((6L, "machine learning models and neural networks"))
      .toDF("id", "text"))
      .neardupPairs("text", "id", threshold = 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(small.contains((1L, 6L)))
  }

  test("neardupPairs cells route: exact duplicates collapse to star edges, " +
      "components equal the exhaustive enumeration") {
    // 3 text families × 8 identical copies → identical vectors. The auto
    // big route (lshRowThreshold = 0 makes everything "big") must emit
    // (minId → member) stars at score 1.0 — 7 per family, linear in the
    // duplication — and its components must equal the exact all-pairs
    // path's despite never enumerating the O(k²) within-family pairs.
    val fams = Seq("machine learning neural nets", "tomato pasta cooking",
      "quantum lattice physics")
    val d = (for (f <- fams.indices; k <- 0 until 8)
      yield ((f * 100 + k).toLong, fams(f))).toDF("id", "text")
    val cells = EmbedOps.neardupPairs(d, "text", "id", threshold = 0.999,
        lshRowThreshold = 0L)
      .select("id1", "id2", "score").as[(Long, Long, Double)].collect()
    val stars = cells.filter(_._3 == 1.0)
    assert(stars.forall(p => p._1 == (p._2 / 100) * 100),
      s"star edges must anchor at the family min id: ${stars.mkString(",")}")
    assert(cells.length == 3 * 7, cells.mkString(","))
    def components(pairs: Set[(Long, Long)]): Map[Long, Long] = {
      val ids = d.select("id").as[Long].collect()
      val rep = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (rep(x) == x) x else { val r = find(rep(x)); rep(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) rep(math.max(ra, rb)) = math.min(ra, rb)
      }
      ids.map(i => i -> find(i)).toMap
    }
    val exact = EmbedOps.neardupPairs(d, "text", "id", threshold = 0.999,
        useLsh = Some(false))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(components(cells.map(p => (p._1, p._2)).toSet) == components(exact))
  }

  test("neardupCellDiagnostics: exact candidate count; duplicates collapse " +
      "out of the layout") {
    val fams = Seq("alpha beta gamma delta", "one two three four",
      "red green blue yellow")
    val d = (for (f <- fams.indices; k <- 0 until 8)
      yield ((f * 100 + k).toLong, fams(f))).toDF("id", "text")
    val diag = EmbedOps.neardupCellDiagnostics(d, "text", "id",
      targetCellSize = 2, cellProbes = 1)
    assert(diag.nVectors == 24 && diag.nDistinctVectors == 3,
      s"collapse drifted: $diag")
    // 3 distinct vectors in ≥2 cells at 1 probe: candidate pairs are the
    // within-cell C(occ,2) sum — at most C(3,2)=3, and crossJoinFraction
    // is a valid fraction of the 3-vector cross product.
    assert(diag.candidatePairs <= 3, diag.toString)
    assert(diag.crossJoinFraction >= 0.0 && diag.crossJoinFraction <= 1.0)
    assert(diag.maxOccupancy <= 3 && diag.occupiedCells >= 1)
  }

  test("neardupPairs cells route refuses a degenerate layout past the " +
      "candidate-pair budget instead of going quadratic") {
    // 60 distinct texts, targetCellSize=256 → the fit floors at k=2 cells,
    // and cellProbes=2 assigns EVERY vector to both — the worst layout:
    // candidate pairs = 2·C(60,2) = 3540, a within-cell cross join.
    val d = (0 until 60).map(i => (i.toLong, s"document number $i about topic ${i % 7}"))
      .toDF("id", "text")
    val e = intercept[IllegalStateException] {
      EmbedOps.neardupPairs(d, "text", "id", threshold = 0.9,
        lshRowThreshold = 0L, targetCellSize = 256, cellProbes = 2,
        maxCandidatePairs = 100L)
    }
    assert(e.getMessage.contains("candidate pairs exceed"), e.getMessage)
    assert(e.getMessage.contains("neardupCellDiagnostics"), e.getMessage)
    // The same layout under the default budget proceeds.
    EmbedOps.neardupPairs(d, "text", "id", threshold = 0.9,
      lshRowThreshold = 0L, targetCellSize = 256, cellProbes = 2).count()
  }

  test("neardupRecallReport: recall is monotone in cellProbes and 1.0 at " +
      "the exhaustive tier; boundary pairs are genuinely missed below it") {
    // 60 unit vectors on an arc (1.5° apart): pairs within 3 steps qualify
    // at 0.995; k-means cells are contiguous arcs, so at 1 probe every
    // qualifying pair straddling a cell boundary is missed — the
    // approximation this report exists to measure.
    val vecs = (0 until 60).map { i =>
      val th = i * math.Pi / 120
      (i.toLong, Seq(math.cos(th).toFloat, math.sin(th).toFloat))
    }.toDF("id", "__vec_emb")
    val rep = EmbedOps.neardupRecallReport(vecs, "emb", "id",
        threshold = 0.995, targetCellSize = 8, cellProbesTiers = Seq(1, 2, 16))
      .orderBy("cell_probes")
      .select("cell_probes", "exact_pairs", "matched_pairs", "recall")
      .as[(Int, Long, Long, Double)].collect()
    assert(rep.length == 3)
    assert(rep.head._2 > 0, s"ground truth must be non-empty: ${rep.toSeq}")
    assert(rep.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(rep.sliding(2).forall { case Array(a, b) => a._4 <= b._4 },
      s"recall must be monotone in cellProbes: ${rep.toSeq}")
    assert(rep.head._4 < 1.0,
      s"1 probe on an arc must miss boundary pairs: ${rep.toSeq}")
    assert(rep.last._4 == 1.0,
      s"probing every cell is exhaustive: ${rep.toSeq}")
  }

  test("recommendCellProbes picks the cheapest tier whose MEASURED recall " +
      "meets the target, falling back to the highest tier") {
    val vecs = (0 until 60).map { i =>
      val th = i * math.Pi / 120
      (i.toLong, Seq(math.cos(th).toFloat, math.sin(th).toFloat))
    }.toDF("id", "__vec_emb")
    // Exhaustive tier always measures 1.0 → a 1.0 target is satisfiable
    // and must choose the smallest tier that measured 1.0.
    val (probes, recall) = EmbedOps.recommendCellProbes(vecs, "emb", "id",
      threshold = 0.995, targetRecall = 1.0, targetCellSize = 8,
      cellProbesTiers = Seq(1, 2, 16))
    assert(recall == 1.0)
    assert(probes > 1, "1 probe misses boundary pairs on the arc, so the " +
      s"1.0 target cannot pick it (picked $probes)")
    // An unreachable-within-tiers target falls back to the best offered.
    val (pMax, rMax) = EmbedOps.recommendCellProbes(vecs, "emb", "id",
      threshold = 0.995, targetRecall = 2.0, targetCellSize = 8,
      cellProbesTiers = Seq(1, 2))
    assert(pMax == 2 && rMax <= 1.0)
    // A trivial target picks the cheapest tier.
    val (pMin, _) = EmbedOps.recommendCellProbes(vecs, "emb", "id",
      threshold = 0.995, targetRecall = 0.0, targetCellSize = 8,
      cellProbesTiers = Seq(1, 2, 16))
    assert(pMin == 1)
  }

  test("recall-aware auto route: the default picks a tier from the measured " +
      "recall, the arc geometry forces >1 probe at target 1.0, and the " +
      "nested estimator agrees with the full recall report") {
    val vecs = (0 until 60).map { i =>
      val th = i * math.Pi / 120
      (i.toLong, Seq(math.cos(th).toFloat, math.sin(th).toFloat))
    }.toDF("id", "__vec_emb")
    // The sample covers the whole corpus (60 ≤ 4096), so measured recall
    // is EXACT: a 1.0 target must reject tier 1 (boundary pairs straddle
    // arcs) and land on a provably exhaustive tier.
    val (probes, recall) = EmbedOps.autoCellProbes(vecs, "emb", "id",
      threshold = 0.995, targetRecall = 1.0, targetCellSize = 8,
      cellProbesTiers = Seq(1, 2, 16))
    assert(recall == 1.0)
    assert(probes > 1, s"tier 1 misses boundary pairs, picked $probes")
    // A trivial target picks the cheapest tier.
    assert(EmbedOps.autoCellProbes(vecs, "emb", "id", threshold = 0.995,
      targetRecall = 0.0, targetCellSize = 8,
      cellProbesTiers = Seq(1, 2, 16))._1 == 1)
    // Per-tier recalls from the ONE-assignment nested estimator must equal
    // the full report's (which re-runs the whole route per tier): same
    // sample, same centroids, same catch condition.
    val rep = EmbedOps.neardupRecallReport(vecs, "emb", "id",
        threshold = 0.995, targetCellSize = 8, cellProbesTiers = Seq(1, 2, 16))
      .orderBy("cell_probes").select("cell_probes", "recall")
      .as[(Int, Double)].collect()
    rep.foreach { case (t, r) =>
      val (_, est) = EmbedOps.autoCellProbes(vecs, "emb", "id",
        threshold = 0.995, targetRecall = 2.0, targetCellSize = 8,
        cellProbesTiers = Seq(t))
      assert(math.abs(est - r) < 1e-12,
        s"tier $t: nested estimator $est vs report $r")
    }
    // END-TO-END: neardupPairs at the auto default (cellProbes = 0) with
    // target 1.0 must return exactly the exact route's pair set.
    val auto = EmbedOps.neardupPairs(vecs, "emb", "id", threshold = 0.995,
        lshRowThreshold = 0L, targetCellSize = 8, targetRecall = 1.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val exact = EmbedOps.neardupPairs(vecs, "emb", "id", threshold = 0.995,
        useLsh = Some(false))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(auto == exact, s"auto=${auto.size} exact=${exact.size}")
  }

  test("LSH hyperplanes span the embedder's true dimension, not a 64 default") {
    graft.core.Sem.withEmbedder(HashingEmbedder(17)) {
      val idx = corpus.semIndex("text")
      assert(EmbedOps.vecDimOf(idx, "__vec_text") == 17)
      // A self sim-join through the LSH path with derived dim must place the
      // exact-duplicate pair in a shared bucket (identical vectors agree on
      // every plane regardless of dimension) and score it 1.0.
      val withDup = corpus.union(Seq((6L, "machine learning models and neural networks"))
        .toDF("id", "text"))
      val found = EmbedOps.neardupPairs(withDup, "text", "id", threshold = 0.999,
          useLsh = Some(true))
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(found.contains((1L, 6L)))
    }
  }

  test("semSimJoin handles a self sim-join on the same column name") {
    val l = corpus.select(col("id").as("lid"), col("text"))
    val r = corpus.select(col("id").as("rid"), col("text"))
    val out = EmbedOps.semSimJoin(l, r, "text", "text", k = 1, tieBreak = Seq(col("rid")))
    // nearest neighbor of each doc is itself (score 1.0)
    val m = out.select(col("lid"), col("rid")).as[(Long, Long)].collect().toMap
    assert(m.forall { case (a, b) => a == b })
  }

  test("semSimJoinAuto picks broadcast under the threshold and LSH above it") {
    val right = Seq((10L, "neural network learning"), (11L, "pasta sauce recipe"))
      .toDF("rid", "rtext")
    val exact = EmbedOps.semSimJoin(corpus, right, "text", "rtext", k = 1,
      tieBreak = Seq(col("rid")))
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val autoSmall = EmbedOps.semSimJoinAuto(corpus, right, "text", "rtext", k = 1,
      tieBreak = Seq(col("rid")))
      .select("id", "rid").as[(Long, Long)].collect().toSet
    assert(autoSmall == exact) // broadcast path, byte-identical to semSimJoin
    // Force the LSH path with a tiny threshold: candidates are a subset of
    // bucket collisions, and every returned pair keeps real scores.
    val autoLsh = EmbedOps.semSimJoinAuto(corpus, right, "text", "rtext", k = 1,
      broadcastBytesThreshold = 1L, tieBreak = Seq(col("rid")))
    assert(autoLsh.columns.contains("_scores"))
    assert(autoLsh.count() <= corpus.count())
  }

  test("randomProject: JL projection preserves near-dup geometry and composes downstream") {
    import graft.operators.EmbedOps
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
    val projected = EmbedOps.randomProject(e, "emb", outDim = 16)
    val row = projected.select(org.apache.spark.sql.functions.size(
      col(EmbedOps.vecCol("emb_rp")))).as[Int].head()
    assert(row == 16)
    // Deterministic: same seed → identical output.
    val again = EmbedOps.randomProject(e, "emb", outDim = 16)
      .select(col("vec_id"), col(EmbedOps.vecCol("emb_rp")))
    val once = projected.select(col("vec_id"), col(EmbedOps.vecCol("emb_rp")))
    assert(once.exceptAll(again).isEmpty)
    // Composes with the standard operators: near-dup pairs on the PROJECTED
    // vectors still recover the strongest planted pairs found on the
    // originals (JL keeps high cosines high; threshold relaxed for the
    // 16-d distortion).
    val origPairs = EmbedOps.neardupPairs(e, "emb", "vec_id", threshold = 0.45)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val projPairs = EmbedOps.neardupPairs(
        projected.drop(EmbedOps.vecCol("emb"))
          .withColumnRenamed(EmbedOps.vecCol("emb_rp"), EmbedOps.vecCol("emb")),
        "emb", "vec_id", threshold = 0.25)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(origPairs.nonEmpty, "gate data must contain strong near-dups")
    val recovered = origPairs.intersect(projPairs).size.toDouble / origPairs.size
    assert(recovered >= 0.8, s"projection lost too many near-dups: $recovered")
  }

  test("semSearchVec over a precomputed index column matches semSearch") {
    val e = graft.core.Sem.settings.embedder
    val qv = e.embedOne("neural networks for machine learning").toIndexedSeq
    val viaVec = corpus.semSearchVec("text", qv, 2, tieBreak = Seq(col("id")))
      .select("id").as[Long].collect().toSeq
    val viaText = corpus.semSearch("text", "neural networks for machine learning", 2,
      tieBreak = Seq(col("id"))).select("id").as[Long].collect().toSeq
    assert(viaVec == viaText)
  }

  // --- prunePrototypes -----------------------------------------------------

  private val protoCents: Array[Array[Float]] = Array(
    Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))

  /** 3 clusters × 12 vectors at graded angles from their centroid —
    * distinct rounded sims, deterministic geometry.
    */
  private def protoCorpus = {
    val rows = for {
      c <- 0 until 3
      j <- 0 until 12
    } yield {
      val t = 0.05f * (j + 1) + 0.013f * c
      val base = protoCents(c).clone()
      base(3) = t // tilt into the shared 4th axis: sim = 1/sqrt(1+t²)
      (c * 100L + j, base)
    }
    rows.toDF("id", EmbedOps.vecCol("emb"))
  }

  /** Brute-force reference: nearest centroid (sq-Euclid, lowest index),
    * per-cluster (round(sim,4), id) order, first ceil(f·n) kept.
    */
  private def protoReference(rows: Seq[(Long, Array[Float])], f: Double,
      hardest: Boolean): Set[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val assigned = rows.map { case (id, v) =>
      val cell = protoCents.zipWithIndex.minBy { case (ct, i) =>
        (ct.zip(v).map { case (x, y) => (y - x).toDouble * (y - x) }.sum, i)
      }._2
      val sim = BigDecimal(cos(v, protoCents(cell)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, cell, sim)
    }
    assigned.groupBy(_._2).flatMap { case (_, rs) =>
      val target = math.ceil(f * rs.size).toInt
      val sorted = if (hardest) rs.sortBy(r => (r._3, r._1))
                   else rs.sortBy(r => (-r._3, r._1))
      sorted.take(target).map(_._1)
    }.toSet
  }

  test("prunePrototypes keeps exactly ceil(f·n) hardest per cluster, " +
      "matching the windowed reference") {
    val rows = protoCorpus.as[(Long, Array[Float])].collect().toSeq
    val got = EmbedOps.prunePrototypes(protoCorpus, "emb", "id",
        protoCents, keepFraction = 0.4)
      .select("id").as[Long].collect().toSet
    assert(got == protoReference(rows, 0.4, hardest = true))
    assert(got.size == 3 * math.ceil(0.4 * 12).toInt)
  }

  test("prunePrototypes keepHardest=false keeps the MOST prototypical instead") {
    val rows = protoCorpus.as[(Long, Array[Float])].collect().toSeq
    val got = EmbedOps.prunePrototypes(protoCorpus, "emb", "id",
        protoCents, keepFraction = 0.25, keepHardest = false)
      .select("id").as[Long].collect().toSet
    val ref = protoReference(rows, 0.25, hardest = false)
    assert(got == ref)
    // Orientation really flipped: disjoint from the hardest-25% set on
    // this geometry (distinct sims, no overlap at f=0.25).
    assert(got.intersect(protoReference(rows, 0.25, hardest = true)).isEmpty)
  }

  test("prunePrototypes boundary bucket: identical sims (the coarse-score " +
      "worst case) resolve by id order at exact count") {
    // Every vector IS its centroid → one (cluster, sim=1.0) bucket per
    // cluster; the whole cluster is the boundary bucket and selection
    // must fall back to id order without a per-cluster window.
    val rows = (for { c <- 0 until 2; j <- 0 until 10 }
      yield (c * 100L + j, protoCents(c).clone())).toDF(
      "id", EmbedOps.vecCol("emb"))
    val got = EmbedOps.prunePrototypes(rows, "emb", "id",
        protoCents, keepFraction = 0.3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L, 100L, 101L, 102L))
  }

  test("hardNegatives: label filter precedes the top-k, anchors never " +
      "draw themselves, ties break on neg_id") {
    import org.apache.spark.sql.functions._
    val v = graft.operators.EmbedOps.vecCol("emb")
    // anchor 0 (label 0) sits closest to 1,2 (label 0 — must be SKIPPED)
    // then 3 (label 1), 4 (label 2), then far 5 (label 1)
    val rows = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(0.99f, 0.1f)),
      (2L, 0, Seq(0.98f, 0.2f)), (3L, 1, Seq(0.9f, 0.4f)),
      (4L, 2, Seq(0.8f, 0.6f)), (5L, 1, Seq(0f, 1f)))
    val df = rows.toDF("id", "label", v)
    val got = graft.operators.EmbedOps.hardNegatives(
        df.filter(col("id") === 0), df, "emb", "id", "label", k = 2)
      .select("neg_id", "neg_label").as[(Long, Int)].collect().toSeq
    assert(got == Seq((3L, 1), (4L, 2)), got.toString)
    // k larger than available negatives: returns what exists, no self
    val all = graft.operators.EmbedOps.hardNegatives(
        df.filter(col("id") === 0), df, "emb", "id", "label", k = 10)
      .select("neg_id").as[Long].collect().toSet
    assert(all == Set(3L, 4L, 5L))
  }

  test("hardNegativesIvf: exhaustive probes + ample over-fetch equals the " +
      "exact tier; a starved nFetch under-delivers and a raised one " +
      "recovers — the documented truncation semantics") {
    import org.apache.spark.sql.functions._
    val v = graft.operators.EmbedOps.vecCol("emb")
    val rng = new scala.util.Random(11)
    val rows = (0L until 120L).map { i =>
      (i, (i % 3).toInt, Seq.fill(8)(rng.nextFloat() - 0.5f))
    }
    val df = rows.toDF("id", "label", v)
    val (indexed, model) = graft.embed.IvfIndex.build(df, "emb", nCells = 4)
    val anchors = df.filter(col("id") < 5)
    def run(nFetch: Int) = graft.operators.EmbedOps.hardNegativesIvf(
        anchors, indexed, model, "emb", "id", "label",
        k = 4, nFetch = nFetch, nProbe = 4)
      .select("anchor_id", "neg_id").as[(Long, Long)].collect().toSet
    val exact = graft.operators.EmbedOps.hardNegatives(
        anchors, df, "emb", "id", "label", k = 4)
      .select("anchor_id", "neg_id").as[(Long, Long)].collect().toSet
    // ample over-fetch at exhaustive probes == the exact tier
    assert(run(nFetch = 120) == exact)
    // nFetch = k cannot absorb same-label crowding: some anchor
    // under-delivers (labels are 1/3 of a random corpus — the top-4
    // fetched almost surely contain a same-label hit or self)
    assert(run(nFetch = 4).size < exact.size,
      "starved over-fetch should under-deliver on this corpus")
  }

  test("packSignBits/hammingBits match the unpacked sign model across " +
      "dims incl. non-multiples of 64") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(23)
    for (dim <- Seq(1, 63, 64, 65, 128, 130)) {
      val a = Array.fill(dim)(rng.nextFloat() - 0.5f)
      val b = Array.fill(dim)(rng.nextFloat() - 0.5f)
      val expected = (0 until dim).count(i => (a(i) > 0) != (b(i) > 0)).toLong
      val got = spark.range(1).select(
        graft.operators.EmbedOps.hammingBits(
          graft.operators.EmbedOps.packSignBits(typedlit(a.toSeq)),
          graft.operators.EmbedOps.packSignBits(typedlit(b.toSeq))).as("h"))
        .head().getLong(0)
      assert(got == expected, s"dim=$dim")
      val words = spark.range(1).select(
        graft.operators.EmbedOps.packSignBits(typedlit(a.toSeq)).as("w"))
        .head().getSeq[Long](0)
      assert(words.length == (dim + 63) / 64)
      // Bit i of word w is exactly the sign of component w*64+i.
      for (i <- 0 until dim)
        assert((((words(i / 64) >>> (i % 64)) & 1L) == 1L) == (a(i) > 0))
    }
    // Empty vector packs to an empty code (the unguarded word sequence
    // would run 0→−1 and index element_at at 0, which throws).
    val empty = spark.range(1).select(
      graft.operators.EmbedOps.packSignBits(
        typedlit(Seq.empty[Float])).as("w"))
      .head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

}
