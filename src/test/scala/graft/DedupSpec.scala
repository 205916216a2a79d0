package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 20 distinct docs + 3 planted near-duplicates (one word changed).
  private def corpus = {
    val base = (0 until 20).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
    val dups = Seq(
      (100L, base(3)._2.replaceFirst("w\\d+", "CHANGED")),
      (101L, base(7)._2),
      (102L, base(11)._2.replace(" ", " ") + " extra"))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("flagPassagesAgainstIndex: the 40-in-400-word quote is INVISIBLE " +
      "to minhash screening and flagged by the stored winnow prints " +
      "with its exact source; pre-winnow indexes refuse loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_winnow_idx")
      .toString + "/idx"
    // Corpus: 5 long docs (400 words each). Batch: doc 100 quotes a
    // 40-word passage from corpus doc 2 inside its own 360 fresh words;
    // doc 101 is entirely fresh.
    val corpusDocs = (0 until 5).map(i =>
      (i.toLong, (0 until 400).map(j => s"c${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val passage = (150 until 190).map(j => s"c2_$j").mkString(" ")
    val batch = Seq(
      (100L, (0 until 180).map(j => s"n0_$j").mkString(" ") + " " + passage +
        " " + (180 until 360).map(j => s"n0_$j").mkString(" ")),
      (101L, (0 until 400).map(j => s"n1_$j").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.saveDedupIndex(corpusDocs, "text", "doc_id", tmp,
      winnowK = 5, winnowW = 4)
    // Minhash/fp screening keeps BOTH batch docs (the quote moves
    // whole-set Jaccard to ~40/760 — far under any useful threshold).
    val kept = Dedup.dropAgainstIndex(batch, "text", "doc_id", tmp,
      threshold = 0.5)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(100L, 101L))
    val flagged = Dedup.flagPassagesAgainstIndex(kept, "text", "doc_id", tmp)
      .select("doc_id", "passage_src", "passage_shared")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))).toMap
    assert(flagged(100L)._1.contains(2L), s"quote not attributed: $flagged")
    // SWA guarantee: a shared run of >= w+k-1 = 8 words yields >= 1
    // shared print; a 40-word run yields many.
    assert(flagged(100L)._2 >= 2L)
    assert(flagged(101L)._1.isEmpty && flagged(101L)._2 == 0L)
    // Appends inherit the winnow column from the sidecar: after doc 101
    // joins the index, a fresh batch quoting IT gets flagged too.
    Dedup.appendToDedupIndex(
      kept.filter(col("doc_id") === 101L), "text", "doc_id", tmp)
    val quote101 = (100 until 140).map(j => s"n1_$j").mkString(" ")
    val batch2 = Seq((200L, (0 until 300).map(j => s"m_$j").mkString(" ") +
      " " + quote101)).toDF("doc_id", "text")
    val f2 = Dedup.flagPassagesAgainstIndex(batch2, "text", "doc_id", tmp)
      .select("passage_src").head()
    assert(!f2.isNullAt(0) && f2.getLong(0) == 101L)
    // An index saved WITHOUT winnow prints refuses passage screening.
    val plain = java.nio.file.Files.createTempDirectory("graft_plain_idx")
      .toString + "/idx"
    Dedup.saveDedupIndex(corpusDocs, "text", "doc_id", plain)
    val e = intercept[IllegalArgumentException](
      Dedup.flagPassagesAgainstIndex(batch, "text", "doc_id", plain))
    assert(e.getMessage.contains("winnow"), e.getMessage)
  }

  test("minhash LSH finds planted near-duplicates") {
    val pairs = Dedup.minhashPairs(corpus, "text", "doc_id", threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 100L)))
    assert(pairs.contains((7L, 101L)))
    assert(pairs.contains((11L, 102L)))
    assert(pairs.size == 3) // no false positives among distinct docs
  }

  test("minhashRecallReport: measured recall vs exact Jaccard ground truth " +
      "climbs the band-tier table and saturates at the aggressive tier") {
    // 40 base docs of 30 words + 25 planted near-dups (1 of 30 words
    // changed → 3 of 28 shingles die → shingle Jaccard 25/31 ≈ 0.81,
    // deliberately NEAR the 0.7 threshold so the conservative band tier
    // genuinely misses pairs: P(collide | j=0.81, r=16, b=4) ≈ 0.12).
    val rng = new scala.util.Random(7)
    val base = (0 until 40).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
    val dups = (0 until 25).map { k =>
      val (src, text) = base(k)
      val words = text.split(" ")
      words(5 + rng.nextInt(20)) = s"CHANGED$k"
      (200L + src, words.mkString(" "))
    }
    val df = (base ++ dups).toDF("doc_id", "text")
    val rep = Dedup.minhashRecallReport(df, "text", "doc_id",
        threshold = 0.7, numHashes = 64, bandTiers = Seq(4, 32))
      .orderBy("bands")
      .select("bands", "n_sample", "exact_pairs", "matched_pairs", "recall")
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(rep.length == 2)
    assert(rep.head._2 == 65, s"all distinct docs sampled: ${rep.toSeq}")
    assert(rep.head._3 >= 25, s"planted pairs must be in ground truth: ${rep.toSeq}")
    assert(rep.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    assert(rep.head._5 <= rep.last._5,
      s"more bands cannot lower recall here: ${rep.toSeq}")
    // bands=32 (2 rows/band): per-pair miss probability at j≥0.7 is
    // (1-0.49)^32 ≈ 5e-10 — recall 1.0 up to astronomically unlucky seeds
    // (everything is seeded/deterministic, so this is a pin, not a flake).
    assert(rep.last._5 == 1.0, s"aggressive tier must saturate: ${rep.toSeq}")
    // bands=4 (16 rows/band): collision probability at j≈0.8 is
    // 1-(1-0.8^16)^4 ≈ 0.1 — the conservative tier must MISS pairs, or
    // the report isn't measuring anything.
    assert(rep.head._5 < 1.0, s"conservative tier must miss: ${rep.toSeq}")
  }

  test("recommendBands turns the recall report into the tuning decision: " +
      "cheapest tier meeting the target, highest as the fallback") {
    // The minhashRecallReport corpus: j≈0.81 pairs near the 0.7 threshold,
    // so 4 bands genuinely under-recall and 32 bands saturate at 1.0.
    val rng = new scala.util.Random(7)
    val base = (0 until 40).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
    val dups = (0 until 25).map { k =>
      val (src, text) = base(k)
      val words = text.split(" ")
      words(5 + rng.nextInt(20)) = s"CHANGED$k"
      (200L + src, words.mkString(" "))
    }
    val df = (base ++ dups).toDF("doc_id", "text")
    val (bands, recall) = Dedup.recommendBands(df, "text", "doc_id",
      threshold = 0.7, targetRecall = 1.0, bandTiers = Seq(4, 32))
    assert(bands == 32 && recall == 1.0, s"($bands, $recall)")
    // An unreachable target falls back to the best offered tier.
    val (bMax, rMax) = Dedup.recommendBands(df, "text", "doc_id",
      threshold = 0.7, targetRecall = 2.0, bandTiers = Seq(4))
    assert(bMax == 4 && rMax < 1.0, s"($bMax, $rMax)")
    // A trivial target picks the cheapest tier.
    assert(Dedup.recommendBands(df, "text", "doc_id", threshold = 0.7,
      targetRecall = 0.0, bandTiers = Seq(4, 32))._1 == 4)
  }

  test("bands = 0 auto: the one-pass estimator agrees with the full recall " +
      "report tier-for-tier, and the auto route reproduces the pinned " +
      "exact pair set") {
    val rng = new scala.util.Random(7)
    val base = (0 until 40).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
    val dups = (0 until 25).map { k =>
      val (src, text) = base(k)
      val words = text.split(" ")
      words(5 + rng.nextInt(20)) = s"CHANGED$k"
      (200L + src, words.mkString(" "))
    }
    val df = (base ++ dups).toDF("doc_id", "text")
    // The cheap estimator must reach the SAME decision as the full
    // per-tier route re-run (recommendBands → minhashRecallReport): same
    // sample, same ground truth, and slice-equality ≡ band-key equality.
    val pick = Dedup.autoBands(df, "text", "doc_id", threshold = 0.7,
      targetRecall = 1.0, bandTiers = Seq(4, 32))
    val full = Dedup.recommendBands(df, "text", "doc_id", threshold = 0.7,
      targetRecall = 1.0, bandTiers = Seq(4, 32))
    assert(pick == full, s"estimator $pick vs full report $full")
    assert(pick._1 == 32 && pick._2 == 1.0, s"$pick")
    // An under-recalling target is honest: tier 4 alone measures < 1.
    val low = Dedup.autoBands(df, "text", "doc_id", threshold = 0.7,
      targetRecall = 1.0, bandTiers = Seq(4))
    assert(low._1 == 4 && low._2 < 1.0, s"$low")
    // The auto route at the measured-exhaustive tier equals the pinned one.
    val auto = Dedup.minhashPairs(df, "text", "doc_id", threshold = 0.7,
        targetRecall = 1.0, autoBandTiers = Seq(4, 32),
        autoSampleSize = Int.MaxValue)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val pinned = Dedup.minhashPairs(df, "text", "doc_id", threshold = 0.7,
        bands = 32)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(auto == pinned && auto.size >= 25, s"auto ${auto.size} pairs")
  }

  test("leakage-safe split: a duplicate cluster never straddles the split, " +
      "and singletons draw exactly the per-doc split") {
    val pairs = Dedup.minhashPairs(corpus, "text", "doc_id", threshold = 0.5,
      bands = 16)
    val clusters = Dedup.componentIds(
        corpus.select(col("doc_id").cast("long").as("id")), pairs)
      .select(col("id").as("doc_id"), col("rep_id"))
    val split = graft.operators.CorpusPrep.assignSplits(clusters, "rep_id",
      Seq("train" -> 0.9, "holdout" -> 0.1), salt = "x")
    // every cluster lands whole on one side
    val perCluster = split.groupBy("rep_id")
      .agg(countDistinct(col("split")).as("n"))
      .select("n").as[Long].collect()
    assert(perCluster.forall(_ == 1L))
    // the planted dup pairs (3,100), (7,101), (11,102) agree with their reps
    val m = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m(3L) == m(100L) && m(7L) == m(101L) && m(11L) == m(102L))
    // singletons draw the same assignment a per-doc split would give them
    val direct = graft.operators.CorpusPrep.assignSplits(
        clusters.filter(col("doc_id") === col("rep_id")), "rep_id",
        Seq("train" -> 0.9, "holdout" -> 0.1), salt = "x")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    direct.foreach { case (id, sp) => assert(m(id) == sp) }
  }

  test("leakageSafeSplits shares one pair graph with dedup under the " +
      "recall-aware AUTO tier: no straddle, and the kept survivor's split " +
      "is every dropped member's split") {
    // AUTO bands (the minhashPairs default) — the tier the estimator
    // picks must feed BOTH dedup and split from the same pairs frame.
    val pairs = Dedup.minhashPairs(corpus, "text", "doc_id", threshold = 0.5)
    val split = graft.operators.CorpusPrep.leakageSafeSplits(
      corpus.select(col("doc_id")), "doc_id", pairs,
      Seq("train" -> 0.9, "holdout" -> 0.1), salt = "x")
    val perCluster = split.groupBy("rep_id")
      .agg(countDistinct(col("split")).as("n"))
      .select("n").as[Long].collect()
    assert(perCluster.forall(_ == 1L), "a cluster straddled the split")
    // Compose with dedup on the SAME pairs: the survivor of each planted
    // cluster carries the split of every member it replaced.
    val kept = Dedup.dropDuplicatesByPairs(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    val m = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    for ((a, b) <- Seq((3L, 100L), (7L, 101L), (11L, 102L))) {
      assert(kept.contains(a) && !kept.contains(b))
      assert(m(a) == m(b), s"dropped $b split differs from survivor $a")
    }
    // Stability: the same pairs frame re-fed gives byte-identical splits
    // (the auto decision lives in the pairs, not in the split).
    val again = graft.operators.CorpusPrep.leakageSafeSplits(
      corpus.select(col("doc_id")), "doc_id", pairs,
      Seq("train" -> 0.9, "holdout" -> 0.1), salt = "x")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == m)
    // A string id column is rejected loudly — the long cast would null
    // non-numeric ids and silently DROP those rows from the output.
    val e = intercept[IllegalArgumentException](
      graft.operators.CorpusPrep.leakageSafeSplits(
        corpus.select(col("doc_id").cast("string").as("doc_id")),
        "doc_id", pairs, Seq("train" -> 1.0)))
    assert(e.getMessage.contains("integral") ||
      e.getMessage.contains("long ids"), e.getMessage)
  }

  test("dropDuplicatesByPairs keeps the min-id representative") {
    val deduped = Dedup.dropDuplicatesByPairs(corpus, "doc_id",
      Dedup.minhashPairs(corpus, "text", "doc_id", threshold = 0.5))
    val kept = deduped.select("doc_id").as[Long].collect().toSet
    assert(kept.size == 20)
    assert(kept.contains(3L) && !kept.contains(100L))
    assert(kept.contains(7L) && !kept.contains(101L))
  }

  test("winnowing: the w+k-1 locality guarantee holds, a local shared " +
      "passage invisible to global minhash is caught, and the candidate " +
      "budget refuses loudly") {
    def ws(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // guarantee: k=5, w=4 → any shared run of >= 8 words shares a print
    val run8 = ws("s", 8)
    val g = Seq(
      (1L, s"${ws("a", 30)} $run8 ${ws("b", 30)}"),
      (2L, s"${ws("c", 30)} $run8 ${ws("d", 30)}"))
    val gp = Dedup.winnowPairs(g.toDF("doc_id", "text"), "doc_id", "text",
        k = 5, w = 4, minShared = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(gp == Set((1L, 2L)), s"guarantee violated: $gp")
    // locality: a 40-word passage inside two otherwise-different 400-word
    // docs — Jaccard ~0.05 is far below any useful minhash threshold,
    // winnowing catches it by construction
    val passage = ws("p", 40)
    val local = Seq(
      (1L, s"${ws("x", 200)} $passage ${ws("y", 200)}"),
      (2L, s"${ws("u", 200)} $passage ${ws("v", 200)}"))
    val wp = Dedup.winnowPairs(local.toDF("doc_id", "text"), "doc_id",
        "text", k = 5, w = 4, minShared = 2)
      .select("id1", "id2", "n_shared").as[(Long, Long, Long)].collect()
    assert(wp.length == 1 && wp.head._1 == 1L && wp.head._2 == 2L &&
      wp.head._3 >= 8, wp.mkString(","))
    val mh = Dedup.minhashPairs(local.toDF("doc_id", "text"), "text",
        "doc_id", threshold = 0.5, bands = 16)
      .count()
    assert(mh == 0L, "global minhash should NOT flag a local passage")
    // determinism across partitioning
    val wp2 = Dedup.winnowPairs(local.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", k = 5, w = 4, minShared = 2)
      .select("id1", "id2", "n_shared").as[(Long, Long, Long)].collect()
    assert(wp2.toSeq == wp.toSeq)
    // boilerplate fan-out refuses loudly before the join
    val dense = (0 until 60).map(i => (i.toLong, ws("z", 12)))
    val e = intercept[IllegalStateException](
      Dedup.winnowPairs(dense.toDF("doc_id", "text"), "doc_id", "text",
        maxCandidatePairs = 100L).count())
    assert(e.getMessage.contains("maxCandidatePairs"))
  }

  test("winnowing guarantee property: over randomized corpora, a planted " +
      "shared run of >= w+k-1 words is ALWAYS caught and a run of < k " +
      "words NEVER produces a shared gram") {
    val rng = new scala.util.Random(71)
    for (trial <- 0 until 6) {
      val k = 2 + rng.nextInt(4) // 2..5
      val w = 1 + rng.nextInt(4) // 1..4
      val guarantee = w + k - 1
      // disjoint per-doc vocab except the planted run
      def body(tag: String, n: Int) =
        (1 to n).map(i => s"$tag$i").mkString(" ")
      val runLen =
        if (trial % 2 == 0) guarantee + rng.nextInt(4) // must be caught
        else k - 1 // cannot share a k-gram
      val run = (1 to runLen).map(i => s"shared$i").mkString(" ")
      val docs = Seq(
        (1L, s"${body("a", 10 + rng.nextInt(20))} $run ${body("b", 10)}"),
        (2L, s"${body("c", 10 + rng.nextInt(20))} $run ${body("d", 10)}"))
      val pairs = Dedup.winnowPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", k = k, w = w, minShared = 1)
        .count()
      if (trial % 2 == 0)
        assert(pairs == 1L,
          s"trial $trial k=$k w=$w run=$runLen: guarantee violated")
      else
        assert(pairs == 0L,
          s"trial $trial k=$k w=$w run=$runLen: sub-k run shared a gram")
    }
  }

  test("simhash flags exact and near copies") {
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id", maxDist = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((7L, 101L))) // identical text → distance 0
  }

  test("jaccard on shingles is exact") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z q r")).toDF("id", "t")
    val sh = df.select($"id", Dedup.shingles($"t", 3).as("s"))
    val j = sh.toDF("id1", "s1").join(sh.toDF("id2", "s2"), $"id1" < $"id2")
      .select($"id1", $"id2", Dedup.jaccard($"s1", $"s2").as("j"))
      .as[(Long, Long, Double)].collect().map(r => ((r._1, r._2), r._3)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) == 0.0)
  }

  test("connected components: chain collapses to min id (union-find path)") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val keep = Dedup.keepAfterConnectedComponents(nodes, edges)
      .as[Long].collect().toSet
    assert(keep == Set(1L, 4L, 6L))
  }

  test("connected components: distributed star-contraction path agrees") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val keep = Dedup.keepAfterConnectedComponents(nodes, edges, driverEdgeThreshold = 0L)
      .as[Long].collect().toSet
    assert(keep == Set(1L, 4L, 6L))
  }

  test("minhash LSH pair set equals exact Jaccard on the gate corpus (oracle premise)") {
    // The dedup_minhash DuckDB oracle computes EXACT-Jaccard connected
    // components; it equals the operator's answer iff LSH candidate recall
    // is 1 on the gate data (planted near-dups at J ≥ 0.889, nothing else
    // above 0.3 — per-pair miss probability (1-J⁴)¹⁶ ≈ 1.5e-7). This pins
    // that premise in-repo: if testdata or banding parameters drift, this
    // fails before the driver gate does.
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = d.select(col("doc_id").cast("long").as("id"),
      array_distinct(graft.functions.MinHashExpr.shingleHashes(
        split(trim(col("text")), "\\s+"), 3)).as("sh"))
    val exact = sh.toDF("id1", "sh1")
      .join(broadcast(sh.toDF("id2", "sh2")), col("id1") < col("id2"))
      .withColumn("j", Dedup.jaccard(col("sh1"), col("sh2")))
      .filter(col("j") >= 0.5).select("id1", "id2")
      .as[(Long, Long)].collect().toSet
    // collapseExact = false: this spec pins LSH candidate RECALL, which is
    // a property of the exhaustive enumeration (the default spanning pair
    // set is checked component-for-component in its own spec below).
    // bands = 16 pinned — the gate's geometry; the bands = 0 auto default
    // may legitimately choose a cheaper tier at its 0.95 target.
    val lsh = Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5,
        bands = 16, collapseExact = false)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "gate corpus must contain planted near-dups")
    assert(lsh == exact, s"missed=${(exact -- lsh).size} spurious=${(lsh -- exact).size}")
  }

  test("exact pre-collapse: spanning pairs are linear in duplication and " +
      "component-equivalent to the exhaustive enumeration") {
    // 3 exact groups of 4 copies each (ids i, 100+i, 200+i, 300+i), one
    // near-miss variant of doc 0 (id 400), plus unique docs. Exhaustive
    // pairs are quadratic in the group size (C(4,2)=6 per group per
    // component); the collapsed set must be 3 star edges per group plus
    // one rep pair — yet produce the identical kept set.
    val base = (0 until 8).map(i =>
      (i.toLong, (0 until 30).map(j => s"x${i}_$j").mkString(" ")))
    val copies = for (i <- 0 until 3; k <- 1 to 3)
      yield ((100 * k + i).toLong, base(i)._2)
    val nearMiss = Seq((400L, base(0)._2.replaceFirst("x\\d+_\\d+", "CHANGED")))
    val d = (base ++ copies ++ nearMiss).toDF("doc_id", "text")
    val collapsed = Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
    // Star edges anchor at the group's min id with jaccard exactly 1.0.
    val stars = collapsed.filter(_._3 == 1.0).map(p => (p._1, p._2)).toSet
    assert(stars == (for (i <- 0 until 3; k <- 1 to 3)
      yield (i.toLong, (100 * k + i).toLong)).toSet)
    // Spanning: 9 star edges + the (0, 400) near-dup rep pair — not the
    // exhaustive 3·C(4,2) + the 4·1 cross pairs of component {0's copies, 400}.
    assert(collapsed.length == 10, collapsed.mkString(","))
    val keptCollapsed = Dedup.dropDuplicatesByPairs(d, "doc_id",
        Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5))
      .select("doc_id").as[Long].collect().toSet
    val keptExhaustive = Dedup.dropDuplicatesByPairs(d, "doc_id",
        Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5,
          collapseExact = false))
      .select("doc_id").as[Long].collect().toSet
    assert(keptCollapsed == keptExhaustive)
    assert(keptCollapsed == (0L until 8L).toSet)
  }

  test("spanning contract holds for degenerate texts (shorter than the " +
      "shingle length, empty, whitespace-only)") {
    // Short docs get a whole-text shingle (never an empty set), so the
    // collapsed and exhaustive modes must agree even on texts the shingle
    // window cannot cover — pinned because a reviewer plausibly predicted
    // a divergence here (empty sets → no band keys on one side only).
    import org.apache.spark.sql.functions.col
    for (t <- Seq("hi", "", "   ")) {
      val d = Seq((1L, t), (2L, t), (3L, "unrelated words entirely different"))
        .toDF("doc_id", "text")
      def pairs(collapse: Boolean) =
        Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5,
            collapseExact = collapse)
          .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(pairs(true) == Set((1L, 2L)), s"collapsed drifted on '$t'")
      assert(pairs(false) == Set((1L, 2L)), s"exhaustive drifted on '$t'")
    }
  }

  test("sharedWindowStats flags cross-doc repeated spans and leaves unique docs at 0") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "one two three four five six seven eight nine ten"),
      (1L, "zz one two three four five six seven eight nine yy"), // shares 8-word windows with 0
      (2L, "totally different words in this unique document body text"),
      (3L, "short doc")
    ).toDF("doc_id", "text")
    val stats = Dedup.sharedWindowStats(docs, "text", "doc_id", window = 8)
      .select(col("doc_id"), col("total_windows"), col("shared_windows"),
        col("boiler_frac"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc 0: 3 windows (10 words), of which [1..8] and [2..9] appear in doc 1.
    assert(stats(0) == ((0L, 3L, 2L, 0.6667)), s"doc0: ${stats(0)}")
    // doc 1: 4 windows (11 words), shares the two interior ones.
    assert(stats(1) == ((1L, 4L, 2L, 0.5)), s"doc1: ${stats(1)}")
    assert(stats(2)._3 == 0L && stats(2)._4 == 0.0)
    assert(stats(3) == ((3L, 1L, 0L, 0.0)), s"short doc is one whole-text window: ${stats(3)}")
  }

  test("stripSharedWindows removes exactly the cross-doc covered words, case-insensitively") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "One two three four five six seven eight nine ten"),
      (1L, "zz one two three four five six seven eight nine yy"), // shares [1..8] and [2..9] of doc 0
      (2L, "totally different words in this unique document body text"),
      (3L, "short doc"),
      (4L, "short doc") // whole-doc window duplicated => strips to empty
    ).toDF("doc_id", "text")
    val out = Dedup.stripSharedWindows(docs, "text", "doc_id", window = 8)
      .select(col("doc_id"), col("n_removed"), col("clean_text"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // doc 0 (10 words): windows [One..eight] and [two..nine] recur in doc 1
    // (matched case-insensitively against "one two ..."), covering positions
    // 0..8 -> only the final word survives.
    assert(out(0) == ((0L, 9L, "ten")), s"doc0: ${out(0)}")
    // doc 1 (11 words): shared starts 1 and 2 cover 1..9 -> "zz" and "yy" survive.
    assert(out(1) == ((1L, 9L, "zz yy")), s"doc1: ${out(1)}")
    // unique doc untouched
    assert(out(2)._2 == 0L && out(2)._3 == "totally different words in this unique document body text")
    // duplicated short docs strip to empty via the whole-doc window
    assert(out(3) == ((3L, 2L, "")) && out(4) == ((4L, 2L, "")), s"${out(3)} ${out(4)}")
  }

  test("exactSubstrClean (Lee et al.) removes maximal cross-doc spans >= " +
      "the window, keeps shorter repeats, and chains adjacent spans") {
    import org.apache.spark.sql.functions._
    def ws(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val span60 = ws("s", 60)   // repeated 60-word span
    val span24 = ws("t", 24)   // repeated but BELOW the 25-word threshold
    val spanA = ws("a", 25)    // two adjacent 25-word spans, repeated
    val spanB = ws("b", 25)    //   contiguously in doc 6 and separately in 7/8
    val docs = Seq(
      (0L, s"${ws("p", 30)} $span60 ${ws("q", 30)}"),
      (1L, s"${ws("r", 30)} $span60 ${ws("u", 30)}"),
      (2L, s"${ws("v", 30)} $span24 ${ws("w", 30)}"),
      (3L, s"${ws("x", 30)} $span24 ${ws("y", 30)}"),
      (6L, s"${ws("c", 30)} $spanA $spanB ${ws("d", 30)}"),
      (7L, s"${ws("e", 30)} $spanA ${ws("f", 30)}"),
      (8L, s"${ws("g", 30)} $spanB ${ws("h", 30)}")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrClean(docs, "text", "doc_id", minMatchWords = 25)
      .select(col("doc_id"), col("n_removed"), col("clean_text"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // The 60-word span strips exactly; windows straddling the distinct
    // 30-word surroundings are unshared, so the surroundings survive whole.
    assert(out(0L) == ((60L, s"${ws("p", 30)} ${ws("q", 30)}")), out(0L).toString)
    assert(out(1L) == ((60L, s"${ws("r", 30)} ${ws("u", 30)}")), out(1L).toString)
    // A 24-word repeat is BELOW minMatchWords: no 25-window repeats, kept.
    assert(out(2L)._1 == 0L && out(3L)._1 == 0L,
      s"sub-threshold span must survive: ${out(2L)} ${out(3L)}")
    // Adjacent repeated spans chain: doc 6 loses the full 50-word run
    // (both spans covered, including the A→B seam via coverage union).
    assert(out(6L) == ((50L, s"${ws("c", 30)} ${ws("d", 30)}")), out(6L).toString)
    assert(out(7L)._1 == 25L && out(8L)._1 == 25L)
    // Intra-doc-only repetition is NOT cross-doc: a doc repeating its own
    // 30-word span keeps it (minDocs counts DISTINCT docs).
    val intra = Seq((9L, s"${ws("k", 30)} ${ws("k", 30)}"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactSubstrClean(intra, "text", "doc_id",
        minMatchWords = 25)
      .select("n_removed").as[Long].head()
    assert(kept == 0L, s"intra-doc repeat must survive the cross-doc cleaner")
  }

  test("exactSubstrClean caseSensitive: case-differing spans survive the " +
      "byte-exact mode and strip under the case-folding default") {
    import org.apache.spark.sql.functions._
    def ws(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val span = ws("s", 30)
    val docs = Seq(
      (0L, s"${ws("p", 30)} $span ${ws("q", 30)}"),
      (1L, s"${ws("r", 30)} ${span.toUpperCase} ${ws("u", 30)}"),
      // byte-identical pair: stripped in BOTH modes
      (2L, s"${ws("v", 30)} $span ${ws("w", 30)}"),
      (3L, s"${ws("x", 30)} ${span.toUpperCase} ${ws("y", 30)}")
    ).toDF("doc_id", "text")
    def removed(cs: Boolean) = Dedup.exactSubstrClean(docs, "text",
        "doc_id", minMatchWords = 25, caseSensitive = cs)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    val ci = removed(cs = false)
    // fold-case: all four share the folded span
    assert(ci.values.forall(_ == 30L), ci.toString)
    val cs = removed(cs = true)
    // byte-exact: 0↔2 share verbatim, 1↔3 share verbatim — still
    // stripped — but the CROSS-case sharing contributed nothing extra
    assert(cs.values.forall(_ == 30L), cs.toString)
    // now make every span case-UNIQUE: byte-exact must keep them all
    val uniq = Seq(
      (0L, s"${ws("p", 30)} $span ${ws("q", 30)}"),
      (1L, s"${ws("r", 30)} ${span.toUpperCase} ${ws("u", 30)}")
    ).toDF("doc_id", "text")
    val csU = Dedup.exactSubstrClean(uniq, "text", "doc_id",
        minMatchWords = 25, caseSensitive = true)
      .select("n_removed").as[Long].collect()
    assert(csU.forall(_ == 0L), "case-unique spans must survive byte-exact")
    val ciU = Dedup.exactSubstrClean(uniq, "text", "doc_id",
        minMatchWords = 25)
      .select("n_removed").as[Long].collect()
    assert(ciU.forall(_ == 30L), "case-unique spans fold together by default")
  }

  test("dropAgainstIndex drops exact and near dups of the indexed corpus, keeps intra-batch dups") {
    import org.apache.spark.sql.functions._
    val old = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (2L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),             // exact dup of 0
      (3L, "the quick brown fox jumps over the lazy dog now"), // near dup of 2 (J = 7/9)
      (5L, "completely novel content that matches nothing else here"),
      (7L, "completely novel content that matches nothing else here") // intra-batch dup: kept
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("incr").toString + "/idx"
    Dedup.saveDedupIndex(old, "text", "doc_id", path)
    val out = Dedup.dropAgainstIndex(fresh, "text", "doc_id", path, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(5L, 7L), out.toSeq.toString)
    // Signature params ride the index sidecar; a bands value that does not
    // divide the saved numHashes fails loudly instead of degrading recall.
    intercept[IllegalArgumentException] {
      Dedup.dropAgainstIndex(fresh, "text", "doc_id", path, threshold = 0.5, bands = 7)
        .count()
    }
  }

  test("componentIds maps every node to its component min, singletons to themselves") {
    import org.apache.spark.sql.functions.col
    val nodes = (0L until 8L).toDF("id")
    val edges = Seq((1L, 3L), (3L, 5L), (6L, 7L)).toDF("id1", "id2")
    def run(threshold: Long): Seq[(Long, Long)] =
      Dedup.componentIds(nodes, edges, driverEdgeThreshold = threshold)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val expected = Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L,
      5L -> 1L, 6L -> 6L, 7L -> 6L)
    assert(run(1000000L) == expected, "driver union-find branch")
    assert(run(0L) == expected, "distributed star-contraction branch")
  }

  test("ngramNovelty: shared spans lower novelty, unique docs score 1.0, " +
      "short docs use the whole-doc shingle") {
    val docs = Seq(
      // 0 and 1 share the 5-word prefix → 3 shared 3-grams each.
      (0L, "alpha beta gamma delta epsilon zeta eta"),   // 5 grams
      (1L, "alpha beta gamma delta epsilon theta iota"), // 5 grams
      (2L, "totally unique words nowhere else repeated"), // 4 grams, novel
      (3L, "tiny doc"),                                   // whole-doc shingle
      (4L, "tiny doc")                                    // exact dup of 3
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(docs, "text", "doc_id", n = 3)
      .select("id", "n_grams", "n_shared", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((0L, 5L, 3L, 0.4)))
    assert(out(1) == ((1L, 5L, 3L, 0.4)))
    assert(out(2) == ((2L, 4L, 0L, 1.0)))
    assert(out(3) == ((3L, 1L, 1L, 0.0)))
    assert(out(4) == ((4L, 1L, 1L, 0.0)))
  }

  test("softDedupWeights: 1/cluster-size weights, singletons at 1.0, and " +
      "expected mass = #clusters") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "a completely different document about spark engines"),
      (4L, "another unrelated text on tokenizer training corpora")
    ).toDF("doc_id", "text")
    val w = Dedup.softDedupWeights(docs, "text", "doc_id", threshold = 0.5)
      .select("id", "rep_id", "cluster_size", "weight")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(w.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
    // 0/1/2 form one near-dup cluster (rep 0), 3 and 4 are singletons.
    assert(w.take(3).forall(r => r._2 == 0L && r._3 == 3L &&
      math.abs(r._4 - 0.333333) < 1e-9))
    assert(w.drop(3).forall(r => r._2 == r._1 && r._3 == 1L && r._4 == 1.0))
    // Σ weights = #clusters (each cluster contributes one doc-equivalent),
    // up to the 6-digit rounding.
    assert(math.abs(w.map(_._4).sum - 3.0) < 1e-5)
  }

  test("star-contraction CC matches driver union-find on seeded random graphs") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val nodes = (0L until 300L).toDF("id")
    // Mixed shape: random unions + a few planted cliques and chains.
    val edges = (
      Seq.fill(250)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)) ++
      (0 until 10).map(i => (i.toLong, (i + 1).toLong)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))
    ).toDF("id1", "id2")
    val viaDriver = Dedup.keepAfterConnectedComponents(nodes, edges)
      .as[Long].collect().sorted.toSeq
    val viaStars = Dedup.keepAfterConnectedComponents(nodes, edges,
        driverEdgeThreshold = 0L)
      .as[Long].collect().sorted.toSeq
    assert(viaStars == viaDriver,
      s"distributed CC diverged: ${viaStars.take(20)} vs ${viaDriver.take(20)}")
  }

  test("star-contraction CC converges in O(log n) rounds on a chain graph") {
    import org.apache.spark.sql.functions._
    // A 1000-node chain is the adversarial case for label propagation
    // (diameter rounds); star contraction must finish inside the default
    // 25-round budget and keep exactly the chain head.
    val nodes = (0L until 1000L).toDF("id")
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("id1", "id2")
    val keep = Dedup.keepAfterConnectedComponents(nodes, edges,
        driverEdgeThreshold = 0L)
      .as[Long].collect().sorted.toSeq
    assert(keep == Seq(0L), s"chain must contract to its min id: ${keep.take(10)}")
  }

  test("connected components free their staged frames (public-API bound)") {
    import org.apache.spark.sql.functions._
    // Each call stages the edge frame and (distributed path) one checkpoint
    // per contraction round; without explicit release every dedup call pins
    // edge-set copies in executor storage for the application's lifetime.
    val nodes = (0L until 200L).toDF("id")
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("id1", "id2")
    // Driver union-find path: everything is consumed at collect time — no
    // persistent RDDs may survive the call.
    val b1 = spark.sparkContext.getPersistentRDDs.size
    Dedup.keepAfterConnectedComponents(nodes, edges).collect()
    assert(spark.sparkContext.getPersistentRDDs.size <= b1,
      s"driver path must release its staged edges: $b1 -> " +
        s"${spark.sparkContext.getPersistentRDDs.size}")
    // Distributed star-contraction path (a chain needs several rounds):
    // only the FINAL round's checkpoint may remain — the returned plan
    // reads its blocks; every earlier round and the staged input must go.
    val b2 = spark.sparkContext.getPersistentRDDs.size
    Dedup.keepAfterConnectedComponents(nodes, edges, driverEdgeThreshold = 0L)
      .collect()
    assert(spark.sparkContext.getPersistentRDDs.size <= b2 + 1,
      s"distributed path may keep only the final round: $b2 -> " +
        s"${spark.sparkContext.getPersistentRDDs.size}")
    // The Tracked variant hands that final round back as a release handle:
    // after materializing and unstaging, NOTHING from the call survives —
    // the long-lived-application contract.
    val b3 = spark.sparkContext.getPersistentRDDs.size
    val (keep, pin) = Dedup.keepAfterConnectedComponentsTracked(nodes, edges,
      driverEdgeThreshold = 0L)
    assert(pin.nonEmpty, "distributed path must expose its residual pin")
    keep.collect()
    graft.core.Persist.unstage(spark, pin)
    assert(spark.sparkContext.getPersistentRDDs.size <= b3,
      s"released handle must free the final round: $b3 -> " +
        s"${spark.sparkContext.getPersistentRDDs.size}")
    // Driver-path handle is empty: nothing survives to release.
    assert(Dedup.componentIdsTracked(nodes, edges)._2.isEmpty)
  }

  test("stripSharedWindows completes in bounded time on a fully-covered 100k-word doc") {
    import org.apache.spark.sql.functions._
    // Two identical 100k-word docs with all-distinct words: every one of the
    // ~100k windows is shared, so every position is covered. The old
    // `filter(words, (w, i) => !array_contains(covered, i))` rebuild is
    // O(words × covered) ≈ 10¹⁰ comparisons here (hours in one task); the
    // difference-array expression is O(words + starts). 60 s is generous.
    val text = Array.tabulate(100000)(i => s"w$i").mkString(" ")
    val docs = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = Dedup.stripSharedWindows(docs, "text", "doc_id", window = 8)
      .select(col("doc_id"), col("n_removed"), length(col("clean_text")).as("len"))
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"stripSharedWindows took $secs s on a fully-covered 100k-word doc")
    assert(out.toSeq == Seq((0L, 100000L, 0), (1L, 100000L, 0)), out.toSeq.toString)
  }

  test("stripRepeatedWindows drops later within-doc repeats, keeps first occurrence") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // windows of 3: "a b c" recurs at positions 0 and 5 -> positions 5..7 covered
      (0L, "a b c x y a b c z"),
      (1L, "all distinct words here today"),
      // case-insensitive window keys; original case survives in the rebuild
      (2L, "One Two Three pad one two three")
    ).toDF("doc_id", "text")
    val out = Dedup.stripRepeatedWindows(docs, "text", window = 3)
      .select(col("doc_id"), col("n_removed"), col("clean_text"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 3L, "a b c x y z")), out(0).toString)
    assert(out(1) == ((1L, 0L, "all distinct words here today")), out(1).toString)
    assert(out(2) == ((2L, 3L, "One Two Three pad")), out(2).toString)
    // Bounded on the adversarial fully-repetitive long doc (one per-row pass).
    val big = Seq((9L, Array.fill(100000)("w").mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val r = Dedup.stripRepeatedWindows(big, "text", window = 3)
      .select(col("n_removed")).as[Long].head()
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
    // Dup starts 1..99997 cover positions 1..99999; only word 0 survives.
    assert(r == 99999L, s"all but the first word drop: $r")
  }

  test("stripSharedWindows ignores spans repeated only within one doc") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "a b c d e f g h i j a b c d e f g h i j"), // window repeats within doc 0 only
      (1L, "completely unrelated second document with other words here")
    ).toDF("doc_id", "text")
    val out = Dedup.stripSharedWindows(docs, "text", "doc_id", window = 8)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().sortBy(_._1)
    assert(out.forall(_._2 == 0L), s"within-doc repeats must not strip: ${out.toSeq}")
  }

  test("dropDuplicatesByPairsKeepBest keeps the argmax, ties to min id") {
    import org.apache.spark.sql.functions._
    // Cluster {1,2,3}: 2 has the top score. Cluster {4,5}: tie → min id 4.
    // 6 is a singleton and always survives.
    val df = Seq(
      (1L, 10), (2L, 99), (3L, 50),
      (4L, 7), (5L, 7),
      (6L, 1)).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val kept = Dedup.dropDuplicatesByPairsKeepBest(df, "id", pairs, col("score"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L, 6L), kept.toString)
    // Min-id policy on the same graph differs (keeps 1, not 2).
    val minKept = Dedup.dropDuplicatesByPairs(df, "id", pairs)
      .select("id").as[Long].collect().sorted.toSeq
    assert(minKept == Seq(1L, 4L, 6L), minKept.toString)
  }

  test("lshPlan picks the factorization whose S-curve matches the threshold") {
    // (1/b)^(1/r) over 64 = b·r: r=8,b=8 → 0.771 (closest to 0.8);
    // r=4,b=16 → 0.5 exactly.
    assert(Dedup.lshPlan(64, 0.8) == ((8, 8)))
    assert(Dedup.lshPlan(64, 0.5) == ((16, 4)))
    // Near-1 thresholds want long rows (few, wide bands).
    val (bHi, rHi) = Dedup.lshPlan(64, 0.95)
    assert(rHi > 8 && bHi * rHi == 64)
    // The S-curve is monotone in s and ~0.5-steep near the implied threshold.
    val p = (s: Double) => Dedup.lshCandidateProbability(s, 8, 8)
    assert(p(0.4) < p(0.6) && p(0.6) < p(0.9))
    assert(p(0.95) > 0.9 && p(0.3) < 0.01)
    intercept[IllegalArgumentException] { Dedup.lshPlan(64, 1.0) }
    intercept[IllegalArgumentException] { Dedup.lshPlan(0, 0.5) }
  }

  test("dedupParagraphs keeps the globally-first paragraph occurrence and " +
      "reassembles survivors in order") {
    val docs = Seq(
      (1L, "alpha beta. shared boiler. gamma"),
      (2L, "shared boiler. delta delta"),          // loses its boilerplate
      (3L, "SHARED  boiler. epsilon"),             // normalized dup also lost
      (4L, "shared boiler")                        // fully deduped: disappears
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "alpha beta. shared boiler. gamma",
      2L -> "delta delta",
      3L -> "epsilon"))
    // Partitioning-independent: the keep-first winner is a total order on
    // (doc_id, position), not arrival order.
    val out7 = Dedup.dedupParagraphs(docs.repartition(7), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out7 == out)
    // Identity on duplicate-free corpora: split + keep-all + reassemble
    // must reproduce every document byte-for-byte.
    val unique = (0 until 40).map { i =>
      (i.toLong, s"first $i sentence. middle part $i. tail $i.")
    }.toDF("doc_id", "text")
    val id = Dedup.dedupParagraphs(unique, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(id == unique.as[(Long, String)].collect().toMap)
  }
}
