package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Classic DP Levenshtein — the independent referee for the brute force. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0)
      d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private def bruteForce(strs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (i1, s1) <- strs
      (i2, s2) <- strs
      if i1 < i2
      dist = lev(s1, s2)
      if dist <= d
    } yield (i1, i2, dist)).toSet

  private def run(strs: Seq[(Long, String)], d: Int, q: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceSelfJoin(strs.toDF("id", "s"), "id", "s", d, q)
      .as[(Long, Long, Int)].collect().toSet

  test("editDistanceSelfJoin equals brute force on randomized corpora " +
      "across (d, q) tiers — small alphabet forces dense near-matches") {
    // Alphabet 4 + lengths 0..13 make true pairs plentiful at every d,
    // including the short-route band (len < q·(d+1)) and cross-band pairs.
    val rng = new scala.util.Random(41)
    val strs = (0 until 130).map { i =>
      val n = rng.nextInt(14)
      (i.toLong, (0 until n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString)
    }
    for (d <- Seq(0, 1, 2, 3); q <- Seq(2, 3)) {
      val expected = bruteForce(strs, d)
      val got = run(strs, d, q)
      assert(got == expected,
        s"d=$d q=$q: missing=${(expected -- got).take(5)} " +
          s"extra=${(got -- expected).take(5)}")
      assert(expected.nonEmpty || d == 0, s"d=$d produced no true pairs")
    }
    // Rarest-first gram order changes candidates, never answers.
    val gotFreq = FuzzyJoin.editDistanceSelfJoin(strs.toDF("id", "s"),
        "id", "s", 2, 2, orderByFrequency = true)
      .as[(Long, Long, Int)].collect().toSet
    assert(gotFreq == bruteForce(strs, 2))
  }

  test("editDistanceSelfJoin: duplicates, empties, and null hygiene") {
    val strs = Seq((1L, ""), (2L, ""), (3L, "a"), (4L, "ab"), (5L, "abcdefgh"),
      (6L, "abcdefgh"), (7L, "abcdefxh"))
    val got = run(strs, 1, 2)
    val expected = bruteForce(strs, 1)
    assert(got == expected)
    assert(got.contains((1L, 2L, 0))) // two empties pair at distance 0
    assert(got.contains((5L, 6L, 0)) && got.contains((5L, 7L, 1)))
    // NULL ids / strings are dropped, not crashed on.
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(8L, null.asInstanceOf[String]),
        org.apache.spark.sql.Row(9L, "ab")),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("s", "string"))
    assert(FuzzyJoin.editDistanceSelfJoin(withNull, "id", "s", 2).count() == 0)
  }

  test("editDistanceSelfJoin scale shape: no cross join in the plan") {
    val df = (0 until 50).map(i => (i.toLong, s"string_number_$i")).toDF("id", "s")
    val plan = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"ED-Join must stay an equi-join candidate route:\n$plan")
  }

  private def shingles(text: String, n: Int = 3): Set[String] = {
    val w = text.trim.split("\\s+").toSeq
    if (w.length <= n) Set(w.mkString(" "))
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  test("containmentPairs equals brute force and catches the asymmetric " +
      "quote case Jaccard misses") {
    val rng = new scala.util.Random(17)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0 until 40).map { i =>
      val n = 4 + rng.nextInt(20)
      (i.toLong, (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    } ++ Seq(
      // doc 100 is a verbatim quote inside the much longer doc 101.
      (100L, "alpha beta gamma delta epsilon"),
      (101L, ("alpha beta gamma delta epsilon " +
        (0 until 60).map(i => s"pad$i").mkString(" "))))
    val c = 0.6
    val got = FuzzyJoin.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", 3, c)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // Frequency-ordered probes change CANDIDATES, never answers.
    val gotFreq = FuzzyJoin.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", 3, c, orderByFrequency = true)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(gotFreq == got, "rarest-first probe order must be exact")
    val expected = (for {
      (i1, t1) <- docs
      (i2, t2) <- docs
      if i1 != i2
      a = shingles(t1); b = shingles(t2)
      if a.intersect(b).size.toDouble / a.size >= c
    } yield (i1, i2)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(got.contains((100L, 101L)), "quote containment must be found")
    assert(!got.contains((101L, 100L)), "containment is asymmetric")
    // Jaccard on the same pair is far below the containment score.
    val a = shingles(docs.find(_._1 == 100L).get._2)
    val b = shingles(docs.find(_._1 == 101L).get._2)
    assert(a.intersect(b).size.toDouble / a.union(b).size < 0.1)
  }

  test("candidate budgets refuse loudly before the join on both routes") {
    val dense = (0 until 40).map(i => (i.toLong, "aaaa aaab aaba")).toDF("id", "s")
    val e1 = intercept[IllegalStateException](
      FuzzyJoin.editDistanceSelfJoin(dense, "id", "s", 2,
        maxCandidatePairs = 10L).count())
    assert(e1.getMessage.contains("maxCandidatePairs"))
    val e2 = intercept[IllegalStateException](
      FuzzyJoin.containmentPairs(dense, "id", "s", 3, 0.5,
        maxCandidatePairs = 10L).count())
    assert(e2.getMessage.contains("maxCandidatePairs"))
    // Under an adequate budget the same corpus runs to completion.
    assert(FuzzyJoin.containmentPairs(dense, "id", "s", 3, 0.5,
      maxCandidatePairs = 1 << 20).count() > 0)
  }

  test("containmentPairs knife-edge threshold: float-rounding of c·|A| " +
      "must not under-size the probe prefix") {
    // c = 0.07, |A| = 100 distinct 1-word shingles: 100·0.07 computes as
    // 7.000000000000001, so an unguarded ceil() gives 8 and a probe one
    // gram SHORT. The 7 shared grams are planted at the very TAIL of the
    // md5 probe order — the under-sized prefix deterministically misses
    // the pair; the guarded prefix must find it (overlap 7/100 ≥ 0.07
    // passes the double-compared verify).
    val words = (0 until 100).map(i => f"tok$i%03d")
    val ordered = words.toDF("w")
      .select(col("w"), md5(element_at(
        graft.functions.MinHashExpr.shingleHashes(array(col("w")), 1),
        1).cast("string")).as("h"))
      .orderBy("h").as[(String, String)].collect().map(_._1)
    val shared = ordered.takeRight(7)
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, (shared ++ (0 until 80).map(i => s"pad$i")).mkString(" ")))
    val got = FuzzyJoin.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleLen = 1, minContainment = 0.07)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)),
      "knife-edge containment pair missed — probe prefix under-sized")
  }

  test("dropContained: quote chains drop every contained member; mutual " +
      "containment keeps exactly one; outscoring containee survives") {
    val full = (0 until 30).map(i => s"w$i").mkString(" ")
    val twoThirds = (0 until 20).map(i => s"w$i").mkString(" ")
    val third = (0 until 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // chain a⊂b⊂c → only c (id 3) survives
      (1L, third), (2L, twoThirds), (3L, full),
      // mutual containment (identical) → min id (10) survives
      (10L, "x1 x2 x3 x4 x5 x6"), (11L, "x1 x2 x3 x4 x5 x6"),
      // unrelated doc survives untouched
      (20L, "z1 z2 z3 z4 z5 z6 z7 z8"))
    val kept = FuzzyJoin.dropContained(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleLen = 3, minContainment = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 10L, 20L), s"kept $kept")
  }

  test("containmentPairs honors the probe-prefix bound at high thresholds") {
    // c = 1.0 → probe prefix of size 1: full containment must still be
    // exact with the minimal probe.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f g h i j"),
      (3L, "x y z q r s")).toDF("doc_id", "text")
    val got = FuzzyJoin.containmentPairs(docs, "doc_id", "text", 3, 1.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
