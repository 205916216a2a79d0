package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap breaks open new 0-based sessions per key") {
    val d = Seq(
      (1L, "u1", 100L), (2L, "u1", 150L), (3L, "u1", 400L), // gap 250 > 100
      (4L, "u1", 450L),
      (5L, "u2", 100L) // other key independent
    ).toDF("id", "user", "ts")
    val out = Temporal.sessionize(d, "user", "ts", maxGap = 100L)
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("sessionize: exact-gap events stay in the same session") {
    val d = Seq((1L, "u", 0L), (2L, "u", 100L)).toDF("id", "user", "ts")
    val out = Temporal.sessionize(d, "user", "ts", maxGap = 100L)
      .select("session_id").as[Long].collect().toSet
    assert(out == Set(0L))
  }

  test("asofJoin: picks the most recent prior-or-equal right per key") {
    val clicks = Seq((1L, "u1", 100L), (2L, "u1", 300L), (3L, "u2", 50L))
      .toDF("id", "user", "ts")
    val views = Seq((10L, "u1", 90L, 1.5), (11L, "u1", 100L, 2.5),
      (12L, "u1", 250L, 3.5), (13L, "u2", 60L, 9.9))
      .toDF("id", "user", "ts", "v")
    val out = Temporal.asofJoin(clicks, views, Seq("user"), "ts",
        rightCols = Seq("id", "v"), suffix = "_v")
      .select("id", "id_v", "v_v").as[(Long, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(11L), Some(2.5)))) // equal-ts right matches
    assert(out(2L) == ((Some(12L), Some(3.5)))) // latest prior wins
    assert(out(3L) == ((None, None)))           // no view at/before ts=50
  }

  test("asofJoin: forward picks earliest at-or-after; tolerance discards far matches") {
    val clicks = Seq((1L, "u1", 100L), (2L, "u1", 300L), (3L, "u2", 50L))
      .toDF("id", "user", "ts")
    val views = Seq((10L, "u1", 90L, 1.5), (11L, "u1", 100L, 2.5),
      (12L, "u1", 250L, 3.5), (13L, "u2", 500L, 9.9))
      .toDF("id", "user", "ts", "v")
    def run(dir: String, tol: Option[Long]) =
      Temporal.asofJoin(clicks, views, Seq("user"), "ts",
          rightCols = Seq("id"), suffix = "_v", direction = dir, tolerance = tol)
        .select("id", "id_v").as[(Long, Option[Long])].collect().toMap
    val fwd = run("forward", None)
    assert(fwd(1L) == Some(11L)) // equal-ts right matches forward too
    assert(fwd(2L).isEmpty)      // no later view for u1
    assert(fwd(3L) == Some(13L)) // u2's only view is ahead
    val fwdTol = run("forward", Some(100L))
    assert(fwdTol(3L).isEmpty)   // 500 - 50 > 100 → discarded
    val backTol = run("backward", Some(10L))
    assert(backTol(1L) == Some(11L)) // distance 0 within any tolerance
    assert(backTol(2L).isEmpty)      // 300 - 250 = 50 > 10 → discarded
  }

  test("asofJoin: nearest picks the closer side, ties prefer backward") {
    val clicks = Seq((1L, "u1", 100L), (2L, "u1", 201L), (3L, "u1", 400L))
      .toDF("id", "user", "ts")
    val views = Seq((10L, "u1", 60L, 0.0), (11L, "u1", 140L, 0.0),
      (12L, "u1", 262L, 0.0)).toDF("id", "user", "ts", "v")
    val near = Temporal.asofJoin(clicks, views, Seq("user"), "ts",
        rightCols = Seq("id"), suffix = "_v", direction = "nearest")
      .select("id", "id_v").as[(Long, Option[Long])].collect().toMap
    assert(near(1L) == Some(10L)) // |100-60| = |100-140| = 40 → backward wins
    assert(near(2L) == Some(11L)) // 61 back vs 61 forward... backward (tie)
    assert(near(3L) == Some(12L)) // only side available
    // nearest with tolerance: both candidates beyond it → null.
    val nt = Temporal.asofJoin(clicks, views, Seq("user"), "ts",
        rightCols = Seq("id"), suffix = "_v", direction = "nearest",
        tolerance = Some(30L))
      .select("id", "id_v").as[(Long, Option[Long])].collect().toMap
    assert(nt(1L).isEmpty && nt(2L).isEmpty)
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(clicks, views, Seq("user"), "ts", Seq("id"),
        direction = "sideways")
    }
  }

  test("asofJoin: nearest re-sorts but never re-shuffles (one exchange)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val clicks = (0 until 100).map(i => (i.toLong, s"u${i % 5}", i.toLong * 10))
        .toDF("id", "user", "ts")
      val views = (0 until 100).map(i => (1000L + i, s"u${i % 5}", i.toLong * 7, i * 1.0))
        .toDF("id", "user", "ts", "v")
      val plan = Temporal.asofJoin(clicks, views, Seq("user"), "ts",
          rightCols = Seq("id", "v"), direction = "nearest")
        .queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.length <= 2, // one per union branch pre-union at most
        s"nearest must not add exchanges beyond the key shuffle: ${shuffles.length}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("asofJoin matches a brute-force model on seeded random inputs, all directions") {
    val rng = new scala.util.Random(421)
    // Odd timestamps for rights, even for lefts — plus deliberate exact
    // collisions — so same-instant matching is exercised but within-side
    // ties (which the operator leaves unspecified) cannot occur.
    val lefts = (0 until 120).map(i =>
      (i.toLong, s"u${rng.nextInt(6)}", rng.nextInt(500).toLong * 2))
    val rights = (0 until 150).map(i =>
      (1000L + i, s"u${rng.nextInt(6)}",
        if (i % 10 == 0) lefts(i % lefts.size)._3 else rng.nextInt(500).toLong * 2 + 1))
    val dedupRights = rights.groupBy(r => (r._2, r._3)).map(_._2.head).toSeq
    val lDf = lefts.toDF("id", "user", "ts")
    val rDf = dedupRights.toDF("id", "user", "ts")
    def model(dir: String, tol: Option[Long]): Map[Long, Option[Long]] =
      lefts.map { case (lid, u, lts) =>
        val cands = dedupRights.filter(_._2 == u)
        def ok(rts: Long) = tol.forall(t => math.abs(lts - rts) <= t)
        val back = cands.filter(r => r._3 <= lts && ok(r._3))
          .sortBy(r => (-r._3, r._1)).headOption
        val fwd = cands.filter(r => r._3 >= lts && ok(r._3))
          .sortBy(r => (r._3, r._1)).headOption
        val pick = dir match {
          case "backward" => back
          case "forward" => fwd
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (f._3 - lts < lts - b._3) Some(f) else Some(b)
            case (b, f) => b.orElse(f)
          }
        }
        lid -> pick.map(_._1)
      }.toMap
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(37L), Some(0L))) {
      val got = Temporal.asofJoin(lDf, rDf, Seq("user"), "ts",
          rightCols = Seq("id"), suffix = "_r", direction = dir, tolerance = tol)
        .select("id", "id_r").as[(Long, Option[Long])].collect().toMap
      assert(got == model(dir, tol), s"direction=$dir tolerance=$tol")
    }
  }

  test("asofJoin: single shuffle on the key — no cross/range join in the plan") {
    val clicks = (0 until 200).map(i => (i.toLong, s"u${i % 5}", i.toLong * 10))
      .toDF("id", "user", "ts")
    val views = (0 until 200).map(i => (1000L + i, s"u${i % 5}", i.toLong * 7, i * 1.0))
      .toDF("id", "user", "ts", "v")
    val out = Temporal.asofJoin(clicks, views, Seq("user"), "ts",
      rightCols = Seq("id", "v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not lower to a product join:\n$plan")
    assert(out.count() == 200)
  }

  test("rangeJoin: inclusive containment, overlap multiplicity, negative domain") {
    val pts = Seq((1L, -25L), (2L, 0L), (3L, 10L), (4L, 99L), (5L, 250L))
      .toDF("pid", "pt")
    val ivs = Seq((10L, -30L, 0L), (11L, 0L, 99L), (12L, 50L, 150L))
      .toDF("iid", "lo", "hi")
    val out = Temporal.rangeJoin(pts, "pt", ivs, "lo", "hi", bucketWidth = 40L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 10L),            // negative bucket: floor, not truncate
      (2L, 10L), (2L, 11L), // inclusive on both ends, 2 overlapping hits
      (3L, 11L),
      (4L, 11L), (4L, 12L)  // pt 250 matches nothing
    ), out.toString)
  }

  test("rangeJoin: equi-join plan (no product join) and oversize-interval refusal") {
    val pts = (0 until 500).map(i => (i.toLong, i.toLong * 3)).toDF("pid", "pt")
    val ivs = (0 until 50).map(i => (i.toLong, i * 30L, i * 30L + 29L))
      .toDF("iid", "lo", "hi")
    val out = Temporal.rangeJoin(pts, "pt", ivs, "lo", "hi", bucketWidth = 30L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must bucketize to an equi-join:\n$plan")
    // every point pt in [lo, hi] of its tiling interval exactly once
    assert(out.count() == pts.as[(Long, Long)].collect()
      .count { case (_, p) => p / 30 < 50 })
    val wide = Seq((0L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      Temporal.rangeJoin(pts, "pt", wide, "lo", "hi", bucketWidth = 10L,
        maxBucketsPerInterval = 16).count()
    }
    assert(e.getMessage.contains("rangeJoin") || e.getCause != null, e.toString)
  }

  test("rangeJoinDiagnostics surfaces a degenerate (too-wide) bucketWidth") {
    // 1000 points over [0, 1000), 20 unit-length intervals. A sane width
    // (≈ interval length) prunes nearly all pairs; a width swallowing the
    // whole domain produces exactly points × intervals candidates — the
    // silent near-cross-join the diagnostic exists to expose.
    val pts = (0L until 1000L).map(t => Tuple1(t)).toDF("pt")
    val ivs = (0 until 20).map { i => (i * 50L, i * 50L + 1L) }.toDF("lo", "hi")
    val sane = Temporal.rangeJoinDiagnostics(pts, "pt", ivs, "lo", "hi", bucketWidth = 10L)
    assert(sane.candidatePairs < 1000L, s"sane width prunes: $sane")
    assert(sane.crossJoinFraction < 0.05, sane.describe)
    assert(!sane.describe.contains("far wider"), sane.describe)

    val degenerate = Temporal.rangeJoinDiagnostics(pts, "pt", ivs, "lo", "hi",
      bucketWidth = 1000000L)
    assert(degenerate.pointBuckets == 1L && degenerate.intervalBuckets == 1L)
    assert(degenerate.candidatePairs == 1000L * 20L,
      s"one bucket holds everything: $degenerate")
    assert(degenerate.crossJoinFraction == 1.0)
    assert(degenerate.describe.contains("far wider"), degenerate.describe)
    // The diagnostic and the join share the interval guard.
    val e = intercept[Exception] {
      Temporal.rangeJoinDiagnostics(pts, "pt", ivs, "lo", "hi", bucketWidth = 1L,
        maxBucketsPerInterval = 1).candidatePairs
    }
    assert(e.getMessage.contains("rangeJoinDiagnostics") || e.getCause != null)
  }

  test("rangeJoin equals the naive containment join on seeded random inputs") {
    val rnd = new scala.util.Random(7)
    for (width <- Seq(7L, 40L, 137L)) {
      val pts = (0 until 80).map(i => (i.toLong, rnd.between(-200L, 200L)))
        .toDF("pid", "pt")
      val ivs = (0 until 30).map { i =>
        val a = rnd.between(-220L, 180L)
        (i.toLong, a, a + rnd.between(0L, 60L))
      }.toDF("iid", "lo", "hi")
      val got = Temporal.rangeJoin(pts, "pt", ivs, "lo", "hi", width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = pts.crossJoin(ivs).filter($"pt" >= $"lo" && $"pt" <= $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want, s"width $width: ${got.diff(want)} / ${want.diff(got)}")
    }
  }
}
