package graft

import org.apache.spark.sql.functions._
import graft.operators.Evals

class EvalAggSpec extends SparkSpec {
  import spark.implicits._

  private def choose(n: Int, k: Int): BigDecimal =
    if (k > n) BigDecimal(0)
    else (0 until k).foldLeft(BigDecimal(1))((a, i) =>
      a * (n - i) / BigDecimal(i + 1))

  test("passAtK equals the exact combinatorial formula on random counts") {
    val rng = new scala.util.Random(29)
    val rows = (0 until 30).flatMap { p =>
      val n = 12 + rng.nextInt(20)
      val c = rng.nextInt(n + 1)
      (0 until n).map(i => (p.toLong, i < c))
    }
    val got = Evals.passAtK(rows.toDF("problem", "ok"), "problem", "ok",
        Seq(1, 5, 10))
      .select("problem", "n", "c", "pass_at_10")
      .as[(Long, Long, Long, Double)].collect()
    got.foreach { case (_, n, c, p10) =>
      val expected = 1.0 -
        (choose((n - c).toInt, 10) / choose(n.toInt, 10)).toDouble
      assert(math.abs(p10 - expected) < 1e-12, s"n=$n c=$c")
    }
    // c = n must be exactly 1.0 (short-circuit, not 1 - tiny).
    val full = Evals.passAtK(Seq((1L, true), (1L, true)).toDF("p", "ok"),
      "p", "ok", Seq(2)).select("pass_at_2").as[Double].head()
    assert(full == 1.0)
    // n < k is rejected loudly.
    val e = intercept[IllegalArgumentException](
      Evals.passAtK(Seq((1L, true)).toDF("p", "ok"), "p", "ok", Seq(5))
        .collect())
    assert(e.getMessage.contains("fewer samples"))
  }

  test("selfConsistency: majority with (count desc, answer asc) tie-break") {
    val rows = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),          // clear majority b
      (2L, "z"), (2L, "a"),                      // tie -> a (smaller)
      (3L, "x"))                                 // singleton
    val got = Evals.selfConsistency(rows.toDF("p", "ans"), "p", "ans")
      .select("p", "majority_answer", "majority_count", "n_samples", "agreement")
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "b", 2L, 3L, 2.0 / 3.0)))
    assert(got(1) == ((2L, "a", 1L, 2L, 0.5)))
    assert(got(2) == ((3L, "x", 1L, 1L, 1.0)))
  }
}
