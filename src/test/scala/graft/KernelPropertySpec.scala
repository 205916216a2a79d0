package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the pure kernels (no Spark session): the
  * serialization/parse pair, placeholder extraction, minhash similarity
  * estimation, simhash locality, and the token estimator. These kernels
  * decide correctness of every gate query, so they get generator coverage
  * beyond the examples.
  */
class KernelPropertySpec extends AnyFunSuite {

  test("LongSetOps.compute equals reference set-Jaccard on random long " +
      "arrays — sorted or not, duplicates or not, empty included") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      Prop.forAll(Gen.listOf(Gen.chooseNum(-50L, 50L)),
          Gen.listOf(Gen.chooseNum(-50L, 50L))) { (a, b) =>
        val ref = {
          val (sa, sb) = (a.toSet, b.toSet)
          val uni = (sa ++ sb).size
          if (uni == 0) 1.0 else (sa & sb).size.toDouble / uni
        }
        val got = graft.functions.LongSetOps.compute(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray))
        got == ref
      })
    assert(res.passed, res.status.toString)
  }

  private def check(p: Prop, tests: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(res.passed, res.status.toString)
  }

  private val cleanString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString.trim)

  test("DEFAULT serialization round-trips through DocParse") {
    check(Prop.forAll(Gen.listOfN(3, cleanString)) { vals =>
      val cols = Seq("Alpha", "Beta", "Gamma")
      val doc = cols.lazyZip(vals).map((c, v) => s"[$c]: «$v»\n").mkString
      val parsed = graft.llm.DocParse.fieldSeq(doc)
      parsed.map(_._1) == cols && parsed.map(_._2) == vals
    })
  }

  test("NLExpr extracts exactly the placeholder columns") {
    val colName = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
    check(Prop.forAll(Gen.listOfN(3, colName)) { cols =>
      val distinct = cols.distinct
      val instr = distinct.map(c => s"{$c}").mkString("use ", " and ", " please")
      graft.core.NLExpr.parse(instr).cols.toSet == distinct.toSet
    })
  }

  test("minhash signature similarity tracks true Jaccard") {
    // Shared-prefix documents: vary the overlap; the fraction of matching
    // signature slots must approximate the true shingle Jaccard.
    val gen = for {
      total <- Gen.choose(30, 80)
      shared <- Gen.choose(5, 25)
    } yield (total, shared)
    check(Prop.forAll(gen) { case (total, shared) =>
      val common = (0 until shared).map(i => s"c$i")
      val a = common ++ (0 until total - shared).map(i => s"a$i")
      val b = common ++ (0 until total - shared).map(i => s"b$i")
      val sa = MiniHash.sig(a, 256)
      val sb = MiniHash.sig(b, 256)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
      val trueJ = MiniHash.jaccard(MiniHash.shingles(a), MiniHash.shingles(b))
      math.abs(est - trueJ) < 0.15
    }, tests = 40)
  }

  test("rate schedule: sliding-window invariants on random request streams") {
    // At every grant instant, the live window (grants newer than now−W,
    // inclusive of the new one) must respect BOTH limits, and grants must
    // be monotone — the invariant acquire() enforces, checked on the pure
    // recurrence the rate_limit_schedule gate verifies.
    val gen = for {
      n <- Gen.choose(1, 60)
      toks <- Gen.listOfN(n, Gen.choose(1, 10))
      rpm <- Gen.choose(1, 6)
      tpm <- Gen.choose(20, 60)
    } yield (toks, rpm, tpm)
    check(Prop.forAll(gen) { case (toks, rpm, tpm) =>
      val w = 1000L
      val cap = (tpm * 0.95).toLong
      val g = graft.llm.RateGovernor.schedule(toks, rpm, tpm, w)
      val mono = g.lazyZip(g.drop(1)).forall(_ <= _)
      val windows = g.indices.forall { i =>
        val live = (0 to i).filter(j => g(j) > g(i) - w)
        live.length <= rpm && live.map(toks(_).toLong).sum <= cap
      }
      mono && windows
    })
  }

  test("simhash: identical token lists collide, disjoint ones differ") {
    check(Prop.forAll(Gen.choose(10, 60)) { n =>
      val a = (0 until n).map(i => s"tok$i")
      val h1 = MiniHash.simhash(a)
      val same = h1 == MiniHash.simhash(a)
      val dist = java.lang.Long.bitCount(h1 ^ MiniHash.simhash((0 until n).map(i => s"other$i")))
      same && dist > 8
    }, tests = 40)
  }

  test("token estimate is positive and near-subadditive under concatenation") {
    check(Prop.forAll(cleanString, cleanString) { (a, b) =>
      val ta = graft.llm.Tokens.estimate(a)
      val tb = graft.llm.Tokens.estimate(b)
      val tc = graft.llm.Tokens.estimate(a + " " + b)
      ta >= 1 && tb >= 1 && tc <= ta + tb + 1
    })
  }
}

/** Local-evaluation helpers around the catalyst expressions. */
object MiniHash {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private def arr(words: Seq[String]) =
    Literal.create(ArrayData.toArrayData(words.map(UTF8String.fromString).toArray),
      ArrayType(StringType))

  def sig(words: Seq[String], n: Int): Seq[Long] =
    graft.functions.MinHashSignature(arr(words), 3, n).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq

  def simhash(words: Seq[String]): Long =
    graft.functions.SimHash64(arr(words)).eval(null).asInstanceOf[Long]

  def shingles(words: Seq[String]): Set[Seq[String]] =
    if (words.length <= 3) Set(words)
    else (0 to words.length - 3).map(i => words.slice(i, i + 3)).toSet

  def jaccard[A](a: Set[A], b: Set[A]): Double =
    if ((a ++ b).isEmpty) 1.0 else (a & b).size.toDouble / (a ++ b).size
}
