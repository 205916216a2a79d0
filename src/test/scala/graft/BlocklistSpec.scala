package graft

import org.apache.spark.sql.functions._
import graft.functions.BlocklistExpr

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def matches(text: String, pats: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(BlocklistExpr.blocklistMatches(col("t"), pats).as("m"))
      .head().getSeq[String](0)

  test("distinct patterns present, in pattern-list order, substring " +
      "semantics incl. phrases") {
    val pats = Seq("drop table", "spark", "scan")
    assert(matches("a SPARK scan then drop  table", pats) ==
      Seq("spark", "scan")) // double space breaks the phrase
    assert(matches("please drop table users with a scan", pats) ==
      Seq("drop table", "scan"))
    assert(matches("nothing here", pats) == Seq.empty)
  }

  test("overlapping and nested patterns all report; repeats report once") {
    // "scan" occurs inside "rescanned"; "can" overlaps "scan"
    assert(matches("rescanned and rescanned again", Seq("can", "scan", "anne")) ==
      Seq("can", "scan", "anne"))
    assert(matches("scan scan scan", Seq("scan")) == Seq("scan"))
    // shared-prefix patterns via the automaton's fail links
    assert(matches("she shells", Seq("she", "shell", "hell", "he")) ==
      Seq("she", "shell", "hell", "he"))
  }

  test("case-insensitive on both sides; patterns echo their given form") {
    assert(matches("SPARK inside", Seq("Spark")) == Seq("Spark"))
    assert(matches("spark inside", Seq("SPARK")) == Seq("SPARK"))
  }

  test("kernel semantics equal the per-pattern contains() it collapses " +
      "on a generated corpus") {
    val rng = new scala.util.Random(11)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "scan", "spark",
      "table", "drop", "slow", "query")
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 12).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("id", "text")
    val pats = Seq("spark", "slow query", "drop table", "scan", "amm")
    val viaKernel = docs.select(col("id"),
        BlocklistExpr.blocklistMatches(col("text"), pats).as("m"))
      .as[(Long, Seq[String])].collect().toMap
    val viaContains = docs.select(col("id"),
        filter(typedLit(pats), p => contains(lower(col("text")), p)).as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaKernel == viaContains)
    // "amm" inside "gamma" — substring semantics must be live somewhere
    assert(viaKernel.values.exists(_.contains("amm")))
  }

  test("degenerate pattern lists refuse loudly") {
    val df = Seq(Tuple1("x")).toDF("t")
    def run(pats: Seq[String]) =
      df.select(BlocklistExpr.blocklistMatches(col("t"), pats)).collect()
    assert(intercept[Throwable](run(Seq.empty)).getMessage != null)
    assert(intercept[Throwable](run(Seq(""))).getMessage != null)
    // duplicates AFTER lowercasing collide silently — refused
    assert(intercept[Throwable](run(Seq("Spark", "spark"))).getMessage != null)
  }

  test("null text is null out; empty text matches nothing") {
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(BlocklistExpr.blocklistMatches(col("t"), Seq("x"))).head()
    assert(r.isNullAt(0))
    assert(matches("", Seq("x")) == Seq.empty)
  }
}
