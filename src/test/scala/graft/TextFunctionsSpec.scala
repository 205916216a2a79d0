package graft

import org.apache.spark.sql.functions._
import graft.functions.{MultimodalOps, TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "the quick brown fox jumps over the lazy dog."),
    (2L, "der hund ist nicht ein katze und das ist gut"),
    (3L, "!!!???...."),
    (4L, "solo palabras el los de que y en un por aqui")
  ).toDF("id", "text")

  test("tokenCount counts whitespace tokens") {
    val m = df.select($"id", TF.tokenCount($"text").as("n")).as[(Long, Int)].collect().toMap
    assert(m(1L) == 9)
    assert(m(3L) == 1)
  }

  test("punctRatio is 1.0 for all-punct strings") {
    val m = df.select($"id", TF.punctRatio($"text").as("p")).as[(Long, Double)].collect().toMap
    assert(m(3L) == 1.0)
    assert(m(1L) > 0 && m(1L) < 0.1)
  }

  test("stopwordRatio sees English stopwords") {
    val m = df.select($"id", TF.stopwordRatio($"text").as("s")).as[(Long, Double)].collect().toMap
    assert(m(1L) > 0.2) // "the" twice + "over"... of 9
    assert(m(3L) == 0.0)
  }

  test("langId picks the dominant lexicon") {
    val m = df.select($"id", TF.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(m(1L) == "en")
    assert(m(2L) == "de")
    assert(m(4L) == "es")
    assert(m(3L) == "en") // zero hits → first lexicon wins deterministically
  }

  test("fingerprint is whitespace/case-insensitive") {
    val two = Seq(("A  B\tC"), ("a b c")).toDF("t")
      .select(TF.fingerprint($"t").as("f")).as[String].collect()
    assert(two(0) == two(1))
  }

  test("qualityScore stays in [0,1]") {
    val vals = df.select(TF.qualityScore($"text").as("q")).as[Double].collect()
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("winnowFingerprint is stable and content-sensitive") {
    val f = Seq(("a b c d e f g h i j"), ("a b c d e f g h i j"), ("x y z"))
      .toDF("t").select(TF.winnowFingerprint($"t").as("w")).as[Long].collect()
    assert(f(0) == f(1) && f(0) != f(2))
  }

  test("multimodal stub decode keeps batch shape and schema") {
    val bin = df.select($"id", to_binary($"text", lit("utf-8")).as("img"))
    val out = MultimodalOps.decodeMeta(bin, "img")
    assert(out.columns.toSeq ==
      Seq("id", "img", "media_bytes", "media_width", "media_height", "media_frames"))
    val r = out.filter($"id" === 3).select("media_bytes").as[Int].head()
    assert(r == 10)
  }
}
