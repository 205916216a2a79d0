package graft

import org.apache.spark.sql.functions._
import graft.core.{ReasoningStrategy, Sem}
import graft.llm.{FakeBehavior, FakeLM}
import graft.llm.Prompts.Example

class SemOpsSpec extends SparkSpec {
  import spark.implicits._

  private def reviews = Seq(
    (1L, "Great product and fast delivery"),
    (2L, "Terrible service with a delay"),
    (3L, "Average experience overall"),
    (4L, "Another delay ruined my day")
  ).toDF("id", "text")

  test("semFilter keeps matching rows") {
    val out = Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("delay"))) {
      reviews.semFilter("the {text} mentions a delay")
    }
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    assert(out.columns.toSeq == Seq("id", "text"))
  }

  test("semFilter returnAll attaches the label column") {
    val out = Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("delay"))) {
      reviews.semFilter("the {text} mentions a delay", returnAll = true)
    }
    assert(out.columns.contains("_filter"))
    assert(out.filter(col("_filter")).count() == 2)
    assert(out.count() == 4)
  }

  test("semFilter falls back to default on unparseable answers") {
    val outTrue = Sem.withLM(FakeLM(FakeBehavior.Scripted(Seq("gibberish")))) {
      reviews.semFilter("the {text} is anything", default = true)
    }
    assert(outTrue.count() == 4)
    val outFalse = Sem.withLM(FakeLM(FakeBehavior.Scripted(Seq("gibberish")))) {
      reviews.semFilter("the {text} is anything", default = false)
    }
    assert(outFalse.count() == 0)
  }

  test("semMap appends the suffix column") {
    val out = Sem.withLM(FakeLM(FakeBehavior.FirstWords("Text", 2))) {
      reviews.semMap("first words of {text}")
    }
    assert(out.filter($"id" === 1).select("_map").as[String].head() == "Great product")
  }

  test("semMap CoT strategy splits reasoning from answer") {
    val out = Sem.withLM(FakeLM(FakeBehavior.Scripted(
      Seq("Reasoning:\nbecause\n\nAnswer: final words")))) {
      reviews.semMap("whatever of {text}", strategy = ReasoningStrategy.ZsCot,
        returnExplanations = true)
    }
    val row = out.filter($"id" === 1).select("_map", "explanation_map").head()
    assert(row.getString(0) == "final words")
    assert(row.getString(1) == "because")
  }

  test("semMap few-shot examples reach the prompt") {
    // Echo returns the serialized context of the last user message — examples
    // precede it, so output is still just the row's doc; but the prompt build
    // must not fail with examples present.
    val out = Sem.withLM(FakeLM(FakeBehavior.Echo)) {
      reviews.semMap("map {text}",
        examples = Seq(Example("[Text]: «ex»\n", "answer", Some("why"))))
    }
    assert(out.count() == 4)
  }

  test("semExtract expands JSON into string columns") {
    val out = Sem.withLM(FakeLM(FakeBehavior.ExtractStats("Text"))) {
      reviews.semExtract(Seq("text"), Seq("first_word" -> None, "n_words" -> None))
    }
    val r = out.filter($"id" === 2).select("first_word", "n_words").head()
    assert(r.getString(0) == "Terrible")
    assert(r.getString(1) == "5")
  }

  test("semJoin keeps only matching pairs and disambiguates overlapping cols") {
    val cats = Seq(Tuple1("delay"), Tuple1("product")).toDF("text2")
    val out = Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text", "Text2"))) {
      reviews.semJoin(cats, "the {text} contains {text2}")
    }
    val pairs = out.select("id", "text2").as[(Long, String)].collect().toSet
    assert(pairs == Set((1L, "product"), (2L, "delay"), (4L, "delay")))
  }

  test("semJoin renames overlapping columns with :left/:right") {
    val other = Seq((10L, "delay")).toDF("id", "text")
    val out = Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text:left", "Text:right"))) {
      reviews.semJoin(other, "the {text:left} contains {text:right}")
    }
    assert(out.columns.toSet == Set("id:left", "text:left", "id:right", "text:right"))
    assert(out.select("id:left").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("JSON and XML serialization formats flow through operators") {
    import graft.core.{SerializationFormat => SF}
    val df = Seq((7L, "hi")).toDF("id", "text")
    val json = Sem.withSettings(Sem.settings.copy(
      lm = FakeLM(FakeBehavior.Echo), serializationFormat = SF.Json)) {
      df.semMap("echo {text} and {id}")
    }.select("_map").as[String].head()
    assert(json == """{"text":"hi","id":7}""")
    val xml = Sem.withSettings(Sem.settings.copy(
      lm = FakeLM(FakeBehavior.Echo), serializationFormat = SF.Xml)) {
      df.semMap("echo {text}")
    }.select("_map").as[String].head()
    assert(xml == "<row><text>hi</text></row>")
  }

  test("semExtract with quotes adds _quote columns") {
    val df = Seq((1L, "alpha beta")).toDF("id", "text")
    val out = Sem.withLM(FakeLM(FakeBehavior.Scripted(Seq(
      """{"first_word": "alpha", "first_word_quote": "alpha beta"}""")))) {
      df.semExtract(Seq("text"), Seq("first_word" -> None), extractQuotes = true)
    }
    val r = out.select("first_word", "first_word_quote").head()
    assert(r.getString(0) == "alpha" && r.getString(1) == "alpha beta")
  }

  test("llmAsJudge produces one column per trial") {
    val out = Sem.withLM(FakeLM(FakeBehavior.FirstWords("Text", 1))) {
      reviews.llmAsJudge("judge the {text}", nTrials = 2)
    }
    assert(out.columns.contains("_judge0") && out.columns.contains("_judge1"))
    assert(out.filter($"id" === 1).select("_judge0").as[String].head() == "Great")
  }

  test("pairwiseJudge maps verdicts to A/B") {
    val df = Seq(("good answer text", "bad")).toDF("left", "right")
    val out = Sem.withLM(FakeLM(FakeBehavior.Scripted(Seq("Answer: A")))) {
      df.pairwiseJudge("left", "right", "which of {left} and {right} is better?")
    }
    assert(out.select("_judge0").as[String].head() == "A")
    assert(out.columns.toSet == Set("left", "right", "_judge0"))
  }
}
