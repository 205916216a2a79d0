package graft

import org.apache.spark.sql.functions._
import graft.core.Sem
import graft.llm._

/** Reference-fixture parity (FIXTURES.md): the reference's own canonical
  * test frames and compositions, run hermetically. The courses pipeline
  * mirrors tests/test_filter.py:64-80 — classical filter → semantic filter
  * → vector search — asserting semantic+relational composition end to end.
  */
/** Membership judge over a serialized field (top-level: ships in closures). */
final case class SetFilterLM(positives: Set[String], field: String) extends LMClient {
  override def complete(batch: Seq[LMRequest]): Seq[LMResult] = batch.map { req =>
    val v = DocParse.fields(req.context).getOrElse(field, "")
    LMResult(if (positives.contains(v)) "Answer: True" else "Answer: False")
  }
}

/** Keyword sentiment extractor (top-level for closure serialization). */
final case class SentimentLM() extends LMClient {
  override def complete(batch: Seq[LMRequest]): Seq[LMResult] = batch.map { req =>
    val t = DocParse.fields(req.context).getOrElse("Text", "")
    LMResult(
      if (t.contains("Great")) """{"sentiment": "positive", "emotion": "joy"}"""
      else """{"sentiment": "negative", "emotion": "anger"}""")
  }
}

class FixtureParitySpec extends SparkSpec {
  import spark.implicits._

  private val courses = Seq(
    ("Introduction to Programming", "CS", 100),
    ("Data Structures", "CS", 200),
    ("Algorithms", "CS", 300),
    ("Machine Learning", "CS", 300),
    ("Cooking Basics", "Culinary", 100),
    ("Advanced Pastry", "Culinary", 200),
    ("Linear Algebra", "Math", 200),
    ("Art History", "Humanities", 100)
  ).toDF("course_name", "department", "level")

  test("courses: classical filter → sem_filter → sem_search composition") {
    val cs = Set("Introduction to Programming", "Data Structures", "Algorithms",
      "Machine Learning")
    val result = Sem.withLM(SetFilterLM(cs, "Course_name")) {
      courses
        .filter($"level" >= 200) // classical predicate first (Catalyst)
        .semFilter("{course_name} is related to computer science")
        .semSearch("course_name", "data structures", k = 2, tieBreak = Seq($"course_name"))
    }
    val names = result.select("course_name").as[String].collect().toSeq
    assert(names.length == 2)
    assert(names.head == "Data Structures") // lexical-overlap top hit
    assert(names.forall(cs.contains)) // search never resurrects filtered rows
  }

  test("reviews: sem_extract adds string sentiment/emotion columns") {
    val reviews = Seq(("Great product!", 5), ("Terrible service", 1)).toDF("text", "rating")
    val out = Sem.withLM(SentimentLM()) {
      reviews.semExtract(Seq("text"),
        Seq("sentiment" -> Some("positive/negative/neutral"), "emotion" -> Some("joy/anger/sadness")))
    }
    val rows = out.select("text", "sentiment", "emotion").as[(String, String, String)]
      .collect().map { case (t, s, e) => t -> ((s, e)) }.toMap
    assert(rows("Great product!") == (("positive", "joy")))
    assert(rows("Terrible service") == (("negative", "anger")))
  }

  test("articles × categories: sim-join assigns each article its category") {
    val articles = Seq("machine learning tutorial", "deep learning models",
      "cooking healthy food", "food recipe ideas").toDF("article")
    val categories = Seq("machine learning", "cooking food").toDF("category")
    // 512-dim hashing: word-overlap signal dominates hash-collision noise.
    val out = Sem.withSettings(Sem.settings.copy(
        embedder = graft.embed.HashingEmbedder(512))) {
      articles.semSimJoin(categories, "article", "category", k = 1)
    }
    val m = out.select("article", "category").as[(String, String)].collect().toMap
    assert(m("machine learning tutorial") == "machine learning")
    assert(m("cooking healthy food") == "cooking food")
    assert(m("food recipe ideas") == "cooking food")
  }
}
