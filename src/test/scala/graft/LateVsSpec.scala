package graft

import org.apache.spark.sql.functions._
import graft.embed.{FakeQdrant, FakeWeaviate, HashingEmbedder, LateInteraction, ParquetVS, QdrantLikeVS}
import graft.operators.EmbedOps

class LateVsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "machine learning models and neural networks"),
    (2L, "deep neural networks for machine learning"),
    (3L, "cooking pasta with tomato sauce"),
    (4L, "recipe for tomato pasta sauce"),
    (5L, "quantum chromodynamics lattice gauge theory")
  ).toDF("id", "text")

  test("late-interaction MaxSim ranks token-overlapping docs first") {
    val top = LateInteraction.search(corpus, "text", "neural network machine learning", k = 2)
    val ids = top.select("id").as[Long].collect().toSet
    assert(ids.subsetOf(Set(1L, 2L)))
    // Score is bounded by the query token count (each term contributes ≤1).
    val s = top.select("li_scores").as[Double].collect()
    assert(s.forall(x => x >= 0.0 && x <= 4.0 + 1e-9))
  }

  test("late interaction distinguishes token order context beyond bag cosine") {
    // Exact-token doc must beat a doc with no shared tokens.
    val df = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta")).toDF("id", "text")
    val top = LateInteraction.search(df, "text", "alpha gamma", k = 1)
    assert(top.select("id").as[Long].head() == 1L)
  }

  test("ParquetVS round-trips and searches like brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graftvs").toString
    val vs = ParquetVS(dir)
    val indexed = EmbedOps.semIndex(corpus, "text")
    vs.index(indexed, "id", EmbedOps.vecCol("text"), "docs")
    assert(vs.load(spark, "docs").count() == 5)
    val qv = HashingEmbedder(64).embedOne("machine learning neural").toIndexedSeq
    val hits = vs.search(spark, "docs", qv, 2).select("id").as[Long].collect().toSet
    assert(hits.subsetOf(Set(1L, 2L)))
  }

  test("WeaviateLikeVS speaks the REST/GraphQL contract through the injectable transport") {
    FakeWeaviate.clear()
    val vs = graft.embed.WeaviateLikeVS("http://fake", FakeWeaviate.fetch, upsertBatch = 2)
    val indexed = EmbedOps.semIndex(corpus, "text")
    vs.index(indexed, "id", EmbedOps.vecCol("text"), "Docs")
    assert(FakeWeaviate.objects.get("Docs").size() == 5)
    assert(vs.load(spark, "Docs").count() == 5)
    val qv = HashingEmbedder(64).embedOne("tomato pasta").toIndexedSeq
    val hits = vs.search(spark, "Docs", qv, 2)
    assert(hits.select("id").as[Long].collect().toSet.subsetOf(Set(3L, 4L)))
    // distance → similarity conversion keeps scores in cosine range
    assert(hits.select("score").as[Double].collect().forall(s => s >= -1.0 && s <= 1.0))
    // Re-index is idempotent: deterministic object ids upsert in place
    // (the reference's uuid5 semantics), never duplicate.
    vs.index(indexed, "id", EmbedOps.vecCol("text"), "Docs")
    assert(vs.load(spark, "Docs").count() == 5)
  }

  test("QdrantLikeVS speaks the REST contract through the injectable transport") {
    FakeQdrant.clear()
    val vs = QdrantLikeVS("http://fake", FakeQdrant.fetch, upsertBatch = 2)
    val indexed = EmbedOps.semIndex(corpus, "text")
    vs.index(indexed, "id", EmbedOps.vecCol("text"), "c1")
    assert(FakeQdrant.points.get("c1").size() == 5)
    assert(vs.load(spark, "c1").count() == 5)
    val qv = HashingEmbedder(64).embedOne("tomato pasta").toIndexedSeq
    val hits = vs.search(spark, "c1", qv, 2).select("id").as[Long].collect().toSet
    assert(hits.subsetOf(Set(3L, 4L)))
  }
}
