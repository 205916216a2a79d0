package graft

import org.apache.spark.sql.functions._
import graft.embed.{HashingEmbedder, LateInteraction, ParquetVS, QdrantLikeVS}
import graft.operators.EmbedOps

/** In-memory server speaking the Qdrant REST contract for hermetic tests. */
object FakeQdrant {
  val collections = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  val points =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[Long, Seq[Float]]]()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def clear(): Unit = { collections.clear(); points.clear() }

  val fetch: graft.connectors.WebSearchEngines.Fetch = (url, _, body) => {
    val parts = url.stripPrefix("http://fake/").split('/')
    val coll = parts(1)
    if (url.endsWith(s"/collections/$coll") && parts.length == 2) {
      collections.put(coll, 1)
      points.putIfAbsent(coll, new java.util.concurrent.ConcurrentHashMap[Long, Seq[Float]]())
      """{"result":true,"status":"ok"}"""
    } else if (url.endsWith("/points")) {
      val node = mapper.readTree(body.get).path("points")
      val store = points.get(coll)
      (0 until node.size()).foreach { i =>
        val p = node.path(i)
        val v = p.path("vector")
        store.put(p.path("id").asLong(), (0 until v.size()).map(v.path(_).floatValue()))
      }
      """{"result":{"status":"acknowledged"},"status":"ok"}"""
    } else if (url.endsWith("/points/scroll")) {
      val sb = new StringBuilder("""{"result":{"points":[""")
      val it = points.get(coll).entrySet().iterator()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb += ','
        first = false
        sb ++= s"""{"id":${e.getKey},"vector":[${e.getValue.mkString(",")}]}"""
      }
      sb ++= "]}}"
      sb.toString
    } else if (url.endsWith("/points/search")) {
      val req = mapper.readTree(body.get)
      val qv = {
        val v = req.path("vector"); (0 until v.size()).map(v.path(_).floatValue())
      }
      val k = req.path("limit").asInt()
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.lazyZip(b).map((x, y) => x.toDouble * y).sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
        if (na == 0 || nb == 0) 0 else dot / (na * nb)
      }
      val hits = {
        import scala.jdk.CollectionConverters._
        points.get(coll).entrySet().asScala.toSeq
          .map(e => (e.getKey, cos(qv, e.getValue)))
          .sortBy { case (id, s) => (-s, id) }.take(k)
      }
      hits.map { case (id, s) => s"""{"id":$id,"score":$s}""" }
        .mkString("""{"result":[""", ",", "]}")
    } else throw new IllegalArgumentException(s"unexpected url $url")
  }
}

/** In-memory server speaking the Weaviate REST/GraphQL contract. */
object FakeWeaviate {
  val classes = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  val objects =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[Long, Seq[Float]]]()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def clear(): Unit = { classes.clear(); objects.clear() }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.lazyZip(b).map((x, y) => x.toDouble * y).sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0 else dot / (na * nb)
  }

  val fetch: graft.connectors.WebSearchEngines.Fetch = (url, _, body) => {
    if (url.endsWith("/v1/schema")) {
      val cls = mapper.readTree(body.get).path("class").asText()
      classes.put(cls, 1)
      objects.putIfAbsent(cls, new java.util.concurrent.ConcurrentHashMap[Long, Seq[Float]]())
      s"""{"class":"$cls"}"""
    } else if (url.endsWith("/v1/batch/objects")) {
      val arr = mapper.readTree(body.get).path("objects")
      (0 until arr.size()).foreach { i =>
        val o = arr.path(i)
        val v = o.path("vector")
        objects.get(o.path("class").asText())
          .put(o.path("properties").path("doc_id").asLong(),
            (0 until v.size()).map(v.path(_).floatValue()))
      }
      """[{"result":{"status":"SUCCESS"}}]"""
    } else if (url.contains("/v1/objects?")) {
      val cls = "class=([^&]+)".r.findFirstMatchIn(url).get.group(1)
      import scala.jdk.CollectionConverters._
      val rows = objects.get(cls).entrySet().asScala.toSeq.sortBy(_.getKey).map { e =>
        s"""{"class":"$cls","properties":{"doc_id":${e.getKey}},"vector":[${e.getValue.mkString(",")}]}"""
      }
      rows.mkString("""{"objects":[""", ",", "]}")
    } else if (url.endsWith("/v1/graphql")) {
      val q = mapper.readTree(body.get).path("query").asText()
      val cls = "Get \\{ (\\w+)\\(".r.findFirstMatchIn(q).get.group(1)
      val qv = "vector: \\[([^\\]]*)\\]".r.findFirstMatchIn(q).get.group(1)
        .split(',').map(_.trim.toFloat).toSeq
      val k = "limit: (\\d+)".r.findFirstMatchIn(q).get.group(1).toInt
      import scala.jdk.CollectionConverters._
      val hits = objects.get(cls).entrySet().asScala.toSeq
        .map(e => (e.getKey, 1.0 - cos(qv, e.getValue))) // Weaviate distance
        .sortBy { case (id, d) => (d, id) }.take(k)
      hits.map { case (id, d) =>
        s"""{"doc_id":$id,"_additional":{"distance":$d}}"""
      }.mkString(s"""{"data":{"Get":{"$cls":[""", ",", "]}}}")
    } else throw new IllegalArgumentException(s"unexpected url $url")
  }
}

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
