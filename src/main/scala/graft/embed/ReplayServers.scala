package graft.embed

/** In-memory servers speaking the REMOTE vector-store REST contracts —
  * the replay transports behind the `ann_qdrant_vs`/`ann_weaviate_vs`
  * oracle gates and the hermetic specs (this zero-egress environment has
  * no live endpoints; the [[graft.llm.FakeLM]] convention for transports). `private[graft]`:
  * these are gate/test doubles living in main only so the oracle gates can
  * reach them — they are NOT public API of the published artifact.
  * State is JVM-global and concurrent: upsert batches arrive from executor
  * threads in local mode exactly as production batches would arrive at a
  * server. `clear()` between runs keeps gates idempotent.
  */
private[graft] object FakeQdrant {
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
private[graft] object FakeWeaviate {
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
