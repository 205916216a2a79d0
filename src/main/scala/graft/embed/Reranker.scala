package graft.embed

/** Reranker abstraction (reference lotus/models/cross_encoder_reranker.py:
  * 7-59): re-order ≤K candidate docs for a query. Candidates are small
  * (post-retrieval), so reranking is a bounded driver/executor-local step.
  */
trait Reranker extends Serializable {
  /** Returns candidate indices in reranked order (best first). */
  def rerank(query: String, docs: Seq[String], k: Int): Seq[Int]
}

/** Deterministic lexical reranker (test stand-in for a cross-encoder):
  * scores by query-term overlap weighted by inverse doc length.
  */
final case class LexicalReranker() extends Reranker {
  override def rerank(query: String, docs: Seq[String], k: Int): Seq[Int] = {
    val qw = query.toLowerCase.split("[^\\p{L}\\p{N}_]+").filter(_.nonEmpty).toSet
    docs.zipWithIndex.map { case (d, i) =>
      val toks = d.toLowerCase.split("[^\\p{L}\\p{N}_]+").filter(_.nonEmpty)
      val overlap = toks.count(qw.contains).toDouble
      val score = if (toks.isEmpty) 0.0 else overlap / math.sqrt(toks.length.toDouble)
      (score, i)
    }.sortBy { case (s, i) => (-s, i) }.take(k).map(_._2)
  }
}

/** Cross-encoder over an OpenAI-compatible scoring endpoint (production
  * path; one HTTP call per (query, doc) batch).
  */
final case class ApiCrossEncoder(endpoint: String, model: String, apiKey: String = "")
    extends Reranker {
  @transient private lazy val http =
    java.net.http.HttpClient.newBuilder().connectTimeout(java.time.Duration.ofSeconds(30)).build()
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def rerank(query: String, docs: Seq[String], k: Int): Seq[Int] = {
    val root = mapper.createObjectNode()
    root.put("model", model).put("query", query)
    val arr = root.putArray("documents")
    docs.foreach(arr.add)
    root.put("top_n", k)
    val b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(endpoint)).header("Content-Type", "application/json")
    val withAuth = if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey") else b
    val resp = http.send(
      withAuth.POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(root))).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"rerank HTTP ${resp.statusCode()}")
    val results = mapper.readTree(resp.body()).path("results")
    (0 until results.size()).map(i => results.get(i).path("index").asInt())
  }
}
