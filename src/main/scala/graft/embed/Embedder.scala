package graft.embed

/** Text → dense vector. Implementations run inside executors (one instance
  * per task closure) and must be Serializable. Mirrors the reference's RM
  * abstraction (lotus/models/rm.py:10-85) with API-backed and local variants.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(texts: Seq[String]): Seq[Array[Float]]
  def embedOne(text: String): Array[Float] = embed(Seq(text)).head
}

/** Deterministic local embedder: hashed bag-of-words + word-bigram features
  * (feature hashing), L2-normalized. Public technique (hashing trick); gives
  * real similarity structure (shared vocab → higher cosine) without any
  * model download, so embedding operators are testable hermetically — the
  * role SentenceTransformersRM plays in the reference.
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    val toks = t.toLowerCase.split("[^\\p{L}\\p{N}_]+").filter(_.nonEmpty)
    var i = 0
    while (i < toks.length) {
      val h1 = scala.util.hashing.MurmurHash3.stringHash(toks(i), 0x9747b28c)
      v(math.floorMod(h1, dim)) += (if (h1 < 0) -1f else 1f)
      if (i + 1 < toks.length) {
        val h2 = scala.util.hashing.MurmurHash3.stringHash(toks(i) + " " + toks(i + 1), 0x85ebca6b)
        v(math.floorMod(h2, dim)) += (if (h2 < 0) -0.5f else 0.5f)
      }
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j) * v(j); j += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }
}

/** OpenAI-compatible embeddings endpoint (production path; batched HTTP like
  * the reference's LiteLLMRM, lotus/models/litellm_rm.py:11-100).
  */
final case class ApiEmbedder(endpoint: String, model: String, apiKey: String = "",
    dim: Int = 1536, batchSize: Int = 256) extends Embedder {

  @transient private lazy val http =
    java.net.http.HttpClient.newBuilder().connectTimeout(java.time.Duration.ofSeconds(30)).build()
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.grouped(batchSize).flatMap { chunk =>
      val root = mapper.createObjectNode()
      root.put("model", model)
      val arr = root.putArray("input")
      chunk.foreach(arr.add)
      val b = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .header("Content-Type", "application/json")
      val withAuth = if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey") else b
      val resp = http.send(
        withAuth.POST(java.net.http.HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root))).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2, s"embed HTTP ${resp.statusCode()}")
      val data = mapper.readTree(resp.body()).path("data")
      (0 until data.size()).map { i =>
        val e = data.path(i).path("embedding")
        Array.tabulate(e.size())(j => e.path(j).floatValue())
      }
    }.toVector
}
