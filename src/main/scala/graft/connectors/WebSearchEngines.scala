package graft.connectors

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Web search engines (reference lotus/web_search.py:289-654): per-corpus
  * engines with the reference's default column contracts
  * (web_search.py:25-67), dispatched through one `search` entry point.
  *
  * The HTTP transport is an injectable `Fetch` function: production uses
  * java.net.http; hermetic tests inject canned payloads (this environment is
  * zero-egress). Engines parse the providers' REAL response formats — arXiv
  * Atom XML, PubMed E-utilities, Tavily/You/SerpAPI JSON — so the code is
  * live-ready.
  */
object WebSearchEngines {

  /** (url, headers, postBody) → response body. postBody None = GET. */
  type Fetch = (String, Map[String, String], Option[String]) => String

  val defaultHeaders: Map[String, String] = Map("User-Agent" -> "graft/0.2")

  def defaultFetch: Fetch = (url, headers, body) => {
    val b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = body match {
      case Some(p) => b.header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(p)).build()
      case None => b.GET().build()
    }
    val client = java.net.http.HttpClient.newHttpClient()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"web search HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  sealed trait Corpus { def name: String; def defaultCols: Seq[String] }
  case object Google extends Corpus {
    val name = "google"
    val defaultCols = Seq("position", "title", "link", "displayed_link", "date",
      "author", "snippet")
  }
  case object GoogleScholar extends Corpus {
    val name = "google_scholar"
    val defaultCols = Google.defaultCols
  }
  case object Arxiv extends Corpus {
    val name = "arxiv"
    val defaultCols = Seq("id", "title", "link", "abstract", "published", "authors", "categories")
  }
  case object You extends Corpus {
    val name = "you"
    val defaultCols = Seq("title", "url", "snippets", "description")
  }
  case object Tavily extends Corpus {
    val name = "tavily"
    val defaultCols = Seq("title", "url", "content")
  }
  case object PubMed extends Corpus {
    val name = "pubmed"
    val defaultCols = Seq("id", "title", "link", "abstract", "published", "authors", "journal", "doi")
  }
  /** Bing is in the reference's dispatch but discontinued upstream — its
    * engine raises a deprecation error (web_search.py:464-472,697-698). The
    * corpus exists here for dispatch parity and fails with the same message.
    */
  case object Bing extends Corpus {
    val name = "bing"
    val defaultCols = Seq("title", "url", "snippet")
  }

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def xml(body: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(body.getBytes("UTF-8")))
  }

  private def childText(e: org.w3c.dom.Element, tag: String): String = {
    val nodes = e.getElementsByTagName(tag)
    if (nodes.getLength == 0) null else nodes.item(0).getTextContent.trim
  }

  private def elements(doc: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] = {
    val nodes = doc.getElementsByTagName(tag)
    (0 until nodes.getLength).map(nodes.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  /** arXiv Atom API (export.arxiv.org/api/query). */
  def searchArxiv(query: String, k: Int, fetch: Fetch): Seq[Map[String, String]] = {
    val url = s"https://export.arxiv.org/api/query?search_query=${enc(query)}&max_results=$k"
    val doc = xml(fetch(url, defaultHeaders, None))
    elements(doc, "entry").map { e =>
      val link = childText(e, "id")
      val authors = {
        val ns = e.getElementsByTagName("author")
        (0 until ns.getLength).map(i =>
          childText(ns.item(i).asInstanceOf[org.w3c.dom.Element], "name")).mkString(", ")
      }
      val cats = {
        val ns = e.getElementsByTagName("category")
        (0 until ns.getLength).map(i =>
          ns.item(i).asInstanceOf[org.w3c.dom.Element].getAttribute("term")).mkString(", ")
      }
      Map(
        "id" -> (if (link == null) null else link.split('/').lastOption.orNull),
        "title" -> childText(e, "title"),
        "link" -> link,
        "abstract" -> childText(e, "summary"),
        "published" -> childText(e, "published"),
        "authors" -> authors,
        "categories" -> cats)
    }
  }

  /** PubMed E-utilities: esearch (ids) then efetch (article XML). */
  def searchPubMed(query: String, k: Int, fetch: Fetch): Seq[Map[String, String]] = {
    val esearch = fetch(
      "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/esearch.fcgi" +
        s"?db=pubmed&retmode=json&retmax=$k&term=${enc(query)}",
      defaultHeaders, None)
    val ids = {
      val node = mapper.readTree(esearch).path("esearchresult").path("idlist")
      (0 until node.size()).map(node.path(_).asText())
    }
    if (ids.isEmpty) return Nil
    val efetch = fetch(
      "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi" +
        s"?db=pubmed&retmode=xml&id=${ids.mkString(",")}",
      defaultHeaders, None)
    val doc = xml(efetch)
    elements(doc, "PubmedArticle").map { a =>
      val pmid = childText(a, "PMID")
      val authors = {
        val ns = a.getElementsByTagName("Author")
        (0 until ns.getLength).map { i =>
          val e = ns.item(i).asInstanceOf[org.w3c.dom.Element]
          Seq(childText(e, "ForeName"), childText(e, "LastName"))
            .filter(_ != null).mkString(" ")
        }.mkString(", ")
      }
      val doi = {
        val ns = a.getElementsByTagName("ArticleId")
        (0 until ns.getLength).map(_.toInt).map(ns.item(_).asInstanceOf[org.w3c.dom.Element])
          .find(_.getAttribute("IdType") == "doi").map(_.getTextContent.trim).orNull
      }
      Map(
        "id" -> pmid,
        "title" -> childText(a, "ArticleTitle"),
        "link" -> (if (pmid == null) null else s"https://pubmed.ncbi.nlm.nih.gov/$pmid/"),
        "abstract" -> childText(a, "AbstractText"),
        "published" -> childText(a, "PubDate"),
        "authors" -> authors,
        "journal" -> childText(a, "Title"),
        "doi" -> doi)
    }
  }

  /** Tavily search API (JSON POST). */
  def searchTavily(query: String, k: Int, apiKey: String, fetch: Fetch): Seq[Map[String, String]] = {
    val body = mapper.createObjectNode()
    body.put("api_key", apiKey); body.put("query", query); body.put("max_results", k)
    val resp = mapper.readTree(fetch("https://api.tavily.com/search", defaultHeaders,
      Some(mapper.writeValueAsString(body))))
    val results = resp.path("results")
    (0 until results.size()).map { i =>
      val r = results.path(i)
      Map("title" -> r.path("title").asText(null),
        "url" -> r.path("url").asText(null),
        "content" -> r.path("content").asText(null))
    }
  }

  /** You.com search API. */
  def searchYou(query: String, k: Int, apiKey: String, fetch: Fetch): Seq[Map[String, String]] = {
    val resp = mapper.readTree(fetch(
      s"https://ydc-index.io/v1/search?query=${enc(query)}&count=$k",
      defaultHeaders + ("X-API-Key" -> apiKey), None))
    val buckets = Seq("web", "news").map(resp.path("results").path(_)).filter(_.isArray)
    buckets.flatMap { arr =>
      (0 until arr.size()).map { i =>
        val r = arr.path(i)
        val snippets = r.path("snippets")
        Map("title" -> r.path("title").asText(null),
          "url" -> r.path("url").asText(null),
          "snippets" -> (if (snippets.isArray)
            (0 until snippets.size()).map(snippets.path(_).asText()).mkString("\n") else null),
          "description" -> r.path("description").asText(null))
      }
    }
  }

  /** Google / Google Scholar via the SerpAPI JSON endpoint. */
  def searchSerpApi(query: String, k: Int, apiKey: String, engine: String,
      fetch: Fetch): Seq[Map[String, String]] = {
    val resp = mapper.readTree(fetch(
      s"https://serpapi.com/search.json?engine=$engine&q=${enc(query)}&num=$k&api_key=$apiKey",
      defaultHeaders, None))
    val results = resp.path("organic_results")
    if (!results.isArray)
      throw new IllegalStateException("No organic_results found in the response from GoogleSearch")
    (0 until results.size()).map { i =>
      val r = results.path(i)
      Map("position" -> (if (r.has("position")) r.path("position").asText() else null),
        "title" -> r.path("title").asText(null),
        "link" -> r.path("link").asText(null),
        "displayed_link" -> r.path("displayed_link").asText(null),
        "date" -> r.path("date").asText(null),
        "author" -> r.path("author").asText(null),
        "snippet" -> r.path("snippet").asText(null))
    }
  }

  /** Dispatch (reference web_search, web_search.py:603-654): one DataFrame
    * with the corpus' default columns plus `query`.
    */
  def search(spark: SparkSession, corpus: Corpus, queries: Seq[String], k: Int,
      apiKey: String = "", fetch: Fetch = defaultFetch): DataFrame = {
    val rows = queries.flatMap { q =>
      val hits = corpus match {
        case Arxiv => searchArxiv(q, k, fetch)
        case PubMed => searchPubMed(q, k, fetch)
        case Tavily => searchTavily(q, k, apiKey, fetch)
        case You => searchYou(q, k, apiKey, fetch)
        case Google => searchSerpApi(q, k, apiKey, "google", fetch)
        case GoogleScholar => searchSerpApi(q, k, apiKey, "google_scholar", fetch)
        case Bing => throw new UnsupportedOperationException(
          "Bing search is discontinued. Please use Google search instead.")
      }
      hits.take(k).map(h => Row.fromSeq(corpus.defaultCols.map(c => h.getOrElse(c, null)) :+ q))
    }
    val schema = StructType(
      corpus.defaultCols.map(StructField(_, StringType)) :+ StructField("query", StringType))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 100 + 1)), schema)
  }

  /** `web_extract`: fetch pages and strip tags/scripts into plain text
    * (reference _HTMLTextExtractor + web_extract, web_search.py:75-286).
    */
  def extractText(html: String): String = {
    val noScript = "(?is)<(script|style|noscript)[^>]*>.*?</\\1>".r.replaceAllIn(html, " ")
    val noTags = "(?s)<[^>]+>".r.replaceAllIn(noScript, " ")
    val unescaped = noTags
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
    unescaped.replaceAll("\\s+", " ").trim
  }

  def webExtract(spark: SparkSession, urls: Seq[String], fetch: Fetch = defaultFetch): DataFrame = {
    import spark.implicits._
    urls.map(u => (u, try extractText(fetch(u, defaultHeaders, None))
      catch { case e: Exception => s"[fetch failed: ${e.getMessage}]" }))
      .toDF("url", "text")
  }
}
