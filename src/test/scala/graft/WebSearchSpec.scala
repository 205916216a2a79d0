package graft

import graft.connectors.WebSearchEngines
import graft.connectors.WebSearchEngines._

/** Hermetic engine tests: canned provider payloads (real response formats)
  * through the injectable Fetch transport — zero egress.
  */
class WebSearchSpec extends SparkSpec {

  private val arxivAtom =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<feed xmlns="http://www.w3.org/2005/Atom">
      |  <entry>
      |    <id>http://arxiv.org/abs/2407.11418v1</id>
      |    <title>Semantic Operators</title>
      |    <summary>A declarative model for semantic queries.</summary>
      |    <published>2024-07-16T00:00:00Z</published>
      |    <author><name>A. Author</name></author>
      |    <author><name>B. Author</name></author>
      |    <category term="cs.DB"/>
      |    <category term="cs.AI"/>
      |  </entry>
      |</feed>""".stripMargin

  test("arxiv engine parses Atom entries into the column contract") {
    val fetch: Fetch = (url, _, _) => { assert(url.contains("export.arxiv.org")); arxivAtom }
    val df = WebSearchEngines.search(spark, Arxiv, Seq("semantic operators"), 5, fetch = fetch)
    assert(df.columns.toSeq ==
      Seq("id", "title", "link", "abstract", "published", "authors", "categories", "query"))
    val r = df.collect().head
    assert(r.getAs[String]("id") == "2407.11418v1")
    assert(r.getAs[String]("authors") == "A. Author, B. Author")
    assert(r.getAs[String]("categories") == "cs.DB, cs.AI")
    assert(r.getAs[String]("query") == "semantic operators")
  }

  test("pubmed engine chains esearch → efetch") {
    val esearchJson = """{"esearchresult":{"idlist":["12345","67890"]}}"""
    val efetchXml =
      """<?xml version="1.0"?><PubmedArticleSet>
        |<PubmedArticle><MedlineCitation><PMID>12345</PMID>
        |  <Article><ArticleTitle>Trial A</ArticleTitle>
        |    <Abstract><AbstractText>Result text.</AbstractText></Abstract>
        |    <AuthorList><Author><ForeName>Jo</ForeName><LastName>Doe</LastName></Author></AuthorList>
        |    <Journal><Title>J Test</Title><JournalIssue><PubDate><Year>2020</Year></PubDate></JournalIssue></Journal>
        |  </Article>
        |  <PubmedData><ArticleIdList><ArticleId IdType="doi">10.1/abc</ArticleId></ArticleIdList></PubmedData>
        |</MedlineCitation></PubmedArticle>
        |</PubmedArticleSet>""".stripMargin
    val fetch: Fetch = (url, _, _) =>
      if (url.contains("esearch")) esearchJson
      else { assert(url.contains("id=12345,67890")); efetchXml }
    val df = WebSearchEngines.search(spark, PubMed, Seq("aspirin"), 3, fetch = fetch)
    val r = df.collect().head
    assert(r.getAs[String]("id") == "12345")
    assert(r.getAs[String]("title") == "Trial A")
    assert(r.getAs[String]("link") == "https://pubmed.ncbi.nlm.nih.gov/12345/")
    assert(r.getAs[String]("authors") == "Jo Doe")
    assert(r.getAs[String]("doi") == "10.1/abc")
  }

  test("tavily engine posts the query and parses results") {
    var posted: String = null
    val fetch: Fetch = (_, _, body) => {
      posted = body.get
      """{"results":[{"title":"T1","url":"https://x/1","content":"C1"}]}"""
    }
    val df = WebSearchEngines.search(spark, Tavily, Seq("q1"), 2, apiKey = "key", fetch = fetch)
    assert(posted.contains("\"query\":\"q1\"") && posted.contains("\"api_key\":\"key\""))
    assert(df.columns.toSeq == Seq("title", "url", "content", "query"))
    assert(df.count() == 1)
  }

  test("serpapi google engine requires organic_results") {
    val fetch: Fetch = (_, _, _) =>
      """{"organic_results":[{"position":1,"title":"Hit","link":"https://h","snippet":"s"}]}"""
    val df = WebSearchEngines.search(spark, Google, Seq("g"), 1, apiKey = "k", fetch = fetch)
    assert(df.select("title").collect().head.getString(0) == "Hit")
    val bad: Fetch = (_, _, _) => """{"error":"no results"}"""
    intercept[IllegalStateException] {
      WebSearchEngines.search(spark, Google, Seq("g"), 1, apiKey = "k", fetch = bad)
    }
  }

  test("bing corpus dispatches to the reference's discontinuation error") {
    // Parity with the reference: Bing is in the dispatch but its engine
    // raises "Bing search is discontinued" (web_search.py:464-472).
    val fetch: Fetch = (_, _, _) => fail("Bing must not fetch")
    val e = intercept[UnsupportedOperationException] {
      WebSearchEngines.search(spark, WebSearchEngines.Bing, Seq("q"), 1, fetch = fetch)
    }
    assert(e.getMessage.contains("discontinued"))
  }

  test("webExtract strips scripts, tags and entities") {
    val html = """<html><head><style>.x{}</style><script>var a=1;</script></head>
      |<body><h1>Title&nbsp;Here</h1><p>Body &amp; more</p></body></html>""".stripMargin
    assert(WebSearchEngines.extractText(html) == "Title Here Body & more")
  }

  test("token estimator beats chars/4 shape on punctuated text") {
    import graft.llm.Tokens
    assert(Tokens.estimate("hello world") == 4) // hell+o, worl+d
    assert(Tokens.estimate("a,b,c") == 5)
    assert(Tokens.estimate("") == 1)
  }
}
