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

  test("wordRepetitionRatio: distinct text 0, repeated text high") {
    val d = Seq((1L, "a b c d"), (2L, "spam spam spam spam"), (3L, "x x y y"))
      .toDF("id", "text")
    val m = d.select($"id", TF.wordRepetitionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) == 0.0)
    assert(m(2L) == 0.75)
    assert(m(3L) == 0.5)
  }

  test("topNgramFraction and dupNgramFraction flag templated text") {
    val d = Seq(
      (1L, "buy now buy now buy now"),   // bigrams: "buy now"×3, "now buy"×2 → top 3/5
      (2L, "one two three four five")    // all bigrams unique
    ).toDF("id", "text")
    val top = d.select($"id", TF.topNgramFraction($"text", 2).as("t"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(top(1L) - 0.6) < 1e-9)
    assert(top(2L) == 0.25) // 4 unique bigrams → max count 1 → 1/4
    val dup = d.select($"id", TF.dupNgramFraction($"text", 3).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(dup(1L) == 1.0) // "buy now buy"×2, "now buy now"×2 → all 4 slots dup
    assert(dup(2L) == 0.0)
  }

  test("ngram fractions complete in bounded time on a 100k-word doc") {
    // The tight-loop counting expression is O(doc length); the naive
    // distinct×slots HOF form is O(g²) and would need ~10¹⁰ comparisons on
    // this input (hours). 30 s is generous for one pass over 100k words.
    val words = Array.tabulate(100000)(i => s"w${i % 5000}") // every gram dup'd
    val d = Seq((1L, words.mkString(" "))).toDF("id", "text")
    val t0 = System.nanoTime()
    val (top, dup) = d.select(
      TF.topNgramFraction($"text", 2).as("t"),
      TF.dupNgramFraction($"text", 3).as("d")).as[(Double, Double)].head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"n-gram fractions took $secs s on a 100k-word doc")
    // Vocabulary cycles every 5000 words, so each bigram repeats 20×.
    assert(math.abs(top - 20.0 / 99999) < 1e-12)
    assert(dup == 1.0)
  }

  test("ngram guards: shorter-than-n docs yield 0.0") {
    val d = Seq((1L, "solo")).toDF("id", "text")
    val r = d.select(
      TF.topNgramFraction($"text", 2).as("t"),
      TF.dupNgramFraction($"text", 3).as("d")).as[(Double, Double)].head()
    assert(r == ((0.0, 0.0)))
  }

  test("symbolWordRatio and alphaWordFraction (Gopher rules)") {
    val d = Seq((1L, "see more ... at # tag"), (2L, "1 2 3 four"))
      .toDF("id", "text")
    val m = d.select($"id", TF.symbolWordRatio($"text").as("s"),
      TF.alphaWordFraction($"text").as("a"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(math.abs(m(1L)._1 - 2.0 / 6) < 1e-9)
    assert(math.abs(m(1L)._2 - 4.0 / 6) < 1e-9) // "..." and "#" carry no alphabetic char
    assert(m(2L)._1 == 0.0)
    assert(m(2L)._2 == 0.25)
  }

  test("line-level Gopher fractions: bullets, ellipses, short lines") {
    val doc = Seq(
      "- first bullet\n* second\nplain line of many words here\n" +
        "to be continued...\nshort one\n   \ntruncated…"
    ).toDF("text")
    // 6 non-empty lines: 2 bulleted, 2 ellipsis-ended, short (<3 words):
    // "- first bullet"(3w no), "* second"(2w yes), "short one"(2w yes),
    // "truncated…"(1w yes) → 3/6.
    val r = doc.select(
      graft.functions.TextFunctions.bulletLineFraction($"text").as("b"),
      graft.functions.TextFunctions.ellipsisLineFraction($"text").as("e"),
      graft.functions.TextFunctions.shortLineFraction($"text", 3).as("s"))
      .head()
    assert(math.abs(r.getDouble(0) - 2.0 / 6) < 1e-12)
    assert(math.abs(r.getDouble(1) - 2.0 / 6) < 1e-12)
    assert(math.abs(r.getDouble(2) - 3.0 / 6) < 1e-12)
    // Whitespace-only text has no lines → null, never a division error.
    val n = Seq("   ").toDF("text").select(
      graft.functions.TextFunctions.bulletLineFraction($"text")).head()
    assert(n.isNullAt(0))
  }

  test("c4LineClean keeps exactly the C4-rule lines: terminal punct, " +
      ">= 5 words, no javascript mention; empty results join to ''") {
    val doc = Seq(
      "this long sentence ends with a period.\n" +        // kept
        "does this question have enough words here?\n" +  // kept (?)
        "she said the words \"quoted ending stays\"\n" +  // kept (")
        "no terminal punctuation on this long line\n" +   // dropped
        "short line.\n" +                                 // dropped (<5)
        "please enable JavaScript to view this content.\n" + // dropped (js)
        "final exclamation line has five words!"          // kept (!)
    ).toDF("text")
    val got = doc.select(
      graft.functions.TextFunctions.c4LineClean($"text").as("c"))
      .head().getString(0)
    assert(got == Seq(
      "this long sentence ends with a period.",
      "does this question have enough words here?",
      "she said the words \"quoted ending stays\"",
      "final exclamation line has five words!").mkString("\n"), got)
    // All lines dropped → "", the array_join-on-empty contract the
    // DuckDB oracle must coalesce to match.
    val none = Seq("no punct here at all\nshort.").toDF("text")
      .select(graft.functions.TextFunctions.c4LineClean($"text")).head()
    assert(none.getString(0) == "")
  }

  test("deflate ratio orders repetitive < prose < random, and is a pure scan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val rng = new scala.util.Random(7)
    val repetitive = "lorem ipsum dolor " * 300
    val prose = (0 until 300).map(i => s"sentence $i about topic ${i % 17} " +
      s"with varying words ${rng.nextInt(1000)}").mkString(". ")
    val random = Array.fill(4000)((rng.nextInt(94) + 33).toChar).mkString
    val df = Seq((1L, repetitive), (2L, prose), (3L, random)).toDF("id", "text")
    val out = df.select($"id",
      graft.functions.CompressExpr.deflateRatio($"text").as("r"))
    assert(out.queryExecution.executedPlan
      .collect { case s: ShuffleExchangeExec => s }.isEmpty)
    val m = out.as[(Long, Double)].collect().toMap
    assert(m(1L) < 0.1, s"repetitive text must compress hard: ${m(1L)}")
    assert(m(2L) > m(1L) && m(2L) < m(3L), m.toString)
    assert(m(3L) > 0.7, s"random text must not compress: ${m(3L)}")
    // Determinism within a JVM and empty-string convention.
    val again = out.as[(Long, Double)].collect().toMap
    assert(again == m)
    val empty = Seq(Tuple1("")).toDF("text")
      .select(graft.functions.CompressExpr.deflateRatio($"text")).head().getDouble(0)
    assert(empty == 1.0)
  }

  test("unicode normalization: NFC composes, stripAccents drops marks only") {
    import graft.functions.UnicodeExpr
    // Explicit escapes: decomposed marks (U+0301/U+0308/U+0303), the
    // standalone \u00d8, and the U+FB01 ligature.
    val decomposed = "cafe\u0301 u\u0308ber n\u0303o \u00d8 \ufb01ne"
    val df = Seq(Tuple1(decomposed)).toDF("t")
    val r = df.select(
      UnicodeExpr.nfcNormalize($"t").as("nfc"),
      UnicodeExpr.nfkcNormalize($"t").as("nfkc"),
      UnicodeExpr.stripAccents($"t").as("plain")).head()
    assert(r.getString(0) == "caf\u00e9 \u00fcber \u00f1o \u00d8 \ufb01ne")
    // NFKC additionally folds the ligature to "fi".
    assert(r.getString(1) == "caf\u00e9 \u00fcber \u00f1o \u00d8 fine")
    // Combining marks removed; standalone \u00d8 untouched (decomposition-
    // based, not locale folding -- the DuckDB strip_accents contract).
    assert(r.getString(2) == "cafe uber no \u00d8 \ufb01ne")
    // Already-normalized fast path returns the identical string.
    val clean = Seq(Tuple1("plain ascii")).toDF("t")
      .select(UnicodeExpr.nfcNormalize($"t")).head().getString(0)
    assert(clean == "plain ascii")
    // Normalization heals byte-level dedup: composed vs decomposed spellings
    // fingerprint identically only after NFC.
    val pair = Seq(("caf\u00e9", "cafe\u0301")).toDF("a", "b")
    val fps = pair.select(
      (graft.functions.TextFunctions.fingerprint($"a") ===
        graft.functions.TextFunctions.fingerprint($"b")).as("raw_eq"),
      (graft.functions.TextFunctions.fingerprint(UnicodeExpr.nfcNormalize($"a")) ===
        graft.functions.TextFunctions.fingerprint(UnicodeExpr.nfcNormalize($"b")))
        .as("nfc_eq")).head()
    assert(!fps.getBoolean(0) && fps.getBoolean(1))
  }

  test("multimodal stub decode keeps batch shape and schema") {
    val bin = df.select($"id", to_binary($"text", lit("utf-8")).as("img"))
    val out = MultimodalOps.decodeMeta(bin, "img")
    assert(out.columns.toSeq ==
      Seq("id", "img", "media_bytes", "media_width", "media_height", "media_frames"))
    val r = out.filter($"id" === 3).select("media_bytes").as[Int].head()
    assert(r == 10)
  }

  test("scriptFractions classifies major scripts; fractions sum to ~1; " +
      "empty text is all zero") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "Привет мир"),
      (3L, "中文字符"),
      (4L, "hello Привет"),
      (5L, "   ")
    ).toDF("id", "text")
    val out = df.select($"id", TF.scriptFractions($"text").as("sf"))
      .select($"id", $"sf.latin", $"sf.cyrillic", $"sf.cjk", $"sf.arabic",
        $"sf.other")
      .as[(Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1.0 && out(1L)._3 == 0.0)
    assert(out(2L)._3 == 1.0 && out(2L)._2 == 0.0)
    assert(out(3L)._4 == 1.0)
    // "hello" = 5 of 11 non-ws chars, "Привет" = 6 of 11.
    assert(out(4L)._2 == 0.4545 && out(4L)._3 == 0.5455)
    assert(out(5L) == ((5L, 0.0, 0.0, 0.0, 0.0, 0.0)))
    // Fractions of a mixed doc cover everything (other picks up the rest).
    val s = out(4L)
    assert(math.abs(s._2 + s._3 + s._4 + s._5 + s._6 - 1.0) < 1e-3)
  }

  test("scriptFractions: × ÷ are signs not latin; NBSP/ideographic space " +
      "are whitespace") {
    val df = Seq(
      // 4 latin letters, 2 signs (× ÷) → latin 4/6, other 2/6
      (1L, "ab×cd÷"),
      // NBSP and U+3000 must strip like ASCII space: latin = 12/12 = 1.0
      // (it would be 12/14 if the two unicode spaces counted as "other")
      (2L, "hello world　ok"),
      (3L, " 　")
    ).toDF("id", "text")
    val out = df.select($"id", TF.scriptFractions($"text").as("sf"))
      .select($"id", $"sf.latin", $"sf.other")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 0.6667 && out(1L)._3 == 0.3333)
    assert(out(2L)._2 == 1.0 && out(2L)._3 == 0.0)
    assert(out(3L) == ((3L, 0.0, 0.0)))
  }

  test("wordEntropy: uniform = ln k, constant = 0, empty = 0, counts exact") {
    val d = Seq(
      (1L, "a b c d"),            // uniform over 4 → ln 4
      (2L, "spam spam spam spam"), // single word → 0
      (3L, ""),                    // empty → 0
      (4L, "   "),                 // whitespace-only → 0
      (5L, "x x y"),               // −(2/3·ln(2/3) + 1/3·ln(1/3))
      (6L, "猫 猫 犬")             // non-ASCII words count the same
    ).toDF("id", "text")
    val m = d.select($"id", TF.wordEntropy($"text").as("e"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(m(1L) - math.log(4)) < 1e-12)
    assert(m(2L) == 0.0 && m(3L) == 0.0 && m(4L) == 0.0)
    val h3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(m(5L) - h3) < 1e-12)
    assert(math.abs(m(6L) - h3) < 1e-12)
  }

  test("wordEntropy is case-insensitive and capped by ln(distinct)") {
    val d = Seq((1L, "The THE the Fox fox dog")).toDF("id", "text")
    // lower() folds to {the×3, fox×2, dog×1}: entropy of (3,2,1)/6.
    val e = d.select(TF.wordEntropy($"text")).as[Double].head()
    val ref = -Seq(3.0, 2.0, 1.0).map(_ / 6).map(p => p * math.log(p)).sum
    assert(math.abs(e - ref) < 1e-12)
    assert(e <= math.log(3) + 1e-12)
  }

  test("mainContent keeps long link-free blocks, drops nav/sidebar/footer " +
      "and script/style subtrees") {
    val body = "this is the long main article text of the page " * 3
    val html =
      "<html><head><style>body{margin:0}</style>" +
      "<script>var x = '<p>fake</p>';</script></head><body>" +
      "<nav><a href='/'>home</a> <a href='/a'>about</a></nav>" +
      "<div><a href='/1'>one link</a> <a href='/2'>two links here</a> " +
      "<a href='/3'>three more padding padding padding padding padding " +
      "padding padding padding</a></div>" +
      s"<p>  $body  </p>" +
      "<div>short</div>" +
      "<footer><a href='/tos'>terms</a></footer></body></html>"
    val out = Seq(html).toDF("html")
      .select(TF.mainContent(col("html")).as("t")).as[String].head()
    assert(out == body.trim.replaceAll("\\s+", " "))
    // A long block that is mostly anchors dies by link density even
    // though it passes the length bound.
    val linky = "<p>" + (1 to 12).map(i =>
      s"<a href='/$i'>link text number $i</a>").mkString(" ") + "</p>"
    val out2 = Seq(s"<html><body>$linky</body></html>").toDF("html")
      .select(TF.mainContent(col("html")).as("t")).as[String].head()
    assert(out2 == "")
    // Two qualifying blocks join with a newline, in document order.
    val two = s"<html><body><p>$body</p><div>x</div><p>$body</p></body></html>"
    val out3 = Seq(two).toDF("html")
      .select(TF.mainContent(col("html")).as("t")).as[String].head()
    val b = body.trim.replaceAll("\\s+", " ")
    assert(out3 == s"$b\n$b")
  }

  test("markdownStrip: fences, links, images, headings, emphasis, quotes " +
      "and rules reduce to prose; syntax-light passthrough documented") {
    def strip(s: String): String = Seq(s).toDF("t")
      .select(TF.markdownStrip(col("t")).as("o")).as[String].head()
    assert(strip("## Title\nbody **bold** *it* text") ==
      "Title\nbody bold it text")
    assert(strip("[click here](http://x.com/a?b=1) and ![logo](i.png)") ==
      "click here and logo")
    // fence LINES empty out but their newlines stay (only spaces/tabs
    // are collapsed; line structure is preserved for line-level stats)
    assert(strip("```scala\nval x = 1\n```") == "\nval x = 1\n")
    assert(strip("> quoted\n> lines\n---\nafter") == "quoted\nlines\n\nafter")
    // reference-style links pass through — documented non-goal
    assert(strip("[ref][1]") == "[ref][1]")
  }

  test("latexStrip: comments, math, commands-with-kept-args, braces") {
    def strip(s: String): String = Seq(s).toDF("t")
      .select(TF.latexStrip(col("t")).as("o")).as[String].head()
    assert(strip("\\section{Intro} body % note\nnext") == "Intro body \nnext")
    assert(strip("pre $x^2+y$ mid $$\\sum_i i$$ post") == "pre mid post")
    assert(strip("\\textbf{kept} \\emph{words} \\cite[p.~3]{key}") ==
      "kept words key")
    // escaped \% is NOT protected — documented approximation
    assert(strip("100\\% sure") == "100\\")
  }

}
