package graft

import graft.operators.Tokenizer
import graft.operators.Tokenizer.SubwordVocab
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("greedy longest-match prefers the longest piece at every position " +
      "and <unk> advances one character") {
    val vocab = SubwordVocab(Seq("win", "w", "i", "n", "d", "o", "window"))
    val df = Seq((0L, "window windo winq")).toDF("id", "text")
    val pieces = Tokenizer.tokenize(df, "text", vocab)
      .select("pieces").as[Seq[String]].head()
    // "window" matches whole (longest wins over "win"+...); "windo" falls
    // back to "win"+"d"+"o"; "winq": q is OOV → <unk> advancing one char.
    assert(pieces == Seq("window", "win", "d", "o", "win", "<unk>"))
  }

  test("codepoint semantics: a supplementary character is ONE unit for " +
      "matching and for the <unk> advance") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, outside the BMP
    val vocab = SubwordVocab(Seq("ab", "a", "b"))
    val df = Seq((0L, s"a${clef}b")).toDF("id", "text")
    val pieces = Tokenizer.tokenize(df, "text", vocab)
      .select("pieces").as[Seq[String]].head()
    assert(pieces == Seq("a", "<unk>", "b"),
      s"surrogate pair must consume as one <unk>: $pieces")
    val withClef = SubwordVocab(Seq("a", "b", clef))
    val p2 = Tokenizer.tokenize(df, "text", withClef)
      .select("pieces").as[Seq[String]].head()
    assert(p2 == Seq("a", clef, "b"))
  }

  test("ids are dense sorted-vocab ranks with unk = 0, and sorting is " +
      "UTF-8 binary order (codepoints), not UTF-16 code units") {
    val clef = new String(Character.toChars(0x1D11E)) // U+1D11E
    // UTF-16 sorts the surrogate pair (0xD834...) BEFORE 0xFFFD; codepoint
    // order puts U+FFFD (65533) before U+1D11E (119070).
    val vocab = SubwordVocab(Seq(clef, "�", "a"))
    assert(vocab.sorted == Seq("a", "�", clef))
    assert(vocab.idOf == Map("a" -> 1, "�" -> 2, clef -> 3))
    val df = Seq((0L, Seq("a", "zzz", "�"))).toDF("id", "pieces")
    val ids = df.select(Tokenizer.tokenIds(col("pieces"), vocab).as("ids"))
      .as[Seq[Int]].head()
    assert(ids == Seq(1, 0, 2))
  }

  test("freqVocab takes the top words by (count desc, word asc) plus " +
      "char n-grams, and empty/whitespace docs tokenize to []") {
    val df = Seq(
      (0L, "aa aa aa bb bb cc"),
      (1L, "aa bb xy"),
      (2L, "   ")
    ).toDF("id", "text")
    val vocab = Tokenizer.freqVocab(df, "text", topWords = 2,
      charNgramLens = Seq(1))
    // top-2 words: aa(4), bb(3); cc(1) and xy(1) decompose to chars.
    assert(vocab.pieces.toSet == Set("aa", "bb", "a", "b", "c", "x", "y"))
    val toks = Tokenizer.tokenize(df, "text", vocab)
      .select("id", "pieces").as[(Long, Seq[String])].collect().toMap
    assert(toks(0L) == Seq("aa", "aa", "aa", "bb", "bb", "c", "c"))
    assert(toks(1L) == Seq("aa", "bb", "x", "y"))
    assert(toks(2L) == Seq.empty)
  }

  test("freqVocab: words shorter than an n-gram length contribute nothing " +
      "at that length (no [1,0] sequence smuggling the whole word in)") {
    val df = Seq((0L, "ab xyz q")).toDF("id", "text")
    // charNgramLens = Seq(3) only: "ab" (len 2) and "q" (len 1) are shorter
    // than 3 — without the length guard Spark's sequence(1,0)=[1,0] would
    // emit them whole as fake "3-grams".
    val vocab = Tokenizer.freqVocab(df, "text", topWords = 1,
      charNgramLens = Seq(3))
    // top-1 word is "ab" (count ties broken word asc); 3-grams: only "xyz".
    assert(vocab.pieces.toSet == Set("ab", "xyz"), vocab.pieces.toString)
  }

  test("freqVocab refuses an oversized piece inventory before collecting it") {
    val df = Seq((0L, "abcdefghij klmnopqrst")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Tokenizer.freqVocab(df, "text", topWords = 2, charNgramLens = Seq(1, 2),
        maxPieces = 5)
    }
    assert(e.getMessage.contains("maxPieces"))
  }

  test("BPE learns the classic merges deterministically and the learned " +
      "vocab round-trips through greedy tokenization") {
    // The Sennrich running example shape: 'low' dominates, so (l,o) then
    // (lo,w) are the first merges.
    val df = Seq(
      (0L, "low low low low low"),
      (1L, "lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")
    ).toDF("id", "text")
    val v4 = Tokenizer.trainBpe(df, "text", numMerges = 4)
    // est(9) → es+t? pair counts: (e,s)=9,(s,t)=9,(w,e)=8... merge order:
    // count desc then lexicographic: (e,s) before (s,t). After es: (es,t)=9.
    assert(v4.pieces.contains("es"))
    assert(v4.pieces.contains("est"))
    val v0 = Tokenizer.trainBpe(df, "text", numMerges = 0)
    assert(v0.pieces.toSet == "lowernwidst".toSet.map((c: Char) => c.toString))
    // Determinism: same corpus, same merges.
    assert(Tokenizer.trainBpe(df, "text", numMerges = 4).pieces == v4.pieces)
    val toks = Tokenizer.tokenize(df.filter($"id" === 2L), "text", v4)
      .select("pieces").as[Seq[String]].head()
    assert(toks.nonEmpty && toks.forall(v4.pieces.contains))
  }

  test("tokenize runs as one shuffle-free projection") {
    val df = Seq((0L, "a b")).toDF("id", "text")
    val vocab = SubwordVocab(Seq("a", "b"))
    val plan = Tokenizer.tokenize(df, "text", vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("unigram Viterbi picks the max-likelihood segmentation, not the " +
      "greedy longest match") {
    import graft.operators.Tokenizer.UnigramVocab
    // Greedy from the left takes "ab"+"c" (-10 + -1); Viterbi finds
    // "a"+"bc" (-1 + -1).
    val v = UnigramVocab(Seq("ab" -> -10.0, "a" -> -1.0,
      "bc" -> -1.0, "c" -> -1.0, "b" -> -9.0))
    val df = Seq((0L, "abc")).toDF("id", "text")
    val pieces = Tokenizer.tokenizeUnigram(df, "text", v)
      .select("pieces").as[Seq[String]].head()
    assert(pieces == Seq("a", "bc"), pieces)
    val greedy = Tokenizer.tokenize(df, "text",
      SubwordVocab(Seq("ab", "a", "bc", "c", "b")))
      .select("pieces").as[Seq[String]].head()
    assert(greedy == Seq("ab", "c"), greedy)
  }

  test("unigram score ties break to the codepoint-smallest '|'-joined " +
      "path, and <unk> advances one codepoint at unkLogProb") {
    import graft.operators.Tokenizer.UnigramVocab
    // "aa" and "a|a" both score -2.0; 'a' (0x61) < '|' (0x7C), so the
    // single-piece path "aa" is the smaller string and must win.
    val v = UnigramVocab(Seq("aa" -> -2.0, "a" -> -1.0))
    val df = Seq((0L, "aa axa")).toDF("id", "text")
    val pieces = Tokenizer.tokenizeUnigram(df, "text", v)
      .select("pieces").as[Seq[String]].head()
    assert(pieces == Seq("aa", "a", "<unk>", "a"), pieces)
    // A supplementary character is ONE <unk> advance (codepoint semantics).
    val clef = new String(Character.toChars(0x1D11E))
    val p2 = Tokenizer.tokenizeUnigram(
        Seq((0L, s"a${clef}a")).toDF("id", "text"), "text", v)
      .select("pieces").as[Seq[String]].head()
    assert(p2 == Seq("a", "<unk>", "a"), p2)
  }

  test("trainUnigram is deterministic, keeps the whole alphabet, learns " +
      "frequent words as whole pieces, and its tokenization covers the " +
      "corpus with no <unk>") {
    val df = Seq(
      (0L, "data data data data data join join join"),
      (1L, "sort hash data join data"),
      (2L, "hash sort sort data")
    ).toDF("id", "text")
    val singles = "datjoinsrh".toSet.map((c: Char) => c.toString)
    val v = Tokenizer.trainUnigram(df, "text", vocabSize = singles.size + 4)
    assert(v.pieces.toSet.intersect(singles) == singles,
      "single-codepoint coverage pieces must never be pruned")
    // "data" (9×) is the most frequent word — with 4 multi-piece slots it
    // must survive as a whole piece and tokenize as itself.
    assert(v.pieces.contains("data"), v.pieces.sorted.mkString(","))
    val v2 = Tokenizer.trainUnigram(df, "text", vocabSize = singles.size + 4)
    assert(v2.scored == v.scored, "training must be deterministic")
    val toks = Tokenizer.tokenizeUnigram(df, "text", v)
      .select("pieces").as[Seq[String]].collect()
    assert(toks.forall(ps => ps.nonEmpty && !ps.contains("<unk>")))
    assert(toks.exists(_.contains("data")))
    // Pieces must reassemble each document's words exactly.
    val texts = df.select("text").as[String].collect()
    toks.zip(texts).foreach { case (ps, t) =>
      assert(ps.mkString == t.replaceAll("\\s+", ""))
    }
  }

  test("trainUnigram refuses a vocabSize below the single-codepoint " +
      "alphabet and unigram ids follow the dense-sorted convention") {
    import graft.operators.Tokenizer.UnigramVocab
    val df = Seq((0L, "ab ba")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Tokenizer.trainUnigram(df, "text", vocabSize = 2)
    }
    val v = UnigramVocab(Seq("b" -> -1.0, "ab" -> -2.0, "a" -> -1.5))
    assert(v.sorted == Seq("a", "ab", "b"))
    assert(v.idOf == Map("a" -> 1, "ab" -> 2, "b" -> 3))
    val ids = Seq(Tuple1(Seq("ab", "zzz", "b")))
      .toDF("pieces")
      .select(Tokenizer.tokenIdsUnigram(col("pieces"), v).as("ids"))
      .as[Seq[Int]].head()
    assert(ids == Seq(2, 0, 3))
  }

  test("tokenizeUnigram runs as one shuffle-free projection and empty " +
      "text yields an empty piece array") {
    import graft.operators.Tokenizer.UnigramVocab
    val v = UnigramVocab(Seq("a" -> -1.0))
    val df = Seq((0L, "a"), (1L, "   ")).toDF("id", "text")
    val out = Tokenizer.tokenizeUnigram(df, "text", v)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.orderBy("id").select("pieces").as[Seq[String]].collect()
    assert(rows(0) == Seq("a") && rows(1).isEmpty)
  }
}
