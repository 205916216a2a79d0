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
}
