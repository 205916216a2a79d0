package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting. All native
  * Catalyst expressions (codegen'd, no UDFs) and deliberately portable to
  * ANSI SQL so results are oracle-checkable.
  */
object TextFunctions {

  /** DOM-density main-content extraction (the jusText/Readability family
    * — Pomikálek 2011 §3: classify block-level segments by length and
    * link density; navigation, sidebars, and footers are short and
    * link-saturated, article text is long and link-free). Pure column
    * composition — zero UDFs, a billion-page extraction is one narrow
    * map — and every regex is RE2-safe (lazy quantifiers, NO
    * backreferences), so the identical formula replays in DuckDB when an
    * oracle needs it; the gate instead pins CONSTRUCTION: pages built
    * around corpus text must extract back to exactly that text.
    *
    * Pipeline: drop script/style subtrees → split into blocks at
    * block-level tags → per block, tag-stripped text and its length
    * with the <a>-subtree text length → keep blocks with
    * `len ≥ minChars` and link density ≤ `maxLinkDensity` → join with
    * '\n'. Character entities are passed through verbatim (compose with
    * the web extractor's entity decoding when input needs it).
    */
  def mainContent(c: Column, minChars: Int = 80,
      maxLinkDensity: Double = 0.5): Column = {
    val noScript = regexp_replace(regexp_replace(c,
      "(?is)<script.*?</script>", " "), "(?is)<style.*?</style>", " ")
    val blocks = split(noScript,
      "(?i)</?(?:p|div|h[1-6]|li|ul|ol|td|tr|table|section|article|header|footer|nav|aside|blockquote|br)[^>]*>")
    def strippedText(b: Column) =
      trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), "\\s+", " "))
    val scored = transform(blocks, b => {
      val all = strippedText(b)
      val nonLink = strippedText(
        regexp_replace(b, "(?is)<a[^>]*>.*?</a>", " "))
      struct(all.as("t"), length(all).as("n"),
        (length(all) - length(nonLink)).as("lk"))
    })
    val kept = filter(scored, s =>
      s.getField("n") >= minChars &&
        s.getField("lk").cast("double") <=
          s.getField("n").cast("double") * maxLinkDensity)
    array_join(transform(kept, s => s.getField("t")), "\n")
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword token estimate: word chunks of ≤4 chars + punctuation
    * marks each count as one token (a public heuristic approximating BPE
    * vocabularies' ~4 chars/token average).
    */
  def bpeTokenEstimate(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of sentence-punctuation chars to total chars. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^.,!?;:]", "")).cast("double") / length(c))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Fraction of whitespace tokens that are (English) stopwords. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val words = split(lower(trim(c)), "\\s+")
    when(size(words) === 0, lit(0.0)).otherwise(
      size(filter(words, w => w.isInCollection(stopwords))).cast("double") / size(words))
  }

  /** Mean word length (chars per whitespace token). */
  def meanWordLen(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s+", "")).cast("double") / tokenCount(c))

  /** Composite quality score in [0,1]: rewards mid-length docs, presence of
    * stopwords, low punctuation noise. Deterministic and SQL-portable.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 10.0)
    round((lenScore + stopScore + punctPenalty) / 3.0, 4)
  }

  private val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "des", "dans", "pour")
  )

  /** N-gram/stopword-lexicon language ID heuristic: most stopword hits wins,
    * ties broken in fixed lexicon order (en, de, es, fr).
    */
  def langId(c: Column): Column = {
    val words = split(lower(trim(c)), "\\s+")
    val hits = Lexicons.map { case (lang, lex) =>
      lang -> size(filter(words, w => w.isInCollection(lex)))
    }
    // argmax with first-wins tie-break
    val best = hits.tail.foldLeft((hits.head._2, lit(hits.head._1))) {
      case ((bestHits, bestLang), (lang, h)) =>
        (greatest(bestHits, h), when(h > bestHits, lit(lang)).otherwise(bestLang))
    }
    best._2
  }

  /** Unicode-script composition of a document: the fraction of
    * NON-WHITESPACE characters in each of the major script classes
    * (latin, cyrillic, cjk, arabic, other) — the pre-language-ID routing
    * signal of multilingual pipelines (a stopword-lexicon langId is
    * meaningless on CJK text; script fractions say which detector even
    * applies, and catch mixed-script spam). Pure per-row regexp counts,
    * O(doc length), no shuffle; the ranges are literal codepoint classes
    * so an external engine reproduces them exactly.
    */
  def scriptFractions(c: Column): Column = {
    // Unicode-aware whitespace strip: NBSP, ogham mark, the en/em-space
    // block, line/para separators, narrow NBSP, math space, ideographic
    // space — all non-letters that must not count as "other" on real
    // multilingual text. The latin class excludes U+00D7 (×) and U+00F7
    // (÷): Latin-1 SIGNS, not letters.
    val nonWs = length(regexp_replace(c,
      "[\\s\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]+", ""))
    def frac(pattern: String) =
      when(nonWs === 0, lit(0.0)).otherwise(
        size(regexp_extract_all(c, lit(pattern), lit(0))).cast("double") / nonWs)
    val latin = frac("[A-Za-z\\u00C0-\\u00D6\\u00D8-\\u00F6\\u00F8-\\u024F]")
    val cyr = frac("[\\u0400-\\u04FF]")
    val cjk = frac("[\\u4E00-\\u9FFF\\u3040-\\u30FF\\uAC00-\\uD7AF]")
    val arabic = frac("[\\u0600-\\u06FF]")
    struct(
      round(latin, 4).as("latin"),
      round(cyr, 4).as("cyrillic"),
      round(cjk, 4).as("cjk"),
      round(arabic, 4).as("arabic"),
      round(when(nonWs === 0, lit(0.0)).otherwise(greatest(lit(0.0),
        lit(1.0) - latin - cyr - cjk - arabic)), 4).as("other"))
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased text.
    * (The md5 builtin exists in both Spark and ANSI-ish oracles, so
    * fingerprints are verifiable end-to-end.)
    */
  def fingerprint(c: Column): Column =
    md5(to_binary(regexp_replace(lower(trim(c)), "\\s+", " "), lit("utf-8")))

  // ------------------------------------------------------------------
  // Repetition / gibberish signals (the Gopher & C4 rule families from
  // published corpus-cleaning pipelines). All per-row higher-order-function
  // compositions: work is bounded by the document's own length, no explode,
  // no shuffle — the property that keeps a quality pass one narrow map at
  // 100 TB. Deliberately SQL-portable so results are oracle-checkable.
  // ------------------------------------------------------------------

  private def wordsOf(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** 1 − distinct/total over whitespace tokens: how much of the doc is
    * repeated vocabulary (boilerplate and keyword-stuffing detector).
    */
  def wordRepetitionRatio(c: Column): Column = {
    val words = wordsOf(c)
    when(size(words) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(words)).cast("double") / size(words))
  }

  /** Sliding n-grams of an array column, joined by `sep` — via
    * `arrays_zip` of n shifted slices, whose CHILDREN evaluate once per
    * row. The naive form (`transform(sequence(...), i => slice(arr, i,
    * n))`) re-evaluates `arr`'s whole expression tree PER ELEMENT —
    * Catalyst does not hoist loop-invariant subtrees out of
    * higher-order-function lambdas, so an inline `split(text)` there
    * turns every O(len) gram pass O(len²) (the scoreLangNB
    * double-evaluation hazard's higher-order sibling; measured 2.6 s →
    * sub-second on ngram_novelty). Returns max(len − n + 1, 0) grams.
    */
  def slidingGrams(arr: Column, n: Int, sep: String = " "): Column = {
    require(n >= 1, s"slidingGrams: n $n must be >= 1")
    if (n == 1) arr
    else {
      val shifted = (0 until n).map(j =>
        slice(arr, lit(j + 1), greatest(size(arr) - j, lit(0))))
      val z = slice(arrays_zip(shifted: _*), lit(1),
        greatest(size(arr) - (n - 1), lit(0)))
      transform(z, s =>
        concat_ws(sep, (0 until n).map(j => s.getField(j.toString)): _*))
    }
  }

  /** Sliding word n-grams as an array column (n ≥ 1; empty below n words). */
  def wordNgrams(c: Column, n: Int): Column = {
    val words = wordsOf(c)
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(slidingGrams(words, n))
  }

  /** Fraction of n-gram slots taken by the single most frequent n-gram
    * (Gopher's "top n-gram fraction"): high ⇒ templated/repetitive text.
    * One O(doc length) counting pass via [[MinHashExpr.ngramRepetition]] —
    * NOT the naive distinct×slots HOF composition, which is O(g²) per row
    * and lets one adversarial 100k-word document stall a corpus-quality
    * task. Same exact-string counting math, so results are identical.
    */
  def topNgramFraction(c: Column, n: Int): Column =
    MinHashExpr.ngramRepetition(wordsOf(c), n).getField("top_frac")

  /** Fraction of n-gram slots whose n-gram occurs more than once (Gopher's
    * "duplicate n-gram fraction"). O(doc length), see [[topNgramFraction]].
    */
  def dupNgramFraction(c: Column, n: Int): Column =
    MinHashExpr.ngramRepetition(wordsOf(c), n).getField("dup_frac")

  /** Shannon entropy (nats) of the document's word distribution — the
    * low-entropy gibberish/spam signal (templated and keyword-stuffed
    * pages collapse toward 0; a single repeated word IS 0). One
    * O(length log distinct) pass via [[MinHashExpr.wordEntropy]], with a
    * deterministic binary-ordered accumulation so the value is
    * bit-identical across engines (see the kernel's Scaladoc).
    */
  def wordEntropy(c: Column): Column =
    MinHashExpr.wordEntropy(wordsOf(c))

  /** Non-empty lines of a document (newline-split, whitespace-only lines
    * dropped) — the unit of Gopher's line-level rules below. Per-row HOFs:
    * O(doc length), no shuffle, SQL-portable.
    */
  private def linesOf(c: Column): Column =
    filter(split(c, "\n"), l => length(trim(l)) > 0)

  /** Fraction of lines starting with a bullet mark (Gopher drops docs with
    * > 90% bulleted lines — list-of-links pages). Null on line-less docs.
    */
  def bulletLineFraction(c: Column): Column = {
    val ls = linesOf(c)
    when(size(ls) === 0, lit(null).cast("double"))
      .otherwise(size(filter(ls, l =>
        substring(trim(l), 1, 1).isin("-", "*", "•"))).cast("double") / size(ls))
  }

  /** Fraction of lines ending in an ellipsis (Gopher drops docs with > 30%
    * — truncated-snippet pages). Null on line-less docs.
    */
  def ellipsisLineFraction(c: Column): Column = {
    val ls = linesOf(c)
    when(size(ls) === 0, lit(null).cast("double"))
      .otherwise(size(filter(ls, l =>
        right(trim(l), lit(3)) === "..." || right(trim(l), lit(1)) === "…"))
        .cast("double") / size(ls))
  }

  /** C4's line-retention rule set (arXiv 1910.10683 §2.2) as one pure
    * column composition: keep a line iff it ends in a terminal
    * punctuation mark (`.` `!` `?` or a closing quote), holds at least
    * `minWords` whitespace tokens, and does not mention "javascript"
    * (case-insensitive — C4 drops cookie/JS-warning boilerplate lines).
    * Returns the retained lines re-joined with '\n'; the page-level C4
    * rules (≥ 3 sentences, no "lorem ipsum", no curly bracket, no
    * blocklist word) compose on top — the c4_quality_filter gate pins
    * the whole published composition. Line-less or fully-dropped docs
    * yield "".
    */
  def c4LineClean(c: Column, minWords: Int = 5): Column = {
    val kept = filter(split(c, "\n"), l => {
      val t = trim(l)
      right(t, lit(1)).isin(".", "!", "?", "\"") &&
        size(split(t, "\\s+")) >= minWords &&
        !lower(t).contains("javascript")
    })
    array_join(kept, "\n")
  }

  /** Fraction of lines with fewer than `minWords` whitespace tokens (the
    * C4 "at least 3 words per line" family: nav crumbs, footers). Null on
    * line-less docs.
    */
  def shortLineFraction(c: Column, minWords: Int = 3): Column = {
    val ls = linesOf(c)
    when(size(ls) === 0, lit(null).cast("double"))
      .otherwise(size(filter(ls, l =>
        size(split(trim(l), "\\s+")) < minWords)).cast("double") / size(ls))
  }

  /** Symbol-to-word ratio (Gopher): '#'/ellipsis marks per whitespace token. */
  def symbolWordRatio(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(c, lit("#|\\.\\.\\."), lit(0))).cast("double")
        / tokenCount(c))

  /** Fraction of whitespace tokens containing at least one alphabetic char
    * (Gopher's "80% of words must contain an alphabetic character" rule).
    */
  def alphaWordFraction(c: Column): Column = {
    val words = wordsOf(c)
    when(size(words) === 0, lit(0.0))
      .otherwise(size(filter(words, w => w.rlike("[a-z]"))).cast("double") / size(words))
  }

  // ------------------------------------------------------------------
  // PII detection / redaction: the scrubbing pass of a training-data
  // pipeline. Pure regexp_replace/count chains — codegen'd, per-row, no
  // shuffle — and every pattern stays inside the regex subset Java and RE2
  // share (no backrefs, no lookaround), so redaction is oracle-checkable.
  // ------------------------------------------------------------------

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\+\\d{1,3}-\\d{3}-\\d{3}-\\d{4}"

  /** Occurrences of one PII pattern. */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Redact all four PII classes to typed placeholder tokens. Order matters
    * and is part of the contract: emails first (their local parts may
    * contain dots and digits), then phones (the leading `+` keeps them
    * disjoint from SSNs), then SSNs, then bare IPv4s.
    */
  def redactPii(c: Column): Column = {
    val e = regexp_replace(c, EmailPattern, "<EMAIL>")
    val p = regexp_replace(e, PhonePattern, "<PHONE>")
    val s = regexp_replace(p, SsnPattern, "<SSN>")
    regexp_replace(s, Ipv4Pattern, "<IP>")
  }

  /** Distinct blocklist patterns present in the text (case-insensitive
    * substring match, pattern-list order) — ONE Aho–Corasick pass per row
    * however long the list ([[BlocklistExpr]]); the C4-style content
    * filter is `size(blocklistMatches(c, terms)) === 0`.
    */
  def blocklistMatches(c: Column, patterns: Seq[String]): Column =
    BlocklistExpr.blocklistMatches(c, patterns)

  /** Strip Markdown syntax to plain text — the arXiv/GitHub-corpus
    * normalization stage (RedPajama/peS2o-style pipelines reduce markup
    * to prose before quality scoring and dedup; markup tokens otherwise
    * pollute n-gram statistics and tokenizer vocabularies). Pure
    * regexp_replace chain (codegen'd, RE2-compatible patterns — no
    * backtracking), applied in a FIXED documented order: code-fence
    * markers, images (keep alt), links (keep text), ATX headings,
    * bold/italic markers, blockquote prefixes, horizontal rules, then
    * whitespace normalization. Deliberately syntax-light: reference-style
    * links, tables and setext headings pass through as text — the goal
    * is corpus statistics hygiene, not a Markdown parser.
    */
  def markdownStrip(c: Column): Column = {
    val noFence = regexp_replace(c, "(?m)^```[^\\n]*$", "")
    val noImg = regexp_replace(noFence,
      "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLink = regexp_replace(noImg,
      "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noHead = regexp_replace(noLink, "(?m)^#{1,6}[ \\t]*", "")
    val noBold = regexp_replace(noHead, "\\*\\*([^*]*)\\*\\*", "$1")
    val noItal = regexp_replace(noBold, "\\*([^*]*)\\*", "$1")
    val noQuote = regexp_replace(noItal, "(?m)^>[ \\t]?", "")
    val noRule = regexp_replace(noQuote, "(?m)^(-{3,}|={3,})[ \\t]*$", "")
    trim(regexp_replace(noRule, "[ \\t]+", " "))
  }

  /** Strip LaTeX markup to plain text — the crude published-pipeline
    * normalization (the RedPajama arXiv pass is the same regex family):
    * comments (`%` to end of line — escaped `\%` is NOT protected,
    * documented approximation), display+inline math replaced whole
    * (`$$..$$`, `$..$` — math tokens are noise to text statistics),
    * `\command[opt]` forms removed with BRACE ARGUMENTS KEPT (the
    * argument of \textbf/\emph/\section is prose), then stray braces
    * dropped and whitespace normalized. NOT a TeX parser: environments'
    * `\begin/\end` lines vanish with their commands, verbatim blocks are
    * not protected — corpus hygiene, not rendering.
    */
  def latexStrip(c: Column): Column = {
    val noComment = regexp_replace(c, "(?m)%[^\\n]*", "")
    val noDisplay = regexp_replace(noComment,
      "\\$\\$[^$]*\\$\\$", " ")
    val noMath = regexp_replace(noDisplay, "\\$[^$]*\\$", " ")
    val noCmd = regexp_replace(noMath,
      "\\\\[a-zA-Z]+\\*?(\\[[^\\]]*\\])?", "")
    val noBrace = regexp_replace(noCmd, "[{}]", "")
    trim(regexp_replace(noBrace, "[ \\t]+", " "))
  }

  /** Rolling (polynomial) content-defined fingerprints of word windows:
    * xxhash64 over sliding word n-grams; the minimum is a winnowing-style
    * whole-document SCALAR signature (cheap identity key). For the actual
    * Schleimer et al. winnowing algorithm — per-window minima with the
    * w+k−1 locality guarantee, for local-similarity detection — see
    * [[graft.operators.Dedup.winnowFingerprints]].
    */
  def winnowFingerprint(c: Column, window: Int = 8): Column = {
    val words = split(lower(trim(c)), "\\s+")
    val grams = when(size(words) <= window, array(concat_ws(" ", words)))
      .otherwise(slidingGrams(words, window))
    array_min(transform(grams, g => xxhash64(g)))
  }
}
