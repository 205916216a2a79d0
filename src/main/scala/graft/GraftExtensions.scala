package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Spark session extension registering graft's custom Catalyst expressions
  * as SQL functions, so pure-SQL pipelines (spark-sql, Thrift server,
  * `spark.sql(...)`) reach the same tight-loop kernels the DataFrame API
  * uses:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // at build time, or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * // ... or on a session that already exists:
  * GraftExtensions.register(spark)
  * spark.sql("SELECT simhash64(split(text, '\\\\s+')) FROM docs")
  * }}}
  *
  * Registered: `minhash_signature(words, shingleLen, numHashes)`,
  * `shingle_hashes(words, n)`, `simhash64(words)`,
  * `ngram_repetition(words, n)`, `deflate_ratio(text[, level])`,
  * `array_dot(a, b)`, `long_set_jaccard(a, b)`,
  * `subword_tokenize(words, vocab[, unk])`, `url_normalize(url)`,
  * `registrable_domain(url)`, `markdown_strip(text)`,
  * `latex_strip(text)`, `winnow_fingerprints(text, k, w)`,
  * unicode normalizers, `blocklist_matches`, `vector_avg`.
  * Shape parameters must be
  * literals — they size
  * per-row loops at plan time, exactly like the DataFrame wrappers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register every graft SQL function on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.FunctionBridge.register(spark, id, info, builder)
    }

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** A FOLDABLE array<string> (array(...) of literals, a typedLit, …)
    * evaluated at registration — vocabularies size the per-row matcher at
    * plan time, exactly like the int shape parameters.
    */
  private def stringArrayLit(e: Expression, fn: String, arg: String): Seq[String] = {
    // Element type is CHECKED, not assumed: array(1,2,3) would otherwise be
    // silently stringified via toString, and a null element would defer to
    // an NPE inside the kernel at eval time — both fail loudly here, at
    // registration, like the sibling literal extractors.
    val elemOk = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (e.foldable && elemOk)
      e.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          val vs = a.toObjectArray(org.apache.spark.sql.types.StringType)
          if (vs.exists(_ == null)) throw new IllegalArgumentException(
            s"$fn: $arg contains a null element — vocab pieces must be non-null")
          vs.map(_.toString).toSeq
        case _ => throw new IllegalArgumentException(
          s"$fn: $arg must be a non-null array<string> literal")
      }
    else throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable array<string> literal, got $e")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), builder)

  private[graft] val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fn("minhash_signature",
      "_FUNC_(words, shingleLen, numHashes) - minhash signature of word shingles") {
      args =>
        require(args.length == 3, "minhash_signature(words, shingleLen, numHashes)")
        functions.MinHashSignature(args.head,
          intLit(args(1), "minhash_signature", "shingleLen"),
          intLit(args(2), "minhash_signature", "numHashes"))
    },
    fn("shingle_hashes", "_FUNC_(words, n) - 64-bit hashes of word n-gram shingles") {
      args =>
        require(args.length == 2, "shingle_hashes(words, n)")
        functions.ShingleHashes(args.head, intLit(args(1), "shingle_hashes", "n"))
    },
    fn("simhash64", "_FUNC_(words) - 64-bit simhash of a token array") { args =>
      require(args.length == 1, "simhash64(words)")
      functions.SimHash64(args.head)
    },
    fn("ngram_repetition",
      "_FUNC_(words, n) - struct(top_frac, dup_frac) n-gram repetition stats") {
      args =>
        require(args.length == 2, "ngram_repetition(words, n)")
        functions.NgramRepetition(args.head, intLit(args(1), "ngram_repetition", "n"))
    },
    fn("deflate_ratio", "_FUNC_(text[, level]) - deflate compressed/raw byte ratio") {
      case Seq(c) => functions.DeflateRatio(c, 6)
      case Seq(c, l) => functions.DeflateRatio(c, intLit(l, "deflate_ratio", "level"))
      case _ => throw new IllegalArgumentException("deflate_ratio(text[, level])")
    },
    fn("array_dot", "_FUNC_(a, b) - dot product of two numeric arrays") { args =>
      require(args.length == 2, "array_dot(a, b)")
      functions.ArrayDotProduct(args.head, args(1))
    },
    fn("long_set_jaccard",
      "_FUNC_(a, b) - merge-based Jaccard of two array<bigint> sets") { args =>
      require(args.length == 2, "long_set_jaccard(a, b)")
      functions.LongSetJaccard(args.head, args(1))
    },
    fn("subword_tokenize",
      "_FUNC_(words, vocab[, unk]) - greedy longest-match subword pieces " +
        "of a word array against an array<string> vocab literal") {
      args =>
        require(args.length == 2 || args.length == 3,
          "subword_tokenize(words, vocab[, unk])")
        val unk = if (args.length == 3) args(2) match {
          case Literal(u, org.apache.spark.sql.types.StringType) if u != null =>
            u.toString
          case other => throw new IllegalArgumentException(
            s"subword_tokenize: unk must be a string literal, got $other")
        } else "<unk>"
        functions.SubwordTokenize(args.head,
          stringArrayLit(args(1), "subword_tokenize", "vocab"), unk)
    },
    fn("nfc_normalize", "_FUNC_(text) - unicode NFC canonical composition") { args =>
      require(args.length == 1, "nfc_normalize(text)")
      functions.UnicodeNormalize(args.head, "NFC")
    },
    fn("nfkc_normalize",
      "_FUNC_(text) - unicode NFKC compatibility composition") { args =>
      require(args.length == 1, "nfkc_normalize(text)")
      functions.UnicodeNormalize(args.head, "NFKC")
    },
    fn("strip_accents", "_FUNC_(text) - remove combining diacritics") { args =>
      require(args.length == 1, "strip_accents(text)")
      functions.StripAccents(args.head)
    },
    fn("blocklist_matches",
      "_FUNC_(text, patterns) - distinct blocklist patterns present " +
        "(case-insensitive substrings, one Aho-Corasick pass)") { args =>
      require(args.length == 2, "blocklist_matches(text, patterns)")
      functions.BlocklistExpr.BlocklistMatches(args.head,
        stringArrayLit(args(1), "blocklist_matches", "patterns"))
    },
    fn("url_normalize",
      "_FUNC_(url) - canonical URL form: fragment/default-port/tracking-" +
        "param strip, scheme+authority lowercase, sorted query") { args =>
      require(args.length == 1, "url_normalize(url)")
      functions.UrlExpr.UrlNormalize(args.head)
    },
    // Column COMPOSITIONS register the same way — the builder returns the
    // composed expression tree (Column#expr); no UDF, plans inline it.
    fn("registrable_domain",
      "_FUNC_(url) - Public-Suffix-List registrable domain (pinned " +
        "ICANN snapshot; exact/wildcard/exception rules, longest match)") {
      args =>
        require(args.length == 1, "registrable_domain(url)")
        org.apache.spark.sql.graft.ColumnBridge.resolvableExpression(
          operators.CorpusPrep.registrableDomain(
            org.apache.spark.sql.graft.ColumnBridge.column(args.head)))
    },
    fn("markdown_strip",
      "_FUNC_(text) - strip Markdown syntax to prose (fences, links, " +
        "images, headings, emphasis, quotes, rules)") { args =>
      require(args.length == 1, "markdown_strip(text)")
      org.apache.spark.sql.graft.ColumnBridge.resolvableExpression(
        functions.TextFunctions.markdownStrip(
          org.apache.spark.sql.graft.ColumnBridge.column(args.head)))
    },
    fn("latex_strip",
      "_FUNC_(text) - strip LaTeX markup to prose (comments, math, " +
        "commands with brace args kept)") { args =>
      require(args.length == 1, "latex_strip(text)")
      org.apache.spark.sql.graft.ColumnBridge.resolvableExpression(
        functions.TextFunctions.latexStrip(
          org.apache.spark.sql.graft.ColumnBridge.column(args.head)))
    },
    fn("winnow_fingerprints",
      "_FUNC_(text, k, w) - winnowing fingerprint set (MOSS): md5 window " +
        "minima over k-word grams, window w") { args =>
      require(args.length == 3, "winnow_fingerprints(text, k, w)")
      org.apache.spark.sql.graft.ColumnBridge.resolvableExpression(
        operators.Dedup.winnowFingerprints(
          org.apache.spark.sql.graft.ColumnBridge.column(args.head),
          intLit(args(1), "winnow_fingerprints", "k"),
          intLit(args(2), "winnow_fingerprints", "w")))
    },
    // An AGGREGATE registers through the same builder: the analyzer wraps a
    // bare AggregateFunction in AggregateExpression during resolution, so
    // SQL GROUP BYs reach the partial-merge vector mean directly.
    fn("vector_avg",
      "_FUNC_(vec) - element-wise mean of array<float> vectors (aggregate)") {
      args =>
        require(args.length == 1, "vector_avg(vec)")
        functions.VectorAvg(args.head)
    })
}
