package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi subword tokenization of a word array under a unigram language
  * model (Kudo 2018, arXiv 1804.10959 §3 — the SentencePiece inference
  * rule): per word, the segmentation maximizing the SUM of piece
  * log-probabilities, not the greedy longest match ([[SubwordTokenize]] is
  * the WordPiece sibling). An `<unk>` transition consuming one codepoint at
  * `unkLogProb` is available at every position, so coverage is total even
  * off-vocabulary.
  *
  * Engine-reproducible by construction, the cross-engine contract every
  * graft kernel keeps:
  *   - scores accumulate LEFT TO RIGHT (`score(prefix) + lp(piece)`), the
  *     same IEEE addition sequence an oracle's recursive path enumeration
  *     performs, so equal paths score bit-identically on both engines;
  *   - score ties break to the SMALLEST piece path joined with `|`,
  *     compared in codepoint (UTF-8 binary) order — `ORDER BY score DESC,
  *     path ASC` under binary collation replays it. The tie-break is
  *     DP-safe: at a fixed consumed-codepoint position neither of two
  *     distinct paths can be a string-prefix of the other (a path extension
  *     appends `|piece`, which always consumes ≥ 1 more codepoint), so the
  *     first differing character decides, and appending a common suffix
  *     preserves the order — prefix dominance survives extension.
  *
  * All string positions are CODEPOINTS (ANSI `substr` semantics), matching
  * [[SubwordTokenize]]. One tight per-row loop, vocab + log-probs ride as a
  * bounded plan literal; CodegenFallback per the kernel convention (the
  * loop itself is compiled JVM code, only the expression boundary is
  * interpreted).
  */
case class UnigramTokenize(child: Expression, pieces: Seq[String],
    logProbs: Seq[Double], unkPiece: String, unkLogProb: Double)
  extends UnaryExpression with CodegenFallback {

  require(pieces.length == logProbs.length,
    s"unigram_tokenize: ${pieces.length} pieces vs ${logProbs.length} log-probs")
  // '|' is the tie-break path separator — a piece containing it would make
  // two different segmentations join to the same path string.
  require(!pieces.exists(_.contains('|')) && !unkPiece.contains('|'),
    "unigram_tokenize: pieces must not contain '|' (the path separator)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_tokenize requires array<string>, got $other")
    }

  @transient private lazy val lpMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.iterator.zip(logProbs.iterator).foreach { case (p, lp) => m.put(p, lp) }
    m
  }
  @transient private lazy val maxPieceCp: Int =
    if (pieces.isEmpty) 1
    else math.max(1, pieces.iterator.map(p => p.codePointCount(0, p.length)).max)

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var wi = 0
    while (wi < words.numElements()) {
      val w = words.getUTF8String(wi)
      if (w != null && w.numBytes() > 0)
        UnigramExpr.viterbi(w.toString, lpMap, maxPieceCp, unkPiece, unkLogProb)
          .foreach(p => out += UTF8String.fromString(p))
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenize =
    copy(child = newChild)
}

object UnigramExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  def unigramTokenize(words: Column, pieces: Seq[String], logProbs: Seq[Double],
      unkPiece: String = "<unk>", unkLogProb: Double = -20.0): Column =
    ColumnBridge.column(UnigramTokenize(ColumnBridge.expression(words),
      pieces, logProbs, unkPiece, unkLogProb))

  /** Codepoint-order string compare (== UTF-8 binary order; UTF-16
    * code-unit order would diverge on supplementary characters).
    */
  private[graft] def cpLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** The shared Viterbi segmenter — ONE implementation used by both the
    * [[UnigramTokenize]] kernel and the
    * [[graft.operators.Tokenizer.trainUnigram]] EM loop, so training
    * counts and inference segmentations can never drift apart. Returns the
    * piece sequence of the (max score, then min `|`-joined path in
    * codepoint order) segmentation; see the class doc for why the
    * tie-break is DP-compatible.
    */
  private[graft] def viterbi(s: String,
      lp: java.util.HashMap[String, java.lang.Double], maxPieceCp: Int,
      unkPiece: String, unkLogProb: Double): Array[String] = {
    // Codepoint index → UTF-16 offset table (the SubwordTokenize probe).
    val cpOff = {
      val b = new Array[Int](s.codePointCount(0, s.length) + 1)
      var o = 0; var i = 0
      while (o < s.length) { b(i) = o; o += Character.charCount(s.codePointAt(o)); i += 1 }
      b(i) = s.length
      b
    }
    val n = cpOff.length - 1
    val score = new Array[Double](n + 1)
    val path = new Array[String](n + 1)
    path(0) = ""
    var i = 0
    def consider(k: Int, sc: Double, pa: String): Unit =
      if (path(k) == null || sc > score(k) ||
          (sc == score(k) && cpLess(pa, path(k)))) {
        score(k) = sc; path(k) = pa
      }
    while (i < n) {
      // Every position is reachable (the unk transition keeps the frontier
      // total), so path(i) is never null here.
      val sep = if (i == 0) "" else "|"
      consider(i + 1, score(i) + unkLogProb, path(i) + sep + unkPiece)
      var j = i + 1
      val jmax = math.min(n, i + maxPieceCp)
      while (j <= jmax) {
        val piece = s.substring(cpOff(i), cpOff(j))
        val v = lp.get(piece)
        if (v != null) consider(j, score(i) + v.doubleValue(), path(i) + sep + piece)
        j += 1
      }
      i += 1
    }
    if (n == 0) Array.empty else path(n).split("\\|", -1)
  }

  /** Best-segmentation total log-probability of `s` — the score the path
    * returned by [[viterbi]] accumulates; exposed for the trainer's
    * corpus-likelihood diagnostics.
    */
  private[graft] def viterbiScore(s: String,
      lp: java.util.HashMap[String, java.lang.Double], maxPieceCp: Int,
      unkPiece: String, unkLogProb: Double): Double = {
    val ps = viterbi(s, lp, maxPieceCp, unkPiece, unkLogProb)
    var acc = 0.0
    var k = 0
    while (k < ps.length) {
      val p = ps(k)
      acc += (if (p == unkPiece) unkLogProb else lp.get(p).doubleValue())
      k += 1
    }
    acc
  }
}
