package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization of a word array against a
  * fixed vocabulary — the WordPiece inference algorithm (Devlin et al. 2018,
  * arXiv 1810.04805 §4; identical matching discipline, no "##"
  * continuation marker): per word, repeatedly emit the LONGEST vocabulary
  * piece prefixing the remaining suffix; a position matching nothing emits
  * `<unk>` and advances one character. One tight per-row loop over a
  * hash-set vocab — no explode, no shuffle, the per-100-TB cost is one
  * linear scan with the vocab riding along as a bounded plan literal
  * (the MinHashSignature kernel convention; CodegenFallback: the loop
  * itself is compiled JVM code, only the expression boundary is
  * interpreted).
  *
  * All string positions are CODEPOINTS, not UTF-16 code units: a
  * supplementary character (emoji, rare CJK) is one unit for both matching
  * and the single-character `<unk>` advance, matching the character
  * semantics of ANSI `substr` so oracles can replay the algorithm exactly.
  */
case class SubwordTokenize(child: Expression, vocab: Seq[String],
    unkPiece: String) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"subword_tokenize requires array<string>, got $other")
    }

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  // Longest piece in CODEPOINTS bounds the prefix probe per position.
  @transient private lazy val maxPieceCp: Int =
    if (vocab.isEmpty) 0
    else vocab.iterator.map(p => p.codePointCount(0, p.length)).max

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var wi = 0
    while (wi < words.numElements()) {
      val w = words.getUTF8String(wi)
      if (w != null && w.numBytes() > 0) {
        val s = w.toString
        // Codepoint index → UTF-16 offset table, so substring probes are
        // O(1) per (start, end) instead of offsetByCodePoints walks.
        val cpOff = {
          val b = new Array[Int](s.codePointCount(0, s.length) + 1)
          var o = 0; var i = 0
          while (o < s.length) { b(i) = o; o += Character.charCount(s.codePointAt(o)); i += 1 }
          b(i) = s.length
          b
        }
        val nCp = cpOff.length - 1
        var i = 0
        while (i < nCp) {
          var j = math.min(nCp, i + math.max(1, maxPieceCp))
          while (j > i && !vocabSet.contains(s.substring(cpOff(i), cpOff(j)))) j -= 1
          if (j == i) {
            out += UTF8String.fromString(unkPiece)
            i += 1
          } else {
            out += UTF8String.fromString(s.substring(cpOff(i), cpOff(j)))
            i = j
          }
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenize =
    copy(child = newChild)
}

object SubwordExpr {
  import org.apache.spark.sql.graft.ColumnBridge
  def subwordTokenize(words: Column, vocab: Seq[String],
      unkPiece: String = "<unk>"): Column =
    ColumnBridge.column(SubwordTokenize(ColumnBridge.expression(words),
      vocab, unkPiece))
}
