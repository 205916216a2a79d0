package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of word n-gram shingles as ONE tight per-row loop: for
  * each sliding window of `shingleLen` words, a 64-bit FNV-1a base hash over
  * the window's bytes, then `numHashes` avalanche mixes updating running
  * minima. Replaces the explode → 64 aggregate pipeline: no shingle-string
  * materialization, no shuffle — the signature is computed where the row
  * already is. (CodegenFallback: the loop itself is compiled JVM code; only
  * the expression boundary is interpreted.)
  */
case class MinHashSignature(child: Expression, shingleLen: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got $other")
    }

  // Deterministic per-hash mix constants (splitmix64 stream from a fixed seed).
  private lazy val seeds: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(numHashes) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(1, n - shingleLen + 1)
    var i = 0
    while (i < nShingles) {
      // FNV-1a over the window's word bytes with a separator byte.
      var h = 0xCBF29CE484222325L
      var j = 0
      val wlen = math.min(shingleLen, n - i)
      while (j < wlen) {
        val w = words.getUTF8String(i + j)
        if (w != null) {
          val bytes = w.getBytes
          var b = 0
          while (b < bytes.length) {
            h ^= (bytes(b) & 0xFFL); h *= 0x100000001B3L; b += 1
          }
        }
        h ^= 0x20L; h *= 0x100000001B3L // separator
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        // xor-mix with the k-th seed + avalanche; cheap and well-spread.
        var z = h ^ seeds(k)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z ^= (z >>> 31)
        if (z < mins(k)) mins(k) = z
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-shingle 64-bit hashes (same FNV-1a kernel as [[MinHashSignature]]),
  * for exact-Jaccard verification over long arrays without materializing
  * shingle strings.
  */
case class ShingleHashes(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val nShingles = math.max(1, n - shingleLen + 1)
    val out = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      var h = 0xCBF29CE484222325L
      var j = 0
      val wlen = math.min(shingleLen, n - i)
      while (j < wlen) {
        val w = words.getUTF8String(i + j)
        if (w != null) {
          val bytes = w.getBytes
          var b = 0
          while (b < bytes.length) {
            h ^= (bytes(b) & 0xFFL); h *= 0x100000001B3L; b += 1
          }
        }
        h ^= 0x20L; h *= 0x100000001B3L
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array as ONE tight per-row loop (sibling of
  * [[MinHashSignature]], replacing the explode → 65-aggregate shuffle): per
  * token a single FNV-1a hash, ±1 bit votes accumulated in a local array,
  * sign → bit. The full corpus is never exploded or shuffled — the signature
  * is computed where the row already is.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        var h = 0xCBF29CE484222325L
        val bytes = w.getBytes
        var b = 0
        while (b < bytes.length) {
          h ^= (bytes(b) & 0xFFL); h *= 0x100000001B3L; b += 1
        }
        // avalanche so low bits are well-mixed
        h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
        h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
        h ^= (h >>> 31)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-/duplicate-n-gram fractions (the Gopher repetition signals) of a word
  * array as ONE tight per-row counting pass: each sliding n-gram is counted
  * in a hash map keyed on the gram's exact text, then
  *   top_frac = max count / grams,   dup_frac = Σ counts>1 / grams.
  * Replaces the higher-order-function composition
  * `array_max(transform(array_distinct(grams), g => size(filter(grams, …))))`
  * which compares every distinct gram against every gram slot — O(g²) per
  * row, so one adversarial 100k-word document costs ~10¹⁰ comparisons and
  * stalls a whole corpus-quality task. This is O(g) per row (the
  * [[MinHashSignature]] pattern): exact string keys, so results are
  * bit-identical to the HOF form and the DuckDB oracle.
  */
case class NgramRepetition(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n-gram length must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_repetition requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nWords = words.numElements()
    if (nWords < n)
      return org.apache.spark.sql.catalyst.InternalRow(0.0, 0.0)
    val g = nWords - n + 1
    // Exact-text keys (single-word grams reuse the word; multi-word grams
    // join with the same " " separator the HOF/oracle form uses).
    val counts = new java.util.HashMap[String, Int](g * 2)
    var i = 0
    while (i < g) {
      val key =
        if (n == 1) String.valueOf(words.getUTF8String(i))
        else {
          val sb = new java.lang.StringBuilder()
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(String.valueOf(words.getUTF8String(i + j)))
            j += 1
          }
          sb.toString
        }
      counts.merge(key, 1, (a, b) => a + b)
      i += 1
    }
    var top = 0
    var dupSlots = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c > 1) dupSlots += c
    }
    org.apache.spark.sql.catalyst.InternalRow(
      top.toDouble / g, dupSlots.toDouble / g)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shannon entropy (nats) of the word distribution of a token-array column
  * — the low-entropy spam/boilerplate signal of the C4/Gopher rule family
  * (keyword-stuffed and template pages collapse toward 0; organic prose
  * sits near ln(distinct words)). Empty-string tokens are ignored (the
  * `trim → split` of an empty document yields `[""]`); an empty
  * distribution scores 0.0.
  *
  * Engine-reproducibility is by CONSTRUCTION, not luck: entropy =
  * ln(n) − (Σ c·ln c)/n accumulated over distinct words in BINARY
  * (UTF-8 byte) order — `UTF8String.compareTo` here, `list(... ORDER BY
  * word)` + left-fold in an oracle — so both engines execute the same
  * IEEE additions in the same order and the rounded value can never
  * straddle a rounding boundary on summation-order drift.
  */
case class WordEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_entropy requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nTok = words.numElements()
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](nTok * 2)
    var n = 0L
    var i = 0
    while (i < nTok) {
      val w = words.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        // clone(): the array accessor may hand back a view into a shared
        // buffer; map keys must own their bytes.
        counts.merge(w.clone(), 1, (a, b) => a + b)
        n += 1
      }
      i += 1
    }
    if (n == 0L) 0.0
    else {
      val ks = new java.util.ArrayList(counts.keySet())
      java.util.Collections.sort(ks)
      var s = 0.0
      val it = ks.iterator()
      while (it.hasNext) {
        val c = counts.get(it.next()).toDouble
        s += c * math.log(c)
      }
      math.log(n.toDouble) - s / n
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Start positions whose window hash already appeared EARLIER in the same
  * array — the within-document repetition mask feeding
  * [[StripCoveredWords]]: one hash-set pass, O(starts). The HOF equivalent
  * (`filter(positions, i => array_position(hashes, hashes[i]) <= i)`) pays
  * a linear scan per element — O(len²) per row, the adversarial class
  * [[NgramRepetition]]/[[StripCoveredWords]] exist to avoid.
  */
case class FirstSeenDupStarts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"first_seen_dup_starts requires array<long>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    val seen = new java.util.HashSet[Long](n * 2)
    val dups = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < n) {
      if (!seen.add(hashes.getLong(i))) dups += i
      i += 1
    }
    new GenericArrayData(dups.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rebuild a document with every word covered by a shared window removed, as
  * ONE tight per-row pass: the covered mask comes from a difference array over
  * the start positions (+1 at each start, −1 past its window end, prefix-sum →
  * coverage), so the cost is O(words + starts) regardless of how much of the
  * doc is boilerplate. Replaces the
  * `filter(words, (w, i) => !array_contains(covered, i))` HOF whose per-word
  * linear scan of the covered array is O(words × covered) — a fully-covered
  * 100k-word document costs ~10¹⁰ comparisons in one task (the same
  * adversarial class [[NgramRepetition]] closed for the Gopher stats).
  *
  * Semantics match the HOF form exactly: window length is min(window, #words)
  * (short docs form one whole-doc window), survivors keep original form and
  * single-space joining, `n_removed` counts distinct covered positions, and a
  * null start set (no shared windows) removes nothing.
  */
case class StripCoveredWords(words: Expression, starts: Expression, window: Int)
    extends BinaryExpression with CodegenFallback {

  require(window >= 1, "window must be >= 1")

  override def left: Expression = words
  override def right: Expression = starts

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  override def nullable: Boolean = words.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (words.dataType, starts.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_covered_words requires (array<string>, array<int>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val w = words.eval(input)
    if (w == null) return null
    val wa = w.asInstanceOf[ArrayData]
    val n = wa.numElements()
    val winLen = math.min(window, n)
    // Difference array: coverage(p) > 0 iff some start s has s <= p < s+winLen.
    val diff = new Array[Int](n + 1)
    val s = starts.eval(input)
    if (s != null) {
      val sa = s.asInstanceOf[ArrayData]
      var i = 0
      while (i < sa.numElements()) {
        if (!sa.isNullAt(i)) {
          val st = sa.getInt(i)
          if (st >= 0 && st < n) {
            diff(st) += 1
            diff(math.min(st + winLen, n)) -= 1
          }
        }
        i += 1
      }
    }
    var removed = 0L
    val sb = new java.lang.StringBuilder()
    var sep = false
    var cover = 0
    var p = 0
    while (p < n) {
      cover += diff(p)
      if (cover > 0) removed += 1
      else {
        val word = wa.getUTF8String(p)
        if (word != null) { // concat_ws skips nulls without a separator
          if (sep) sb.append(' ')
          sb.append(word.toString)
          sep = true
        }
      }
      p += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), removed)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(words = newLeft, starts = newRight)
}

object MinHashExpr {
  import org.apache.spark.sql.graft.ColumnBridge
  /** Column wrapper: minhash signature (array<long>) of a word-array column. */
  def minhashSignature(words: Column, shingleLen: Int = 3, numHashes: Int = 64): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(words), shingleLen, numHashes))

  /** Column wrapper: per-shingle hashes (array<long>) of a word-array column. */
  def shingleHashes(words: Column, shingleLen: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(words), shingleLen))

  /** Column wrapper: 64-bit simhash (long) of a token-array column. */
  def simhash64(words: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(words)))

  /** Column wrapper: struct(top_frac, dup_frac) n-gram repetition stats of a
    * word-array column, one O(doc length) counting pass.
    */
  def ngramRepetition(words: Column, n: Int): Column =
    ColumnBridge.column(NgramRepetition(ColumnBridge.expression(words), n))

  /** Column wrapper: struct(clean, n_removed) — document rebuilt without the
    * words covered by shared-window starts, one O(words + starts) pass.
    */
  def stripCoveredWords(words: Column, starts: Column, window: Int): Column =
    ColumnBridge.column(StripCoveredWords(
      ColumnBridge.expression(words), ColumnBridge.expression(starts), window))

  /** Column wrapper: array<int> of start positions whose hash appeared
    * earlier in the array — one O(length) hash-set pass.
    */
  def firstSeenDupStarts(hashes: Column): Column =
    ColumnBridge.column(FirstSeenDupStarts(ColumnBridge.expression(hashes)))

  /** Column wrapper: Shannon entropy (nats) of a word-array column's token
    * distribution — one O(length log distinct) counting pass.
    */
  def wordEntropy(words: Column): Column =
    ColumnBridge.column(WordEntropy(ColumnBridge.expression(words)))
}
