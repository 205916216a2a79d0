package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist matching — the C4/RefinedWeb "bad words"
  * content filter (C4 drops any page containing a blocklist term; real
  * lists run to tens of thousands of entries). Per-pattern `contains`
  * scans are O(text · patterns); this kernel runs ONE Aho–Corasick pass
  * (Aho & Corasick 1975, CACM 18(6)) over the text regardless of list
  * size — the property that keeps a 10k-term filter a narrow map over
  * 100 TB. The automaton is built once per plan from the pattern literal
  * and shared by every row.
  *
  * Semantics: DISTINCT patterns present as substrings (case-insensitive
  * via lowercasing both sides), returned in pattern-list order — exactly
  * `filter(patterns, p -> contains(lower(text), p))`, which is the shape
  * a SQL oracle replays. Match positions/counts are deliberately not
  * exposed: the filter decision needs membership, and occurrence counts
  * differ between overlapping-match conventions.
  */
object BlocklistExpr {

  /** Aho–Corasick automaton over lowercased patterns. Flat-array nodes,
    * HashMap transitions (pattern alphabets are unbounded unicode);
    * breadth-first failure links; output sets propagated through the
    * fail chain at build time so matching never walks it.
    */
  private[graft] final class Automaton(patterns: Seq[String]) {
    require(patterns.nonEmpty, "blocklist: need >= 1 pattern")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "blocklist: null/empty pattern")
    private val lowered = patterns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(lowered.distinct.size == lowered.size,
      s"blocklist: duplicate patterns after lowercasing — " +
        lowered.diff(lowered.distinct).distinct.mkString(", "))

    private val next =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    private val fail = scala.collection.mutable.ArrayBuffer(0)

    lowered.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        val t = next(s).get(ch)
        s = if (t != null) t.intValue()
        else {
          next += new java.util.HashMap[Character, Integer]()
          out += Nil
          fail += 0
          next(s).put(ch, next.size - 1)
          next.size - 1
        }
      }
      out(s) = pi :: out(s)
    }
    locally {
      val q = scala.collection.mutable.Queue[Int]()
      next(0).forEach((_, v) => q.enqueue(v.intValue()))
      while (q.nonEmpty) {
        val u = q.dequeue()
        next(u).forEach { (ch, v) =>
          var f = fail(u)
          while (f != 0 && !next(f).containsKey(ch)) f = fail(f)
          val t = next(f).get(ch)
          fail(v) = if (t != null && t.intValue() != v.intValue())
            t.intValue() else 0
          out(v) = out(v) ++ out(fail(v))
          q.enqueue(v.intValue())
        }
      }
    }
    private val nextA = next.toArray
    private val outA = out.map(_.distinct.sorted.toArray).toArray
    private val failA = fail.toArray

    /** Indices (into the ORIGINAL pattern list) of distinct patterns
      * present in `text` (already lowercased), ascending.
      */
    def matches(text: String): Array[Int] = {
      val found = new java.util.TreeSet[Integer]()
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val ch = text.charAt(i)
        while (s != 0 && !nextA(s).containsKey(ch)) s = failA(s)
        val t = nextA(s).get(ch)
        s = if (t != null) t.intValue() else 0
        val os = outA(s)
        var j = 0
        while (j < os.length) { found.add(os(j)); j += 1 }
        i += 1
      }
      val r = new Array[Int](found.size)
      val it = found.iterator()
      var k = 0
      while (it.hasNext) { r(k) = it.next().intValue(); k += 1 }
      r
    }
  }

  /** `array<string>` of the DISTINCT blocklist patterns present in the
    * text (case-insensitive), in pattern-list order — one automaton pass
    * per row.
    */
  case class BlocklistMatches(child: Expression, patterns: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes() = child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"blocklist_matches requires string, got $other")
    }
    @transient private lazy val auto = new Automaton(patterns)
    @transient private lazy val patU8 =
      patterns.map(UTF8String.fromString).toArray
    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
      val idx = auto.matches(s)
      val r = new Array[Any](idx.length)
      var i = 0
      while (i < idx.length) { r(i) = patU8(idx(i)); i += 1 }
      new GenericArrayData(r)
    }
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  def blocklistMatches(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(BlocklistMatches(ColumnBridge.expression(c), patterns))
}
