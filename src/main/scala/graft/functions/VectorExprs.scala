package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays as a native Catalyst expression with
  * whole-stage codegen. The built-in composition
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an intermediate
  * array per row and runs the lambda interpreter — on an N²-pair similarity
  * scan that allocation dominates. This expression is a tight primitive loop
  * over the ArrayData buffers (the preference order the engine follows:
  * native Expression > higher-order functions > UDF).
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot requires numeric arrays, got ${left.dataType} and ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def accessorName(t: DataType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (tx, ty) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    def get(ad: ArrayData, t: DataType, j: Int): Double = t match {
      case FloatType => ad.getFloat(j).toDouble
      case DoubleType => ad.getDouble(j)
      case IntegerType => ad.getInt(j).toDouble
      case LongType => ad.getLong(j).toDouble
      case _ => 0.0
    }
    while (i < n) { acc += get(x, tx, i) * get(y, ty, i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accA = accessorName(elemType(left))
    val accB = accessorName(elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.$accA($i) * (double)$b.$accB($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    nullSafeEval(a, b)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index of the nearest centroid (squared Euclidean, ties → lowest index)
  * for a float-array column — the IVF cell-assignment kernel. The centroid
  * table is tiny (nCells × dim) and rides in the expression itself; the
  * per-row work is one tight O(k·d) primitive loop, no vector-type
  * conversion column, no MLlib transform job.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires array<float>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      // Fail loudly on a dimension mismatch: assigning over a truncated
      // prefix would silently place rows in wrong cells at build time while
      // search-time rankCells throws on the same mismatch.
      if (d != cent.length) throw new IllegalArgumentException(
        s"nearest_centroid dimension mismatch: vector dim $d vs centroid dim ${cent.length}")
      var dist = 0.0
      var i = 0
      while (i < d) {
        val diff = v.getFloat(i).toDouble - cent(i)
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared L2 distance to the nearest centroid — [[NearestCentroid]]'s
  * loop returning `bestDist` instead of the argmin index. Feeds the
  * sampled mean-assignment-distance drift statistic.
  */
case class NearestCentroidDist(child: Expression, centroids: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_dist requires array<float>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (d != cent.length) throw new IllegalArgumentException(
        s"nearest_centroid_dist dimension mismatch: vector dim $d vs " +
          s"centroid dim ${cent.length}")
      var dist = 0.0
      var i = 0
      while (i < d) {
        val diff = v.getFloat(i).toDouble - cent(i)
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) bestDist = dist
      c += 1
    }
    bestDist
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`nProbe` IVF cells by cosine similarity to the row's vector (ties →
  * lowest cell id) — the batch-retrieval probe kernel. One expression per
  * QUERY row lets a whole query table compute its probe sets inside the
  * scan (no driver loop over queries), which is what turns Q searches into
  * ONE distributed join. Same centroid-in-closure shape as
  * [[NearestCentroid]]; per-row work is O(nCells·dim + nCells log nCells).
  */
case class ProbeCells(child: Expression, centroids: Array[Array[Float]],
    nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"probe_cells requires array<float>, got $other")
    }

  // Centroid norms are row-invariant — computed once per expression
  // instance, not once per (row × centroid).
  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map { cent =>
      var s = 0.0; var i = 0
      while (i < cent.length) { s += cent(i).toDouble * cent(i); i += 1 }
      math.sqrt(s)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    // The query norm is centroid-invariant — one pass per row, hoisted out
    // of the centroid loop (halves the kernel's flops on the batch path).
    var nv = 0.0
    var i = 0
    while (i < d) {
      val x = v.getFloat(i).toDouble
      nv += x * x
      i += 1
    }
    val qNorm = math.sqrt(nv)
    val scored = new Array[(Double, Int)](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (d != cent.length) throw new IllegalArgumentException(
        s"probe_cells dimension mismatch: vector dim $d vs centroid dim ${cent.length}")
      var dot = 0.0
      i = 0
      while (i < d) { dot += v.getFloat(i).toDouble * cent(i); i += 1 }
      val denom = qNorm * centroidNorms(c)
      scored(c) = (if (denom == 0.0) 0.0 else dot / denom, c)
      c += 1
    }
    val top = scored.sortBy { case (s, j) => (-s, j) }
      .take(math.min(nProbe, centroids.length)).map(_._2)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(top)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard |A∩B| / |A∪B| of two long-array SETS — the minhash
  * verification kernel as one merge pass. The built-in composition
  * `size(array_intersect)/size(array_union)` builds a boxed hash set and
  * materializes two result arrays PER PAIR; on a verify join over millions
  * of candidate pairs that allocation dominates. Here each side is copied
  * once into a primitive long[] (sorted on the fly iff the producer did
  * not pre-sort — legacy saved dedup indexes predate the sorted layout)
  * and intersected by merge with duplicate-run skipping, so inputs need
  * not be distinct for CORRECTNESS (set semantics), only for speed. Empty
  * ∪ empty → 1.0, matching [[graft.operators.Dedup.jaccard]].
  */
object LongSetOps {
  def isSorted(xs: Array[Long]): Boolean = {
    var i = 1
    while (i < xs.length) { if (xs(i - 1) > xs(i)) return false; i += 1 }
    true
  }

  /** Copy out the non-null elements and whether any NULL element was
    * present. `ArrayData.toLongArray` on a null-bearing array either NPEs
    * (GenericArrayData) or silently reads 0 (UnsafeArrayData) — since
    * `long_set_jaccard` is a user-facing SQL function the same query must
    * not behave differently per physical representation. NULL is treated
    * as one distinct set element per side, exactly matching the
    * `size(array_intersect)/size(array_union)` composition this kernel
    * replaces.
    */
  private def extract(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : (Array[Long], Boolean) = {
    val n = a.numElements()
    var hasNull = false
    var nn = 0
    var i = 0
    while (i < n) { if (a.isNullAt(i)) hasNull = true else nn += 1; i += 1 }
    if (!hasNull) return (a.toLongArray(), false)
    val out = new Array[Long](nn)
    var j = 0
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { out(j) = a.getLong(i); j += 1 }
      i += 1
    }
    (out, true)
  }

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val (xs, aNull) = extract(a)
    val (ys, bNull) = extract(b)
    if (!isSorted(xs)) java.util.Arrays.sort(xs)
    if (!isSorted(ys)) java.util.Arrays.sort(ys)
    val n = xs.length
    val m = ys.length
    var i = 0; var j = 0
    var inter = 0L; var da = 0L; var db = 0L
    while (i < n && j < m) {
      val x = xs(i); val y = ys(j)
      if (x == y) {
        inter += 1; da += 1; db += 1
        while (i < n && xs(i) == x) i += 1
        while (j < m && ys(j) == y) j += 1
      } else if (x < y) {
        da += 1; while (i < n && xs(i) == x) i += 1
      } else {
        db += 1; while (j < m && ys(j) == y) j += 1
      }
    }
    while (i < n) { val x = xs(i); da += 1; while (i < n && xs(i) == x) i += 1 }
    while (j < m) { val y = ys(j); db += 1; while (j < m && ys(j) == y) j += 1 }
    // NULL contributes one distinct element per side (array_intersect /
    // array_union semantics: null ∈ both → in the intersection once).
    if (aNull && bNull) inter += 1
    if (aNull) da += 1
    if (bNull) db += 1
    val uni = da + db - inter
    if (uni == 0L) 1.0 else inter.toDouble / uni
  }

  /** Distinct-element intersection COUNT of two long-array sets — the same
    * merge pass as [[compute]] without the union bookkeeping. Backs the
    * asymmetric containment verify (|A∩B| / |A|), where Jaccard alone
    * cannot recover the numerator without also trusting both set sizes.
    * NULL elements follow the same rule: one distinct element per side,
    * in the intersection iff present on both.
    */
  def computeOverlap(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val (xs, aNull) = extract(a)
    val (ys, bNull) = extract(b)
    if (!isSorted(xs)) java.util.Arrays.sort(xs)
    if (!isSorted(ys)) java.util.Arrays.sort(ys)
    val n = xs.length
    val m = ys.length
    var i = 0; var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val x = xs(i); val y = ys(j)
      if (x == y) {
        inter += 1
        while (i < n && xs(i) == x) i += 1
        while (j < m && ys(j) == y) j += 1
      } else if (x < y) {
        while (i < n && xs(i) == x) i += 1
      } else {
        while (j < m && ys(j) == y) j += 1
      }
    }
    if (aNull && bNull) inter += 1
    inter
  }
}

/** Intersection size |A∩B| of two long-array sets (merge pass, codegen'd).
  * Numerator of the containment score C(A→B) = |A∩B| / |A|.
  */
case class LongSetOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_set_overlap requires two array<bigint>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(LongSetOps.computeOverlap(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LongSetOps.computeOverlap($a, $b);")

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    nullSafeEval(a, b)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class LongSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_set_jaccard requires two array<bigint>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(LongSetOps.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LongSetOps.compute($a, $b);")

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    nullSafeEval(a, b)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.graft.ColumnBridge
  /** Column wrapper: dot product of two numeric array columns (codegen'd). */
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: merge-based Jaccard of two long-array set columns. */
  def longSetJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(LongSetJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: distinct intersection count of two long-array sets. */
  def longSetOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(LongSetOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: nearest-centroid index of a float-array column. */
  def nearestCentroid(v: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), centroids))

  /** Column wrapper: squared distance to the NEAREST centroid — the
    * assignment-quality signal behind the quantizer-staleness report
    * ([[graft.embed.IvfIndex.describe]]): appended data that drifted off
    * the trained centroids sits measurably farther from its assigned
    * cell than the fit-time corpus did.
    */
  def nearestCentroidDist(v: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCentroidDist(ColumnBridge.expression(v), centroids))

  def probeCells(v: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    ColumnBridge.column(ProbeCells(ColumnBridge.expression(v), centroids, nProbe))
}
