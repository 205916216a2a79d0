package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.operators.CorpusPrep

/** Morton-key clustering: bit-level correctness of the interleave, the
  * locality property that makes it a layout (consecutive key runs are small
  * hyper-rectangles), and the writeCorpus integration — per-file min/max
  * ranges tight on BOTH z-ordered dimensions, which is exactly what parquet
  * row-group pruning consumes at 100 TB.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places bit b of column i at position b*n+i") {
    // x=0b101, y=0b011, bits=3 → z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
    val df = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 3).as("z"))
    assert(df.head().getLong(0) == 27L)
    // Single column degenerates to identity.
    val one = Seq(Tuple1(11L)).toDF("x")
      .select(ZOrder.interleave(Seq(col("x")), 4).as("z"))
    assert(one.head().getLong(0) == 11L)
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("x"), col("y")), 32) // 64 bits > signed range
    }
  }

  test("quantize clamps, maps nulls/degenerate ranges to 0, hits both ends") {
    val df = Seq(Some(0.0), Some(50.0), Some(100.0), Some(-5.0), Some(200.0), None)
      .toDF("v")
      .select(ZOrder.quantize(col("v"), 0.0, 100.0, 8).as("q"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 127L, 255L, 0L, 255L, 0L))
    val deg = Seq(Tuple1(7.0)).toDF("v")
      .select(ZOrder.quantize(col("v"), 3.0, 3.0, 8).as("q"))
    assert(deg.head().getLong(0) == 0L)
  }

  test("consecutive z-runs are square tiles, not full-range stripes") {
    // A full 64×64 grid, 8 quantization bits is exact (values are already
    // 0..63 after scaling). 4096 rows in z order, chunked by 256: each
    // chunk is EXACTLY one 16×16 tile — both extents 15. The same chunks
    // x-sorted give stripes: x-extent ~3, y-extent 63 (no pruning on y).
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = ZOrder.withZValue(grid, Seq("x", "y"), bits = 6, outCol = "z")
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    val zChunks = z.grouped(256).toSeq
    zChunks.foreach { c =>
      val (xs, ys) = (c.map(_._1), c.map(_._2))
      assert(xs.max - xs.min == 15 && ys.max - ys.min == 15,
        s"z-chunk must be a 16x16 tile, got x ${xs.min}..${xs.max} y ${ys.min}..${ys.max}")
    }
    val rowMajor = z.sortBy(p => (p._1, p._2)).grouped(256).toSeq
    assert(rowMajor.forall { c => c.map(_._2).max - c.map(_._2).min == 63 },
      "x-sorted chunks span the full y range — the layout z-order replaces")
  }

  test("writeCorpus(zOrderBy) yields per-file bounds tight on BOTH dimensions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zwrite").toString
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    CorpusPrep.writeCorpus(grid, s"$tmp/z", Nil, zOrderBy = Seq("x", "y"),
      zBits = 6, maxRecordsOverride = Some(256L))
    val files = new java.io.File(s"$tmp/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size >= 8, s"expected multiple files, got ${files.size}")
    // Pruning metric: MEAN per-file extent on each dimension. A file that
    // straddles a major z-curve seam can individually span the space
    // (range-partition boundaries are sample-based, not tile-aligned), but
    // the fleet average stays near tile size — while ANY single-column
    // layout pins the other dimension's extent at the full 63 for every
    // file. Mean ≤ 40 vs 63 is the conservative, deterministic separation.
    val extents = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    val meanX = extents.map(_._1).sum.toDouble / extents.size
    val meanY = extents.map(_._2).sum.toDouble / extents.size
    assert(meanX <= 40 && meanY <= 40,
      s"mean per-file extents x=$meanX y=$meanY — z-layout should bound both " +
        s"dims on average (global 63; a 1-D sort pins one dim at 63)")
    // The z-key itself must not leak into the written schema.
    assert(spark.read.parquet(s"$tmp/z").columns.toSeq.sorted == Seq("x", "y"))
  }
}
