package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.EmbedOps

/** Scalar (int8) quantization of embedding columns — the storage/IO tier of
  * the ANN stack (the "SQ8" codec from the FAISS line of work, re-expressed
  * as native Spark columns).
  *
  * Per-vector symmetric quantization: `scale = max|v| / 127`, `code_i =
  * round(v_i / scale)` ∈ [-127, 127]. A 100 TB float32 corpus becomes
  * ~25 TB of codes + one double per vector; reconstruction error is bounded
  * by scale/2 per component. Scoring dequantizes inside the scan
  * (`code_i · scale`) — one multiply per element fused into the cosine
  * kernel's input, still whole-stage codegen, no extra pass or shuffle.
  *
  * Everything here is double-math on top of exact int codes, so quantized
  * scores are reproducible bit-for-bit across engines — the oracle gate
  * (`ann_sq8_search`) hash-verifies the full quantized lifecycle against
  * DuckDB list-lambda SQL.
  */
object Quantize {

  def codesCol(c: String): String = s"__sq8_$c"
  def scaleCol(c: String): String = s"__sq8_scale_$c"

  /** Per-vector quantization scale: max-abs / 127, floored away from zero so
    * an all-zero vector quantizes to all-zero codes instead of dividing by 0.
    */
  def sq8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))) / 127.0, lit(1e-30))

  /** Int8 codes for a float-array column given its scale. */
  def sq8Codes(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") / scale).cast("tinyint"))

  /** Reconstructed double vector from codes + scale. */
  def sq8Dequant(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Replace `c`'s vector column with SQ8 codes + scale columns (embedding
    * first if the vector column is not yet attached).
    */
  def quantize(df: DataFrame, c: String): DataFrame = {
    val indexed = EmbedOps.semIndex(df, c)
    val v = col(EmbedOps.vecCol(c))
    indexed
      .withColumn(scaleCol(c), sq8Scale(v))
      .withColumn(codesCol(c), sq8Codes(v, col(scaleCol(c))))
      .drop(EmbedOps.vecCol(c))
  }

  /** Cosine of the dequantized vectors against a query vector — the scoring
    * expression for quantized scans (codegen'd dot product on the
    * reconstructed arrays).
    */
  def sq8CosineToQuery(codes: Column, scale: Column, qv: Seq[Float]): Column =
    EmbedOps.cosineSim(sq8Dequant(codes, scale), lit(qv.map(_.toDouble).toArray))

  /** Exact top-k over a quantized frame (brute-force counterpart of
    * [[graft.operators.EmbedOps.semSearchVec]] on codes).
    */
  def searchQuantized(df: DataFrame, c: String, qv: Seq[Float], k: Int,
      scoreCol: String = "vec_scores", tieBreak: Seq[Column] = Nil): DataFrame =
    df.withColumn(scoreCol, sq8CosineToQuery(col(codesCol(c)), col(scaleCol(c)), qv))
      .orderBy(col(scoreCol).desc +: tieBreak: _*)
      .limit(k)
      .drop(codesCol(c), scaleCol(c))
}
