package graft.embed

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ColBERT-style late interaction (reference ColBERTv2RM,
  * lotus/models/colbertv2_rm.py:17-156; MaxSim from the published ColBERT
  * papers): documents are embedded per TOKEN, and relevance is
  *   score(q, d) = Σ_{query token t} max_{doc token u} cos(t, u)
  * — finer-grained than single-vector cosine because each query token finds
  * its own best-matching doc token.
  *
  * Spark shape: the token-embedding matrix rides in the DataFrame as an
  * `array<array<float>>` column (like the single-vector index column), and
  * scoring is one tight per-row loop against the broadcast query matrix —
  * fully distributed, top-k via TakeOrderedAndProject.
  */
object LateInteraction {

  def mvecCol(c: String): String = s"__mvec_$c"

  /** Token-embedding matrix per row, batched per partition; `maxTokens`
    * bounds the per-doc matrix (ColBERT's doc_maxlen).
    */
  def indexTokens(df: DataFrame, c: String, embedder: Embedder = null,
      maxTokens: Int = 128): DataFrame = {
    val emb = Option(embedder).getOrElse(graft.core.Sem.settings.embedder)
    val out = mvecCol(c)
    if (df.columns.contains(out)) return df
    val idx = df.schema.fieldIndex(c)
    val schema = StructType(df.schema.fields :+
      StructField(out, ArrayType(ArrayType(FloatType, containsNull = false), containsNull = false)))
    df.mapPartitions { iter =>
      iter.map { r =>
        val toks = tokens(Option(r.get(idx)).map(_.toString).getOrElse(""), maxTokens)
        val vecs = emb.embed(toks).map(_.toIndexedSeq)
        Row.fromSeq(r.toSeq :+ vecs.toIndexedSeq)
      }
    }(Encoders.row(schema))
  }

  private def tokens(text: String, maxTokens: Int): Seq[String] = {
    val t = text.toLowerCase.split("[^\\p{L}\\p{N}_]+").filter(_.nonEmpty).take(maxTokens)
    if (t.isEmpty) Seq("") else t.toIndexedSeq
  }

  /** MaxSim over float matrices (query matrix broadcast in the closure). */
  private[embed] def maxSim(qm: Array[Array[Float]],
      dm: scala.collection.Seq[scala.collection.Seq[Float]]): Double = {
    if (dm.isEmpty) return 0.0
    val docs = dm.map(_.toArray).toArray
    val docNorms = docs.map { d =>
      var n = 0.0; var i = 0
      while (i < d.length) { n += d(i) * d(i); i += 1 }
      math.sqrt(n)
    }
    var total = 0.0
    var qi = 0
    while (qi < qm.length) {
      val q = qm(qi)
      var qn = 0.0
      var i = 0
      while (i < q.length) { qn += q(i) * q(i); i += 1 }
      val qNorm = math.sqrt(qn)
      var best = 0.0
      var di = 0
      while (di < docs.length) {
        val d = docs(di)
        var dot = 0.0
        var j = 0
        val len = math.min(q.length, d.length)
        while (j < len) { dot += q(j) * d(j); j += 1 }
        val denom = qNorm * docNorms(di)
        val sim = if (denom == 0) 0.0 else dot / denom
        if (sim > best) best = sim
        di += 1
      }
      total += best
      qi += 1
    }
    total
  }

  /** Late-interaction top-k search: per-token query embedding, distributed
    * MaxSim scoring, global top-k (reference ColBERTv2RM.__call__).
    */
  def search(df: DataFrame, c: String, query: String, k: Int,
      scoreCol: String = "li_scores", embedder: Embedder = null,
      maxTokens: Int = 128): DataFrame = {
    val emb = Option(embedder).getOrElse(graft.core.Sem.settings.embedder)
    val qm = emb.embed(tokens(query, maxTokens)).toArray
    searchVec(indexTokens(df, c, emb, maxTokens), c, qm, k, scoreCol)
  }

  /** [[search]] against a precomputed query-token matrix (the operator core
    * — also the entry point when the frame already carries a stored
    * token-embedding matrix column, mirroring [[graft.operators.EmbedOps
    * .semSearchVec]]). `tieBreak` makes the top-k deterministic under score
    * ties.
    */
  def searchVec(df: DataFrame, c: String, qm: Array[Array[Float]], k: Int,
      scoreCol: String = "li_scores",
      tieBreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val indexed = indexTokens(df, c)
    val mIdx = indexed.schema.fieldIndex(mvecCol(c))
    val schema = StructType(indexed.schema.fields :+ StructField(scoreCol, DoubleType))
    indexed.mapPartitions { iter =>
      iter.map { r =>
        val dm = r.getSeq[scala.collection.Seq[Float]](mIdx)
        Row.fromSeq(r.toSeq :+ maxSim(qm, dm))
      }
    }(Encoders.row(schema))
      .orderBy(col(scoreCol).desc +: tieBreak: _*)
      .limit(k)
      .drop(mvecCol(c))
  }
}
