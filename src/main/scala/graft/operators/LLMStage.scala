package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructType}
import graft.llm.{LMClient, LMRequest}

/** The physical core of every semantic operator: a `mapPartitions` stage that
  * batches rows into LLM requests (reference physical model: batched API
  * calls, lotus/models/lm.py:261-302) and appends the raw answer as a string
  * column. Everything downstream (CoT split, boolean parse, JSON expansion)
  * is native Catalyst expressions so it stays inside whole-stage codegen.
  *
  * Scale notes: batching is per-partition (parallelism = tasks × in-batch
  * concurrency); no driver collect; determinism relies on temperature-0
  * defaults so Spark task retries reproduce answers.
  */
object LLMStage {

  /** LLM-call parallelism = tasks × in-batch concurrency, so a small-file
    * input (one partition) would serialize every call. Spread low-partition
    * inputs to cluster parallelism; well-partitioned inputs pass through.
    */
  private def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Append `outCol` = LM answer for each row. `mkReq` is resolved against
    * the input schema on the driver and shipped in the task closure.
    */
  def appendAnswer(
      dfIn: DataFrame,
      lm: LMClient,
      outCol: String,
      mkReq: Row => LMRequest
  ): DataFrame = {
    val df = parallelize(dfIn)
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol, StringType, nullable = true))
    val batch = lm.maxBatchSize
    val stats = graft.llm.UsageTracker.forSession(df.sparkSession)
    df.mapPartitions { iter =>
      iter.grouped(batch).flatMap { rows =>
        val reqs = rows.map(mkReq)
        val results = lm.complete(reqs)
        stats.record(reqs, results)
        rows.lazyZip(results).map { (r, res) => Row.fromSeq(r.toSeq :+ res.output) }
      }
    }(Encoders.row(outSchema))
  }

  /** Like [[appendAnswer]] but also appends the positive-token probability
    * (logprob-derived) column — the helper-model pass of cascades.
    */
  def appendAnswerWithProb(
      dfIn: DataFrame,
      lm: LMClient,
      outCol: String,
      probCol: String,
      mkReq: Row => LMRequest
  ): DataFrame = {
    val df = parallelize(dfIn)
    val outSchema = StructType(df.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(outCol, StringType, nullable = true),
      org.apache.spark.sql.types.StructField(probCol,
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val batch = lm.maxBatchSize
    df.mapPartitions { iter =>
      iter.grouped(batch).flatMap { rows =>
        val results = lm.complete(rows.map(mkReq))
        rows.lazyZip(results).map { (r, res) =>
          Row.fromSeq(r.toSeq ++ Seq(res.output, res.positiveProb.orNull))
        }
      }
    }(Encoders.row(outSchema))
  }
}
