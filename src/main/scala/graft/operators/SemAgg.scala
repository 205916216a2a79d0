package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{NLExpr, Sem}
import graft.llm.{LMRequest, Prompts}

/** Hierarchical LLM aggregation (reference lotus/sem_ops/sem_agg.py:62-235):
  * pack documents into context-budgeted prompts, summarize each pack, repeat
  * on the partial summaries until one row (per group) remains.
  *
  * Spark shape: a driver round loop; each round is ONE distributed job —
  * token-budget packing via a window cumulative sum, `collect_list` per pack
  * (bounded by the LM context window, so each list is small by construction),
  * then a batched `mapPartitions` LLM stage. Rounds shrink the data by the
  * pack fan-in (≥2), so the loop is O(log n) jobs and never collects docs to
  * the driver — this is the 100 TB-safe layout.
  */
object SemAgg {

  def semAgg(
      df: DataFrame,
      instr: String,
      allCols: Boolean = false,
      groupBy: Seq[String] = Nil,
      suffix: String = "_output",
      orderBy: Seq[Column] = Nil
  ): DataFrame = {
    val s = Sem.settings
    val nle = NLExpr.parse(instr)
    val docCols =
      if (allCols) df.columns.filterNot(groupBy.contains).toIndexedSeq
      else { nle.validate(df.columns.toIndexedSeq); nle.cols }
    val instruction = nle.instruction
    val lm = s.lm

    // Serialized doc per row, built natively (codegen) for the DEFAULT format.
    val docExpr = concat(docCols.map { c =>
      concat(lit(s"[${graft.core.NLExpr.cap(c)}]: «"),
        coalesce(col(c).cast(StringType), lit("None")), lit("»\n"))
    }: _*)

    val ord = if (orderBy.nonEmpty) orderBy else Seq(monotonically_increasing_id())
    val groupCols = groupBy.map(col)
    val w = if (groupBy.isEmpty) Window.orderBy(ord: _*)
            else Window.partitionBy(groupCols: _*).orderBy(ord: _*)

    var cur = df
      .withColumn("__doc", docExpr)
      .withColumn("__ord", row_number().over(w).cast(LongType))
      .select(groupBy.map(col) :+ col("__ord") :+ col("__doc"): _*)

    // Chars-per-pack budget ≈ 4 chars/token on the usable context.
    val budget = math.max(2000L, (lm.maxCtxLen.toLong - lm.maxTokens.toLong) * 4 / 2)

    val outSchema = StructType(
      groupBy.map(g => df.schema(g)) ++
        Seq(StructField("__ord", LongType), StructField("__doc", StringType)))

    var isLeaf = true
    var done = false
    while (!done) {
      val gw = if (groupBy.isEmpty) Window.orderBy(col("__ord"))
               else Window.partitionBy(groupCols: _*).orderBy(col("__ord"))
      // Token-budget packing, with guaranteed fan-in ≥ 2: when documents are
      // large relative to the budget (partial summaries can approach it),
      // size-based packing alone would put one doc per pack and the fold
      // would stop shrinking — the pairwise bound keeps rounds O(log n).
      // (A real LM shrinks summaries each level; the bound also covers
      // summarizers that don't compress.)
      val packed = cur
        .withColumn("__t", length(col("__doc")).cast(LongType) + 64L)
        .withColumn("__cum", sum(col("__t")).over(gw))
        .withColumn("__rn", row_number().over(gw))
        .withColumn("__pack", least(
          floor((col("__cum") - 1) / budget),
          floor((col("__rn") - 1) / 2)))
        .groupBy(groupCols :+ col("__pack"): _*)
        .agg(sort_array(collect_list(struct(col("__ord"), col("__doc")))).as("__docs"))

      val leaf = isLeaf
      val nGroup = groupBy.length
      val batchSize = lm.maxBatchSize
      val next = packed.mapPartitions { iter =>
        iter.grouped(batchSize).flatMap { rows =>
          val reqs = rows.map { r =>
            val docs = r.getSeq[Row](nGroup + 1).map(_.getString(1))
            LMRequest(Prompts.aggFormatter(docs, instruction, leaf))
          }
          val res = lm.complete(reqs)
          rows.lazyZip(res).map { (r, out) =>
            val ordMin = r.getSeq[Row](nGroup + 1).head.getLong(0)
            Row.fromSeq((0 until nGroup).map(r.get) ++ Seq(ordMin,
              s"[Source]: «${out.output}»\n"))
          }
        }
      }(Encoders.row(outSchema))

      // Eager checkpoint: materializes the round's LLM calls exactly once
      // AND truncates lineage so O(log n) rounds don't stack plans.
      val nextCp = next.localCheckpoint()
      // Converged when every group is a single pack.
      val anyMultiPack =
        if (groupBy.isEmpty) nextCp.limit(2).count() > 1
        else nextCp.groupBy(groupCols: _*).count().filter(col("count") > 1).limit(1).count() > 0
      cur = nextCp
      if (!anyMultiPack) done = true else isLeaf = false
    }

    // Unwrap the [Source]: «…» envelope of the final summary.
    val unwrap = regexp_extract(col("__doc"), "(?s)\\[Source\\]: «(.*)»\\n", 1)
    cur.select(groupBy.map(col) :+ unwrap.as(suffix): _*)
  }
}
