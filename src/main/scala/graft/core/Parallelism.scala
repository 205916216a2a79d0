package graft.core

import org.apache.spark.sql.DataFrame

object Parallelism {

  /** Spread a low-partition input (small/few files) to cluster parallelism
    * before CPU-heavy per-row stages; large inputs pass through untouched.
    * Decided from logical-plan size stats, not `df.rdd.getNumPartitions` —
    * instantiating the RDD lineage would physically plan the query a
    * second time outside AQE. A scan gets ~sizeInBytes/maxPartitionBytes
    * partitions, so below one maxPartitionBytes per core the input cannot
    * fill the cluster and is worth an (O(small) bytes) spread shuffle.
    * (Promoted from Dedup's private helper once the ×30 load test showed
    * the same single-partition starvation on the ad-hoc BM25 scorer: a
    * compactly-written 60 MB corpus ran its two scoring scans on ONE core.)
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size < BigInt(maxPartitionBytes) * target) df.repartition(target) else df
  }
}
