package graft.core

import org.apache.spark.sql.DataFrame

/** Stage materialization with a reliability switch: `localCheckpoint` is the
  * fast local default, but its blocks die with an executor — a real cluster
  * run of an iterative/nondeterministic pipeline should set
  * `SemSettings.checkpointDir` to use reliable `checkpoint(dir)` instead
  * (HDFS/S3-backed, survives executor loss).
  */
object Persist {

  /** Materialize a stage boundary. `eager=false` defers to the first action
    * but still truncates lineage and pins the computed blocks.
    */
  def stage(df: DataFrame, eager: Boolean = true): DataFrame =
    Sem.settings.checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = eager)
      case None =>
        df.localCheckpoint(eager = eager)
    }

  /** [[stage]] + the persistent-RDD ids backing the staged frame, so the
    * caller can free the blocks with [[unstage]] once downstream no longer
    * reads them — `Dataset.unpersist` is a no-op for localCheckpoint
    * storage, and without an explicit release every iterative operator
    * pins its staged frames for the application's lifetime. The ids are
    * found by walking the staged plan's OWN RDD ancestry for persisted
    * nodes (race-free — a global before/after snapshot diff could capture
    * a concurrent thread's checkpoint, whose blocks are unrecoverable once
    * dropped: localCheckpoint truncates lineage). With a reliable
    * checkpointDir configured no ancestor is persisted and unstage is a
    * no-op (checkpoint FILES are cleaned by Spark's ContextCleaner on GC).
    */
  def stageTracked(df: DataFrame, eager: Boolean = true): (DataFrame, Set[Int]) = {
    val staged = stage(df, eager)
    (staged, persistedAncestors(staged.queryExecution.toRdd))
  }

  /** Ids of persisted RDDs in `rdd`'s dependency closure (including
    * itself). A localCheckpointed Dataset's plan is a scan over the
    * checkpoint RDD, so this finds exactly the blocks [[stage]] pinned.
    */
  private def persistedAncestors(rdd: org.apache.spark.rdd.RDD[_]): Set[Int] = {
    val seen = scala.collection.mutable.Set.empty[Int]
    val out = scala.collection.mutable.Set.empty[Int]
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      if (seen.add(r.id)) {
        if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) out += r.id
        r.dependencies.foreach(d => walk(d.rdd))
      }
    walk(rdd)
    out.toSet
  }

  /** Free blocks recorded by [[stageTracked]]. Only safe once no
    * still-to-be-materialized plan reads the staged frame: localCheckpoint
    * truncates lineage, so dropped blocks cannot be recomputed.
    */
  def unstage(spark: org.apache.spark.sql.SparkSession, ids: Set[Int]): Unit = {
    LogLevels.quietLocalCheckpointUnpersist
    val sc = spark.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}
