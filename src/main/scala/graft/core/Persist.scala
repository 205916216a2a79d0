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

  /** [[stage]] + the persistent-RDD ids the checkpoint created, so the
    * caller can free the blocks with [[unstage]] once downstream no longer
    * reads them — `Dataset.unpersist` is a no-op for localCheckpoint
    * storage, and without an explicit release every iterative operator
    * pins its staged frames for the application's lifetime. A concurrent
    * persist landing inside the snapshot window could at worst be
    * unpersisted early, which recomputes but stays correct. (With a
    * reliable checkpointDir configured no persistent RDDs appear and
    * unstage is a no-op; checkpoint FILES are cleaned by Spark's
    * ContextCleaner on GC.)
    */
  def stageTracked(df: DataFrame, eager: Boolean = true): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val staged = stage(df, eager)
    (staged, sc.getPersistentRDDs.keySet.diff(before).toSet)
  }

  /** Free blocks recorded by [[stageTracked]]. Only safe once no
    * still-to-be-materialized plan reads the staged frame: localCheckpoint
    * truncates lineage, so dropped blocks cannot be recomputed.
    */
  def unstage(spark: org.apache.spark.sql.SparkSession, ids: Set[Int]): Unit = {
    val sc = spark.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}
