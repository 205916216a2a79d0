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
}
