package graft.core

import org.apache.logging.log4j.{Level, LogManager}

/** Targeted demotion of known-noisy loggers, applied ONCE and only when the
  * user has not configured the logger explicitly — a library must not
  * permanently override user log4j configuration as a hidden side effect of
  * calling an API (and must not re-apply the override on every call).
  */
object LogLevels {

  /** Demote `name` to `level` unless the active log4j2 configuration
    * already has an explicit LoggerConfig for it (then the user's choice
    * wins). Non-log4j2-core backends are left untouched.
    */
  private def demoteIfUnconfigured(name: String, level: Level): Unit =
    LogManager.getContext(false) match {
      case ctx: org.apache.logging.log4j.core.LoggerContext =>
        // getLoggerConfig returns the nearest ANCESTOR config when the
        // logger itself is unconfigured — name mismatch means "inherited",
        // which is the only case we may override.
        if (ctx.getConfiguration.getLoggerConfig(name).getName != name)
          org.apache.logging.log4j.core.config.Configurator.setLevel(name, level)
      case _ => ()
    }

  /** FileStreamSink probes every literal load-path glob for a streaming
    * metadata dir and logs a spurious FileNotFoundException stack trace per
    * query — keeping the glob in the load path is correct (see
    * DirectoryReaderLite.toDf), so the probe noise is demoted instead.
    */
  lazy val quietFileStreamSinkProbe: Unit = demoteIfUnconfigured(
    "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink", Level.ERROR)

  /** The deliberate block release in [[Persist.unstage]] triggers a benign
    * "locally checkpointed … cannot be recomputed after unpersisting" WARN
    * per freed RDD (freeing truncated-lineage blocks is the entire point —
    * nothing downstream reads them again). Demoted so REAL warnings stay
    * visible instead of scrolling past dozens of these per run.
    */
  lazy val quietLocalCheckpointUnpersist: Unit = demoteIfUnconfigured(
    "org.apache.spark.rdd.MapPartitionsRDD", Level.ERROR)
}
