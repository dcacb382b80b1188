package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared foreachBatch I/O plumbing — the two blocks every incremental
  * sink needs and that are easy to get subtly wrong (see
  * [[withDynamicPartitionOverwrite]]'s session note). */
private[streaming] object BatchIO {

  /** True iff `dir` exists and holds at least one non-metadata entry —
    * Hadoop FileSystem API (S3/HDFS-correct, not java.io.File). */
  def nonEmptyDir(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists(!_.getPath.getName.startsWith("_"))
  }

  /** Run `body` with `partitionOverwriteMode=dynamic` on `session`,
    * restoring the previous value after. CRITICAL: `session` must be the
    * session the write will actually read its conf from — the session of
    * the DataFrame being written. Inside foreachBatch that is usually
    * the micro-batch's per-query CLONE, where the outer session's conf
    * is invisible; setting the outer conf silently leaves the overwrite
    * STATIC and truncates every other partition of the target. */
  def withDynamicPartitionOverwrite[T](session: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = session.conf.getOption(key)
    session.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => session.conf.set(key, v)
      case None => session.conf.unset(key)
    }
  }
}
