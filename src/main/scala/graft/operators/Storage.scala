package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared storage protocol for iterative operators (connected
  * components, PageRank, k-means, BPE, triangle counting): rounds are
  * `localCheckpoint(true)`-materialized and the superseded round's
  * blocks released as soon as the next one exists, so executor
  * storage stays flat in the iteration count. */
private[graft] object Storage {

  /** Release the RDD blocks behind a localCheckpoint'ed frame.
    * Non-blocking: the caller is already holding the successor. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
