package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable epoch-versioned snapshot store for foreachBatch-maintained
  * relational state (the "durable variant" the session-lived
  * [[StreamingOps.TriangleState]] scaladoc promises): each committed
  * generation is a set of named parquet relations under
  * `dir/gen=<epoch>/<name>` plus a `_COMMITTED` marker written LAST,
  * so a crash mid-write leaves a torn generation that restart simply
  * ignores. Combined with Spark's streaming checkpoint this yields
  * exactly-once maintenance: a replayed epoch (its batch re-delivered
  * because the stream's commit log lost the race) finds its
  * generation already committed and must NOT be re-applied —
  * [[latestCommitted]] tells the caller where to resume and which
  * epochs to skip.
  *
  * 100 TB shape: generations are plain partitioned parquet writes of
  * the state relations (executor-parallel, no driver data path); the
  * driver touches only generation DIRECTORY listings and the marker
  * files. Superseded generations are pruned after each commit, so
  * storage holds one committed generation plus the one being written.
  */
final class EpochStateStore(spark: SparkSession, dir: String) {
  private val fs = new Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def genDir(epoch: Long) = new Path(dir, s"gen=$epoch")
  private def marker(epoch: Long) = new Path(genDir(epoch), "_COMMITTED")

  /** Committed epochs, ascending (torn generations excluded). */
  private def committedEpochs(): Seq[Long] = {
    val base = new Path(dir)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("gen=") => s.drop(4).toLong }
      .filter(e => fs.exists(marker(e)))
      .sorted
  }

  /** Highest committed epoch and its named relations, if any. The
    * frames are plain parquet reads — callers localCheckpoint them
    * into their in-memory state protocol. */
  def latestCommitted(names: Seq[String]): Option[(Long, Map[String, DataFrame])] =
    committedEpochs().lastOption.map { e =>
      (e, names.map(n =>
        n -> spark.read.parquet(new Path(genDir(e), n).toString)).toMap)
    }

  /** True iff `epoch` is already committed — a replayed batch the
    * caller must skip rather than re-apply. */
  def isCommitted(epoch: Long): Boolean = fs.exists(marker(epoch))

  /** Durably commit generation `epoch`: write every named relation as
    * parquet, then the marker, then prune superseded generations.
    * Write order makes the commit atomic-enough for restart: no
    * marker, no generation. */
  def commit(epoch: Long, frames: Map[String, DataFrame]): Unit = {
    val g = genDir(epoch)
    // a torn earlier attempt at this same generation is overwritten
    frames.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(new Path(g, n).toString)
    }
    fs.create(marker(epoch), true).close()
    committedEpochs().dropRight(1).foreach(e =>
      fs.delete(genDir(e), true))
  }
}
