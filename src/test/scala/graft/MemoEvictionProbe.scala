package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM probe for the BPE merge-memo session-eviction rule
  * (`TextQueries.learnedMerges`): entries hold localCheckpoint'ed
  * relations that die with their SparkContext, so a memo entry whose
  * context has stopped must be evicted on the next lookup — otherwise
  * multi-session JVMs pin dead checkpoints forever. The rule is only
  * observable with two SEQUENTIAL SparkContexts in one JVM, which the
  * shared-session test harness cannot host — BpeSpec forks this main
  * instead. Exit 0 + MEMO_EVICTION_OK on stdout = pass; any require()
  * failure exits nonzero. */
object MemoEvictionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    def boot(name: String) = {
      val s = SparkSession.builder()
        .master("local[2]").appName(name)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    val s1 = boot("memo-probe-1")
    assert(graft.queries.TextQueries.learnedMerges(s1, sfDir).count() > 0)
    val k1 = graft.queries.TextQueries.bpeMemoKeys
    require(k1.size == 1, s"expected 1 memo entry after session 1, got $k1")
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = boot("memo-probe-2")
    assert(graft.queries.TextQueries.learnedMerges(s2, sfDir).count() > 0)
    val k2 = graft.queries.TextQueries.bpeMemoKeys
    require(k2.size == 1, s"dead session's checkpoint still pinned: $k2")
    require(k2 != k1, s"memo key did not rotate with the new session: $k2")
    s2.stop()
    println("MEMO_EVICTION_OK")
  }
}
