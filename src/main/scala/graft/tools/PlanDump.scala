package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: print the formatted physical plan and a timed noop-sink
  * run for the named SparkEntry queries (all args). Not part of the
  * driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("ref_customer_decode", "ref_join_json")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n =====")
      df.explain("formatted")
      // warm + 3 timed passes
      df.write.format("noop").mode("overwrite").save()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$n pass $i] ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
