package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time arbitrary stages of a query at a given
  * scale factor. Not part of the driver contract. */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

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
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._

    val docs = graft.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    time("tokens explode")(
      docs.select(explode(tokens(col("text")))).write.format("noop").mode("overwrite").save())
    time("shingleSet(5)")(
      docs.select(shingleSet(col("text"), 5)).write.format("noop").mode("overwrite").save())
    time("shingle explode")(
      docs.select(explode(shingleSet(col("text"), 5))).write.format("noop").mode("overwrite").save())
    val inv = docs.select(
      col("doc_id"), col("lang"),
      (col("n_chars") / lit(200)).cast("long").as("len_band"),
      shingleSet(col("text"), 5).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .select(col("doc_id"), col("lang"), col("len_band"), col("n_sh"),
        explode(col("sh")).as("shingle"))
    time("inv count")(println("  inv rows = " + inv.count()))
    val a = inv.select(col("shingle"), col("lang"), col("len_band"),
      col("doc_id").as("a_id"), col("n_sh").as("a_n"))
    val b = inv.select(col("shingle"), col("lang"), col("len_band"),
      col("doc_id").as("b_id"), col("n_sh").as("b_n"))
    val joined = a.join(b, Seq("shingle", "lang", "len_band"))
      .where(col("a_id") < col("b_id"))
    time("pair join count")(println("  pair rows = " + joined.count()))
    time("full ngramJaccard")(
      graft.operators.Dedup.ngramJaccard(docs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
