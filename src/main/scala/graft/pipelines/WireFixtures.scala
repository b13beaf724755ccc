package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic generators that wrap the driver's testdata rows in the
  * reference's wire formats (FIXTURES.md §A2/§A4), so the full decode
  * pipelines can be exercised — and oracle-verified — on batch data.
  *
  * The synthesis formulas are simple integer arithmetic on the keys so
  * that a DuckDB oracle can recompute the expected *output* of the
  * decode chain directly from the base tables, verifying the entire
  * to_json → base64 → envelope → unbase64 → from_json round trip
  * end-to-end (any byte-level decode bug breaks the hash match).
  */
object WireFixtures {

  /** email/birthDay synthesized from customer keys; the oracle mirrors
    * these formulas in SQL. */
  private def customerFields(df: DataFrame): DataFrame =
    df.withColumn("email", concat(col("c_name"), lit("@example.com")))
      .withColumn("birth_year_num", (lit(1940) + col("c_custkey") % 60).cast("int"))
      .withColumn(
        "birthDay",
        concat_ws(
          "-",
          col("birth_year_num").cast("string"),
          lpad((lit(1) + col("c_custkey") % 12).cast("string"), 2, "0"),
          lpad((lit(1) + col("c_custkey") % 28).cast("string"), 2, "0")))

  /** Kafka-shaped rows (key/value) carrying the Redis change-event
    * envelope with a base64 customer JSON in zSetEntries[0].element —
    * the exact shape of FIXTURES.md §A2. */
  def redisTopicFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val c = customerFields(Tables.customer(spark, sfDir))
    val customerJson = to_json(struct(
      col("c_name").as("customerName"),
      col("email"),
      lit("8015551212").as("phone"),
      col("birthDay")))
    c.select(
      lit("Q3VzdG9tZXI=").as("key"), // base64("Customer"), as on the wire
      to_json(struct(
        lit("Q3VzdG9tZXI=").as("key"),
        lit("NONE").as("existType"),
        lit(false).as("Ch"),
        lit(false).as("Incr"),
        array(struct(
          base64(customerJson.cast("binary")).as("element"),
          lit("0.0").as("Score"))).as("zSetEntries"))).as("value"))
  }

  /** Kafka-shaped rows carrying STEDI risk events (FIXTURES.md §A4),
    * synthesized from orders: customer = owning customer's email,
    * score = o_totalprice rendered as a JSON number. */
  def stediTopicFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), concat(col("c_name"), lit("@example.com")).as("email"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(
        col("email").as("key"),
        to_json(struct(
          col("email").as("customer"),
          col("o_totalprice").as("score"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("riskDate"))).as("value"))
  }
}
