package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.OptimizerBarrier.evalOnce
import graft.model.Schemas

/** The reference's operator inventory (SURVEY.md §2.1, O2–O13) as small
  * composable `DataFrame => DataFrame` functions. Each op is pure plan
  * construction — source-agnostic, so the same composition runs on a
  * batch DataFrame (for the DuckDB oracle) and on a streaming one
  * (Kafka / MemoryStream), which is the key Spark idiom the reference's
  * three scripts share.
  *
  * Reference citations are to /root/reference/project/starter/.
  */
object RefOps {

  /** O2 — Kafka record → string key/value.
    * sparkpyrediskafkastreamtoconsole.py:35, sparkpykafkajoin.py:42,110 */
  def castKeyValueToString(df: DataFrame): DataFrame =
    df.selectExpr("cast(key AS STRING) key", "cast(value AS STRING) value")

  /** O3+O4 — parse the Redis change-event envelope out of `value` and
    * star-expand it. sparkpyrediskafkastreamtoconsole.py:67-68 */
  def parseRedisEnvelope(df: DataFrame): DataFrame =
    df.withColumn("value", from_json(col("value"), Schemas.redisEnvelope))
      .select(col("value.*"))

  /** O7+O8 — zSetEntries[0].element (base64) → UTF-8 customer JSON text.
    * Case-insensitive `zsetEntries` resolution as in the reference SQL.
    * sparkpyrediskafkastreamtoconsole.py:71,78; sparkpykafkajoin.py:79,86 */
  def extractEncodedCustomer(df: DataFrame): DataFrame =
    df.selectExpr("zsetEntries[0].element AS encodedCustomer")

  def decodeCustomerJson(df: DataFrame): DataFrame =
    df.withColumn("customer", unbase64(col("encodedCustomer")).cast("string"))

  /** O3+O4 — customer JSON text → flattened customer columns.
    * `evalOnce` pins the whole decode chain (envelope from_json →
    * unbase64 → customer from_json) to a single evaluation per row:
    * without it, predicate pushdown of the email/birthDay null filter
    * re-evaluates the chain once per conjunct (3x per row, measured).
    * sparkpyrediskafkastreamtoconsole.py:85-86 */
  def parseCustomer(df: DataFrame): DataFrame =
    df.withColumn("customer", evalOnce(from_json(col("customer"), Schemas.customer)))
      .select(col("customer.*"))

  /** O9 — the reference's only malformed-row handling: drop rows whose
    * decode produced null email/birthDay (this is also what filters out
    * non-customer Redis writes). sparkpyrediskafkastreamtoconsole.py:93 */
  def nonNullEmailBirthDay(df: DataFrame): DataFrame =
    df.filter(col("email").isNotNull && col("birthDay").isNotNull)
      .select("email", "birthDay")

  /** O10+O11 — birthYear = split(birthDay, "-")[0]; keep (email, birthYear).
    * sparkpyrediskafkastreamtoconsole.py:95,100 */
  def birthYearFromBirthDay(df: DataFrame): DataFrame =
    df.withColumn("birthYear", split(col("birthDay"), "-").getItem(0))
      .select("email", "birthYear")

  /** Full customer-side decode chain (entry point 1, SURVEY.md §3.1):
    * Kafka-shaped rows → (email, birthYear). */
  def customerDecodeChain(df: DataFrame): DataFrame =
    birthYearFromBirthDay(
      nonNullEmailBirthDay(
        parseCustomer(
          decodeCustomerJson(
            extractEncodedCustomer(
              parseRedisEnvelope(
                castKeyValueToString(df)))))))

  /** O3+O4 — risk-event side (entry point 2, SURVEY.md §3.2):
    * Kafka-shaped rows → (customer, score).
    * sparkpyeventskafkastreamtoconsole.py:24-35 */
  def riskDecodeChain(df: DataFrame): DataFrame =
    castKeyValueToString(df)
      .withColumn("value", evalOnce(from_json(col("value"), Schemas.stediEvent)))
      .select(col("value.*"))
      .select("customer", "score")

  /** O12 — the stream-stream inner equi-join on email = customer, both
    * key columns kept, exactly as sparkpykafkajoin.py:131. In batch this
    * plans as a hash/sort-merge join; in streaming as
    * StreamingSymmetricHashJoinExec. */
  def riskJoin(customerSide: DataFrame, riskSide: DataFrame): DataFrame =
    customerSide.join(riskSide, expr("email = customer"))

  /** O13 — whole-row JSON serialization for the Kafka sink value.
    * sparkpykafkajoin.py:145 */
  def toJsonValue(df: DataFrame): DataFrame =
    df.selectExpr("to_json(struct(*)) AS value")
}
