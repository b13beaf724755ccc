package graft.model

import org.apache.spark.sql.types._

/** The reference's three hand-declared wire schemas, reproduced as
  * Scala `StructType`s.
  *
  * Sources (all in /root/reference):
  *  - Redis change-event envelope: project/starter/sparkpykafkajoin.py:8-17
  *  - Customer JSON (base64 payload): project/starter/sparkpykafkajoin.py:18-23
  *  - STEDI risk event: project/starter/sparkpykafkajoin.py:24-28
  *
  * Fidelity notes (SURVEY.md §1.2):
  *  - everything business-level is StringType — even `score` (a JSON
  *    number on the wire; `from_json` coerces number→string) and
  *    `Score` inside zSetEntries;
  *  - `zSetEntries` is Array[Struct[element, Score]]; the wire also
  *    carries a redundant lowercase `zsetEntries` twin that is never
  *    declared, and queries rely on case-insensitive resolution
  *    (`spark.sql.caseSensitive=false`, the default).
  */
object Schemas {

  val zSetEntry: StructType = StructType(Seq(
    StructField("element", StringType),
    StructField("Score", StringType)))

  /** Redis change-event envelope published to the `redis-server` topic. */
  val redisEnvelope: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("existType", StringType),
    StructField("Ch", BooleanType),
    StructField("Incr", BooleanType),
    StructField("zSetEntries", ArrayType(zSetEntry))))

  /** Customer JSON carried base64-encoded inside zSetEntries[0].element. */
  val customer: StructType = StructType(Seq(
    StructField("customerName", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("birthDay", StringType)))

  /** STEDI risk event published to the `stedi-events` topic. */
  val stediEvent: StructType = StructType(Seq(
    StructField("customer", StringType),
    StructField("score", StringType),
    StructField("riskDate", StringType)))
}

/** Typed views of the same shapes for Dataset[T] use in tests. */
case class ZSetEntry(element: String, Score: String)
case class RedisEnvelope(
    key: String,
    existType: String,
    Ch: Boolean,
    Incr: Boolean,
    zSetEntries: Seq[ZSetEntry])
case class Customer(
    customerName: String,
    email: String,
    phone: String,
    birthDay: String)
case class StediEvent(customer: String, score: String, riskDate: String)
