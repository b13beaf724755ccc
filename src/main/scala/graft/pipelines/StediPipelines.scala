package graft.pipelines

import org.apache.spark.sql.DataFrame
import graft.ops.RefOps

/** The reference's three end-to-end pipelines (SURVEY.md §3), expressed
  * as source-agnostic plan builders: hand them any Kafka-shaped
  * DataFrame (binary-or-string key/value) — a real Kafka readStream, a
  * MemoryStream, or a batch fixture frame — and they build the same
  * logical plan the reference builds.
  *
  * Reference: /root/reference/project/starter/
  *  - sparkpyrediskafkastreamtoconsole.py (customer decode → console)
  *  - sparkpyeventskafkastreamtoconsole.py (risk parse → console)
  *  - sparkpykafkajoin.py (join → Kafka)
  */
object StediPipelines {

  /** redis-server topic → (email, birthYear). Entry point 1. */
  def customerPipeline(redisTopic: DataFrame): DataFrame =
    RefOps.customerDecodeChain(redisTopic)

  /** stedi-events topic → (customer, score). Entry point 2. */
  def riskPipeline(stediTopic: DataFrame): DataFrame =
    RefOps.riskDecodeChain(stediTopic)

  /** Both topics → inner equi-join on email = customer → row as JSON
    * `value` (the Kafka sink contract, FIXTURES.md §A5). Entry point 3. */
  def joinPipeline(redisTopic: DataFrame, stediTopic: DataFrame): DataFrame =
    RefOps.toJsonValue(
      RefOps.riskJoin(customerPipeline(redisTopic), riskPipeline(stediTopic)))

  /** Join pipeline stopping before JSON serialization — the columnar
    * form (email, birthYear, customer, score) used for oracle checks. */
  def joinedColumns(redisTopic: DataFrame, stediTopic: DataFrame): DataFrame =
    RefOps.riskJoin(customerPipeline(redisTopic), riskPipeline(stediTopic))
}
