package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized *partitions*, but when a
  * single key dominates (the classic hot-user / null-key case) the
  * only fix is salting: fan the probe side's key out into `salt`
  * sub-keys and replicate the build side once per sub-key. Shuffle
  * volume rises by `salt`× on the (small) build side in exchange for
  * even task sizes on the (huge) probe side.
  *
  * Result is exactly `left.join(right, leftKey === rightKey, "inner")`
  * — verified by SkewJoinSpec against the plain join.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      salt: Int = 16): DataFrame = {
    // probe side: random-but-deterministic salt from row content is
    // unnecessary — any uniform assignment works; use a cheap hash of
    // monotonically varying columns? Simplest deterministic choice:
    // hash the whole row.
    val saltedLeft = left.withColumn(
      "_salt", pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt)).cast("int"))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(
      saltedRight,
      leftKey === rightKey && saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
