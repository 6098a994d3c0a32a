package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (left) side's keys and replicate the
  * other side across the salt domain, so one hot key spreads over
  * `saltFactor` reducers instead of melting a single partition. AQE's skew
  * join handles sort-merge cases adaptively; this helper is for when the
  * skew is known up front (one customer holding 10% of a 100 TB fact table)
  * or the join is hash-partitioned by an explicit repartition. Semantically
  * identical to `left.join(right, keys, "inner")` — proven in SkewJoinSpec.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<long>")))
    val out = salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
    // drop the helper column and the duplicated right-side key
    val rightCols = right.columns.filter(_ != key).map(replicated(_))
    out.select(salted("*") +: rightCols.toSeq: _*).drop("__salt")
  }
}
