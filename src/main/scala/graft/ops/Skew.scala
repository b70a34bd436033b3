package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation operators: the salted two-phase aggregate — THE
 * canonical fix when one hot key (the empty string, the null user, "the"
 * as a token, a bot account) funnels 10% of a 100 TB table through one
 * reducer. Spark's hash aggregate already does map-side partials, but a
 * hot key still lands its entire partial set on ONE final-aggregate
 * task; salting splits the key into `saltBuckets` sub-keys for the first
 * shuffle and re-merges in a second, tiny shuffle keyed on the true key
 * (cardinality ≤ keys × saltBuckets).
 */
object Skew {

  /**
   * Salted two-phase aggregation: counts plus exact integer sums per key.
   * `distributor` must vary within a key (a row id, an event id — it only
   * feeds the salt hash, never the result). All sums are integer-exact
   * and order-free, so the salted plan is bit-identical to the direct
   * `groupBy(keys).agg(...)` — which is what the oracle checks.
   *
   * `sumCols` are integer columns (scale doubles first, as everywhere in
   * this codebase): a float sum would change its rounding under
   * re-association and the salted result would drift from the direct one.
   */
  def saltedAgg(df: DataFrame, keys: Seq[String], distributor: Column,
                sumCols: Seq[String], saltBuckets: Int = 16): DataFrame = {
    require(keys.nonEmpty, "salted aggregate with no keys")
    require(saltBuckets >= 2, s"saltBuckets=$saltBuckets defeats the purpose")
    val salt = pmod(xxhash64(distributor), lit(saltBuckets.toLong)).as("_salt")
    val partialAggs = count(lit(1)).as("_n") +:
      sumCols.map(c => sum(col(c)).as(s"_s_$c"))
    val partial = df.withColumn("_salt", salt)
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("_n")).as("n_rows") +:
      sumCols.map(c => sum(col(s"_s_$c")).as(s"sum_$c"))
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
