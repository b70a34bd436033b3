package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — the canonical time-series operator Spark has no built-in
 * for: attach to every left row the payload of the most recent right row
 * at-or-before it (`right.ts <= left.ts`) on the same key. The classic
 * "trade joined to the latest quote" / "event joined to the last preceding
 * state change" primitive.
 *
 * Spark-first shape: rather than a range join (which Catalyst planners
 * turn into a broadcast-nested-loop or an O(n·m) theta join), both sides
 * are UNION-merged and swept with ONE keyed window — partition by the join
 * key, order by (ts, side, tie), carry the last non-null right payload
 * forward (`last(..., ignoreNulls = true)` over unbounded preceding). One
 * shuffle on the key + one in-partition sort, identical cost to
 * sessionization; at 100 TB the key (user/instrument) partitions the
 * merge and AQE handles hot keys. Right rows sort BEFORE left rows at an
 * equal timestamp (side 0 < 1), giving the standard inclusive `<=` as-of
 * semantics.
 *
 * Determinism: ordering is total — (ts, side, tie) with a caller-supplied
 * unique tiebreaker — so "the most recent right row" is uniquely defined
 * even under timestamp ties; payload values are carried verbatim (no
 * float arithmetic introduced).
 */
object AsOf {

  /**
   * @param left     probe side; all its columns are preserved
   * @param right    reference side; must share `key`, `ts`, `tie` columns
   * @param key      equi-join key (e.g. user_id)
   * @param ts       ordering column (integer micros recommended)
   * @param tie      unique-per-row tiebreaker column present on both sides
   * @param payload  right columns to carry (packed into struct `asofCol`,
   *                 null when no right row precedes the left row)
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               tie: String, payload: Seq[String],
               asofCol: String = "asof"): DataFrame = {
    val r = right.select(
      col(key), col(ts), col(tie), lit(0).as("_side"),
      struct(payload.map(col): _*).as(asofCol))
    val l = left.withColumn("_side", lit(1))
    val merged = l.unionByName(r, allowMissingColumns = true)
    val sweep = Window.partitionBy(key).orderBy(ts, "_side", tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn(asofCol, last(col(asofCol), ignoreNulls = true).over(sweep))
      .where(col("_side") === 1)
      .drop("_side")
  }
}
