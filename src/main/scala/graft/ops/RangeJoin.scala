package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) joins at scale: Spark turns a pure inequality join
 * predicate (`abs(a.ts - b.ts) <= w`) into BroadcastNestedLoopJoin — a
 * cartesian product that dies at 10^11 rows. The standard fix is BINNING:
 * bucket both sides by `floor(ts / w)`, explode the probe side into its
 * bucket and the two neighbors (any pair within `w` is at most one bucket
 * apart), equi-join on the bucket, and re-check the exact predicate. The
 * equi-join hashes and distributes like any other join; the exact filter
 * restores precise semantics, so the result is identical to the
 * cartesian-with-predicate — which is what the oracle checks.
 */
object RangeJoin {

  /**
   * Self-join of a timestamped table: pairs of rows within `windowUs`
   * microseconds of each other, restricted by `pairFilter` (used to break
   * symmetry — e.g. `left("user_id") < right("user_id")` — so each
   * unordered pair appears once and self-pairs never do). Returned frame
   * carries every column of each side with `_a` / `_b` suffixes.
   *
   * Cost shape: each left row joins only the ~3 buckets its window can
   * reach; bucket population is bounded by event rate × window, so the
   * join is linear in (rows × density), never quadratic in the table. A
   * pathological hot bucket (flash-crowd second) is an AQE skew-join
   * case, same as any hot key.
   */
  def selfJoinWithin(df: DataFrame, tsCol: String, windowUs: Long,
                     pairFilter: (String => Column, String => Column) => Column): DataFrame = {
    require(windowUs > 0, "window must be positive")
    val a = df.select(df.columns.map(c => col(c).as(s"${c}_a")).toIndexedSeq: _*)
      .withColumn("_us_a", us_of(tsCol + "_a"))
      .withColumn("_bucket", floor(col("_us_a") / windowUs).cast("long"))
    val b = df.select(df.columns.map(c => col(c).as(s"${c}_b")).toIndexedSeq: _*)
      .withColumn("_us_b", us_of(tsCol + "_b"))
      .withColumn("_bucket",
        explode(array(Seq(-1, 0, 1).map(d =>
          floor(col("_us_b") / windowUs).cast("long") + d): _*)))
    // a pair's buckets differ by at most 1, so it meets exactly ONE of the
    // probe's three exploded copies — no dedup needed afterwards
    a.join(b, Seq("_bucket"))
      .where(abs(col("_us_a") - col("_us_b")) <= windowUs)
      .where(pairFilter(n => col(s"${n}_a"), n => col(s"${n}_b")))
      .drop("_bucket", "_us_a", "_us_b")
  }

  private def us_of(c: String): Column =
    expr(s"unix_micros(cast(`$c` as timestamp))")
}
