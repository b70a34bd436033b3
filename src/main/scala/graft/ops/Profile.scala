package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/**
 * Table-profiling operators — the ANALYZE pass a 100 TB curation run
 * executes before anything else, because every downstream decision
 * (join order, broadcast eligibility, partition count, skew salting,
 * quality thresholds) reads these statistics. (The reference has no
 * profiling surface at all; its closest analogue is the triple COUNT in
 * `persistence_systems.py` — this generalizes that to per-column table
 * statistics.)
 */
object Profile {

  /**
   * Per-column statistics in ONE aggregation pass: row count, null count,
   * distinct count, and min/max (numeric columns report them as doubles,
   * string columns as strings — computed on the NATIVE type first, so
   * numeric min/max is numeric order, not lexicographic).
   *
   * Output: one row per requested column —
   * (column, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str).
   *
   * Scale shape: `approx = false` (the oracle-checkable default) uses
   * exact COUNT DISTINCT, which for k columns expands the input k+1 ways
   * before the partial aggregate (Spark's standard multi-distinct plan) —
   * fine at dimension scale, wrong at 10^11 rows. `approx = true` swaps in
   * HLL++ `approx_count_distinct`, collapsing the whole profile to a
   * single narrow pass with map-side partials — the production setting,
   * spec-tested rather than oracle-checked because HLL estimates are not
   * engine-portable. Everything else (counts, min/max) is exact and
   * order-free in both modes. The k per-column stat structs come back in
   * one 1-row aggregate exploded driver-free into k rows.
   */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile of no columns")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      val ndv = if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
      val numeric = types(c).isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"_nn_$c"),
        ndv.as(s"_ndv_$c"),
        (if (numeric) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_minn_$c"),
        (if (numeric) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_maxn_$c"),
        (if (numeric) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"_mins_$c"),
        (if (numeric) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"_maxs_$c"))
    } :+ count(lit(1)).as("_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("_rows").as("n_rows"),
        (col("_rows") - col(s"_nn_$c")).as("n_null"),
        col(s"_ndv_$c").as("n_distinct"),
        col(s"_minn_$c").as("min_num"),
        col(s"_maxn_$c").as("max_num"),
        col(s"_mins_$c").as("min_str"),
        col(s"_maxs_$c").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("st")).select("st.*")
  }

  /**
   * Distribution-drift monitor over a timestamped metric: per (group,
   * epoch-week) mean vs the group's LEAVE-ONE-OUT baseline (all other
   * weeks), standardized by the standard error (sigma_baseline /
   * sqrt(n_week)) so a week is flagged when its mean is an improbable
   * draw from the rest of the group's distribution — the alert a
   * production data pipeline wants when an upstream source silently
   * changes (a scraper breaks, a partner swaps formats, a bot floods one
   * week). Leave-one-out matters: against the grand mean, one hot week
   * drags the baseline toward itself and flags every QUIET week too; the
   * jackknifed baseline is computed by subtracting the week's own exact
   * integer moments from the group totals — no second aggregation. A
   * group's only week has no baseline: drift_z is null, drifted false.
   *
   * Shape at 100 TB: ONE narrow projection then two hash aggregates over
   * the same scaled-integer frame — (group, week) partials then group
   * totals re-aggregated FROM the weekly frame (never a second scan of
   * the raw table), plus a groups-sized broadcast join back. No windows,
   * no sorts.
   *
   * Determinism: the metric is scaled to integers (×`scale`, half-up)
   * and all sums are exact integer sums — order-free; means/sigma/z
   * derive per-row from those integers in identical IEEE double
   * expressions on any engine, rounded 6 dp.
   */
  def driftMonitor(events: DataFrame, valueCol: String, groupCol: String,
                   tsCol: String = "ts", threshold: Double = 2.0,
                   scale: Long = 100L,
                   bucketUs: Long = 7L * 86400 * 1000000): DataFrame = {
    val s = round(col(valueCol) * scale, 0).cast("long")
    val scaled = events.select(col(groupCol),
      expr(s"unix_micros(cast($tsCol as timestamp)) div $bucketUs").as("week"),
      s.as("sv"))
    // (group, week)-sized and referenced twice (group totals + the final
    // join): pin so the raw-table aggregate runs once
    val weekly = scaled.groupBy(groupCol, "week").agg(
      count(lit(1)).as("n_week"), sum(col("sv")).as("sum_week"),
      sum(col("sv") * col("sv")).as("sumsq_week"))
      .localCheckpoint(false)
    val totals = weekly.groupBy(groupCol).agg(
      sum(col("n_week")).as("n"), sum(col("sum_week")).as("sum_s"),
      sum(col("sumsq_week")).as("sumsq_s"))
    val nB = (col("n") - col("n_week")).cast("double")
    val meanB = (col("sum_s") - col("sum_week")).cast("double") / nB
    val varB = (col("sumsq_s") - col("sumsq_week")).cast("double") / nB - meanB * meanB
    val weeklyMean = col("sum_week").cast("double") / col("n_week").cast("double")
    val z = when(col("n") === col("n_week"), lit(null).cast("double"))
      .otherwise((weeklyMean - meanB) / sqrt(varB / col("n_week").cast("double")))
    weekly.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col("week"), col("n_week"),
        round(weeklyMean / scale, 6).as("weekly_mean"),
        round(z, 6).as("drift_z"),
        coalesce(abs(z) > threshold, lit(false)).as("drifted"))
  }
}
