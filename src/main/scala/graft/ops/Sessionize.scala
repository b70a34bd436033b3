package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event sessionization — the canonical keyed-sequence operator of a
 * large-scale behavioural pipeline: split each user's event stream into
 * sessions at inactivity gaps, then aggregate per session.
 *
 * Shape at 100 TB: ONE shuffle on `user_id` + an in-partition sort (the
 * lag/cumsum window pair), then a partial-aggregated groupBy on
 * (user_id, session_idx) that lands in the SAME partitioning — Catalyst
 * reuses the exchange, so the whole operator is one shuffle end-to-end.
 * Hot users (bots) are the skew risk; the per-user sequence must stay on
 * one partition by definition, so the mitigation is AQE skew handling
 * plus upstream bot filtering, not salting.
 *
 * Determinism: all time math is INTEGER microseconds (`unix_micros` here,
 * `epoch_us` in the DuckDB oracle — second-granularity `unix_timestamp`
 * would alias sub-second gaps), ordering ties break on `event_id`, and
 * the only float output is an order-free `max`.
 */
object Sessionize {

  /**
   * Funnel conversion — step-1 → step-2 within an attribution window: per
   * user, the first `step1` event and the count of `step2` events landing
   * in `(t_step1, t_step1 + window]`. Three keyed aggregates + two
   * broadcast-or-keyed joins on user_id; every output is integer/boolean
   * (microsecond time math), so the oracle is exact by construction.
   * Users who never reach step 1 appear with sentinel 0 (not NULL — whole
   * rows are sort-compared by oracle harnesses).
   */
  def funnel(events: DataFrame, step1: String = "signup", step2: String = "purchase",
             windowUs: Long = 24L * 3600 * 1000000): DataFrame = {
    val tus = unix_micros(col("ts").cast("timestamp"))
    // user-grain and referenced twice (conversion join + final join):
    // pin so the filtered scan+aggregate runs once
    val first1 = events.where(col("event_type") === step1)
      .groupBy("user_id").agg(min(tus).as("first_step1_us"))
      .localCheckpoint(false)
    val conv = events.where(col("event_type") === step2)
      .select(col("user_id"), tus.as("p_us"))
      .join(first1, Seq("user_id"))
      .where(col("p_us") > col("first_step1_us") &&
        col("p_us") <= col("first_step1_us") + windowUs)
      .groupBy("user_id").agg(count(lit(1)).as("n_step2_in_window"))
    events.select("user_id").distinct()
      .join(first1, Seq("user_id"), "left")
      .join(conv, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("first_step1_us"), lit(0L)).as("first_step1_us"),
        coalesce(col("n_step2_in_window"), lit(0L)).as("n_step2_in_window"),
        (coalesce(col("n_step2_in_window"), lit(0L)) > 0).as("converted"))
  }

  /** Per-session aggregates with a `gap`-microsecond inactivity cutoff
    * (default 30 min). `session_idx` is 1-based per user in time order. */
  def sessions(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // ts is TIMESTAMP_NTZ in the parquet; the UTC-session cast makes
      // unix_micros read the same wall-clock micros DuckDB's epoch_us does
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("event_id"), col("value"))
      .withColumn("new_s",
        when(lag(col("tus"), 1).over(order).isNull ||
          col("tus") - lag(col("tus"), 1).over(order) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tus")).as("session_start_us"),
        (max(col("tus")) - min(col("tus"))).as("duration_us"),
        max(col("value")).as("max_value"))
  }

  /**
   * Retention cohorts — the third canonical behavioural operator (after
   * sessionization and funnels): users are cohorted by their first active
   * week, and each (cohort, week-offset) cell counts how many of them were
   * active that many weeks later.
   *
   * Weeks are INTEGER epoch-microsecond buckets (`epoch_us div 7d`) rather
   * than calendar `date_trunc('week', …)` — bucket arithmetic is identical
   * in every engine (the oracle uses `//`), where week-truncation semantics
   * (ISO Monday vs locale) are not. All outputs are integers except the
   * rate, an exactly-rounded division of two small integer-valued doubles.
   *
   * Shape at 100 TB: one distinct over (user_id, week) — the raw event
   * volume collapses map-side to at most users × active-weeks — then a
   * user-keyed aggregate + join (self-colocated), a cohort-keyed aggregate,
   * and a broadcast join against the tiny cohort-size dimension. No window
   * functions, no per-user sequences — unlike sessionization this operator
   * never needs a user's events on one partition, so hot users are not a
   * skew risk at all.
   */
  /**
   * Event-type transition matrix (first-order Markov counts) — the
   * sequence-mining primitive behind next-action prediction features and
   * bot/anomaly triage: per user, order events in time and count
   * (src → dst) event-type transitions globally, with per-src transition
   * probabilities.
   *
   * Shape at 100 TB: the lead() window is the same ONE `user_id` shuffle
   * sessionization pays (per-user order is the semantics; hot users are
   * the same unsalvageable skew, mitigated by AQE), and the transition
   * count collapses map-side to at most |event_type|² rows per partition
   * before its tiny exchange. The per-src totals ride back on a broadcast.
   *
   * Determinism: ordering ties break on `event_id`; counts are integers;
   * the probability is one exactly-rounded division of integer-valued
   * doubles.
   */
  def transitions(events: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val seq = events
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("dst_type", lead(col("event_type"), 1).over(order))
      .where(col("dst_type").isNotNull)
    // cnt is |types|²-sized and referenced twice (totals + final join):
    // pin it so the user-keyed window pass over the event stream runs once
    val cnt = seq.groupBy(col("event_type").as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val tot = cnt.groupBy("src_type").agg(sum("n").as("n_src"))
    cnt.join(broadcast(tot), Seq("src_type"))
      .select(col("src_type"), col("dst_type"), col("n"),
        round(col("n").cast("double") / col("n_src").cast("double"), 6).as("p"))
  }

  /**
   * Semi-structured property rollup — JSON field extraction over the raw
   * `props` payload column, then a keyed aggregate: the schema-on-read
   * pass every event pipeline runs before promoting a JSON field to a real
   * column. `get_json_object` is a codegen'd native expression, so the
   * parse stays inside WholeStageCodegen; the aggregate collapses map-side
   * to |event_type| rows per partition. All outputs are integer counts /
   * integer min-max-sum (the extracted field is integral in the data, and
   * a non-integral or missing value falls out as NULL on both engines).
   */
  def propsRollup(events: DataFrame, field: String = "k"): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), s"$$.$field").cast("long").as("v"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("v")).as("n_with_field"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))

  /**
   * Last-write-wins key compaction (SCD-1 / CDC upsert-merge): keep each
   * key's latest row by (event time, event_id tiebreak). This is the
   * maintenance pass every mutable-dimension ingest runs to fold a change
   * stream into current state.
   *
   * Shape at 100 TB: ONE shuffle on the key + an in-partition sort (the
   * row_number window); with the base table bucketed by key, incremental
   * merges shuffle only the (small) delta. `max(struct(...))` would do it
   * in a hash aggregate without the sort, but the window spelling keeps
   * the full row without a struct repack and AQE coalesces the exchange
   * the same way; both are one-shuffle.
   *
   * Determinism: selection only (no arithmetic) over a total order —
   * (tus DESC, event_id DESC) has no ties since event_id is unique.
   */
  def latestByKey(events: DataFrame, keys: Seq[String] = Seq("user_id", "event_type"))
      : DataFrame = {
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("tus").desc, col("event_id").desc)
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"), col("value"))
      .withColumn("rn", row_number().over(order))
      .where(col("rn") === 1)
      .drop("rn")
  }

  def retentionCohorts(events: DataFrame,
                       bucketUs: Long = 7L * 86400 * 1000000): DataFrame = {
    // userWeeks is referenced twice (cohort derivation + the activity
    // join) and cohorts twice (sizes + join): pin both so the distinct
    // pass and the per-user aggregate run once each
    val userWeeks = events
      .select(col("user_id"),
        expr(s"unix_micros(cast(ts as timestamp)) div $bucketUs").as("week"))
      .distinct()
      .localCheckpoint(false)
    val cohorts = userWeeks.groupBy("user_id").agg(min("week").as("cohort_week"))
      .localCheckpoint(false)
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("n_cohort"))
    userWeeks.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active")) // userWeeks is distinct -> count == distinct users
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort").cast("double"), 6)
          .as("retention_rate"))
  }
}
