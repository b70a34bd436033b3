package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values) distinct sketches and sketch-based corpus overlap
 * estimation — the sub-linear answer to "how much does corpus B overlap
 * corpus A?" (train/eval contamination triage, dataset-version drift,
 * dedup-rate forecasting) when the exact n-gram join
 * ([[NgramQuality.contamination]]) is too expensive to run corpus × corpus.
 *
 * The sketch of a set is its k smallest md5 values. Three classical
 * estimators (Bar-Yossef et al. 2002; Beyer et al. 2007) compose from it:
 *  - distinct count: (k−1) / r_k, where r_k is the k-th smallest hash
 *    mapped to [0,1) — here via the first 12 hex nibbles (48 bits, exact
 *    in a double);
 *  - Jaccard: |S_k(A∪B) ∩ S_k(A) ∩ S_k(B)| / |S_k(A∪B)| (the union sketch
 *    is a uniform sample of A∪B, membership in both side-sketches marks an
 *    intersection element);
 *  - intersection size: Jaccard × |A∪B|-estimate.
 * Sets smaller than k are counted exactly (their sketch IS the set).
 *
 * Scale shape: each side is one distinct + one `TakeOrderedAndProject`
 * (per-partition top-k heaps, merged on one reducer — k rows, never a full
 * sort); everything downstream operates on ≤k-row frames joined as
 * broadcasts. At 100 TB the only full-data passes are the two shingle
 * scans; the k-row sketches can also be persisted per corpus version and
 * composed later (union of sketches = sketch of union — the algebra is
 * what makes the operator a pipeline primitive rather than a query).
 *
 * Determinism (oracle-exact): md5 hex strings order identically in Spark
 * and DuckDB; sketch contents are therefore exact, every estimator input
 * (k, sketch sizes, shared counts, 48-bit hash values) is an integer, and
 * each derived double is one rounded expression — no cross-row float
 * folds anywhere.
 */
object Sketches {

  /** Default sketch size: ±1/√256 ≈ 6% relative error on distinct counts. */
  val KmvK = 256

  /** First `nibbles` hex digits of an md5 string as an exact integer
    * (nibbles ≤ 13 keeps the value < 2^52, exact in a double). Built from
    * `instr` on the hex alphabet so DuckDB can evaluate the identical
    * expression — no engine-specific hex-to-int conversion. */
  def hexPrefixValue(h: Column, nibbles: Int = 12): Column =
    (0 until nibbles).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1).cast("double") *
        lit(math.pow(16.0, (nibbles - 1 - i).toDouble))
    }.reduce(_ + _)

  /** The same expression as [[hexPrefixValue]] in portable SQL. */
  def hexPrefixValueSql(h: String, nibbles: Int = 12): String =
    (0 until nibbles).map { i =>
      s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1)::DOUBLE * ${math.pow(16.0, (nibbles - 1 - i).toDouble)}"
    }.mkString("(", " + ", ")")

  /** KMV sketch of the values in `elems(valueCol)`: the k smallest
    * md5(value) hex strings, one `h` column. */
  def kmvSketch(elems: DataFrame, valueCol: String, k: Int = KmvK): DataFrame =
    elems.select(md5(col(valueCol)).as("h")).distinct().orderBy("h").limit(k)

  /**
   * Fixed-bucket histogram of a numeric column: `buckets` equal-width
   * bins over the observed [min, max], per-bin count and bounds — the
   * distribution-profiling pass (outlier triage, quantile eyeballing,
   * drift dashboards) that precedes threshold picking. Two passes: a
   * 1-row min/max aggregate rides the plan as a broadcast, then one
   * hash aggregate on the bin index (map-side combine collapses each
   * partition to ≤`buckets` rows before the exchange).
   *
   * Determinism: bin width and indices derive from the same IEEE doubles
   * in either engine (floor of identical doubles), the max value clamps
   * into the last bin, and a constant column degenerates to bin 0.
   */
  def valueHistogram(df: DataFrame, valueCol: String, buckets: Int = 20): DataFrame = {
    val mm = df.agg(min(col(valueCol)).cast("double").as("mn"),
      max(col(valueCol)).cast("double").as("mx"))
    val width = (col("mx") - col("mn")) / buckets
    df.select(col(valueCol).cast("double").as("v"))
      .crossJoin(broadcast(mm))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit((buckets - 1).toLong),
            floor((col("v") - col("mn")) / width))).as("bucket"),
        col("mn"), col("mx"))
      .groupBy("bucket", "mn", "mx")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), col("n"),
        round(col("mn") + col("bucket") * width, 6).as("lo"),
        round(col("mn") + (col("bucket") + 1) * width, 6).as("hi"))
  }

  /**
   * Exact per-group quantiles by rank selection (percentile_disc
   * semantics): the value at rank ceil(q·n) in each group's sort order,
   * for each requested q. Pure SELECTION — no interpolation arithmetic —
   * so the result is a value that exists in the data and is
   * engine-exact by construction (interpolated percentile implementations
   * differ across engines; order statistics cannot).
   *
   * Shape at 100 TB: one shuffle on the group key + an in-partition sort
   * shared by the row_number and count windows (same partitioning → one
   * exchange). Exact global quantiles inherently need the group's values
   * co-sorted; at full corpus scale the approximate path is
   * [[valueHistogram]] / a KMV-style sketch, and this operator serves
   * per-slice exact reporting where the slice fits a partition.
   */
  def exactQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                     qs: Seq[Double] = Seq(0.25, 0.5, 0.9, 0.99)): DataFrame = {
    val byGroup = Window.partitionBy(groupCol)
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("double").as("v"))
      .withColumn("rn", row_number().over(byGroup.orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(byGroup))
    ranked
      .select(col(groupCol), col("v"), col("rn"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .where(col("rn") === greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
      .select(col(groupCol), col("q"), col("n"), col("rn").cast("long").as("rank"),
        col("v").as("value"))
  }

  /**
   * Moment-based outlier detection per group — flag rows whose value sits
   * more than `threshold` standard deviations from the group mean. The
   * classic metric-anomaly triage pass.
   *
   * Shape at 100 TB: one map-side-combined aggregate to per-group moments
   * (n, Σs, Σs²) — three integers per group — broadcast back over the
   * stream; no sort, no window.
   *
   * Determinism across engines, the interesting part: raw Σ of doubles is
   * order-dependent, so the moments are accumulated over SCALED INTEGERS
   * (`round(value·100)` — the data is 2-decimal; 64-bit sums are exact and
   * order-free). Mean/variance/z then derive per-row from the same integer
   * sums via the identical expression tree, and sqrt is IEEE-exact.
   */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     threshold: Double = 2.0, scale: Long = 100L): DataFrame = {
    val s = round(col(valueCol) * scale, 0).cast("long")
    val scaled = df.select(col("event_id"), col(groupCol), col(valueCol), s.as("s"))
    val moments = scaled.groupBy(groupCol).agg(
      count(lit(1)).as("n"), sum(col("s")).as("sum_s"),
      sum(col("s") * col("s")).as("sumsq_s"))
    val meanS = col("sum_s").cast("double") / col("n").cast("double")
    val varS = col("sumsq_s").cast("double") / col("n").cast("double") - meanS * meanS
    val z = (col("s").cast("double") - meanS) / sqrt(varS)
    scaled.join(broadcast(moments), Seq(groupCol))
      .where(abs(z) > threshold)
      .select(col("event_id"), col(groupCol), col(valueCol),
        col("n"), round(z, 6).as("zscore"))
  }

  /**
   * Robust (median/MAD) outlier detection per group — the heavy-tail-safe
   * sibling of [[zscoreOutliers]]: moments explode under the very outliers
   * they hunt, medians don't. Flags rows with
   * |value − median| / (1.4826·MAD) > `threshold`.
   *
   * Shape at 100 TB: two rank selections per group (median of the scaled
   * value, then median of the absolute deviations) — each one group-keyed
   * shuffle + in-partition sort; the two medians join back as a
   * groups-sized broadcast. Exact medians inherently co-sort a group's
   * values; the approximate path at full scale is [[valueHistogram]].
   *
   * Determinism: both medians are SELECTED scaled integers (ceil(n/2)-th
   * order statistics — no interpolation, no float accumulation); the
   * robust z derives per-row from those integers via one identical
   * expression tree. Groups with MAD = 0 (majority-constant) are excluded
   * rather than divided by zero.
   */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  threshold: Double = 3.5, scale: Long = 100L): DataFrame = {
    def medianOf(in: DataFrame, c: String): DataFrame = {
      val byGroup = Window.partitionBy(groupCol)
      in.withColumn("rn", row_number().over(byGroup.orderBy(col(c))))
        .withColumn("n", count(lit(1)).over(byGroup))
        .where(col("rn") === greatest(lit(1L), ceil(lit(0.5) * col("n")).cast("long")))
        .select(col(groupCol), col(c).as(s"med_$c"))
    }
    val scaled = df.select(col("event_id"), col(groupCol), col(valueCol),
      round(col(valueCol) * scale, 0).cast("long").as("s"))
    // med is groups-sized — pin it so the first median window runs once;
    // dev is referenced twice (the MAD median + the final flag join), so
    // pin it too: the alternative replays a full scan+join per reference.
    // (At full corpus scale this materializes an events-sized frame — the
    // operator is per-slice exact reporting by contract, see scaladoc.)
    val med = medianOf(scaled, "s").localCheckpoint(false)
    val dev = scaled.join(broadcast(med), Seq(groupCol))
      .withColumn("d", abs(col("s") - col("med_s")))
      .localCheckpoint(false)
    val mad = medianOf(dev.select(col(groupCol), col("d")), "d")
    val z = (col("s").cast("double") - col("med_s").cast("double")) /
      (lit(1.4826) * col("med_d").cast("double"))
    dev.join(broadcast(mad), Seq(groupCol))
      .where(col("med_d") > 0 && abs(z) > threshold)
      .select(col("event_id"), col(groupCol), col(valueCol),
        col("med_s"), col("med_d").as("mad_s"), round(z, 6).as("robust_z"))
  }

  /**
   * One-row overlap report between two element sets (same `valueCol`
   * convention on both): sketch sizes, distinct-count estimates for A, B
   * and A∪B, Jaccard and intersection estimates — plus the exact distinct
   * counts of each side so accuracy is visible at test scale.
   */
  def kmvOverlap(a: DataFrame, b: DataFrame, valueCol: String,
                 k: Int = KmvK): DataFrame =
    // ONE fused pass over both element streams (guide §1.2: don't compute
    // things twice): the previous shape scanned/exploded each side TWICE
    // (side sketch + exact distinct count = 4 full passes). Both sides
    // union into a single distinct-hash aggregate carrying side-membership
    // flags; the sketches, the exact counts and the union sketch are then
    // ≤|distinct|-row scans of the pinned frame. Contents are identical:
    // distinct md5 per side, k smallest per side.
    overlapReport(
      a.select(md5(col(valueCol)).as("h"), lit(1L).as("fa"), lit(0L).as("fb"))
        .unionByName(b.select(md5(col(valueCol)).as("h"),
          lit(0L).as("fa"), lit(1L).as("fb"))), k)

  /**
   * [[kmvOverlap]] when the two element sets are a PARTITION of one stream
   * (side = a per-row predicate): the stream is scanned and exploded ONCE
   * — `kmvOverlap(elems.where(!isB), elems.where(isB), ...)` would compute
   * the upstream (e.g. a corpus-wide shingle explode) once per side.
   * Identical report (isB rows are side B, the rest side A).
   */
  def kmvOverlapSplit(elems: DataFrame, valueCol: String, isB: Column,
                      k: Int = KmvK): DataFrame =
    overlapReport(
      // rows where the predicate is NULL belong to neither side — exactly
      // what the two-filter form (where(!isB) / where(isB)) produces
      elems.where(isB.isNotNull)
        .select(md5(col(valueCol)).as("h"),
          when(isB, lit(0L)).otherwise(lit(1L)).as("fa"),
          when(isB, lit(1L)).otherwise(lit(0L)).as("fb")), k)

  /** The shared report tail: `hashed` is (h, fa, fb) with one row per
    * element occurrence; flags mark side membership. */
  private def overlapReport(hashed: DataFrame, k: Int): DataFrame = {
    val dh = hashed.groupBy("h")
      .agg(max(col("fa")).as("fa"), max(col("fb")).as("fb"))
      .localCheckpoint(false) // referenced 3× below (sketches + exact counts);
                              // lazy: pinned once inside the single action
    val sa = dh.where(col("fa") === 1L).select("h").orderBy("h").limit(k)
    val sb = dh.where(col("fb") === 1L).select("h").orderBy("h").limit(k)
    val su = sa.unionByName(sb).distinct().orderBy("h").limit(k)

    def stats(s: DataFrame, kCol: String, mCol: String): DataFrame =
      s.agg(count(lit(1)).as(kCol), max(col("h")).as(mCol))

    // estimate = exact sketch size below k, else (k-1)/r_k
    def est(kc: Column, mx: Column): Column = {
      val rk = hexPrefixValue(mx) / lit(math.pow(16.0, 12.0))
      when(kc < k, kc.cast("double")).otherwise(lit((k - 1).toDouble) / rk)
    }

    val shared = su.join(sa, Seq("h")).join(sb, Seq("h"))
      .agg(count(lit(1)).as("shared"))
    val exacts = dh.agg(sum(col("fa")).as("exact_a"), sum(col("fb")).as("exact_b"))

    val estU = est(col("ku"), col("mu"))
    stats(sa, "ka", "ma")
      .crossJoin(stats(sb, "kb", "mb"))
      .crossJoin(stats(su, "ku", "mu"))
      .crossJoin(shared).crossJoin(exacts)
      .select(
        lit(k.toLong).as("k"),
        coalesce(col("exact_a"), lit(0L)).as("exact_a"),
        coalesce(col("exact_b"), lit(0L)).as("exact_b"),
        round(est(col("ka"), col("ma")), 6).as("est_a"),
        round(est(col("kb"), col("mb")), 6).as("est_b"),
        round(estU, 6).as("est_union"),
        round(col("shared").cast("double") / col("ku"), 6).as("est_jaccard"),
        round(col("shared").cast("double") / col("ku") * estU, 6).as("est_intersection"))
  }

  /**
   * Count-min-sketch heavy hitters: `depth` independent md5-derived hash
   * rows × `16^widthNibbles` buckets, each element incrementing one counter
   * per row; a value's estimate is the MINIMUM of its `depth` counters —
   * an overestimate by at most the collision mass, never an underestimate.
   * Values whose estimate clears `threshold` are reported with both the
   * estimate and the exact count, so the overestimate bound is visible
   * (and verifiable) at test scale.
   *
   * Shape at 100 TB: the sketch state is FIXED SIZE (`depth × width`
   * counters) regardless of corpus size — one explode and one hash
   * aggregate build it, with the Zipf head absorbed map-side per
   * partition. The candidate pass here scores the full distinct vocabulary
   * (needed to report exact counts); a production stream queries the
   * broadcast sketch for candidate keys only and skips the exact join.
   *
   * Determinism: md5-nibble bucket arithmetic is engine-portable
   * ([[hexPrefixValue]]), all counters are exact integers, and min() over
   * integers has no float order.
   */
  def cmsHeavyHitters(elems: DataFrame, valueCol: String, depth: Int = 4,
                      widthNibbles: Int = 2, threshold: Long = 100): DataFrame = {
    def bucket(v: Column, r: Column): Column =
      hexPrefixValue(md5(concat(r.cast("string"), lit("#"), v)), widthNibbles)
        .cast("long")
    val rows = explode(sequence(lit(0), lit(depth - 1)))
    // ONE pass over the element stream: the per-value exact counts feed
    // BOTH the sketch counters (counter = Σ counts of values hashing into
    // the bucket — identical integers to counting raw occurrences) and the
    // candidate scoring. Previously the raw stream was exploded and
    // aggregated twice. The frame is vocabulary-sized; pinned lazily.
    val vCounts = elems.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("exact_cnt"))
      .localCheckpoint(false)
    val counters = vCounts.select(col("v"), col("exact_cnt"), rows.as("r"))
      .select(col("r"), bucket(col("v"), col("r")).as("bucket"), col("exact_cnt"))
      .groupBy("r", "bucket").agg(sum(col("exact_cnt")).as("c"))
    vCounts
      .select(col("v"), col("exact_cnt"), rows.as("r"))
      .withColumn("bucket", bucket(col("v"), col("r")))
      .join(counters, Seq("r", "bucket"))
      .groupBy("v", "exact_cnt").agg(min(col("c")).as("est_cnt"))
      .where(col("est_cnt") >= threshold)
      .select(col("v").as("token"), col("exact_cnt"), col("est_cnt"))
  }
}
