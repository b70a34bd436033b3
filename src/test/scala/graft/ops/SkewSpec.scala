package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the salted aggregate's contract (bit-identical to the direct
  * groupBy on a hot-key fixture, salt never leaks) and the quantile
  * bucketizer's point (a power-law column fills buckets evenly where
  * linear min/max scaling dumps almost everything into bucket 0). */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("saltedAgg == direct groupBy on a hot-key fixture") {
    import spark.implicits._
    // 90% of rows on one hot key, exact integer sums
    val df = (0 until 5000).map(i =>
      (i.toLong, if (i % 10 == 0) s"cold${i % 7}" else "hot", (i % 101).toLong))
      .toDF("id", "k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), col("id"), Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
    assert(!Skew.saltedAgg(df, Seq("k"), col("id"), Seq("v")).columns.contains("_salt"))
    assertThrows[IllegalArgumentException](
      Skew.saltedAgg(df, Seq("k"), col("id"), Seq("v"), saltBuckets = 1))
  }

  test("quantileBucket balances a power-law column that minMaxBucket cannot") {
    import spark.implicits._
    // x ~ power law: values 1..10 common, a few huge outliers
    val xs = ((0 until 1000).map(i => (i % 10 + 1).toLong) ++
      Seq(100000L, 500000L, 1000000L)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = xs.toDF("id", "x")
    val q = Layout.quantileBucket(df, "x", 2) // 4 buckets
      .groupBy(col("_qb_x")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every quantile bucket carries weight; no bucket hoards ~everything
    assert(q.keySet.subsetOf(Set(0L, 1L, 2L, 3L)) && q.size >= 3)
    assert(q.values.max <= 600, s"quantile buckets should be balanced-ish: $q")
    val lin = df.select(Layout.minMaxBucket(col("x"), lit(1L), lit(1000000L), 2).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lin(0L) >= 1000L, s"linear scaling must hoard bucket 0 here: $lin")
  }

  test("quantileBucket (scale-safe map form) is bit-identical to the global percent_rank window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed values incl. ties and a null — the window form orders NULLS FIRST
    val xs: Seq[java.lang.Long] =
      Seq[java.lang.Long](7L, 7L, 7L, 1L, 2L, 2L, 9L, 100L, 100L, 3L, null)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val bits = 2
    val size = 1L << bits
    val got = Layout.quantileBucket(df, "x", bits)
      .select(col("id"), col("_qb_x")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("_qb_x",
        least(floor(percent_rank().over(Window.orderBy(col("x"))) * size)
          .cast("long"), lit(size - 1)))
      .select(col("id"), col("_qb_x")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"map-form buckets diverge from window form: $got vs $want")
  }
}
