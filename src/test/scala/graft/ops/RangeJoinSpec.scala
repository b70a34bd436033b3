package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the binned interval join's one contract: identical result to the
  * direct cartesian-with-predicate join (including pairs that straddle a
  * bucket boundary and pairs exactly at the window edge), without a
  * nested-loop join in the plan. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("binned self-join == cartesian predicate join; plan is a hash join") {
    import spark.implicits._
    val w = 60L * 1000000
    // cluster points around bucket edges: exact-window pairs, straddlers,
    // same-user pairs (must drop), far-apart pairs (must not match)
    val rows = Seq(
      (1L, 10L, new Timestamp(0L)),
      (2L, 11L, new Timestamp(60000L)),      // exactly 60 s from e1
      (3L, 12L, new Timestamp(59999L)),
      (4L, 10L, new Timestamp(30000L)),      // same user as e1
      (5L, 13L, new Timestamp(119999L)),     // 60 s from e2, straddles bucket
      (6L, 14L, new Timestamp(10_000_000L))) // far away
      .toDF("event_id", "user_id", "ts")
    val binned = RangeJoin.selfJoinWithin(rows, "ts", w,
      (a, b) => a("user_id") < b("user_id"))
      .select("event_id_a", "event_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = rows.select(col("event_id").as("ea"), col("user_id").as("ua"),
      expr("unix_micros(cast(ts as timestamp))").as("ta"))
    val b = rows.select(col("event_id").as("eb"), col("user_id").as("ub"),
      expr("unix_micros(cast(ts as timestamp))").as("tb"))
    val direct = a.crossJoin(b)
      .where(abs(col("ta") - col("tb")) <= w && col("ua") < col("ub"))
      .select("ea", "eb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == direct)
    assert(binned.contains((1L, 2L)), "exact-window-edge pair must match")
    assert(binned.contains((2L, 5L)), "bucket-straddling pair must match")
    assert(!binned.exists { case (x, y) => x == 4L && y == 1L || x == 1L && y == 4L })
    val plan = RangeJoin.selfJoinWithin(rows, "ts", w,
      (a, b) => a("user_id") < b("user_id")).queryExecution.executedPlan.toString()
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"binned join must hash, not nested-loop:\n$plan")
  }
}
