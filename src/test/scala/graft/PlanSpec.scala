package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan contract tests over the REAL driver queries at sf0.001:
 * the scale claims the Scaladocs make (zero-shuffle, one-exchange,
 * broadcast dim, top-k without total sort, column pruning) asserted
 * against `queryExecution.executedPlan`, so a refactor that silently
 * regresses a plan shape fails CI, not a 100 TB run.
 */
class PlanSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString()

  private def shuffles(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length +
      "Exchange rangepartitioning".r.findAllIn(p).length

  test("q_quantize_int8 is a pure projection: zero shuffle exchanges") {
    val p = plan("q_quantize_int8")
    assert(shuffles(p) == 0, s"expected no shuffle, plan:\n$p")
  }

  test("q_sessionize reuses ONE user_id exchange across windows + aggregate") {
    val p = plan("q_sessionize")
    assert(shuffles(p) == 1, s"expected exactly one shuffle, got ${shuffles(p)}:\n$p")
    assert(p.contains("hashpartitioning(user_id"))
  }

  test("q_join_agg broadcasts the dimension side") {
    val p = plan("q_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"dim join must broadcast:\n$p")
  }

  test("q_topk is TakeOrderedAndProject, not a total sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not total-sort:\n$p")
  }

  test("q_zorder scan prunes to exactly the two clustered columns") {
    val p = plan("q_zorder")
    val read = "ReadSchema: [^\\n]+".r.findFirstIn(p).getOrElse("")
    assert(read.contains("user_id") && read.contains("value"), read)
    assert(!read.contains("event_type") && !read.contains("props"),
      s"scan must not read unused columns: $read")
  }

  test("q1_agg aggregates map-side before its single exchange") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final aggregate:\n$p")
    assert(shuffles(p) == 1)
  }

  test("q_dedup_bloom probes with broadcast joins only (no probe-side shuffle before verify)") {
    val p = plan("q_dedup_bloom")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 5,
      s"k=5 bloom probes must be broadcast joins:\n$p")
  }

  test("sum outputs match the oracle's HUGEINT type (the r6 driver hash-fail class)") {
    // DuckDB sum(BIGINT) returns HUGEINT = arrow decimal128(38,0); the
    // driver's hash is type-sensitive, so every uncast oracle sum must be
    // mirrored by a decimal(38,0) Spark column. These three shipped RED in
    // CORRECTNESS_r06.json from exactly this mismatch — pin the fix.
    // (The cross-engine half of the gate is tools/check_oracles.py, now
    // type-strict; DuckDB is driver-side-only so it cannot run in sbt.)
    import org.apache.spark.sql.types.DecimalType
    def types(name: String): Map[String, org.apache.spark.sql.types.DataType] =
      SparkEntry.queries(name)(spark, sfDir).schema
        .map(f => f.name -> f.dataType).toMap
    assert(types("q_rollup")("sum_sv") == DecimalType(38, 0))
    assert(types("q_salted_agg")("sum_sv") == DecimalType(38, 0))
    val pivot = types("q_pivot")
    Seq("click", "error", "purchase", "signup", "view").foreach { c =>
      assert(pivot(c) == DecimalType(38, 0), s"pivot column $c: ${pivot(c)}")
    }
  }
}
