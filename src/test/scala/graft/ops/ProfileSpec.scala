package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the profiler's per-type stat routing (numeric vs string min/max,
  * null accounting, exact-vs-HLL NDV modes) and the drift monitor's
  * standard-error flagging. The oracle queries pin engine parity. */
class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile: counts, nulls, exact NDV, typed min/max in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.5), "b"), (2L, Some(-3.0), "a"),
      (3L, None, "b"), (4L, Some(10.5), "c"))
      .toDF("id", "v", "s")
    val got = Profile.profile(df, Seq("id", "v", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "v", "s"))
    val v = got("v")
    assert(v.getLong(1) == 4L && v.getLong(2) == 1L && v.getLong(3) == 2L)
    assert(v.getDouble(4) == -3.0 && v.getDouble(5) == 10.5)
    assert(v.isNullAt(6) && v.isNullAt(7))
    val s = got("s")
    assert(s.getLong(2) == 0L && s.getLong(3) == 3L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "c")
    assertThrows[IllegalArgumentException](Profile.profile(df, Seq("nope")))
  }

  test("profile approx mode: HLL NDV within tolerance, all else exact") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"k${i % 37}")).toDF("id", "k")
    val got = Profile.profile(df, Seq("id", "k"), approx = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("id").getLong(1) == 1000L && got("id").getLong(2) == 0L)
    // HLL++ default rsd is 5%; 1000 and 37 distinct must land well inside
    assert(math.abs(got("id").getLong(3) - 1000L) <= 100L)
    assert(math.abs(got("k").getLong(3) - 37L) <= 4L)
    assert(got("id").getDouble(4) == 1.0 && got("id").getDouble(5) == 1000.0)
  }

  test("driftMonitor flags the week whose mean is an improbable draw") {
    import spark.implicits._
    val wk = 7L * 86400 * 1000
    // group g: three quiet weeks (mean 10, within-week sigma ~3.2), one
    // drifted week shifted by +2. With the leave-one-out baseline the
    // quiet weeks' z ~ 1.4 (the drifted week inflates their baseline
    // variance as well as its mean) while the drifted week's z ~ 4.5.
    val rows = (0 until 4).flatMap { w =>
      val base = if (w == 3) 12.0 else 10.0
      (0 until 50).map(i =>
        ("g", new Timestamp(w * wk + i * 1000L), base + ((i % 11) - 5).toDouble))
    }
    // group h: a single week -> no leave-one-out baseline -> never flagged
    val single = (0 until 10).map(i => ("h", new Timestamp(i * 1000L), 5.0))
    val got = Profile.driftMonitor((rows ++ single).toDF("event_type", "ts", "value"),
      "value", "event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("week")) ->
        (r.getAs[Boolean]("drifted"), r.isNullAt(r.fieldIndex("drift_z")))).toMap
    assert(got.size == 5)
    assert(got(("g", 3L))._1, "hot week must be flagged")
    Seq(0L, 1L, 2L).foreach(w =>
      assert(!got(("g", w))._1, s"quiet week $w must not be flagged"))
    assert(got(("h", 0L)) == (false, true), "single-week group has null z, unflagged")
  }
}
