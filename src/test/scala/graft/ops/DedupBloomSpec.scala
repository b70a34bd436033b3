package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bloom prefilter's two contracts: no false negatives (every
  * true member routes to the maybe side, so the composed result is exactly
  * the anti-join even at absurd false-positive rates) and real pruning
  * (at sane sizing, most non-members never reach the verify join). */
class DedupBloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def frames = {
    import spark.implicits._
    val ref = (0 until 200).map(i => s"ref-key-$i").toDF("key")
    val probe = ((0 until 50).map(i => (i.toLong, s"ref-key-${i * 4}")) ++
      (50 until 400).map(i => (i.toLong, s"new-key-$i"))).toDF("id", "key")
    (probe, ref)
  }

  test("bloomDecontaminate equals the plain anti-join, even with a tiny filter") {
    val (probe, ref) = frames
    val expected = probe.join(ref, Seq("key"), "left_anti")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(expected.size == 350)
    for (mBits <- Seq(64L, 1024L, 1L << 20)) {
      val got = Dedup.bloomDecontaminate(probe, ref, "key", mBits = mBits)
        .collect().map(_.getAs[Long]("id")).toSet
      assert(got == expected, s"mBits=$mBits must not change the answer")
    }
  }

  test("bloomSplit: no false negatives; sane sizing prunes most non-members") {
    val (probe, ref) = frames
    val (clean, maybe) = Dedup.bloomSplit(probe, ref, "key", mBits = 1L << 16)
    val maybeIds = maybe.select("id").collect().map(_.getAs[Long]("id")).toSet
    val cleanIds = clean.select("id").collect().map(_.getAs[Long]("id")).toSet
    assert((0L until 50L).forall(maybeIds), "every true member must be maybe")
    assert(cleanIds.intersect((0L until 50L).toSet).isEmpty)
    assert(cleanIds.size + maybeIds.size == 400)
    // 200 keys in 65536 bits, k=5 -> fp rate ~1e-9; all 350 should be clean
    assert(cleanIds.size >= 345,
      s"expected nearly all non-members pruned, got ${cleanIds.size}")
    assertThrows[IllegalArgumentException](
      Dedup.bloomSplit(probe, ref, "key", mBits = 100))
  }
}
