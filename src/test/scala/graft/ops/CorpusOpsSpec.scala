package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for boilerplate segment removal, DSIR importance weights,
  * and count-min-sketch heavy hitters (the oracle queries pin engine
  * parity; these pin the semantics on hand-checkable inputs). */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("boilerplate drops cross-doc repeated segments, keeps unique content") {
    import spark.implicits._
    // window=2, minDocs=2: "nav bar" repeats in all three docs -> removed;
    // each doc's unique tail survives
    val docs = Seq(
      (1L, "nav bar alpha beta"),
      (2L, "nav bar gamma delta"),
      (3L, "nav bar epsilon")).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplate(docs, window = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((2L, 1L, 2L, md5Hex("alpha beta"))))
    assert(got(2L) == ((2L, 1L, 2L, md5Hex("gamma delta"))))
    assert(got(3L) == ((2L, 1L, 1L, md5Hex("epsilon"))))
  }

  test("boilerplate fully-boilerplate doc hashes the empty string") {
    import spark.implicits._
    val docs = Seq((1L, "nav bar"), (2L, "nav bar"), (3L, "real text here ok"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.boilerplate(docs, window = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got(1L) == md5Hex(""))
    assert(got(2L) == md5Hex(""))
  }

  test("dsirWeights scores target-domain-looking docs higher") {
    import spark.implicits._
    // target vocabulary {x, y}; source-only vocabulary {p, q}
    val docs = Seq(
      (1L, "x y x y", true), (2L, "x y y x", true),
      (3L, "p q p q", false), (4L, "x y p q", false))
      .toDF("doc_id", "text", "tgt")
    val got = NgramQuality.dsirWeights(docs, col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(4L) && got(4L) > got(3L),
      s"expected target > mixed > source-only, got $got")
    // weights are means: permutation of the same bag scores identically
    assert(got(1L) == got(2L))
  }

  test("cmsHeavyHitters never underestimates and filters by threshold") {
    import spark.implicits._
    val elems = (Seq.fill(40)("hot") ++ Seq.fill(12)("warm") ++
      (1 to 30).map(i => s"cold$i")).toDF("tok")
    // width 16 (1 nibble) with 32 distinct values forces collisions
    val got = Sketches.cmsHeavyHitters(elems, "tok",
      depth = 3, widthNibbles = 1, threshold = 12)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byTok = got.map(t => t._1 -> t).toMap
    assert(byTok.contains("hot") && byTok("hot")._2 == 40L)
    got.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CMS underestimated $t: $est < $exact")
      assert(est >= 12L)
    }
    // a singleton can only clear the threshold via collision mass — with
    // 3 rows of 16 buckets that's possible but every reported row must
    // still satisfy the overestimate bound asserted above; the true heavy
    // hitter is always present
    assert(got.map(_._1).contains("hot"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
