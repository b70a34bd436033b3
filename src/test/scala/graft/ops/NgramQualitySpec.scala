package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * In-test oracles for the corpus-hygiene operators (independent of the
 * DuckDB oracle surface): hand-derivable fixtures for contamination and
 * repetition, a plain-Scala re-derivation of the bigram-LM score, and the
 * plan-shape guarantees the Scaladocs promise (repetition shuffle-free).
 */
class NgramQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetition: duplicate n-gram fractions match hand counts, zero shuffle") {
    val d = docsDf(
      1L -> "a b a b a b",      // bigrams: ab ba ab ba ab -> 5 total 2 distinct
      2L -> "x y z w",          // no repeats
      3L -> "q q q q q",        // bigrams qq x4 -> 4 total 1 distinct
      4L -> "one two")          // no trigram
    val got = NgramQuality.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == ((4L, 2L, 0.6, 0.5)))    // tri: abab baba abab baba -> 4 total, 2 distinct
    assert(got(2L) == ((2L, 0L, 0.0, 0.0)))
    assert(got(3L) == ((3L, 2L, 0.75, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
    assert(got(4L) == ((0L, 0L, 0.0, 0.0)))
    // the Scaladoc's scale claim: pure projection, NO exchange in the plan
    val plan = NgramQuality.repetitionStats(d).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"repetitionStats shuffled:\n$plan")
  }

  test("contamination: overlap counts vs a known benchmark set") {
    val corpus = docsDf(
      10L -> "alpha beta gamma delta epsilon zeta",   // shares 5-grams with bench doc 0
      11L -> "totally different words here now folks",
      0L -> "alpha beta gamma delta epsilon")         // the benchmark doc itself
    val bench = corpus.where(org.apache.spark.sql.functions.col("doc_id") === 0L)
    val got = NgramQuality.contamination(corpus, bench).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // doc 10 has 5-grams {a b g d e, b g d e z}; the first IS bench's only 5-gram
    assert(got(10L) == ((2L, 1L, true)))
    assert(got(11L) == ((2L, 0L, false)))
    assert(got(0L) == ((1L, 1L, true))) // the benchmark doc trivially overlaps itself
  }

  test("bigram-LM mean NLL matches a plain-Scala re-derivation") {
    val rows = Seq(1L -> "a b a c", 2L -> "a b b", 3L -> "c a b")
    val d = docsDf(rows: _*)
    // independent model: same tokenization, add-1 smoothing, ordered fold
    val toks = rows.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val vocab = uni.size
    val big = toks.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = toks.map { case (id, ts) =>
      // the pinned op order: per-document DISTINCT bigrams, ordered by first
      // position, folding cnt * nll left-to-right (the de-skewed formula)
      val transitions = ts.zip(ts.drop(1))
      val distinctBigrams = transitions.zipWithIndex
        .groupBy(_._1).view
        .mapValues(occ => (occ.size, occ.map(_._2).min)).toSeq
        .sortBy(_._2._2)
      val wsum = distinctBigrams.foldLeft(0.0) { case (acc, (p, (cnt, _))) =>
        acc + cnt.toDouble * -math.log((big(p) + 1).toDouble / (uni(p._1) + vocab).toDouble)
      }
      id -> math.rint(wsum / transitions.size * 1e6) / 1e6
    }.toMap
    val got = NgramQuality.bigramLmScores(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == expected)
    // repeated structure ("a b" appears in every doc) scores lower than it
    // would under a uniform model — the count tables are really being used
    assert(got(1L) != got(2L) || got(2L) != got(3L))
  }

  test("perplexity count joins carry the per-doc distinct-bigram frame, not token rows") {
    // the de-skew contract: transitions are pre-aggregated to
    // (doc_id, head, next) BEFORE the cb/cu joins, so the Zipf-skewed head
    // key joins once per containing document, not once per occurrence —
    // visible as an Aggregate on [doc_id, head, next] BELOW the joins
    val df = NgramQuality.bigramLmScores(docsDf(1L -> "a b a c", 2L -> "a b b"))
    val plan = df.queryExecution.optimizedPlan.toString()
    val joinIdx = plan.indexOf("Join")
    // the three-key aggregate, not the outer per-doc collect_list
    // aggregate — since round 7 the frame is pinned (localCheckpoint), so
    // it may surface as a LogicalRDD carrying exactly the distinct-bigram
    // columns (doc_id, head, next, cnt, pos) instead of a raw Aggregate
    val aggIdx = math.max(
      "Aggregate \\[doc_id#\\d+L?, head#".r
        .findFirstMatchIn(plan).map(_.start).getOrElse(-1),
      "LogicalRDD \\[doc_id#\\d+L?, head#\\d+, next#\\d+, cnt#\\d+L?, pos#\\d+".r
        .findFirstMatchIn(plan).map(_.start).getOrElse(-1))
    assert(joinIdx >= 0, s"no join in plan:\n$plan")
    assert(aggIdx > joinIdx,
      s"per-document distinct-bigram frame is not below the count joins:\n$plan")
  }
}
