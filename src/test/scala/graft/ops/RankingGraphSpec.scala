package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-6 additions: as-of join, BM25 / TF-IDF
  * ranking, and triangle counting. Each test pins semantics on a
  * hand-checkable input (the oracle queries pin engine parity). */
class RankingGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asofJoin attaches the latest at-or-before right row per key") {
    import spark.implicits._
    // right: quotes at t=10, 20, 20(later id), 40; left probes at 5, 20, 30
    val left = Seq((1L, 5L, 100L), (1L, 20L, 101L), (1L, 30L, 102L), (2L, 30L, 103L))
      .toDF("k", "tus", "event_id")
    val right = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 20L, 3L, 3.0),
      (1L, 40L, 4L, 4.0), (2L, 25L, 5L, 5.0))
      .toDF("k", "tus", "event_id", "px")
    val got = AsOf.asofJoin(left, right, "k", "tus", "event_id", Seq("tus", "px"))
      .select(col("event_id"), col("asof.tus").as("rt"), col("asof.px").as("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
    assert(got(100L).isEmpty)                      // nothing at-or-before t=5
    assert(got(101L).contains((20L, 3.0)))         // inclusive <=; later tie id wins
    assert(got(102L).contains((20L, 3.0)))         // carries forward past t=20
    assert(got(103L).contains((25L, 5.0)))         // keys never cross
  }

  test("bm25 matches the hand-computed single-doc score and ranks by tf") {
    import spark.implicits._
    val d = Seq((1L, "x"), (2L, "x x y"), (3L, "y z")).toDF("doc_id", "text")
    val got = Ranking.bm25(d, Seq("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // doc 3 has no query term -> absent
    assert(got.map(_._1).toSet == Set(1L, 2L))
    // doc 1: tf=1, dl=1, N=3, df=2, avgdl=(1+3+2)/3=2
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    val s1 = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 1.0 / 2.0))
    val r1 = got.find(_._1 == 1L).get
    assert(r1._2 == 1L)
    assert(math.abs(r1._3 - s1) < 1e-6)
    // doc 2: tf=2 but dl=3 -> length normalization wins, doc 1 ranks higher
    val s2 = idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 2.0))
    val r2 = got.find(_._1 == 2L).get
    assert(math.abs(r2._3 - s2) < 1e-6)
    assert(r1._3 > r2._3)
  }

  test("tfIdfTopTerms ranks corpus-rare terms first with term tiebreak") {
    import spark.implicits._
    val d = Seq((1L, "a a rare b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    val got = Ranking.tfIdfTopTerms(d, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    // 'a'/'b' appear in every doc -> idf = ln(1) = 0; 'rare' wins doc 1
    assert(got.filter(_._1 == 1L).sortBy(_._2).map(_._3) == List("rare", "a"))
    // docs 2/3: all scores 0 -> tiebreak by term name
    assert(got.filter(_._1 == 2L).sortBy(_._2).map(_._3) == List("a", "b"))
  }

  test("labelPropagation: two weighted cliques joined by a weak bridge") {
    import spark.implicits._
    // clique {1,2,3} (weight 5) and clique {4,5,6} (weight 5), bridge 3-4
    // (weight 1): after 3 rounds each clique converges to its min id.
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L),
      (4L, 5L, 5L), (5L, 6L, 5L), (4L, 6L, 5L),
      (3L, 4L, 1L))
      .toDF("entity_a", "entity_b", "weight")
    val got = GraphAnalytics.labelPropagation(edges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 == got(2L)._1 && got(2L)._1 == got(3L)._1)
    assert(got(4L)._1 == got(5L)._1 && got(5L)._1 == got(6L)._1)
    assert(got(1L)._1 != got(4L)._1)     // the weak bridge does not merge them
    assert(got(1L)._2 == 3L && got(4L)._2 == 3L)
  }

  test("bfsDistance: min hop distance from seeds, bounded by iters") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7, seed = node 1 only
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("entity_a", "entity_b")
    val got = GraphAnalytics.bfsDistance(edges, col("id") === 1L, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // nodes 6,7 are beyond 4 hops -> absent
  }

  test("kmvOverlap: small sets are counted exactly and jaccard is exact") {
    import spark.implicits._
    // below k=256 the sketch IS the set: estimates must equal exact counts
    val a = (1 to 100).map(i => s"e$i").toDF("v")
    val b = (51 to 130).map(i => s"e$i").toDF("v")
    val r = Sketches.kmvOverlap(a, b, "v").collect().head
    assert(r.getAs[Long]("exact_a") == 100L && r.getAs[Long]("exact_b") == 80L)
    assert(r.getAs[Double]("est_a") == 100.0 && r.getAs[Double]("est_b") == 80.0)
    assert(r.getAs[Double]("est_union") == 130.0)
    // shared = 50 of 130 union-sketch members
    assert(math.abs(r.getAs[Double]("est_jaccard") - 50.0 / 130.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("est_intersection") - 50.0) < 1e-6)
  }

  test("kmvOverlap: estimator lands near truth above sketch size") {
    import spark.implicits._
    // 4000 vs 3000 elements with 2000 shared; k=256 -> ~6% relative error
    val a = (1 to 4000).map(i => s"x$i").toDF("v")
    val b = (2001 to 5000).map(i => s"x$i").toDF("v")
    val r = Sketches.kmvOverlap(a, b, "v").collect().head
    assert(math.abs(r.getAs[Double]("est_a") - 4000) / 4000 < 0.2)
    assert(math.abs(r.getAs[Double]("est_union") - 5000) / 5000 < 0.2)
    assert(math.abs(r.getAs[Double]("est_intersection") - 2000) / 2000 < 0.35)
  }

  test("pmiEdges: independence gives pmi 0, perfect co-occurrence npmi 1") {
    import spark.implicits._
    // 4 convs: x in all 4, y in all 4 (perfect pair); z in {c1, c2} with x
    val m = Seq(
      ("c1", "x"), ("c1", "y"), ("c1", "z"),
      ("c2", "x"), ("c2", "y"), ("c2", "z"),
      ("c3", "x"), ("c3", "y"),
      ("c4", "x"), ("c4", "y"))
      .toDF("conv_id", "entity_id")
    val got = GraphAnalytics.pmiEdges(m)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getDouble(6)))).toMap
    // x-y: n_ab=4=N, n_a=n_b=4 -> pmi = ln(4*4/(4*4)) = 0, npmi = 1
    assert(got(("x", "y")) == ((4L, 0.0, 1.0)))
    // x-z: n_ab=2, n_a=4, n_z=2 -> pmi = ln(2*4/(4*2)) = 0; npmi = 0/-ln(1/2) = 0
    assert(got(("x", "z"))._2 == 0.0 && got(("x", "z"))._3 == 0.0)
    // y-z: same marginals as x-z
    assert(got(("y", "z"))._1 == 2L)
  }

  test("entityTimelines aggregates provenance-joined mention spans") {
    import spark.implicits._
    val m = Seq(("c1", 0, "e1", 2L), ("c1", 1, "e1", 1L), ("c2", 0, "e1", 1L),
      ("c2", 0, "e2", 5L))
      .toDF("conv_id", "turn_idx", "entity_id", "n_hits")
    val t = Seq(("c1", 0, "2024-01-01 00:00:00"), ("c1", 1, "2024-01-01 00:01:00"),
      ("c2", 0, "2024-01-01 00:05:00"))
      .toDF("conv_id", "turn_idx", "ts")
    val got = GraphAnalytics.entityTimelines(m, t)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    assert(got("e1") == ((base, base + 300000000L, 3L, 4L, 2L, 300000000L)))
    assert(got("e2") == ((base + 300000000L, base + 300000000L, 1L, 5L, 1L, 0L)))
  }

  test("knnFromPairs symmetrizes and ranks by (jaccard desc, neighbor)") {
    import spark.implicits._
    val scored = Seq((1L, 2L, 0.8), (1L, 3L, 0.8), (2L, 3L, 0.5), (1L, 4L, 0.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val got = Ranking.knnFromPairs(scored, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1: ties at 0.8 break by neighbor id; 0-score pair dropped
    assert(got((1L, 1L)) == 2L && got((1L, 2L)) == 3L)
    assert(!got.contains((4L, 1L)))
    // doc 3 sees both sides of its pairs: 1 (0.8) then 2 (0.5)
    assert(got((3L, 1L)) == 1L && got((3L, 2L)) == 2L)
  }

  test("chunkDocuments windows with overlap and a short tail") {
    import spark.implicits._
    val d = Seq((7L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Sampling.chunkDocuments(d, window = 64, stride = 48)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L)._1 == 0L && got(0L)._2 == 64L)
    assert(got(1L) == ((48L, 52L, (49 to 100).map(i => s"t$i").mkString(" "))))
    assert(got(2L) == ((96L, 4L, "t97 t98 t99 t100")))
  }

  test("mixtureSample fills integer quotas in deterministic md5 order") {
    import spark.implicits._
    val d = (1L to 20L).map(i => (i, if (i <= 12) "en" else "de")).toDF("doc_id", "lang")
    val got = Sampling.mixtureSample(d, "lang", Seq("en" -> 3, "de" -> 5))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(got.count(_._1 == "en") == 3)
    assert(got.count(_._1 == "de") == 5)
    // determinism: a second run picks the identical sample
    val again = Sampling.mixtureSample(d, "lang", Seq("en" -> 3, "de" -> 5))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(got.toSet == again.toSet)
  }

  test("triangles: K4 plus a pendant node (hand-counted)") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, 3 per node) + pendant edge 4-5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L), (2L, 4L), (4L, 5L))
      .toDF("entity_a", "entity_b")
    val got = GraphAnalytics.triangles(edges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 3L, 1.0)))
    assert(got(3L) == ((3L, 3L, 1.0)))
    assert(got(4L) == ((4L, 3L, 0.5)))
    assert(got(5L) == ((1L, 0L, 0.0)))
    // global count: per-node sum = 3 x triangle count
    assert(got.values.map(_._2).sum == 12L)
  }

  test("kCore peels the pendant chain off a triangle (k=2)") {
    import spark.implicits._
    // triangle {1,2,3} + chain 3-4, 4-5: round 1 drops 5 (deg 1), round 2
    // drops the now-pendant 4; the triangle is the 2-core.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("entity_a", "entity_b")
    val got = GraphAnalytics.kCore(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("valueHistogram bins equal widths and clamps the max into the last bin") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0).toDF("value")
    val got = Sketches.valueHistogram(df, "value", buckets = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // width 1.0 over [0,4]; the max value 4.0 clamps into bucket 3
    assert(got == Map(
      0L -> ((1L, 0.0, 1.0)), 1L -> ((1L, 1.0, 2.0)),
      2L -> ((1L, 2.0, 3.0)), 3L -> ((2L, 3.0, 4.0))))
    // constant column degenerates to one bucket holding every row
    val const = Sketches.valueHistogram(Seq(7.0, 7.0, 7.0).toDF("value"), "value", buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(const == Map(0L -> 3L))
  }

  test("fuzzyVocabPairs blocks on (first char, ±1 length) before the verify") {
    import spark.implicits._
    val docs = Seq((1L, "cat cot cat"), (2L, "dog dig cart")).toDF("doc_id", "text")
    val got = TextAnalysis.fuzzyVocabPairs(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // cot/cart is dist 2 -> filtered; dog/cat cross blocks -> never joined
    assert(got == Set(
      ("cart", "cat", 1L, 1L, 2L),
      ("cat", "cot", 1L, 2L, 1L),
      ("dig", "dog", 1L, 1L, 1L)))
  }

  test("pageRank production mode (plain sum) agrees with the ordered-fold mode to 1e-6") {
    import spark.implicits._
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("a", "c", 3L), ("c", "d", 1L))
      .toDF("entity_a", "entity_b", "weight")
    val det = GraphAnalytics.pageRank(edges).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val prod = GraphAnalytics.pageRank(edges, deterministic = false).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(det.keySet == prod.keySet)
    det.foreach { case (id, pr) =>
      assert(math.abs(pr - prod(id)) <= 1e-6, s"$id: $pr vs ${prod(id)}")
    }
  }

  test("nodeSimilarity hub cap: a non-binding cap changes nothing; a binding cap prunes hub wedges") {
    import spark.implicits._
    // star through hub h (degree 3) plus a pendant pair via x (degree 2)
    val edges = Seq(("a", "h"), ("b", "h"), ("c", "h"), ("a", "x"), ("b", "x"))
      .toDF("entity_a", "entity_b")
    val base = GraphAnalytics.nodeSimilarity(edges)
      .select("entity_a", "entity_b", "common").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val loose = GraphAnalytics.nodeSimilarity(edges, hubDegreeCap = Some(100L))
      .select("entity_a", "entity_b", "common").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(base == loose, "non-binding cap must not change the result")
    val capped = GraphAnalytics.nodeSimilarity(edges, hubDegreeCap = Some(2L))
      .select("entity_a", "entity_b", "common").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // wedges THROUGH h (deg 3) are pruned — a/b/c no longer pair via h; the
    // (a,b) wedge through x and the (h,x) wedges through a and b survive
    // (the cap gates the shared NEIGHBOR, not the endpoints)
    assert(capped == Map(("a", "b") -> 1L, ("h", "x") -> 2L))
  }
}
