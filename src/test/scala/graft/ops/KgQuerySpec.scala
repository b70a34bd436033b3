package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the SPARQL-shaped query layer: BGP matching semantics,
  * VoID statistics, min-hop transitive closure (incl. cycles and the
  * maxIters truncation bound), and the filtered-negatives protocol. The
  * oracle queries pin engine parity; these pin the algebra. */
class KgQuerySpec extends AnyFunSuite {
  import KgQuery._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def graph(rows: (String, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("s", "p", "o", "o_kind")
  }

  test("bgp joins patterns on shared variables and filters constants") {
    val g = graph(
      ("t1", "partOf", "c1", 0L), ("t2", "partOf", "c1", 0L),
      ("t3", "partOf", "c2", 0L),
      ("t1", "tool", "grep", 2L), ("t3", "tool", "sed", 2L),
      ("c1", "mentions", "e1", 0L), ("c2", "mentions", "e2", 0L))
    val got = bgp(g, Seq(
      TriplePattern(V("turn"), C("partOf"), V("conv")),
      TriplePattern(V("turn"), C("tool"), V("tl")),
      TriplePattern(V("conv"), C("mentions"), V("ent"))))
      .collect().map(r => (r.getAs[String]("turn"), r.getAs[String]("conv"),
        r.getAs[String]("tl"), r.getAs[String]("ent"))).toSet
    // t2 has no tool -> no binding; joins respect both shared vars
    assert(got == Set(("t1", "c1", "grep", "e1"), ("t3", "c2", "sed", "e2")))
  }

  test("bgp repeated variable within one pattern binds equal positions") {
    val g = graph(("a", "self", "a", 0L), ("a", "self", "b", 0L))
    val got = bgp(g, Seq(TriplePattern(V("x"), C("self"), V("x"))))
      .collect().map(_.getString(0)).toList
    assert(got == List("a"))
  }

  test("bgp constant object selects and unshared patterns cross-product") {
    val g = graph(("s1", "p1", "k", 0L), ("s2", "p1", "k", 0L), ("s3", "p1", "x", 0L),
      ("u1", "p2", "v1", 0L))
    val got = bgp(g, Seq(
      TriplePattern(V("a"), C("p1"), C("k")),
      TriplePattern(V("b"), C("p2"), V("c"))))
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
    assert(got == Set(("s1", "u1"), ("s2", "u1")))
  }

  test("voidStats profiles each predicate") {
    val g = graph(
      ("s1", "p1", "o1", 0L), ("s1", "p1", "o2", 0L), ("s2", "p1", "o1", 0L),
      ("s1", "p2", "lit", 2L))
    val got = voidStats(g).collect()
      .map(r => r.getAs[String]("p") -> ((r.getAs[Long]("n_triples"),
        r.getAs[Long]("n_subjects"), r.getAs[Long]("n_objects"),
        r.getAs[Long]("n_iri_objects"), r.getAs[Double]("avg_fanout")))).toMap
    assert(got("p1") == ((3L, 2L, 2L, 3L, 1.5)))
    assert(got("p2") == ((1L, 1L, 1L, 0L, 1.0)))
  }

  test("transitiveClosure finds min-hop distances on a chain + shortcut") {
    import spark.implicits._
    // a->b->c->d plus the shortcut a->c: dist(a,c) must be 1, dist(a,d) 2
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")).toDF("src", "dst")
    val got = transitiveClosure(e, maxIters = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("c", "d") -> 1L,
      ("a", "c") -> 1L, ("a", "d") -> 2L, ("b", "d") -> 2L))
  }

  test("transitiveClosure saturates on cycles and honors maxIters truncation") {
    import spark.implicits._
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = transitiveClosure(cyc, maxIters = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("a", "a") -> 2L, ("b", "b") -> 2L))
    // chain of 4 edges truncated at maxIters=2: only dist<=2 pairs appear
    val chain = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5")).toDF("src", "dst")
    val trunc = transitiveClosure(chain, maxIters = 2).collect()
      .map(r => r.getLong(2)).max
    assert(trunc == 2L)
  }

  test("negativeSamples are deterministic, non-true, non-self, k-indexed") {
    import spark.implicits._
    val pos = Seq(("s1", "o1"), ("s1", "o2"), ("s2", "o1"), ("s3", "o3"))
      .toDF("s", "o")
    val negs = negativeSamples(pos, k = 4)
    val rows = negs.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val posSet = Set(("s1", "o1"), ("s1", "o2"), ("s2", "o1"), ("s3", "o3"))
    rows.foreach { case (s, o, k, neg) =>
      assert(neg != o, "self-corruption must be filtered")
      assert(!posSet.contains((s, neg)), "accidental true edge must be filtered")
      assert(k >= 1 && k <= 4)
      assert(posSet.contains((s, o)), "negatives derive from a positive")
    }
    assert(rows.nonEmpty)
    // determinism: a second evaluation yields the identical multiset
    assert(negativeSamples(pos, k = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sorted.sameElements(rows.sorted))
  }
}
