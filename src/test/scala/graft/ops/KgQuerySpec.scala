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

  test("bgpOptional keeps unmatched bindings with nulls, rejects unshared groups") {
    val g = graph(
      ("t1", "partOf", "c1", 0L), ("t2", "partOf", "c1", 0L),
      ("t1", "tool", "grep", 2L))
    val got = bgpOptional(g,
      Seq(TriplePattern(V("turn"), C("partOf"), V("conv"))),
      Seq(Seq(TriplePattern(V("turn"), C("tool"), V("tl")))))
      .collect().map(r => r.getAs[String]("turn") -> Option(r.getAs[String]("tl"))).toMap
    assert(got == Map("t1" -> Some("grep"), "t2" -> None))
    assertThrows[IllegalArgumentException] {
      bgpOptional(g,
        Seq(TriplePattern(V("turn"), C("partOf"), V("conv"))),
        Seq(Seq(TriplePattern(V("x"), C("tool"), V("y")))))
    }
  }

  test("construct instantiates templates per binding, set semantics") {
    import spark.implicits._
    val bindings = Seq(("e1", "e2"), ("e1", "e3"), ("e1", "e2")).toDF("a", "b")
    val got = construct(bindings, Seq(
      (V("a"), C("linked"), V("b"), 0),
      (C("urn:meta"), C("derivedFrom"), V("a"), 0)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      ("e1", "linked", "e2", 0L), ("e1", "linked", "e3", 0L),
      ("urn:meta", "derivedFrom", "e1", 0L)))
  }

  test("bgpMinus removes compatible bindings; disjoint minus removes nothing") {
    val g = graph(
      ("c1", "mentions", "e1", 0L), ("c2", "mentions", "e2", 0L),
      ("t1", "partOf", "c1", 0L), ("t1", "usedTool", "grep", 2L))
    val got = bgpMinus(g,
      Seq(TriplePattern(V("conv"), C("mentions"), V("e"))),
      Seq(TriplePattern(V("turn"), C("partOf"), V("conv")),
        TriplePattern(V("turn"), C("usedTool"), V("tool"))))
      .collect().map(r => r.getAs[String]("conv")).toSet
    assert(got == Set("c2"))
    // minus side binds no shared variable -> SPARQL keeps everything
    val disjoint = bgpMinus(g,
      Seq(TriplePattern(V("conv"), C("mentions"), V("e"))),
      Seq(TriplePattern(V("x"), C("usedTool"), V("y"))))
      .collect().map(_.getAs[String]("conv")).toSet
    assert(disjoint == Set("c1", "c2"))
  }

  test("valuesJoin restricts to inline bindings, rejects unshared tables") {
    import spark.implicits._
    val g = graph(("t1", "role", "user", 2L), ("t2", "role", "assistant", 2L))
    val b = bgp(g, Seq(TriplePattern(V("turn"), C("role"), V("role"))))
    val got = valuesJoin(b, Seq("user", "moderator").toDF("role"))
      .collect().map(r => r.getAs[String]("turn") -> r.getAs[String]("role")).toSet
    assert(got == Set("t1" -> "user"))
    assertThrows[IllegalArgumentException] {
      valuesJoin(b, Seq("x").toDF("unrelated"))
    }
  }

  test("describe returns triples where the resource is subject OR object") {
    import spark.implicits._
    val g = graph(
      ("e1", "type", "Person", 0L), ("c1", "mentions", "e1", 0L),
      ("c2", "mentions", "e2", 0L))
    val got = KgQuery.describe(g, Seq("e1").toDF("r"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("e1", "type", "Person"), ("c1", "mentions", "e1")))
  }

  test("pathEval: sequence composes, alternation unions, inverse swaps") {
    val g = graph(
      ("t1", "partOf", "c1", 0L), ("t2", "partOf", "c1", 0L),
      ("c1", "mentions", "e1", 0L), ("c1", "mentions", "e2", 0L),
      ("t1", "usedTool", "grep", 2L))
    def rel(p: Path) = pathEval(g, p).collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(rel(PathSeq(Seq(Pred("partOf"), Pred("mentions")))) ==
      Set("t1" -> "e1", "t1" -> "e2", "t2" -> "e1", "t2" -> "e2"))
    assert(rel(PathAlt(Seq(Pred("usedTool"), Pred("partOf")))) ==
      Set("t1" -> "grep", "t1" -> "c1", "t2" -> "c1"))
    assert(rel(Inv(Pred("partOf"))) == Set("c1" -> "t1", "c1" -> "t2"))
    // composition under inverse: who shares a conversation with t1
    assert(rel(PathSeq(Seq(Pred("partOf"), Inv(Pred("partOf"))))) ==
      Set("t1" -> "t1", "t1" -> "t2", "t2" -> "t1", "t2" -> "t2"))
    assertThrows[IllegalArgumentException](pathEval(g, PathSeq(Nil)))
    assertThrows[IllegalArgumentException](pathEval(g, PathAlt(Nil)))
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

  test("randomWalks emits valid, deterministic fixed-length walks") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")).toDF("src", "dst")
    val edgeSet = Set("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
      .flatMap { case (u, v) => Set(u -> v, v -> u) }
    val rows = KgQuery.randomWalks(e, walksPerNode = 2, walkLen = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    // every node starts exactly walksPerNode walks
    assert(rows.length == 4 * 2)
    rows.foreach { case (start, w, end, path) =>
      val hops = path.split(" ")
      assert(hops.length == 4, s"walk $path must have walkLen+1 nodes")
      assert(hops.head == start && hops.last == end)
      hops.sliding(2).foreach { p =>
        assert(edgeSet.contains(p(0) -> p(1)), s"$path uses non-edge ${p.toList}")
      }
      assert(w == 1L || w == 2L)
    }
    // bit-identical on re-evaluation
    val again = KgQuery.randomWalks(e, walksPerNode = 2, walkLen = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(rows.sorted.sameElements(again.sorted))
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
