package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Connected components vs an in-test BFS oracle, on seeded random graphs. */
class CanonicalizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bfsComponents(nodes: Seq[String], edges: Seq[(String, String)]): Map[String, String] = {
    val adj = scala.collection.mutable.HashMap.empty[String, List[String]]
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val comp = scala.collection.mutable.HashMap.empty[String, String]
    nodes.foreach { n =>
      if (!comp.contains(n)) {
        val members = scala.collection.mutable.ArrayBuffer(n)
        val queue = scala.collection.mutable.Queue(n)
        val seen = scala.collection.mutable.HashSet(n)
        while (queue.nonEmpty) {
          adj.getOrElse(queue.dequeue(), Nil).foreach { nb =>
            if (seen.add(nb)) { members += nb; queue += nb }
          }
        }
        val root = members.min
        members.foreach(mm => comp(mm) = root)
      }
    }
    comp.toMap
  }

  private def check(nNodes: Int, nEdges: Int, seed: Long, forceDistributed: Boolean): Unit = {
    import spark.implicits._
    val rnd = new Random(seed)
    val nodes = (0 until nNodes).map(i => f"n$i%04d")
    val edges = Seq.fill(nEdges)((nodes(rnd.nextInt(nNodes)), nodes(rnd.nextInt(nNodes))))
      .filter { case (a, b) => a != b }
    val edgesDf = edges.toDF("entity_a", "entity_b")
    val nodesDf = nodes.toDF("entity_id")
    val got =
      (if (forceDistributed)
         Canonicalize.distributedComponents(spark, edgesDf, nodesDf)
       else Canonicalize.connectedComponents(spark, edgesDf, nodesDf))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = bfsComponents(nodes, edges)
    assert(got == expected, s"seed=$seed distributed=$forceDistributed")
  }

  test("driver union-find fast path matches BFS oracle on random graphs") {
    Seq(1L, 2L, 3L).foreach(s => check(nNodes = 200, nEdges = 150, seed = s, forceDistributed = false))
  }

  test("distributed large-star/small-star matches BFS oracle on random graphs") {
    // sparse (many components), dense (one giant component), chain-heavy
    check(nNodes = 120, nEdges = 60, seed = 11L, forceDistributed = true)
    check(nNodes = 60, nEdges = 200, seed = 12L, forceDistributed = true)
    check(nNodes = 100, nEdges = 99, seed = 13L, forceDistributed = true)
  }

  test("node-count gate: sparse edges over a big node dimension take the distributed path") {
    import spark.implicits._
    // 3 edges but 50 nodes with driverThreshold=10: the edge probe passes
    // but the node probe must reject the driver path (a production entity
    // dimension with sparse links would otherwise collect 10^8 ids)
    val nodes = (0 until 50).map(i => f"g$i%03d")
    val edges = Seq(("g000", "g001"), ("g001", "g002"), ("g010", "g011"))
    val got = Canonicalize.connectedComponents(spark,
      edges.toDF("entity_a", "entity_b"), nodes.toDF("entity_id"),
      driverThreshold = 10L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = bfsComponents(nodes, edges)
    assert(got == expected)
    assert(got.size == 50) // isolated nodes all present, self-canonical
  }

  test("long path graph converges (worst case for min-propagation, fine for star algorithm)") {
    import spark.implicits._
    val nodes = (0 until 64).map(i => f"p$i%03d")
    val edges = nodes.sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Canonicalize.distributedComponents(spark,
      edges.toDF("entity_a", "entity_b"), nodes.toDF("entity_id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.values.toSet == Set("p000"))
  }
}
