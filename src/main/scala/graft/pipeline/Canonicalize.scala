package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Entity canonicalization via connected components over candidate-link
 * edges (BASELINE.json north_star stage T4): union-find expressed as the
 * alternating large-star / small-star DataFrame algorithm (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
 * rounds, no driver-side state, no RDDs (SURVEY §2.3: pure-DataFrame CC
 * preferred over RDD-based GraphX).
 *
 * Scale properties:
 *  - each round is two self-join + aggregate stages; AQE's partial
 *    aggregation absorbs hub-node skew map-side, and `localCheckpoint`
 *    truncates lineage so round N doesn't replay rounds 1..N-1;
 *  - convergence is detected by a one-row fingerprint aggregate
 *    (count + sum of edge hashes), not a full `except` anti-join;
 *  - hot-entity skew in the upstream edge *construction* is handled in
 *    Extraction.linkEdges; here star-shaped intermediate graphs are the
 *    algorithm's own design (large-star caps any node's degree growth).
 */
object Canonicalize {

  /**
   * @param edges DataFrame with string columns (entity_a, entity_b)
   * @param nodes DataFrame with column entity_id (covers isolated entities)
   * @return (entity_id, canonical_id) — canonical = min entity id in the component
   */
  /**
   * Entry point with a size-adaptive strategy: entity-link graphs are
   * usually dimension-sized (bounded by the gazetteer), and a driver-side
   * union-find on a collected edge list costs microseconds where the
   * distributed algorithm pays ~10 scheduled jobs of fixed latency. Above
   * `driverThreshold` edges it switches to the shuffle-based
   * large-star/small-star — the 10^8-node path.
   */
  def connectedComponents(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
                          maxIter: Int = 25, driverThreshold: Long = 200000L): DataFrame = {
    import spark.implicits._
    val collected = edges
      .select(col("entity_a").as("u"), col("entity_b").as("v"))
      .limit((driverThreshold + 1).toInt).collect()
    // the gate covers BOTH inputs: a sparse edge set over a production-scale
    // entity dimension (10^6-10^8 aliases) must not pull every node id to
    // the driver — limit+collect bounds the probe itself
    val nodeIds =
      if (collected.length <= driverThreshold)
        nodes.select(col("entity_id")).distinct()
          .limit((driverThreshold + 1).toInt).as[String].collect()
      else Array.empty[String]
    if (collected.length <= driverThreshold && nodeIds.length <= driverThreshold) {
      val parent = scala.collection.mutable.HashMap.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      def union(a: String, b: String): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      collected.foreach(r => union(r.getString(0), r.getString(1)))
      nodeIds.map(n => (n, find(n))).toSeq.toDF("entity_id", "canonical_id")
    } else {
      distributedComponents(spark, edges, nodes, maxIter)
    }
  }

  /** Shuffle-based large-star/small-star CC (the at-scale path). */
  def distributedComponents(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
                            maxIter: Int = 25): DataFrame = {
    var e = edges
      .select(col("entity_a").as("u"), col("entity_b").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    def symmetric(d: DataFrame): DataFrame =
      d.union(d.select(col("v").as("u"), col("u").as("v")))

    def largeStar(d: DataFrame): DataFrame = {
      val sym = symmetric(d)
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(d: DataFrame): DataFrame = {
      val directed = symmetric(d).where(col("v") < col("u"))
      val mins = directed.groupBy("u").agg(min("v").as("mn"))
      val relinked = directed.join(mins, "u")
        .select(col("v").as("u"), col("mn").as("v"))
        .union(mins.select(col("u"), col("mn").as("v")))
      relinked.where(col("u") =!= col("v")).distinct()
    }

    def fingerprint(d: DataFrame): (Long, Long) = {
      // bit_xor: order-independent and overflow-free under ANSI arithmetic
      val row = d.agg(
        count(lit(1)).as("c"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
      (row.getLong(0), row.getLong(1))
    }

    var fp = fingerprint(e)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      e = next
      iter += 1
    }

    // after convergence e is a star forest: u -> root. Map every node.
    val assign = symmetric(e)
      .groupBy("u").agg(min("v").as("root"))
      .select(col("u").as("entity_id"),
        least(col("u"), col("root")).as("canonical_id"))
    nodes.select(col("entity_id")).distinct()
      .join(assign, Seq("entity_id"), "left")
      .select(col("entity_id"),
        coalesce(col("canonical_id"), col("entity_id")).as("canonical_id"))
  }
}
