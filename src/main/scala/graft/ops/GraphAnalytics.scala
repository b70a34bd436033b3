package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph analytics over the CONSTRUCTED knowledge graph — the analysis
 * layer a KG-construction engine feeds: entity co-mention edges, degree
 * centrality, and a fixed-iteration PageRank. (The reference stops at
 * serialization; these run on the extraction pipeline's own outputs.)
 *
 * Scale shape: PageRank is the canonical iterate-join-aggregate dataflow —
 * each iteration shuffles the edge list once on `src` (to attach ranks and
 * out-degrees) and once on `dst` (the contribution aggregate). At 10^8+
 * entities both joins hash-partition on the entity key and AQE handles the
 * celebrity-entity skew; iterations are UNROLLED to a fixed count (the
 * production convergence loop checkpoints between iterations instead —
 * lineage grows linearly and a 20-iteration chain of lazy plans would
 * otherwise recompute everything each action).
 *
 * Determinism (oracle-exact): the per-node contribution sum is a float
 * fold over incoming neighbors ORDERED BY source entity id (`aggregate`
 * over an `array_sort(collect_list(...))` here, `list_reduce(list(x ORDER
 * BY src))` in DuckDB), every division/multiply is exactly rounded in both
 * engines, and each iteration's rank is rounded to 6 dp so cross-iteration
 * drift cannot compound.
 */
object GraphAnalytics {

  /** Undirected co-mention edges: entity pairs mentioned in the same
    * conversation, `weight` = number of shared conversations. ONE
    * conv-keyed aggregate builds each conversation's sorted distinct
    * entity set (gazetteer-bounded, so the array is small by
    * construction), pairs expand NARROWLY from the array, and one hash
    * aggregate counts them — two exchanges where the previous
    * distinct + conv-keyed self-join + aggregate paid three. */
  def coMentionEdges(mentions: DataFrame): DataFrame = {
    val sets = mentions.select(col("conv_id"), col("entity_id"))
      .groupBy("conv_id")
      .agg(sort_array(collect_set(col("entity_id"))).as("es"))
    val pairs = flatten(transform(col("es"), (x, i) =>
      transform(slice(col("es"), i + lit(2), size(col("es"))),
        y => struct(x.as("a"), y.as("b")))))
    sets.select(explode(pairs).as("pr"))
      .groupBy(col("pr.a").as("entity_a"), col("pr.b").as("entity_b"))
      .agg(count(lit(1)).as("weight"))
  }

  /**
   * Fixed-iteration PageRank (damping `d`, `iters` unrolled iterations)
   * over the undirected co-mention graph. Every node of the edge graph has
   * degree ≥ 1 by construction (isolated entities never enter the edge
   * list), so there is no dangling-mass term. Returns
   * (entity_id, degree, pagerank).
   */
  /**
   * @param deterministic true (default) keeps the oracle-exact ORDERED
   *        contribution fold: `array_sort(collect_list(...))` materializes
   *        every incoming contribution of a node as ONE array in ONE row —
   *        fine on a gazetteer-bounded entity domain, an executor OOM on a
   *        celebrity node of a 10^8-entity production graph. false is the
   *        production mode: a plain `sum()` (partial map-side aggregation,
   *        no per-node array, hot nodes collapse before the exchange) whose
   *        float-order nondeterminism is the standard, accepted PageRank
   *        behavior. Both modes agree to ~1e-6 (each iteration rounds to
   *        6 dp, which also stops cross-iteration drift from compounding).
   */
  def pageRank(edges: DataFrame, iters: Int = 3, d: Double = 0.85,
               deterministic: Boolean = true): DataFrame = {
    // dir and deg are referenced by EVERY unrolled iteration (plus the
    // final join): pin them lazily so the symmetrize/degree passes run
    // once — unpinned, iteration i replayed them i times over
    val dir = edges.select(col("entity_a").as("src"), col("entity_b").as("dst"))
      .unionByName(edges.select(col("entity_b").as("src"), col("entity_a").as("dst")))
      .localCheckpoint(false)
    val deg = dir.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    // node count rides the plan as a broadcast 1-row aggregate
    val nn = deg.agg(count(lit(1)).as("n"))
    var pr = deg.select(col("src").as("id"))
      .crossJoin(broadcast(nn))
      .select(col("id"), round(lit(1.0) / col("n"), 6).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = dir
        .join(pr, dir("src") === pr("id")).drop("id")
        .join(deg, Seq("src"))
        .select(col("dst"), col("src"), (col("pr") / col("deg")).as("c"))
      // no checkpoint here: pr is referenced exactly once per iteration,
      // so the unrolled plan is linear and one action computes it once
      // (BFS below is the contrast case — its iterate is referenced twice)
      pr =
        (if (deterministic)
          contrib.groupBy("dst")
            .agg(array_sort(collect_list(struct(col("src"), col("c")))).as("parts"))
            .select(col("dst"), aggregate(col("parts"), lit(0.0),
              (acc, x) => acc + x.getField("c")).as("csum"))
        else
          contrib.groupBy("dst").agg(sum(col("c")).as("csum")))
        .crossJoin(broadcast(nn))
        .select(col("dst").as("id"),
          round(lit(1.0 - d) / col("n") + lit(d) * col("csum"), 6).as("pr"))
    }
    pr.join(deg, pr("id") === deg("src"))
      .select(col("id").as("entity_id"), col("deg").as("degree"),
        col("pr").as("pagerank"))
  }

  /**
   * Per-node triangle count + local clustering coefficient over the
   * undirected co-mention graph — the standard graph-quality signal
   * (community density, spam-ring detection) computed the standard
   * scalable way: DEGREE-ORDERED edge orientation. Every edge is oriented
   * from its (degree, id)-smaller endpoint; wedges are enumerated only
   * between two out-edges of the same source and closed against the
   * oriented edge list — each triangle is found exactly once, and the
   * wedge count is Σ outdeg(v)² with outdeg bounded by O(√|E|) under this
   * orientation (the celebrity node's edges point INTO it, so its millions
   * of neighbors never pair up). Two self-joins on the edge key + one hash
   * aggregate; the (degree, id) tiebreak keeps the orientation — and so
   * the plan — fully deterministic.
   */
  /**
   * PMI / NPMI association strength for co-mention edges — the standard
   * graph-construction refinement over raw co-occurrence counts (raw
   * counts make stop-entity hubs look important; PMI normalizes by both
   * endpoints' marginals). Event space = conversations: p(a) = n_a/N over
   * distinct convs mentioning a, p(a,b) = n_ab/N over convs mentioning
   * both. One distinct + two keyed aggregates + a conv-keyed self-join —
   * the marginals join back as a broadcast-sized dimension (entity
   * cardinality = gazetteer size).
   *
   * Determinism: all inputs are integer counts; `ln` of exact integer
   * ratios, rounded to 6 dp (NPMI divides two such logs before rounding).
   */
  def pmiEdges(mentions: DataFrame): DataFrame = {
    // referenced four times (total, marginals, both self-join sides):
    // pin the distinct frame so the dedup shuffle runs once
    val cm = mentions.select(col("conv_id"), col("entity_id")).distinct()
      .localCheckpoint(false)
    val nTotal = cm.select(col("conv_id")).distinct().agg(count(lit(1)).as("n"))
    val marg = cm.groupBy("entity_id").agg(count(lit(1)).as("n_e"))
    val a = cm.select(col("conv_id"), col("entity_id").as("entity_a"))
    val b = cm.select(col("conv_id"), col("entity_id").as("entity_b"))
    a.join(b, Seq("conv_id"))
      .where(col("entity_a") < col("entity_b"))
      .groupBy("entity_a", "entity_b")
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(marg.select(col("entity_id").as("entity_a"), col("n_e").as("n_a"))), Seq("entity_a"))
      .join(broadcast(marg.select(col("entity_id").as("entity_b"), col("n_e").as("n_b"))), Seq("entity_b"))
      .crossJoin(broadcast(nTotal))
      .select(col("entity_a"), col("entity_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(log(col("n_ab").cast("double") * col("n") /
          (col("n_a").cast("double") * col("n_b"))), 6).as("pmi"),
        // p(a,b) = 1 makes the NPMI normalizer -ln(1) = 0; the
        // perfect-co-occurrence convention is npmi = 1
        when(col("n_ab") === col("n"), lit(1.0))
          .otherwise(round(log(col("n_ab").cast("double") * col("n") /
            (col("n_a").cast("double") * col("n_b"))) /
            -log(col("n_ab").cast("double") / col("n")), 6)).as("npmi"))
  }

  /**
   * Temporal KG: per-entity mention timeline — first/last mention
   * timestamp, mention-row and hit counts, distinct conversations, and
   * activity span. The provenance join (mentions back to turns on
   * (conv_id, turn_idx)) plus ONE entity-keyed aggregate; everything is
   * integer microseconds, so the row hash is exact by construction.
   */
  def entityTimelines(mentions: DataFrame, turns: DataFrame): DataFrame =
    mentions.select(col("conv_id"), col("turn_idx"), col("entity_id"), col("n_hits"))
      .join(turns.select(col("conv_id"), col("turn_idx"),
        unix_micros(col("ts").cast("timestamp")).as("tus")), Seq("conv_id", "turn_idx"))
      .groupBy("entity_id")
      .agg(
        min(col("tus")).as("first_us"),
        max(col("tus")).as("last_us"),
        count(lit(1)).as("n_mentions"),
        sum(col("n_hits")).cast("long").as("n_hits"),
        countDistinct(col("conv_id")).as("n_convs"),
        (max(col("tus")) - min(col("tus"))).as("span_us"))

  /**
   * Synchronous label propagation (community detection) — `iters` unrolled
   * rounds over the weighted undirected co-mention graph. Every node
   * starts labeled with its own id; each round it adopts the label with
   * the highest incident edge-weight sum among its neighbors, ties broken
   * by the SMALLER label — a fully deterministic argmax (`min` over
   * `struct(-w, label)`), integer arithmetic only, so the result is
   * oracle-exact with no float anywhere.
   *
   * Scale shape: per round, one `dst`-keyed join to attach neighbor labels
   * and two hash aggregates ((node, label) weight sum with map-side
   * combine, then the per-node argmax) — the same iterate-join-aggregate
   * dataflow as PageRank, hash-partitioned on the entity key, AQE handling
   * celebrity-entity skew. Returns (entity_id, community, community_size).
   */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    // referenced by every unrolled round + the seed-label distinct: pin so
    // the symmetrize pass runs once
    val dir = edges.select(col("entity_a").as("src"), col("entity_b").as("dst"), col("weight"))
      .unionByName(edges.select(col("entity_b").as("src"), col("entity_a").as("dst"), col("weight")))
      .localCheckpoint(false)
    var labels = dir.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      labels = dir
        .join(labels, dir("dst") === labels("id")).drop("id")
        .groupBy(col("src"), col("label"))
        .agg(sum(col("weight")).as("w"))
        .groupBy(col("src"))
        .agg(min(struct((-col("w")).as("nw"), col("label"))).as("top"))
        .select(col("src").as("id"), col("top.label").as("label"))
    }
    // the final frame is referenced twice below (sizes + join) and up to
    // three more times by modularity(); without pinning, every reference
    // re-executes the whole unrolled iterate (measured: q_kg_modularity
    // replayed the 3-round LPA per reference). The frame is nodes-sized;
    // the checkpoint is LAZY so no extra blocking job is launched — the
    // first action materializes it once and later references hit the cache.
    labels = labels.localCheckpoint(false)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select(col("id").as("entity_id"), col("label").as("community"),
        col("community_size"))
  }

  /**
   * Multi-source k-hop BFS: minimum hop distance from any seed node,
   * `iters` unrolled Bellman-Ford relaxation rounds (nodes further than
   * `iters` hops are absent). Per round one `src`-keyed join + one min
   * aggregate — integer distances, deterministic by construction. The
   * production variant checkpoints the frontier between rounds; unrolling
   * matches the fixed-depth neighborhood-expansion query (entity context
   * windows for KG-grounded retrieval).
   */
  def bfsDistance(edges: DataFrame, seedPred: Column, iters: Int = 4): DataFrame = {
    // referenced by every relaxation round + the node set: pin once
    val dir = edges.select(col("entity_a").as("src"), col("entity_b").as("dst"))
      .unionByName(edges.select(col("entity_b").as("src"), col("entity_a").as("dst")))
      .localCheckpoint(false)
    val nodes = dir.select(col("src").as("id")).distinct()
    var dist = nodes.where(seedPred).select(col("id"), lit(0L).as("dist"))
    for (_ <- 1 to iters) {
      val relaxed = dir.join(dist, dir("src") === dist("id"))
        .select(col("dst").as("id"), (col("dist") + 1).as("dist"))
      // each round references the previous frontier TWICE (carry + expand):
      // unchecked that doubles the replayed lineage per round (2^iters);
      // localCheckpoint pins each round's result instead. LAZY: an eager
      // checkpoint blocked on one job per round — the lazy chain
      // materializes every round exactly once inside the final action.
      dist = dist.unionByName(relaxed)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
    }
    dist.select(col("id").as("entity_id"), col("dist"))
  }

  /**
   * k-core peeling, `rounds` unrolled rounds: repeatedly remove nodes with
   * degree < k and recount — the standard dense-subgraph / spam-ring
   * filter. A fixpoint needs O(degeneracy) rounds; a fixed unroll is the
   * bounded-latency batch variant (the survivors after R rounds are a
   * superset of the true k-core, equal once a round removes nothing).
   * Each round is one aggregate + two semi-joins on the entity key;
   * integer degrees only. The per-round localCheckpoint pins the shrinking
   * edge set — the surviving-edge frame is referenced twice per round
   * (degree count + semi-join) and feeds every later round.
   */
  def kCore(edges: DataFrame, k: Int = 2, rounds: Int = 4): DataFrame = {
    // lazy checkpoints: each round's surviving-edge frame is pinned (it is
    // referenced three times — degree count + both semi-joins — and feeds
    // every later round) but materialized only once, inside the final
    // action, instead of one blocking job per round
    var e = edges.select(col("entity_a"), col("entity_b")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val deg = e.select(col("entity_a").as("u"))
        .unionByName(e.select(col("entity_b").as("u")))
        .groupBy("u").agg(count(lit(1)).as("deg"))
      // keep is referenced by both semi-joins: pin the nodes-sized frame
      // so the degree aggregate runs once per round
      val keep = deg.where(col("deg") >= k).select(col("u")).localCheckpoint(false)
      e = e
        .join(keep.select(col("u").as("entity_a")), Seq("entity_a"), "leftsemi")
        .join(keep.select(col("u").as("entity_b")), Seq("entity_b"), "leftsemi")
        .localCheckpoint(false)
    }
    e.select(col("entity_a").as("u"))
      .unionByName(e.select(col("entity_b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("kcore_degree"))
      .select(col("u").as("entity_id"), col("kcore_degree"))
  }

  /**
   * Structural node similarity — common-neighbor Jaccard over the
   * undirected graph: for every node pair sharing ≥1 neighbor,
   * |N(a)∩N(b)| / |N(a)∪N(b)|. The entity-resolution / link-prediction
   * primitive (two entities that co-occur with the same third entities
   * are candidates for merging or for a missing edge).
   *
   * Shape at 100 TB: candidate pairs come from ONE self-join keyed on the
   * shared neighbor — only pairs with an actual common neighbor are ever
   * materialized (never all-pairs). The known hot spot is a hub neighbor
   * (deg² pair blowup through one key); production mitigation is a degree
   * cap on the join's build side (drop hubs above a percentile — they
   * carry no discriminative signal for similarity) or the KMV
   * neighborhood-sketch estimate ([[Sketches.kmvSketch]]); the testdata
   * graph needs neither. Degrees ride back on two keyed joins against the
   * (nodes-sized) degree frame.
   *
   * Determinism: `dir` holds distinct (node, neighbor) rows by
   * construction, so every count is an exact integer; jaccard is one
   * rounded division.
   */
  /**
   * @param hubDegreeCap production guard for the deg² wedge blowup through
   *        a hub neighbor: wedges are only enumerated through shared
   *        neighbors whose degree is ≤ the cap (a celebrity entity shared
   *        by millions of nodes carries no discriminative similarity
   *        signal, and its pair fan-out is quadratic). None (default)
   *        enumerates every wedge — the oracle-exact mode.
   */
  def nodeSimilarity(edges: DataFrame, hubDegreeCap: Option[Long] = None): DataFrame = {
    // referenced three times (degree pass + both wedge-join sides): pin
    val dir = edges.select(col("entity_a").as("u"), col("entity_b").as("n"))
      .unionByName(edges.select(col("entity_b").as("u"), col("entity_a").as("n")))
      .localCheckpoint(false)
    val deg = dir.groupBy("u").agg(count(lit(1)).as("deg"))
    val wedgeSrc = hubDegreeCap match {
      case Some(cap) => dir.join(
        deg.where(col("deg") <= cap).select(col("u").as("n")), Seq("n"), "leftsemi")
      case None => dir
    }
    val pairs = wedgeSrc.as("x").join(wedgeSrc.as("y"),
        col("x.n") === col("y.n") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("entity_a"), col("y.u").as("entity_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(deg.select(col("u").as("entity_a"), col("deg").as("deg_a")), Seq("entity_a"))
      .join(deg.select(col("u").as("entity_b"), col("deg").as("deg_b")), Seq("entity_b"))
      .select(col("entity_a"), col("entity_b"), col("common"),
        col("deg_a"), col("deg_b"),
        round(col("common").cast("double") /
          (col("deg_a") + col("deg_b") - col("common")).cast("double"), 6)
          .as("jaccard"))
  }

  /**
   * Per-community Newman modularity contribution — the quality score for a
   * community assignment (e.g. [[labelPropagation]]'s): for community c,
   * Q_c = e_c/m − (d_c/2m)², where e_c = intra-community edges, d_c = the
   * community's degree mass, m = total edges. Positive Q_c means denser
   * than the random-graph expectation; the sum over communities is the
   * global modularity.
   *
   * Shape at 100 TB: two label joins on the edge list (entity-keyed) + two
   * community-keyed aggregates; m rides as a 1-row broadcast. No
   * per-community sequences, so a giant community costs nothing special.
   *
   * Determinism: e_c, d_c, m are integers; each contribution is one
   * rounded expression over them (per-row — the global sum is left to the
   * reader precisely because a cross-row float fold would need an order
   * pin).
   */
  def modularity(edges: DataFrame, labelsIn: DataFrame): DataFrame = {
    // `labels` is referenced three times (two edge-endpoint joins + the
    // degree rollup); pin it (lazily — no extra blocking job) so an
    // expensive upstream assignment (e.g. labelPropagation's unrolled
    // iterate) is computed once, not thrice. The frame is nodes-sized,
    // so the checkpoint is cheap at any scale.
    val labels = labelsIn.localCheckpoint(false)
    val e = edges.select(col("entity_a"), col("entity_b"))
    val m = e.agg(count(lit(1)).as("m"))
    val intra = e
      .join(labels.select(col("entity_id").as("entity_a"), col("community").as("ca")),
        Seq("entity_a"))
      .join(labels.select(col("entity_id").as("entity_b"), col("community").as("cb")),
        Seq("entity_b"))
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("intra_edges"))
    val deg = e.select(col("entity_a").as("u"))
      .unionByName(e.select(col("entity_b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
    val dsum = deg
      .join(labels.select(col("entity_id").as("u"), col("community")), Seq("u"))
      .groupBy("community")
      .agg(sum("deg").as("degree_sum"), count(lit(1)).as("n_nodes"))
    val halfMass = col("degree_sum").cast("double") / (lit(2L) * col("m")).cast("double")
    dsum.join(intra, Seq("community"), "left").crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        round(coalesce(col("intra_edges"), lit(0L)).cast("double") /
          col("m").cast("double") - halfMass * halfMass, 6).as("q_contrib"))
  }

  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("entity_a"), col("entity_b"))
    // deg is referenced four times (two orientation joins + the final
    // left join), ori three times (both wedge sides + the closing join):
    // pin both so the degree pass and the orientation run once each
    val deg = e.select(col("entity_a").as("u"))
      .unionByName(e.select(col("entity_b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val withDeg = e
      .join(deg.select(col("u").as("entity_a"), col("deg").as("da")), Seq("entity_a"))
      .join(deg.select(col("u").as("entity_b"), col("deg").as("db")), Seq("entity_b"))
    val lower = struct(col("da"), col("entity_a")) < struct(col("db"), col("entity_b"))
    val ori = withDeg.select(
      when(lower, col("entity_a")).otherwise(col("entity_b")).as("u"),
      when(lower, col("entity_b")).otherwise(col("entity_a")).as("v"),
      when(lower, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint(false)
    val e1 = ori.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val e2 = ori.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = e1.join(e2, Seq("u"))
      .where(struct(col("dv1"), col("v1")) < struct(col("dv2"), col("v2")))
    val tris = wedges.join(ori.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tris
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, deg("u") === perNode("id"), "left")
      .select(col("u").as("entity_id"), col("deg").cast("long").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("deg") * (col("deg") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
