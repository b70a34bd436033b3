package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Declarative query operators over the CONSTRUCTED knowledge graph — the
 * SPARQL-shaped surface a triple store grows once construction works:
 * basic-graph-pattern matching, VoID-style dataset statistics, bounded
 * transitive closure (RDFS-style materialization), and KG-embedding
 * negative sampling. (The reference stops at COUNT/ASK/SELECT-LIMIT over a
 * store — `persistence_systems.py` in `/root/reference/rdfx/` wraps
 * rdflib's `query`/SPARQL surface;
 * these re-express the query layer as Spark dataflow over the graph table.)
 *
 * Scale shape: a triple table at 10^11 rows is the canonical self-join
 * workload. Every pattern scan filters its constants FIRST (Catalyst pushes
 * the `p = <iri>` predicates into the parquet scan of a materialized graph
 * table), each join keys on the shared variable(s) and hash-partitions on
 * them, and AQE's skew handling covers celebrity subjects. Pattern order is
 * the caller's selectivity hint — a cost-based reorder belongs in a
 * Catalyst rule once table statistics exist, not in the evaluator.
 */
object KgQuery {

  /** A term in a triple pattern: either a variable (projected, joinable)
    * or an IRI/literal constant (filtered at the scan). */
  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(value: String) extends Term

  /** One `?s ?p ?o` pattern over the graph's (s, p, o) columns. */
  final case class TriplePattern(s: Term, p: Term, o: Term)

  /**
   * Evaluate a basic graph pattern (conjunctive triple-pattern query) over
   * a set-semantics graph table, SPARQL-style: each pattern binds its
   * variables against the graph, patterns join on shared variables, and
   * the result is one row per distinct binding of all variables.
   *
   * Evaluation is a left fold in caller order: constants become scan
   * predicates (pushed down), a variable repeated WITHIN one pattern
   * becomes an equality filter, and consecutive frames join on the
   * intersection of bound variables (a pattern sharing no variable with
   * the prefix is a genuine cross product — allowed, as in SPARQL, but
   * the caller should order patterns so it never happens by accident).
   */
  /**
   * @param distinctSPO caller asserts the graph is distinct at (s, p, o)
   *        grain (set semantics per triple, not just per (s, p, o, kind)).
   *        Then EVERY single-pattern projection is already distinct — each
   *        of the three positions is either an equality-filtered constant
   *        or equal to a projected variable, so the projection is injective
   *        on graph rows — and the per-pattern dedup exchange is skipped
   *        (one shuffle saved per pattern; guide §2.4 "a distinct on data
   *        that is already unique").
   */
  def bgp(graph: DataFrame, patterns: Seq[TriplePattern],
          distinctSPO: Boolean = false): DataFrame = {
    require(patterns.nonEmpty, "empty basic graph pattern")
    def one(tp: TriplePattern): DataFrame = {
      val binds = Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)
      var df = graph.select(col("s"), col("p"), col("o"))
      binds.foreach {
        case (c, C(v)) => df = df.where(col(c) === v)
        case _         => ()
      }
      val varCols = binds.collect { case (c, V(n)) => (c, n) }
      require(varCols.nonEmpty, "pattern with no variables — use an ASK instead")
      // ?x p ?x — both positions must carry the same binding
      varCols.groupBy(_._2).valuesIterator.filter(_.size > 1).foreach { g =>
        val cs = g.map(_._1)
        cs.tail.foreach(c => df = df.where(col(cs.head) === col(c)))
      }
      val names = varCols.map(_._2).distinct
      val first = varCols.groupBy(_._2).map { case (n, g) => (n, g.head._1) }
      // set semantics per pattern: a projection onto the variable positions
      // may collapse rows — unless the graph is distinct at (s, p, o) grain,
      // in which case the projection is injective (see distinctSPO above)
      val proj = df.select(names.map(n => col(first(n)).as(n)): _*)
      if (distinctSPO) proj else proj.dropDuplicates(names)
    }
    patterns.map(one).reduceLeft { (acc, next) =>
      val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq.sorted
      if (shared.nonEmpty) acc.join(next, shared) else acc.crossJoin(next)
    }
  }

  /**
   * SPARQL OPTIONAL: evaluate the required BGP, then left-join each
   * optional pattern GROUP on its shared variables — bindings that match
   * the optional side carry its variables, the rest carry nulls (never
   * dropped). Each group is itself a BGP (its patterns must hold
   * together). Mirrors SPARQL's left-outer-join algebra for the common
   * well-designed-pattern case (every optional group shares at least one
   * variable with the required part — enforced, because an unshared
   * optional is a cross product that silently multiplies bindings).
   */
  def bgpOptional(graph: DataFrame, required: Seq[TriplePattern],
                  optional: Seq[Seq[TriplePattern]],
                  distinctSPO: Boolean = false): DataFrame =
    optional.foldLeft(bgp(graph, required, distinctSPO)) { (acc, group) =>
      val opt = bgp(graph, group, distinctSPO)
      val shared = acc.columns.toSet.intersect(opt.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"optional group ${group.mkString(", ")} shares no variable with the required pattern")
      acc.join(opt, shared, "left_outer")
    }

  /**
   * SPARQL CONSTRUCT: instantiate template triples from every binding row
   * — the enrichment loop of a KG pipeline (derive new edges from query
   * results and write them back into the graph). Template positions are
   * either variables (looked up in the bindings) or constants; `oKind` is
   * per-template. Output is set-semantics (s, p, o, o_kind), union-merged
   * across templates, ready for [[graft.rdf.GraphOps]] / catalog append.
   */
  def construct(bindings: DataFrame,
                templates: Seq[(Term, Term, Term, Int)]): DataFrame = {
    require(templates.nonEmpty, "CONSTRUCT with no template")
    def term(t: Term): Column = t match {
      case V(n) => col(n)
      case C(v) => lit(v)
    }
    templates.map { case (s, p, o, kind) =>
      bindings.select(term(s).as("s"), term(p).as("p"), term(o).as("o"),
        lit(kind.toLong).as("o_kind"))
    }.reduceLeft(_ unionByName _).dropDuplicates("s", "p", "o", "o_kind")
  }

  /**
   * SPARQL MINUS: remove from the required bindings every row that is
   * compatible (equal on the shared variables) with some binding of the
   * minus-side BGP — an anti-join on the shared variables. Per the SPARQL
   * algebra, a minus group sharing NO variable with the required side
   * removes nothing (disjoint domains are never "compatible"), so that
   * case returns the required bindings unchanged rather than erroring —
   * the one place MINUS and FILTER NOT EXISTS genuinely differ.
   *
   * Scale shape: one left-anti hash join keyed on the shared variables;
   * the minus side is projected to exactly those variables and
   * deduplicated first, so the anti-join's build input is as small as the
   * distinct key set.
   */
  def bgpMinus(graph: DataFrame, required: Seq[TriplePattern],
               minusGroup: Seq[TriplePattern],
               distinctSPO: Boolean = false): DataFrame = {
    val req = bgp(graph, required, distinctSPO)
    val mns = bgp(graph, minusGroup, distinctSPO)
    val shared = req.columns.toSet.intersect(mns.columns.toSet).toSeq.sorted
    if (shared.isEmpty) req
    else req.join(mns.select(shared.map(col): _*).dropDuplicates(shared),
      shared, "left_anti")
  }

  /**
   * SPARQL VALUES: constrain (and optionally extend) a binding frame with
   * an inline table of bindings — an inner join on the variables the two
   * sides share. The values table is caller-provided data, not a graph
   * pattern, which is exactly VALUES' role in federation and
   * parameterized queries. It is dimension-sized by definition, so it
   * broadcasts; rows are deduplicated first (VALUES is bag-semantics in
   * SPARQL, but this layer is set-semantics throughout, like [[bgp]]).
   */
  def valuesJoin(bindings: DataFrame, values: DataFrame): DataFrame = {
    val shared = bindings.columns.toSet.intersect(values.columns.toSet).toSeq.sorted
    require(shared.nonEmpty, "VALUES block shares no variable with the pattern")
    bindings.join(broadcast(values.dropDuplicates()), shared)
  }

  /**
   * SPARQL DESCRIBE (concise symmetric description): every triple whose
   * subject OR object is in the resource set — the "show me everything
   * about these IRIs" query an entity page or a debugging session issues.
   *
   * The resource set is one column, distinct, and assumed dimension-sized
   * (a DESCRIBE of 10^9 resources is a full graph export, not a query) —
   * it broadcasts into two semi-joins (one keyed on s, one on o; an OR
   * join predicate would force a nested loop), unioned with set semantics.
   */
  def describe(graph: DataFrame, resources: DataFrame): DataFrame = {
    val r = broadcast(
      resources.select(col(resources.columns.head).as("_r")).distinct())
    graph.join(r, col("s") === col("_r"), "left_semi")
      .unionByName(graph.join(r, col("o") === col("_r"), "left_semi"))
      // dedup on EVERY carried column: the two semi-join branches overlap
      // (a triple whose s and o are both described), but two graph rows
      // that differ only in a non-(s,p,o) column (e.g. o_kind) are
      // distinct rows and must both survive
      .dropDuplicates(graph.columns)
  }

  /**
   * VoID-style dataset statistics (the W3C "Vocabulary of Interlinked
   * Datasets" per-property partition): for every predicate, triple count,
   * distinct subjects/objects, IRI-object count, and mean out-fanout —
   * the profile an ontology engineer (or a join planner) reads before
   * writing queries. One hash aggregate over the graph table; the two
   * COUNT DISTINCTs expand to the standard two-phase distinct aggregate.
   *
   * Determinism: counts are exact integers; the fanout divides two exact
   * integer-valued doubles (IEEE division exactly rounded) and rounds 6 dp.
   */
  def voidStats(graph: DataFrame): DataFrame =
    graph.groupBy("p").agg(
      count(lit(1)).as("n_triples"),
      countDistinct(col("s")).as("n_subjects"),
      countDistinct(col("o")).as("n_objects"),
      sum(when(col("o_kind") === 0, lit(1L)).otherwise(lit(0L))).as("n_iri_objects"),
      round(count(lit(1)).cast("double") / countDistinct(col("s")).cast("double"), 6)
        .as("avg_fanout"))

  /** SPARQL 1.1 property-path algebra (the non-recursive core): a path
    * denotes a binary relation over nodes. `p+`/`p*` recursion is
    * [[transitiveClosure]] over the path's relation. */
  sealed trait Path
  /** A single predicate step `p`. */
  final case class Pred(iri: String) extends Path
  /** Inverse path `^p` — follow the relation backwards. */
  final case class Inv(p: Path) extends Path
  /** Sequence `p1/p2/...` — relational composition. */
  final case class PathSeq(steps: Seq[Path]) extends Path
  /** Alternation `p1|p2|...` — union of relations. */
  final case class PathAlt(alts: Seq[Path]) extends Path

  /**
   * Evaluate a property path to its (src, dst) relation, set semantics.
   * Predicates scan with a pushed-down `p =` filter; inverse is a column
   * swap (free); alternation unions; sequence composes with one hash join
   * per `/` keyed on the meeting node — at a 10^11-triple scale each
   * step's relation stays partitioned on its join side and AQE handles
   * celebrity-node skew, same as [[bgp]] (which a path is sugar for when
   * every step is a plain predicate — this evaluator exists for `^`, `|`,
   * and composition under them, which BGP cannot express).
   */
  def pathEval(graph: DataFrame, path: Path,
               distinctSPO: Boolean = false): DataFrame = path match {
    case Pred(iri) =>
      // with a (s, p, o)-distinct graph the fixed-p projection is already
      // distinct — skip the dedup exchange (alternation/sequence below
      // still dedup: unions and compositions genuinely create duplicates)
      val scan = graph.where(col("p") === iri)
        .select(col("s").as("src"), col("o").as("dst"))
      if (distinctSPO) scan else scan.dropDuplicates("src", "dst")
    case Inv(p) =>
      pathEval(graph, p, distinctSPO)
        .select(col("dst").as("src"), col("src").as("dst"))
    case PathAlt(alts) =>
      require(alts.nonEmpty, "empty path alternation")
      alts.map(pathEval(graph, _, distinctSPO)).reduceLeft(_ unionByName _)
        .dropDuplicates("src", "dst")
    case PathSeq(steps) =>
      require(steps.nonEmpty, "empty path sequence")
      steps.map(pathEval(graph, _, distinctSPO)).reduceLeft { (acc, next) =>
        acc.join(next.select(col("src").as("_mid"), col("dst").as("_nd")),
          acc("dst") === col("_mid"))
          .select(acc("src"), col("_nd").as("dst")).dropDuplicates("src", "dst")
      }
  }

  /**
   * Minimum-hop transitive closure of a directed edge set — the engine of
   * RDFS materialization (`rdfs:subClassOf`+, `owl:TransitiveProperty`)
   * and SPARQL property paths (`p+`). Returns (src, dst, dist) with the
   * SHORTEST hop count per reachable pair.
   *
   * BFS-by-relaxation: each round extends every known path by one edge and
   * keeps the per-pair minimum. A pair first enters the frame at exactly
   * its shortest distance, so the loop stops when the pair set stops
   * growing (min distances are already final at that point). Rounds
   * shuffle once on the join key and once on the (src, dst) aggregate —
   * the same two-exchange iterate as PageRank — and each round's frame is
   * persisted then dropped, so lineage stays one round deep.
   *
   * `maxIters` bounds materialized path length: closure over a graph whose
   * diameter exceeds it is truncated (cyclic inputs are safe — revisited
   * pairs never improve the min and the pair set saturates).
   *
   * SCALE BOUND (round-7 note): the output materializes ALL reachable
   * (src, dst) pairs — on a dense graph that product is quadratic in the
   * reachable set no matter how the iteration is organized, because it IS
   * the answer. Semi-naive evaluation bounds the per-round WORK (frontier
   * × edges, new pairs only) but not the answer's size; at 100× scale,
   * restrict the edge set to predicate-filtered subgraphs (as q_kg_closure
   * does: partOf/mentions only, a DAG of depth 2), or use a frontier-only
   * BFS ([[graft.ops.GraphAnalytics.bfsDistance]]) when only distances
   * from given sources — not the full pair relation — are needed.
   */
  def transitiveClosure(edges: DataFrame, maxIters: Int = 10): DataFrame = {
    // SEMI-NAIVE evaluation (the standard datalog/BFS delta iterate): only
    // pairs DISCOVERED LAST ROUND extend by one edge, and only genuinely
    // new pairs enter the frame. A pair first appears at exactly its
    // minimum hop count (BFS level), so results are identical to the
    // naive re-aggregate — but each round joins the (shrinking) frontier
    // instead of every known path, and nothing re-aggregates the full
    // closure per round. Round cost: one frontier join + one candidate
    // dedup + one anti-join against the known set; the naive variant
    // shuffled and re-aggregated the ENTIRE path set every round.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).dropDuplicates("src", "dst")
      .persist(lvl)
    val hop = e.select(col("src").as("_hs"), col("dst").as("_hd"))
    var frontier = e.withColumn("dist", lit(1L)).persist(lvl)
    // no eager count of the seed frontier: an empty edge set just makes the
    // first round's join produce an empty fresh frame and the loop exits —
    // the only per-round driver action is an EMPTINESS probe (take(1),
    // short-circuits on the first row) rather than a full count; the
    // persisted frontier then materializes fully inside the next round's
    // join (or the caller's action), so no work is duplicated and the
    // per-round barrier cost is one row
    var exhausted = false
    var known = frontier
    var it = 1
    while (!exhausted && it < maxIters) {
      val grown = frontier.join(hop, frontier("dst") === col("_hs"))
        .select(frontier("src"), col("_hd").as("dst"), (col("dist") + 1L).as("dist"))
        .dropDuplicates("src", "dst")
      val fresh = grown.join(known, Seq("src", "dst"), "left_anti").persist(lvl)
      exhausted = fresh.isEmpty
      if (!exhausted) known = known.unionByName(fresh)
      frontier = fresh
      it += 1
    }
    known
  }

  /**
   * Deterministic random-walk corpus for DeepWalk/node2vec-style KG
   * embeddings: `walksPerNode` walks of length `walkLen` start at every
   * node of the (symmetrized) edge list; the "random" neighbor at each
   * step is the one ranked `md5(start#walk#step#current) mod degree` among
   * the current node's id-sorted neighbors. Zero RNG — the walk corpus is
   * bit-identical across engines and reruns, which is what makes the
   * downstream embedding training reproducible.
   *
   * Shape at 100 TB: the neighbor table (src, dst, idx) is built with ONE
   * per-source window (partitioned rank, no global ordering) and each of
   * the `walkLen` unrolled steps is one hash join keyed on the current
   * node — the iterate-join dataflow of every frontier algorithm here.
   * Degree skew (celebrity nodes) lands on the join's build side and AQE
   * splits it; the walk frame itself stays exactly
   * `nodes × walksPerNode` rows through every step.
   *
   * Dead ends cannot occur on a symmetrized graph (every node that enters
   * the edge list has degree ≥ 1), so the inner joins preserve all walks.
   */
  def randomWalks(edges: DataFrame, walksPerNode: Int = 2, walkLen: Int = 4): DataFrame = {
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
    // nbr and deg are referenced by EVERY unrolled step (walkLen × 2 joins);
    // unpinned, each reference replays the symmetrize+dedup+window chain.
    // Lazy checkpoints materialize each exactly once inside the action.
    val nbr = dir.select(col("src").as("nsrc"), col("dst").as("ndst"),
      (row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
        .cast("long").as("idx"))
      .localCheckpoint(false)
    val deg = nbr.groupBy(col("nsrc").as("dsrc")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    // start set = deg's key set (one row per distinct source) — reuses the
    // pinned frame instead of a third pass over the symmetrized edges
    var frame = deg.select(col("dsrc").as("start"))
      .select(col("start"),
        explode(sequence(lit(1), lit(walksPerNode))).as("w"))
      .select(col("start"), col("w"), col("start").as("cur"),
        col("start").as("path"))
    for (step <- 1 to walkLen) {
      val key = concat(col("start"), lit("#"), col("w").cast("string"),
        lit("#"), lit(step.toString), lit("#"), col("cur"))
      frame = frame
        .join(deg, frame("cur") === deg("dsrc"))
        .withColumn("pick", Sketches.hexPrefixValue(md5(key), 4).cast("long") % col("deg"))
        .join(nbr, col("cur") === col("nsrc") && col("pick") === col("idx"))
        .select(col("start"), col("w"), col("ndst").as("cur"),
          concat(col("path"), lit(" "), col("ndst")).as("path"))
    }
    frame.select(col("start").as("start_node"), col("w").cast("long").as("walk_id"),
      col("cur").as("end_node"), col("path"))
  }

  /**
   * Deterministic negative sampling for KG-embedding training (TransE-family
   * corruption): for each positive edge (s, o) and sample index k ∈ 1..`k`,
   * replace o with the entity whose rank is `md5(s#o#k) mod |E|` in the
   * id-sorted entity vocabulary, then drop self-corruptions and accidental
   * true edges (the standard filtered-negatives protocol). Zero RNG — the
   * same corpus yields the same negatives on every engine and every run,
   * which is what makes training-data builds reproducible.
   *
   * Scale shape: the entity vocabulary is a DIMENSION (id + rank), built
   * with one global-window rank here because a gazetteer-bounded vocabulary
   * is dimension-sized; a web-scale entity table would zipWithIndex a
   * sorted snapshot once and reuse it. The rank join and the filtered
   * anti-join are the only wide ops; the ranked vocabulary broadcasts. The
   * 16-bit hash (4 md5 nibbles, engine-portable) makes mod-|E| bias
   * negligible for dimension-sized vocabularies; a 10^9-entity table wants
   * the full 13-nibble prefix.
   */
  def negativeSamples(positives: DataFrame, k: Int): DataFrame = {
    val pos = positives.select(col("s"), col("o")).dropDuplicates("s", "o")
      // referenced three times (vocabulary, the corruption explode, the
      // filtered-negatives anti-join): pin the dedup once
      .localCheckpoint(false)
    val ents = pos.select(col("o")).distinct()
    // distributed exact rank over the entity vocabulary (round 7): range-
    // partition so each partition holds a contiguous id range, rank within
    // partitions, add the partitions-sized offsets — identical indices to
    // the previous global-order window without moving the vocabulary to
    // one partition (same mechanism as Layout.quantileBucket).
    val parts = ents.repartitionByRange(col("o"))
      .withColumn("_pid", spark_partition_id().cast("long"))
      .localCheckpoint(false) // pid assignment must not replay
    val ptot = parts.groupBy("_pid").agg(count(lit(1)).as("_pt"))
    val off = ptot.as("a")
      .join(ptot.as("b"), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._pt")), lit(0L)).as("_off"))
    val ranked = parts
      .withColumn("_rn",
        row_number().over(Window.partitionBy("_pid").orderBy("o")).cast("long"))
      .join(broadcast(off), Seq("_pid"))
      .select(col("o").as("cand"), (col("_rn") - 1L + col("_off")).as("idx"))
    val nDf = ents.agg(count(lit(1)).as("n"))
    val key = concat(col("s"), lit("#"), col("o"), lit("#"), col("kk").cast("string"))
    pos
      .select(col("s"), col("o"), explode(sequence(lit(1), lit(k))).as("kk"))
      .crossJoin(broadcast(nDf))
      .withColumn("idx", Sketches.hexPrefixValue(md5(key), 4).cast("long") % col("n"))
      .join(broadcast(ranked), Seq("idx"))
      .where(col("cand") =!= col("o"))
      .join(pos.select(col("s"), col("o").as("cand")), Seq("s", "cand"), "left_anti")
      .select(col("s"), col("o"), col("kk").cast("long").as("k"), col("cand").as("o_neg"))
  }
}
