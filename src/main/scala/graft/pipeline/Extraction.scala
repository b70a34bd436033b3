package graft.pipeline

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One detected entity mention, with link score (pipeline stages T1+T2 fused). */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    entity_id: String,
    surface: String,
    n_hits: Long,
    first_pos: Long,
    score: Double)

/**
 * Mention detection + entity-link scoring + triple extraction
 * (BASELINE.json north_star stages T1-T3).
 *
 * T1/T2 run fused in ONE mapPartitions pass over the typed transcript
 * Dataset: the Aho-Corasick automaton is broadcast once and matched against
 * every turn — no per-row regex, no shuffle, codegen-opaque but JIT-hot.
 * At cluster scale the input arrives partitioned by conv_id (the transcript
 * table's partition key), so this stage is embarrassingly parallel across
 * 10^12 turns.
 *
 * T3 is a declarative projection/union over the mention table — Catalyst
 * handles pushdown and the dedup shuffle.
 */
object Extraction {

  /** T1+T2: all gazetteer mentions per turn, scored. */
  def mentions(spark: SparkSession, turns: Dataset[Turn]): Dataset[Mention] = {
    import spark.implicits._
    val ac = new AhoCorasick(Gazetteer.surfaces)
    val bc = spark.sparkContext.broadcast((ac, Gazetteer.surfaces, Gazetteer.entityIds))
    turns.mapPartitions { it =>
      val (trie, surfaces, entityIds) = bc.value
      it.flatMap { turn =>
        val text = if (turn.text == null) "" else turn.text
        trie.findAll(text)
          .groupBy(_.patternIdx)
          .iterator
          .map { case (idx, ms) =>
            val n = ms.size.toLong
            val first = ms.map(_.start).min.toLong
            // link score: more hits → higher confidence, shared rounding with oracle
            val score = BigDecimal(n.toDouble / (n + 1).toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            Mention(turn.conv_id, turn.turn_idx, entityIds(idx), surfaces(idx), n, first, score)
          }
      }
    }
  }

  /**
   * Candidate-link edges for canonicalization (input to T4): entity pairs
   * whose first mentions in a turn start within `maxDist` characters of each
   * other — at the default 0, exactly the overlapping-alias case ("table"
   * and "table scan" matched at the same offset are candidate references to
   * one entity). Implemented as a self-join on the (conv_id, turn_idx)
   * composite key — per-turn mention cardinality is small and bounded by
   * the gazetteer, so the join explodes locally, not combinatorially; the
   * aggregate that follows is the only shuffle.
   */
  def linkEdges(mentions: Dataset[Mention], maxDist: Long = 0L): DataFrame = {
    val a = mentions.toDF().select(
      col("conv_id"), col("turn_idx"),
      col("entity_id").as("entity_a"), col("first_pos").as("pos_a"))
    val b = mentions.toDF().select(
      col("conv_id"), col("turn_idx"),
      col("entity_id").as("entity_b"), col("first_pos").as("pos_b"))
    a.join(b, Seq("conv_id", "turn_idx"))
      .where(col("entity_a") < col("entity_b") &&
        abs(col("pos_a") - col("pos_b")) <= maxDist)
      .groupBy(col("entity_a"), col("entity_b"))
      .agg(count(lit(1)).as("weight"))
  }

  /**
   * T3: extracted (s, p, o) triples with conv/turn provenance. Columns:
   * s, p, o, o_kind (0=IRI, 2=literal), conv_id, turn_idx.
   *
   *  - mention triples: <urn:conv:C> urn:graft:mentions <urn:ENT-canonical>
   *  - structure triples: <urn:conv:C:T> urn:graft:partOf <urn:conv:C>
   *  - role triples: <urn:conv:C:T> urn:graft:role "role"
   */
  def triples(mentions: Dataset[Mention], canonical: DataFrame,
              turns: DataFrame): DataFrame = {
    val m = mentions.toDF()
      .join(broadcast(canonical), "entity_id") // entity dimension is small; at scale: salted shuffle join
      .select(
        concat(lit("urn:conv:"), col("conv_id")).as("s"),
        lit("urn:graft:mentions").as("p"),
        concat(lit("urn:"), col("canonical_id")).as("o"),
        lit(0).as("o_kind"),
        col("conv_id"), col("turn_idx"))
      .dropDuplicates("s", "p", "o", "turn_idx")
    val turnIri = concat(lit("urn:conv:"), col("conv_id"), lit(":"), col("turn_idx"))
    val structure = turns.select(
      turnIri.as("s"),
      lit("urn:graft:partOf").as("p"),
      concat(lit("urn:conv:"), col("conv_id")).as("o"),
      lit(0).as("o_kind"),
      col("conv_id"), col("turn_idx"))
    val roles = turns.select(
      turnIri.as("s"),
      lit("urn:graft:role").as("p"),
      col("role").as("o"),
      lit(2).as("o_kind"),
      col("conv_id"), col("turn_idx"))
    m.unionByName(structure).unionByName(roles)
  }
}
