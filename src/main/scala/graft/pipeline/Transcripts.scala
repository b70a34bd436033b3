package graft.pipeline

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthesis of the transcript input table
 * (BASELINE.json input_hint: conv_id, turn_idx, role, text, tool, ts) from
 * the driver-generated `documents` parquet — no external data, no
 * wall-clock, scale-proportional (conversation count grows with the corpus).
 *
 * The mapping is intentionally SQL-expressible so the DuckDB oracle can
 * re-derive the identical table (per-turn text equality under stable
 * (conv_id, turn_idx) ordering is the correctness invariant vs the
 * reference):
 *
 *   conv_id  = 'conv_' || doc_id / 8        (integer division)
 *   turn_idx = doc_id % 8
 *   role     = even turn → 'user', odd → 'assistant'
 *   text     = documents.text (verbatim — the equality invariant)
 *   tool     = doc_id%7==0 → 'search', ==3 → 'code', else NULL
 *   ts       = 2024-01-01T00:00:00Z + doc_id minutes
 */
object Transcripts {

  val TurnsPerConv = 8

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** The transcript table as a DataFrame (columns per input_hint). */
  def synthesize(spark: SparkSession, sfDir: String): DataFrame =
    fromDocuments(documents(spark, sfDir))

  def fromDocuments(docs: DataFrame): DataFrame = {
    docs.select(
      concat(lit("conv_"), (col("doc_id") / TurnsPerConv).cast("long")).as("conv_id"),
      (col("doc_id") % TurnsPerConv).cast("int").as("turn_idx"),
      when(col("doc_id") % 2 === 0, "user").otherwise("assistant").as("role"),
      col("text"),
      when(col("doc_id") % 7 === 0, "search")
        .when(col("doc_id") % 7 === 3, "code")
        .otherwise(lit(null).cast("string")).as("tool"),
      expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, CAST(doc_id AS INT), 0)").as("ts"))
  }

  /** Typed view for mapPartitions stages. */
  def turns(spark: SparkSession, sfDir: String): Dataset[Turn] = {
    import spark.implicits._
    synthesize(spark, sfDir).as[Turn]
  }

  /** The same synthesis as DuckDB SQL (oracle side; documents = parquet table). */
  val oracleSql: String =
    """SELECT 'conv_' || CAST(doc_id // 8 AS VARCHAR) AS conv_id,
      |       CAST(doc_id % 8 AS INT) AS turn_idx,
      |       CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |       text,
      |       CASE WHEN doc_id % 7 = 0 THEN 'search'
      |            WHEN doc_id % 7 = 3 THEN 'code' END AS tool,
      |       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 MINUTE * doc_id AS ts
      |FROM documents""".stripMargin

  /** Shared CTE prelude for downstream oracle queries. */
  val oracleCte: String = s"WITH turns AS (\n$oracleSql\n)"
}
