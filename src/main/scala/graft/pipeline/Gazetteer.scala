package graft.pipeline

/**
 * Deterministic entity gazetteer for the KG-construction pipeline (stage T1).
 *
 * Surfaces are drawn from the closed vocabulary of the synthetic corpus
 * (TESTDATA.md `documents.text`) so mention detection is exercised for both
 * single-token and multi-token (cross-word-boundary) patterns. In a
 * production deployment this table is a loaded dimension (typically 10^6-10^8
 * aliases) broadcast to executors; the matching machinery (Aho-Corasick over
 * broadcast patterns inside mapPartitions) is identical.
 *
 * Mention semantics (shared with the SQL oracle): every substring occurrence
 * of a surface counts; `n_hits` = occurrence count, `first_pos` = 0-based
 * first offset, link `score` = n_hits / (n_hits + 1) rounded to 6 dp.
 */
object Gazetteer {
  /** (surface, entity_id) — some entities have multiple alias surfaces. */
  val entries: Seq[(String, String)] = Seq(
    "spark" -> "ent:spark",
    "join" -> "ent:join",
    "merge" -> "ent:merge",
    "table" -> "ent:table",
    "scan" -> "ent:scan",
    "window" -> "ent:window",
    "stream" -> "ent:stream",
    "batch" -> "ent:batch",
    "filter" -> "ent:filter",
    "query" -> "ent:query",
    "vector" -> "ent:vector",
    "customer" -> "ent:customer",
    "hash" -> "ent:hash",
    "sort" -> "ent:sort",
    "group" -> "ent:group",
    "agg" -> "ent:agg",
    // multi-token surfaces — exercise cross-boundary trie matching
    "table scan" -> "ent:table_scan",
    "hash join" -> "ent:hash_join",
    "merge join" -> "ent:merge_join",
    "sort merge" -> "ent:sort_merge",
    // prefix aliases — overlap-linked to their parents, giving the
    // canonicalization stage 3-node chains (tab—table—table_scan)
    "tab" -> "ent:tab",
    "has" -> "ent:has")

  val surfaces: Array[String] = entries.map(_._1).toArray
  val entityIds: Array[String] = entries.map(_._2).toArray

  /** The same table as a SQL VALUES list (for the DuckDB oracle). */
  def sqlValues: String =
    entries.map { case (s, e) => s"('$s','$e')" }.mkString(", ")
}
