package graft.catalog

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Catalog of named graphs = one partitioned triple table keyed by
 * `graph_iri`, plus an atomic snapshot log — the Spark mapping of the
 * reference's SOP/EDG named-graph surface (SURVEY S6:
 * /root/reference/rdfx/persistence_systems.py:453-784 — read/write by graph
 * IRI, COUNT, ASK, SELECT-LIMIT).
 *
 * Table-format abstraction (SURVEY §7 "No Iceberg jar in sandbox"): the
 * public API is snapshot-id-based commits with exactly-once semantics; this
 * [[ParquetSnapshotCatalog]] implementation backs it with partitioned
 * Parquet + a JSON snapshot manifest committed by atomic rename. On a
 * cluster with an Iceberg runtime, an `IcebergCatalog` implements the same
 * trait via `DataFrameWriterV2.writeTo(...).partitionedBy(...)` — config,
 * not code, changes.
 *
 * Scale notes:
 *  - `graph_iri` is the physical partition column → reads of one graph are
 *    partition-pruned scans (no full-table IO), the direct analogue of the
 *    SOP server resolving a graph URN.
 *  - `ask` uses LIMIT 1 (LocalLimit short-circuit), never a full count.
 *  - snapshot commit = write to `.tmp-<id>` dir + atomic manifest rename;
 *    a resumed job sees either the old or the new snapshot, never half.
 */
trait GraphCatalog {
  def write(graphIri: String, triples: DataFrame, overwrite: Boolean = true,
            leadingComments: Seq[String] = Nil): Long
  def read(graphIri: String): (Seq[String], DataFrame)
  /** Iceberg-style time travel: read a specific committed snapshot. */
  def readAt(graphIri: String, snapshotId: Long): (Seq[String], DataFrame)
  /** Committed snapshot ids for a graph, ascending. */
  def snapshots(graphIri: String): Seq[Long]
  def exists(graphIri: String): Boolean
  def ask(graphIri: String): Boolean
  def count(graphIri: String): Long
  def selectLimit(graphIri: String, n: Int): DataFrame
  def graphs(): Seq[String]
}

/**
 * SOP/EDG workflow-URN surface (reference parity:
 * /root/reference/rdfx/persistence_systems.py:760-784, 844-865). A workflow
 * graph `urn:x-evn-tag:<datagraph>:<workflow>:<user>` addresses a change-set
 * layered over the master graph `urn:x-evn-master:<datagraph>`; existence
 * checks on a workflow URN delegate to its master graph.
 */
object GraphCatalog {
  private val WorkflowPrefix = "urn:x-evn-tag"

  def isWorkflowUrn(graphIri: String): Boolean = graphIri.startsWith(WorkflowPrefix)

  /** `urn:x-evn-tag:dg:wf:user` -> `urn:x-evn-master:dg` (persistence_systems.py:844-855). */
  def graphFromWorkflow(workflowGraph: String): String = {
    if (!isWorkflowUrn(workflowGraph))
      throw new IllegalArgumentException(
        "The workflow graph passed does not start with 'x-evn-tag' - it does not look like a SOP Workflow")
    val parts = workflowGraph.split(":", -1).toVector
    (parts.updated(1, "x-evn-master").take(3)).mkString(":")
  }

  /** `urn:x-evn-tag:dg:wf:user` -> `urn:x-tags:wf` (persistence_systems.py:857-865). */
  def tagFromWorkflow(workflowGraph: String): String = {
    if (!isWorkflowUrn(workflowGraph))
      throw new IllegalArgumentException(
        "The workflow graph passed does not start with 'x-evn-tag' - it does not look like a SOP Workflow")
    "urn:x-tags:" + workflowGraph.split(":", -1)(3)
  }

  /** Workflow URNs resolve to their master graph for storage addressing. */
  def resolveGraphIri(graphIri: String): String =
    if (isWorkflowUrn(graphIri)) graphFromWorkflow(graphIri) else graphIri
}

final class ParquetSnapshotCatalog(spark: SparkSession, root: String) extends GraphCatalog {
  private val rootPath = Paths.get(root)
  private val dataDir = rootPath.resolve("data")
  private val snapDir = rootPath.resolve("_snapshots")
  Files.createDirectories(dataDir)
  Files.createDirectories(snapDir)

  private def enc(iri: String): String =
    java.net.URLEncoder.encode(iri, "UTF-8")

  private def graphDataDir(iri: String): Path = dataDir.resolve(enc(iri))

  /**
   * Latest committed snapshot manifest for a graph, if any. Manifest names
   * are matched against the exact `<enc(iri)>.<9-digit-id>.json` pattern —
   * URLEncoder leaves '.' unencoded, so a bare startsWith prefix test would
   * let a graph IRI that is a dot-prefix of another (e.g. `urn:g` vs
   * `urn:g.x`) silently resolve to the other graph's snapshots.
   */
  private def latestSnapshot(iri: String): Option[Path] = {
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(enc(iri)) + "\\.\\d{9}\\.json")
    val files =
      if (!Files.isDirectory(snapDir)) Vector.empty
      else {
        val s = Files.list(snapDir)
        try s.iterator().asScala.toVector.filter(p => pat.matcher(p.getFileName.toString).matches())
        finally s.close()
      }
    files.sortBy(_.getFileName.toString).lastOption
  }

  private def parseManifest(p: Path): Map[String, String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readAllBytes(p))
    node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /**
   * Commit: write parquet to a versioned dir, then atomically publish the
   * manifest. Returns the snapshot id. Exactly-once: if the job dies before
   * the rename, the partial dir is invisible (no manifest names it) and a
   * rerun re-commits the next id.
   */
  def write(graphIri: String, triples: DataFrame, overwrite: Boolean = true,
            leadingComments: Seq[String] = Nil): Long = {
    val resolved = GraphCatalog.resolveGraphIri(graphIri)
    val prevId = latestSnapshot(resolved).map(m => parseManifest(m)("snapshot_id").toLong).getOrElse(0L)
    val id = prevId + 1
    val target = graphDataDir(resolved).resolve(s"v$id")
    val toWrite =
      if (overwrite || prevId == 0) triples
      else {
        // append = set-union with the previous snapshot (reference merge-into-datagraph semantics)
        val (_, prev) = read(resolved)
        prev.unionByName(triples).dropDuplicates("s", "s_kind", "p", "o", "o_kind", "o_dtype", "o_lang")
      }
    toWrite.write.mode(SaveMode.Overwrite).parquet(target.toString)
    val manifest =
      s"""{"graph_iri": ${jstr(resolved)}, "snapshot_id": "$id", "path": ${jstr(target.toString)},
         | "leading_comments": ${jarr(leadingComments)}}""".stripMargin
    val tmp = snapDir.resolve(s".tmp-${enc(resolved)}.$id")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, snapDir.resolve(f"${enc(resolved)}.$id%09d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    id
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  private def jarr(xs: Seq[String]): String = xs.map(jstr).mkString("[", ",", "]")

  /** Workflow URNs resolve to their master graph THROUGHOUT the surface
    * (read/readAt/snapshots/exists/ask/count/selectLimit) — the reference
    * reads a workflow's content via its datagraph
    * (test_persistence_system_local_sop.py:81-87: write through the
    * workflow URN, read 6 master triples back), and resolving only in
    * `exists` would make `ask` pass its exists() guard then crash in read. */
  def read(graphIri: String): (Seq[String], DataFrame) = {
    val resolved = GraphCatalog.resolveGraphIri(graphIri)
    val manifest = latestSnapshot(resolved).getOrElse(
      throw new IllegalArgumentException(s"No such graph: $resolved"))
    readManifest(manifest)
  }

  private def readManifest(manifest: Path): (Seq[String], DataFrame) = {
    val m = parseManifest(manifest)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val comments = {
      val node = mapper.readTree(Files.readAllBytes(manifest))
      if (node.has("leading_comments"))
        node.get("leading_comments").elements().asScala.map(_.asText()).toSeq
      else Nil
    }
    (comments, spark.read.parquet(m("path")))
  }

  /** Time travel: every snapshot's data dir and manifest are immutable
    * once committed, so any historical snapshot id reads consistently —
    * the Iceberg semantic the ParquetSnapshotFormat stands in for. */
  def readAt(graphIri: String, snapshotId: Long): (Seq[String], DataFrame) = {
    val resolved = GraphCatalog.resolveGraphIri(graphIri)
    val p = snapDir.resolve(f"${enc(resolved)}.$snapshotId%09d.json")
    if (!Files.exists(p))
      throw new IllegalArgumentException(s"No snapshot $snapshotId for graph: $resolved")
    readManifest(p)
  }

  def snapshots(graphIri: String): Seq[Long] = {
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(enc(GraphCatalog.resolveGraphIri(graphIri))) + "\\.(\\d{9})\\.json")
    val files =
      if (!Files.isDirectory(snapDir)) Vector.empty
      else {
        val s = Files.list(snapDir)
        try s.iterator().asScala.toVector finally s.close()
      }
    files.flatMap { p =>
      val m = pat.matcher(p.getFileName.toString)
      if (m.matches()) Some(m.group(1).toLong) else None
    }.sorted
  }

  /**
   * Workflow-aware existence (SURVEY S6; persistence_systems.py:760-784):
   * a `urn:x-evn-tag:...` workflow URN exists iff its master graph does.
   */
  def exists(graphIri: String): Boolean =
    latestSnapshot(GraphCatalog.resolveGraphIri(graphIri)).isDefined

  /** COUNT(*) over the named graph — partial+final count agg (SURVEY O9). */
  def count(graphIri: String): Long = read(graphIri)._2.count()

  /** ASK — LIMIT-1 short-circuit, not a scan (SURVEY O10). */
  def ask(graphIri: String): Boolean =
    exists(graphIri) && !read(graphIri)._2.isEmpty

  /** SELECT * {?s ?p ?o} LIMIT n (SURVEY O11). */
  def selectLimit(graphIri: String, n: Int): DataFrame =
    read(graphIri)._2.select("s", "p", "o").limit(n)

  def graphs(): Seq[String] = {
    val files =
      if (!Files.isDirectory(snapDir)) Vector.empty
      else {
        val s = Files.list(snapDir)
        try s.iterator().asScala.toVector finally s.close()
      }
    files.map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(n => java.net.URLDecoder.decode(n.substring(0, n.lastIndexOf('.', n.length - 6)), "UTF-8"))
      .distinct.sorted
  }
}
