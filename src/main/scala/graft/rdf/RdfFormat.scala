package graft.rdf

import graft.model._

/**
 * Closed format vocabulary + extension tables, mirroring the reference's
 * `RDF_FORMATS` / `RDF_FILE_ENDINGS` / `OUTPUT_FILE_ENDINGS`
 * (/root/reference/rdfx/persistence_systems.py:20-34,
 * /root/reference/rdfx/rdfx_cli.py:12-31).
 */
sealed abstract class RdfFormat(val token: String, val fileExt: String)

object RdfFormat {
  case object Turtle extends RdfFormat("turtle", "ttl")
  case object NTriples extends RdfFormat("nt", "nt")
  case object N3 extends RdfFormat("n3", "n3")
  case object JsonLd extends RdfFormat("json-ld", "json-ld")
  case object RdfXml extends RdfFormat("xml", "xml")

  val all: Seq[RdfFormat] = Seq(Turtle, NTriples, N3, JsonLd, RdfXml)

  /** Valid serialize/parse tokens — reference's RDF_FORMATS (ttl, turtle, xml, json-ld, nt, n3). */
  val validTokens: Seq[String] = Seq("ttl", "turtle", "xml", "json-ld", "nt", "n3")

  /** Token -> format; "ttl" aliases turtle (persistence_systems.py:20-21). */
  def fromToken(token: String): RdfFormat = token match {
    case "ttl" | "turtle" => Turtle
    case "nt"             => NTriples
    case "n3"             => N3
    case "json-ld" | "json" | "jsonld" => JsonLd
    case "xml" | "rdf" | "owl"         => RdfXml
    case other =>
      throw new IllegalArgumentException(
        s"The format must be one of ${validTokens.mkString(", ")}, got: $other")
  }

  /**
   * File-suffix -> parser format token (reference RDF_FILE_ENDINGS,
   * persistence_systems.py:23-34). Insertion order matters: directory glob
   * expansion iterates keys in this order and the ordering is fixture-pinned
   * (tests/test_persistence_systems_generic_methods.py:118-135).
   */
  val fileEndings: Seq[(String, String)] = Seq(
    "ttl" -> "turtle",
    "turtle" -> "turtle",
    "json" -> "json-ld",
    "json-ld" -> "json-ld",
    "jsonld" -> "json-ld",
    "owl" -> "xml",
    "xml" -> "xml",
    "rdf" -> "xml",
    "nt" -> "nt",
    "n3" -> "n3")

  private val endingMap: Map[String, String] = fileEndings.toMap

  /** Output format token -> output file extension (rdfx_cli.py:25-31). */
  val outputFileEndings: Map[String, String] = Map(
    "turtle" -> "ttl",
    "ttl" -> "ttl",
    "xml" -> "xml",
    "json-ld" -> "json-ld",
    "nt" -> "nt",
    "n3" -> "n3")

  /** Infer parser format from a file path's extension (rdfx_cli.py:34-45). */
  def inferFromPath(path: String): RdfFormat = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    val suffix = if (dot >= 0) name.substring(dot + 1).toLowerCase else ""
    endingMap.get(suffix) match {
      case Some(tok) => fromToken(tok)
      case None =>
        throw new IllegalArgumentException(
          s"Cannot infer RDF format for file: $path (unknown suffix '$suffix')")
    }
  }
}

/**
 * A parsed graph: the triple set plus the prefix bindings observed at parse
 * time (carried so `clean`/Turtle-serialize can reproduce rdflib's prefix
 * behavior). Driver-side only — distributed graphs are `Dataset[TripleRow]`.
 */
final case class ParsedGraph(triples: Vector[Triple], prefixes: Map[String, String]) {
  /** Set-union with dedup — the reference merge semantics (rdfx_cli.py:91-93). */
  def union(other: ParsedGraph): ParsedGraph =
    ParsedGraph((triples ++ other.triples).distinct, prefixes ++ other.prefixes)
  def size: Int = triples.distinct.size
}

object ParsedGraph {
  val empty: ParsedGraph = ParsedGraph(Vector.empty, Map.empty)
}
