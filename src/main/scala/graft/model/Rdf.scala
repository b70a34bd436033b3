package graft.model

/**
 * RDF 1.1 term/triple model — the universal value domain of the engine.
 *
 * Mirrors the observable domain of the reference (`rdflib.Graph` triples,
 * /root/reference/rdfx/persistence_systems.py:18): IRIs, blank nodes, and
 * literals (plain / typed / language-tagged). All values are strings plus a
 * 3-way term-kind discriminator; there is no numeric/temporal term storage —
 * typed literals keep their lexical form (RDF 1.1 semantics).
 *
 * Spark-side, triples travel as the flat [[TripleRow]] (one column per term
 * component) so Catalyst sees plain string/int columns — filters and
 * aggregations on term columns stay codegen'd and pushdown-friendly.
 */
object TermKind {
  val Iri: Int = 0
  val BNode: Int = 1
  val Literal: Int = 2
}

/** One RDF term. `dtype`/`lang` are null unless kind==Literal and set. */
final case class RdfTerm(kind: Int, value: String, dtype: String, lang: String) {
  def isIri: Boolean = kind == TermKind.Iri
  def isBNode: Boolean = kind == TermKind.BNode
  def isLiteral: Boolean = kind == TermKind.Literal
}

object RdfTerm {
  def iri(v: String): RdfTerm = RdfTerm(TermKind.Iri, v, null, null)
  def bnode(label: String): RdfTerm = RdfTerm(TermKind.BNode, label, null, null)
  def lit(v: String): RdfTerm = RdfTerm(TermKind.Literal, v, null, null)
  def typed(v: String, dtype: String): RdfTerm =
    // xsd:string-typed literals are plain literals in RDF 1.1 (rdflib collapses them)
    if (dtype == Ns.xsdString) lit(v) else RdfTerm(TermKind.Literal, v, dtype, null)
  def lang(v: String, tag: String): RdfTerm = RdfTerm(TermKind.Literal, v, null, tag)
}

/** One triple, driver-side representation (parsers/serializers). */
final case class Triple(s: RdfTerm, p: RdfTerm, o: RdfTerm)

/**
 * Flat triple row for `Dataset[TripleRow]` — columns, not structs, so the
 * dedup shuffle (`dropDuplicates`) and per-column predicates are pure
 * codegen. `graph_iri` is the named-graph addressing key (partition column
 * at materialization); provenance columns ride along but are excluded from
 * set semantics (SURVEY §1.1).
 */
final case class TripleRow(
    s: String, s_kind: Int,
    p: String,
    o: String, o_kind: Int, o_dtype: String, o_lang: String) {
  def asTriple: Triple = Triple(
    RdfTerm(s_kind, s, null, null),
    RdfTerm.iri(p),
    RdfTerm(o_kind, o, o_dtype, o_lang))
}

object TripleRow {
  def fromTriple(t: Triple): TripleRow = TripleRow(
    t.s.value, t.s.kind,
    t.p.value,
    t.o.value, t.o.kind, t.o.dtype, t.o.lang)
}

/** Transcript row (BASELINE.json input_hint — Iceberg-style transcript table). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

/** Well-known namespaces (public RDF vocabulary IRIs). */
object Ns {
  val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val rdfs = "http://www.w3.org/2000/01/rdf-schema#"
  val owl = "http://www.w3.org/2002/07/owl#"
  val xsd = "http://www.w3.org/2001/XMLSchema#"
  val xml = "http://www.w3.org/XML/1998/namespace"
  val rdfType = rdf + "type"
  val xsdString = xsd + "string"
  val xsdInteger = xsd + "integer"
  val xsdDecimal = xsd + "decimal"
  val xsdDouble = xsd + "double"
  val xsdBoolean = xsd + "boolean"
  val langString = rdf + "langString"

  /** Default bindings rdflib attaches to every fresh graph (core only). */
  val defaultBindings: Seq[(String, String)] = Seq(
    "xml" -> xml, "rdf" -> rdf, "rdfs" -> rdfs, "xsd" -> xsd, "owl" -> owl)
}
