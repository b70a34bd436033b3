package graft.rdf

import graft.model._
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * RDF/XML codec over the JDK DOM parser (no extra dependencies).
 *
 * Parses the subset the reference fixture exercises
 * (/root/reference/tests/data/file_02.rdf) plus the common grammar:
 * `rdf:RDF` root, `rdf:Description` and typed node elements, `rdf:about` /
 * `rdf:ID` / `rdf:nodeID`, property elements with `rdf:resource`,
 * `rdf:datatype`, `xml:lang`, `rdf:nodeID`, text content, nested node
 * elements, and `rdf:parseType="Resource"`.
 *
 * Serialization is deterministic (subjects and predicates sorted) and
 * namespace-declared at the root, mirroring rdflib's pretty-xml shape; no
 * reference fixture pins RDF/XML output bytes (only parse + "serializes
 * without error"), so determinism + round-trip fidelity is the contract.
 */
object RdfXmlCodec {
  private val RdfNs = Ns.rdf

  // ==================================================================== parse

  def parse(doc: String): ParsedGraph = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // harden against XXE — transcript-scale inputs are untrusted
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val dom = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(doc.getBytes("UTF-8")))
    val triples = ArrayBuffer.empty[Triple]
    val prefixes = mutable.LinkedHashMap.empty[String, String]
    var bnodeCounter = 0
    def freshBnode(): RdfTerm = { bnodeCounter += 1; RdfTerm.bnode(s"xb$bnodeCounter") }

    def collectPrefixes(e: Element): Unit = {
      val attrs = e.getAttributes
      for (i <- 0 until attrs.getLength) {
        val a = attrs.item(i)
        if (a.getNodeName.startsWith("xmlns:")) prefixes(a.getNodeName.substring(6)) = a.getNodeValue
      }
    }

    def childElements(e: Element): Seq[Element] = {
      val out = ArrayBuffer.empty[Element]
      val nl = e.getChildNodes
      for (i <- 0 until nl.getLength) nl.item(i) match {
        case el: Element => out += el
        case _ =>
      }
      out.toSeq
    }

    def isRdf(e: Element, local: String): Boolean =
      RdfNs.stripSuffix("#") + "#" + local == (Option(e.getNamespaceURI).getOrElse("") + e.getLocalName) ||
        (e.getNamespaceURI == RdfNs && e.getLocalName == local)

    def rdfAttr(e: Element, local: String): Option[String] =
      Option(e.getAttributeNS(RdfNs, local)).filter(_.nonEmpty)

    /** Parse a node element; returns its subject term. */
    def parseNodeElement(e: Element): RdfTerm = {
      collectPrefixes(e)
      val subj = rdfAttr(e, "about").map(RdfTerm.iri)
        .orElse(rdfAttr(e, "ID").map(id => RdfTerm.iri("#" + id)))
        .orElse(rdfAttr(e, "nodeID").map(RdfTerm.bnode))
        .getOrElse(freshBnode())
      // typed node element: element name is the rdf:type
      if (!isRdf(e, "Description")) {
        val typeIri = Option(e.getNamespaceURI).getOrElse("") + e.getLocalName
        triples += Triple(subj, RdfTerm.iri(Ns.rdfType), RdfTerm.iri(typeIri))
      }
      childElements(e).foreach(pe => parsePropertyElement(subj, pe))
      subj
    }

    def parsePropertyElement(subj: RdfTerm, pe: Element): Unit = {
      collectPrefixes(pe)
      val pred = RdfTerm.iri(Option(pe.getNamespaceURI).getOrElse("") + pe.getLocalName)
      val resource = rdfAttr(pe, "resource")
      val nodeId = rdfAttr(pe, "nodeID")
      val datatype = rdfAttr(pe, "datatype")
      val parseType = rdfAttr(pe, "parseType")
      val lang = Option(pe.getAttribute("xml:lang")).filter(_.nonEmpty)
      val kids = childElements(pe)

      if (resource.isDefined) triples += Triple(subj, pred, RdfTerm.iri(resource.get))
      else if (nodeId.isDefined) triples += Triple(subj, pred, RdfTerm.bnode(nodeId.get))
      else if (parseType.contains("Resource")) {
        val b = freshBnode()
        triples += Triple(subj, pred, b)
        kids.foreach(k => parsePropertyElement(b, k))
      } else if (kids.nonEmpty) {
        val obj = parseNodeElement(kids.head)
        triples += Triple(subj, pred, obj)
      } else {
        val text = pe.getTextContent
        val obj =
          if (datatype.isDefined) RdfTerm.typed(text, datatype.get)
          else if (lang.isDefined) RdfTerm.lang(text, lang.get)
          else RdfTerm.lit(text)
        triples += Triple(subj, pred, obj)
      }
    }

    val root = dom.getDocumentElement
    collectPrefixes(root)
    if (isRdf(root, "RDF")) childElements(root).foreach(parseNodeElement)
    else parseNodeElement(root)
    ParsedGraph(triples.toVector.distinct, prefixes.toMap)
  }

  // ================================================================ serialize

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  /** Split an IRI into (namespace, XML-NCName local). */
  private def splitIri(iri: String): (String, String) = {
    var i = iri.length - 1
    while (i >= 0 && (Character.isLetterOrDigit(iri.charAt(i)) || iri.charAt(i) == '_' ||
           iri.charAt(i) == '-' || iri.charAt(i) == '.')) i -= 1
    val split = i + 1
    val local = iri.substring(split)
    if (local.isEmpty || local.charAt(0).isDigit || local.contains('.'))
      (iri, "") // unsplittable — handled by caller
    else (iri.substring(0, split), local)
  }

  def serialize(g: ParsedGraph): String = {
    val triples = g.triples.distinct
    // assign prefixes to every predicate namespace
    val nsToPrefix = mutable.LinkedHashMap[String, String](RdfNs -> "rdf")
    val preferred = g.prefixes.map(_.swap) // ns -> prefix hint from parse
    var n = 0
    def prefixFor(ns: String): String = nsToPrefix.getOrElseUpdate(ns, {
      preferred.get(ns).filter(p => p.nonEmpty && !nsToPrefix.values.exists(_ == p))
        .getOrElse { n += 1; s"ns$n" }
    })

    val bySubj = triples.groupBy(_.s).toVector.sortBy { case (s, _) => (s.kind, s.value) }
    val body = new StringBuilder
    bySubj.foreach { case (subj, ts) =>
      val subjAttr = subj.kind match {
        case TermKind.Iri => s"""rdf:about="${xmlEscape(subj.value)}""""
        case _            => s"""rdf:nodeID="${xmlEscape(subj.value)}""""
      }
      body.append(s"""  <rdf:Description $subjAttr>\n""")
      ts.sortBy(t => (if (t.p.value == Ns.rdfType) "" else t.p.value, t.o.kind, t.o.value))
        .foreach { t =>
          val (ns, local) = splitIri(t.p.value)
          require(local.nonEmpty, s"cannot XML-serialize predicate IRI: ${t.p.value}")
          val qn = s"${prefixFor(ns)}:$local"
          t.o.kind match {
            case TermKind.Iri =>
              body.append(s"""    <$qn rdf:resource="${xmlEscape(t.o.value)}"/>\n""")
            case TermKind.BNode =>
              body.append(s"""    <$qn rdf:nodeID="${xmlEscape(t.o.value)}"/>\n""")
            case TermKind.Literal =>
              val attrs =
                if (t.o.lang != null) s""" xml:lang="${t.o.lang}""""
                else if (t.o.dtype != null) s""" rdf:datatype="${xmlEscape(t.o.dtype)}""""
                else ""
              body.append(s"    <$qn$attrs>${xmlEscape(t.o.value)}</$qn>\n")
          }
        }
      body.append("  </rdf:Description>\n")
    }

    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<rdf:RDF\n")
    nsToPrefix.toVector.sortBy(_._2).foreach { case (ns, p) =>
      sb.append(s"""   xmlns:$p="${xmlEscape(ns)}"\n""")
    }
    sb.append(">\n").append(body).append("</rdf:RDF>\n")
    sb.toString
  }
}
