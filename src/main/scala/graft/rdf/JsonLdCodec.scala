package graft.rdf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model._
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/**
 * JSON-LD codec over Jackson (already on the Spark classpath).
 *
 * Parses the expanded/flattened shape rdflib emits and the reference fixture
 * uses (/root/reference/tests/data/file_03.json-ld): an array of node objects
 * with `@id`, `@type`, and per-property arrays of `{"@id"}` node refs or
 * `{"@value", "@type"/"@language"}` value objects. Also accepts a simple
 * `@context` of prefix→IRI strings, `@graph` wrappers, compact IRIs, and bare
 * string/number/boolean values (coerced per JSON-LD 1.0 expansion rules).
 *
 * Serializes the same expanded array shape deterministically: nodes sorted by
 * subject, properties sorted by IRI, `@type` array sorted.
 */
object JsonLdCodec {
  private val mapper = new ObjectMapper()

  // ==================================================================== parse

  def parse(doc: String): ParsedGraph = {
    val root = mapper.readTree(doc)
    val triples = ArrayBuffer.empty[Triple]
    val ctx = mutable.HashMap.empty[String, String]
    var bnodeCounter = 0
    def freshBnode(): RdfTerm = { bnodeCounter += 1; RdfTerm.bnode(s"jb$bnodeCounter") }

    def expandIri(s: String): String = {
      if (s.startsWith("@")) s
      else {
        val colon = s.indexOf(':')
        if (colon > 0) {
          val prefix = s.substring(0, colon)
          ctx.get(prefix).map(_ + s.substring(colon + 1)).getOrElse(s)
        } else ctx.getOrElse(s, s)
      }
    }

    def loadContext(n: JsonNode): Unit =
      if (n.isObject) n.properties().asScala.foreach { e =>
        val v = e.getValue
        if (v.isTextual) ctx(e.getKey) = v.asText()
        else if (v.isObject && v.has("@id")) ctx(e.getKey) = v.get("@id").asText()
      }

    def subjectTerm(n: JsonNode): RdfTerm =
      if (n.has("@id")) {
        val id = expandIri(n.get("@id").asText())
        if (id.startsWith("_:")) RdfTerm.bnode(id.substring(2)) else RdfTerm.iri(id)
      } else freshBnode()

    /** Returns the term for this value node; emits triples for nested nodes. */
    def valueTerm(v: JsonNode): RdfTerm = {
      if (v.isTextual) RdfTerm.lit(v.asText())
      else if (v.isBoolean) RdfTerm.typed(v.asText(), Ns.xsdBoolean)
      else if (v.isIntegralNumber) RdfTerm.typed(v.asText(), Ns.xsdInteger)
      else if (v.isNumber) RdfTerm.typed(v.asText(), Ns.xsdDouble)
      else if (v.isObject) {
        if (v.has("@value")) {
          val lex = v.get("@value").asText()
          if (v.has("@language")) RdfTerm.lang(lex, v.get("@language").asText())
          else if (v.has("@type")) RdfTerm.typed(lex, expandIri(v.get("@type").asText()))
          else if (v.get("@value").isBoolean) RdfTerm.typed(lex, Ns.xsdBoolean)
          else if (v.get("@value").isIntegralNumber) RdfTerm.typed(lex, Ns.xsdInteger)
          else if (v.get("@value").isNumber) RdfTerm.typed(lex, Ns.xsdDouble)
          else RdfTerm.lit(lex)
        } else {
          // nested / referenced node object
          val t = subjectTerm(v)
          if (v.properties().asScala.exists(e => e.getKey != "@id")) processNode(v, Some(t))
          t
        }
      } else throw new IllegalArgumentException(s"Unsupported JSON-LD value: $v")
    }

    def processNode(n: JsonNode, subjOpt: Option[RdfTerm] = None): Unit = {
      if (n.has("@context")) loadContext(n.get("@context"))
      if (n.has("@graph")) { n.get("@graph").elements().asScala.foreach(processNode(_, None)); return }
      val subj = subjOpt.getOrElse(subjectTerm(n))
      n.properties().asScala.foreach { e =>
        val key = e.getKey
        val v = e.getValue
        key match {
          case "@id" | "@context" => ()
          case "@type" =>
            val types = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            types.foreach { t =>
              triples += Triple(subj, RdfTerm.iri(Ns.rdfType), RdfTerm.iri(expandIri(t.asText())))
            }
          case prop =>
            val pred = RdfTerm.iri(expandIri(prop))
            val vals = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            vals.foreach { vv => triples += Triple(subj, pred, valueTerm(vv)) }
        }
      }
    }

    if (root.isArray) root.elements().asScala.foreach(processNode(_, None))
    else processNode(root, None)
    ParsedGraph(triples.toVector.distinct, ctx.toMap)
  }

  // ================================================================ serialize

  def serialize(g: ParsedGraph): String = {
    val triples = g.triples.distinct
    val bySubj = triples.groupBy(_.s).toVector.sortBy { case (s, _) => (s.kind, s.value) }
    val arr: ArrayNode = mapper.createArrayNode()
    bySubj.foreach { case (subj, ts) =>
      val node: ObjectNode = mapper.createObjectNode()
      node.put("@id", if (subj.isBNode) "_:" + subj.value else subj.value)
      val types = ts.filter(_.p.value == Ns.rdfType).map(_.o.value).distinct.sorted
      if (types.nonEmpty) {
        val ta = node.putArray("@type")
        types.foreach(ta.add)
      }
      ts.filterNot(_.p.value == Ns.rdfType)
        .groupBy(_.p.value).toVector.sortBy(_._1)
        .foreach { case (pred, pts) =>
          val pa = node.putArray(pred)
          pts.map(_.o).distinct.sortBy(o => (o.kind, o.value)).foreach { o =>
            val vo = mapper.createObjectNode()
            o.kind match {
              case TermKind.Iri   => vo.put("@id", o.value)
              case TermKind.BNode => vo.put("@id", "_:" + o.value)
              case TermKind.Literal =>
                if (o.lang != null) vo.put("@language", o.lang)
                else if (o.dtype != null) vo.put("@type", o.dtype)
                vo.put("@value", o.value)
            }
            pa.add(vo)
          }
        }
      arr.add(node)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr) + "\n"
  }
}
