package graft.rdf

import graft.model._
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Turtle (and N3-subset) codec.
 *
 * The serializer is byte-compatible with the reference's frozen fixtures
 * (/root/reference/tests/test_convert.py:39-53,
 * tests/test_persistence_systems_generic_methods.py:21-61): sorted @prefix
 * block of USED prefixes only, `a` shorthand listed first, remaining
 * predicates sorted by IRI, object lists joined by ",\n" + 8-space indent,
 * predicates by " ;\n" + 4-space indent, subject block terminated " .\n" and
 * followed by a blank line. `a` does not count as a use of the rdf: prefix
 * (the fixture emits owl/sdo/xsd but not rdf).
 *
 * Multi-subject ordering is deterministic (IRIs by codepoint, then bnodes by
 * label) — the reference pins no multi-subject fixture, rdflib's insertion
 * order is not reproducible, and a deterministic sort is what a distributed
 * engine needs anyway (SURVEY §7 "Determinism").
 */
object TurtleCodec {

  // ================================================================ serialize

  def serialize(g: ParsedGraph): String = {
    val triples = g.triples.distinct
    val bindings = dedupBindings(Ns.defaultBindings.toMap ++ g.prefixes)

    // group: subject -> predicate -> objects
    val bySubj = mutable.LinkedHashMap.empty[RdfTerm, mutable.LinkedHashMap[String, ArrayBuffer[RdfTerm]]]
    triples.foreach { t =>
      val preds = bySubj.getOrElseUpdate(t.s, mutable.LinkedHashMap.empty)
      preds.getOrElseUpdate(t.p.value, ArrayBuffer.empty) += t.o
    }

    val usedPrefixes = mutable.SortedSet.empty[String] // prefix names actually rendered
    val body = new StringBuilder

    def qname(iri: String): Option[String] = {
      // longest-namespace match among bindings with a Turtle-safe local part
      var best: Option[(String, String)] = None
      bindings.foreach { case (p, ns) =>
        if (iri.startsWith(ns) && ns.nonEmpty &&
            (best.isEmpty || ns.length > best.get._2.length)) {
          val local = iri.substring(ns.length)
          if (validLocal(local)) best = Some((p, ns))
        }
      }
      best.map { case (p, ns) => s"$p:${iri.substring(ns.length)}" }
    }

    def renderIri(iri: String): String = qname(iri) match {
      case Some(q) => usedPrefixes += q.substring(0, q.indexOf(':')); q
      case None => "<" + iri + ">"
    }

    def renderTerm(t: RdfTerm): String = t.kind match {
      case TermKind.Iri => renderIri(t.value)
      case TermKind.BNode => "_:" + t.value
      case TermKind.Literal =>
        if (t.lang != null) "\"" + NtCodec.escape(t.value) + "\"@" + t.lang
        else if (t.dtype == null) "\"" + NtCodec.escape(t.value) + "\""
        else if (bareLexical(t.value, t.dtype)) t.value
        else "\"" + NtCodec.escape(t.value) + "\"^^" + renderIri(t.dtype)
    }

    val subjects = bySubj.keys.toVector.sortBy(t => (t.kind, t.value))
    subjects.foreach { subj =>
      val preds = bySubj(subj)
      val subjStr = renderTerm(subj)
      body.append(subjStr).append(' ')
      val predIris = {
        val ps = preds.keys.toVector.sorted
        if (ps.contains(Ns.rdfType)) Ns.rdfType +: ps.filterNot(_ == Ns.rdfType) else ps
      }
      val predStrs = predIris.map { p =>
        val pStr = if (p == Ns.rdfType) "a" else renderIri(p)
        val objs = preds(p).distinct.sortBy(o => (o.kind, o.value)).map(renderTerm)
        pStr + " " + objs.mkString(",\n" + " " * 8)
      }
      body.append(predStrs.mkString(" ;\n" + " " * 4))
      body.append(" .\n\n")
    }

    val header = new StringBuilder
    usedPrefixes.foreach { p =>
      header.append(s"@prefix $p: <${bindings(p)}> .\n")
    }
    if (usedPrefixes.nonEmpty && subjects.nonEmpty) header.append('\n')
    header.append(body).toString
  }

  /** One prefix per namespace: when several prefixes bind the same IRI keep the
    * first alphabetically (deterministic; matches rdflib's replace-on-rebind
    * observable behavior closely enough for the fixtures, which never collide). */
  private def dedupBindings(b: Map[String, String]): Map[String, String] = {
    val byNs = mutable.HashMap.empty[String, String]
    b.toSeq.sortBy(_._1).foreach { case (p, ns) =>
      if (!byNs.contains(ns)) byNs(ns) = p
    }
    byNs.map(_.swap).toMap
  }

  private def validLocal(local: String): Boolean =
    local.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.') &&
      !local.startsWith(".") && !local.endsWith(".") &&
      (local.isEmpty || !local.charAt(0).isDigit)

  /** Literals rdflib's Turtle writer emits bare (integer/decimal/double/boolean). */
  private def bareLexical(v: String, dtype: String): Boolean = dtype match {
    case Ns.xsdInteger => v.matches("[+-]?[0-9]+")
    case Ns.xsdDecimal => v.matches("[+-]?[0-9]*\\.[0-9]+")
    case Ns.xsdDouble  => v.matches("[+-]?([0-9]+\\.[0-9]*|\\.?[0-9]+)[eE][+-]?[0-9]+")
    case Ns.xsdBoolean => v == "true" || v == "false"
    case _ => false
  }

  // ==================================================================== parse

  def parse(doc: String): ParsedGraph = new TurtleParser(doc).parseDocument()

  /**
   * Recursive-descent Turtle parser covering the W3C Turtle grammar subset the
   * reference exercises plus everything our own serializer emits: directives
   * (@prefix/@base and SPARQL-style), prefixed names, `a`, object/predicate
   * lists, bnode property lists `[...]`, collections `(...)`, all four string
   * quoting forms with escapes, numeric/boolean shorthand, lang tags and
   * datatypes.
   */
  private final class TurtleParser(doc: String) {
    private var pos = 0
    private val prefixes = mutable.LinkedHashMap.empty[String, String]
    private var base: String = ""
    private val triples = ArrayBuffer.empty[Triple]
    private var bnodeCounter = 0

    def parseDocument(): ParsedGraph = {
      skipWsAndComments()
      while (pos < doc.length) {
        parseStatement()
        skipWsAndComments()
      }
      ParsedGraph(triples.toVector.distinct, prefixes.toMap)
    }

    private def err(msg: String): Nothing = {
      val ctx = doc.substring(math.max(0, pos - 30), math.min(doc.length, pos + 30))
      throw new IllegalArgumentException(s"Turtle parse error at offset $pos: $msg near '...$ctx...'")
    }

    private def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < doc.length) {
        val c = doc.charAt(pos)
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < doc.length && doc.charAt(pos) != '\n') pos += 1 }
        else go = false
      }
    }

    /**
     * Keyword lookahead. Turtle keywords (`a`, `true`, `false`) are
     * case-sensitive; SPARQL-style directives (PREFIX/BASE) are not. A
     * following PN character or ':' is a non-boundary, so prefixed names
     * whose prefix collides with a keyword (`a:prop`, `true:x`) parse as
     * names rather than keyword-plus-garbage.
     */
    private def peekWord(w: String, ignoreCase: Boolean = false): Boolean =
      doc.regionMatches(ignoreCase, pos, w, 0, w.length) && {
        pos + w.length >= doc.length || {
          val c = doc.charAt(pos + w.length)
          !(c.isLetterOrDigit || c == ':' || c == '_' || c == '-')
        }
      }

    private def parseStatement(): Unit = {
      if (doc.startsWith("@prefix", pos)) { pos += 7; parsePrefix(); expect('.') }
      else if (doc.startsWith("@base", pos)) { pos += 5; parseBase(); expect('.') }
      else if (peekWord("PREFIX", ignoreCase = true)) { pos += 6; parsePrefix() }
      else if (peekWord("BASE", ignoreCase = true)) { pos += 4; parseBase() }
      else parseTriples()
    }

    private def parsePrefix(): Unit = {
      skipWsAndComments()
      val colon = doc.indexOf(':', pos)
      if (colon < 0) err("expected prefix name")
      val name = doc.substring(pos, colon).trim
      pos = colon + 1
      skipWsAndComments()
      val iri = parseIriRef()
      prefixes(name) = iri
    }

    private def parseBase(): Unit = {
      skipWsAndComments()
      base = parseIriRef()
    }

    private def expect(c: Char): Unit = {
      skipWsAndComments()
      if (pos >= doc.length || doc.charAt(pos) != c) err(s"expected '$c'")
      pos += 1
    }

    private def parseIriRef(): String = {
      if (doc.charAt(pos) != '<') err("expected IRI")
      val end = doc.indexOf('>', pos)
      if (end < 0) err("unterminated IRI")
      val raw = NtCodec.unescape(doc.substring(pos + 1, end))
      pos = end + 1
      resolve(raw)
    }

    /** Minimal RFC 3986 relative resolution against @base (fragment, query,
      * absolute-path, and relative-path references; no dot-segment pass —
      * fixtures and real-world Turtle use none). */
    private def resolve(iri: String): String = {
      val hasScheme = iri.indexOf(':') match {
        case -1 => false
        case i  => iri.substring(0, i).forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') &&
                   iri.nonEmpty && iri.charAt(0).isLetter && i > 0
      }
      if (hasScheme || base.isEmpty) iri
      else if (iri.isEmpty) base
      else if (iri.startsWith("#") || iri.startsWith("?")) {
        val cut = base.indexOf(if (iri.startsWith("#")) '#' else '?')
        (if (cut >= 0) base.substring(0, cut) else base) + iri
      } else if (iri.startsWith("//")) {
        val scheme = base.substring(0, base.indexOf(':') + 1)
        scheme + iri
      } else if (iri.startsWith("/")) {
        // scheme + authority of base
        val schemeEnd = base.indexOf("://")
        if (schemeEnd < 0) base + iri
        else {
          val authEnd = base.indexOf('/', schemeEnd + 3)
          (if (authEnd < 0) base else base.substring(0, authEnd)) + iri
        }
      } else {
        // relative path: replace everything after the last '/' of base's path
        val slash = base.lastIndexOf('/')
        val schemeEnd = base.indexOf("://")
        if (slash > (if (schemeEnd < 0) 0 else schemeEnd + 2)) base.substring(0, slash + 1) + iri
        else base + "/" + iri
      }
    }

    private def freshBnode(): RdfTerm = {
      bnodeCounter += 1
      RdfTerm.bnode(s"gb$bnodeCounter")
    }

    private def parseTriples(): Unit = {
      val subj =
        if (doc.charAt(pos) == '[') {
          val b = parseBnodePropertyList()
          skipWsAndComments()
          // `[...] .` with no following predicates is legal
          if (pos < doc.length && doc.charAt(pos) == '.') { pos += 1; return }
          b
        } else parseTerm(subjectPos = true)
      skipWsAndComments()
      parsePredicateObjectList(subj)
      expect('.')
    }

    private def parsePredicateObjectList(subj: RdfTerm): Unit = {
      var go = true
      while (go) {
        skipWsAndComments()
        val pred =
          if (peekWord("a")) { pos += 1; RdfTerm.iri(Ns.rdfType) }
          else parseTerm(subjectPos = false) match {
            case t if t.isIri => t
            case _ => err("predicate must be an IRI")
          }
        var more = true
        while (more) {
          skipWsAndComments()
          val obj = parseObject()
          triples += Triple(subj, pred, obj)
          skipWsAndComments()
          if (pos < doc.length && doc.charAt(pos) == ',') pos += 1 else more = false
        }
        skipWsAndComments()
        if (pos < doc.length && doc.charAt(pos) == ';') {
          pos += 1
          skipWsAndComments()
          // trailing ';' before '.' / ']' is legal
          if (pos < doc.length && (doc.charAt(pos) == '.' || doc.charAt(pos) == ']')) go = false
        } else go = false
      }
    }

    private def parseObject(): RdfTerm = {
      val c = doc.charAt(pos)
      if (c == '[') parseBnodePropertyList()
      else if (c == '(') parseCollection()
      else if (c == '"' || c == '\'') parseLiteral()
      else if (c.isDigit || c == '+' || c == '-' ||
               (c == '.' && pos + 1 < doc.length && doc.charAt(pos + 1).isDigit)) parseNumber()
      else if (peekWord("true")) { pos += 4; RdfTerm.typed("true", Ns.xsdBoolean) }
      else if (peekWord("false")) { pos += 5; RdfTerm.typed("false", Ns.xsdBoolean) }
      else parseTerm(subjectPos = false)
    }

    private def parseBnodePropertyList(): RdfTerm = {
      expect('[')
      val node = freshBnode()
      skipWsAndComments()
      if (doc.charAt(pos) != ']') parsePredicateObjectList(node)
      expect(']')
      node
    }

    private def parseCollection(): RdfTerm = {
      expect('(')
      val items = ArrayBuffer.empty[RdfTerm]
      skipWsAndComments()
      while (pos < doc.length && doc.charAt(pos) != ')') {
        items += parseObject()
        skipWsAndComments()
      }
      expect(')')
      if (items.isEmpty) RdfTerm.iri(Ns.rdf + "nil")
      else {
        val nodes = items.map(_ => freshBnode())
        for (i <- items.indices) {
          triples += Triple(nodes(i), RdfTerm.iri(Ns.rdf + "first"), items(i))
          val rest = if (i == items.length - 1) RdfTerm.iri(Ns.rdf + "nil") else nodes(i + 1)
          triples += Triple(nodes(i), RdfTerm.iri(Ns.rdf + "rest"), rest)
        }
        nodes.head
      }
    }

    /** IRI, prefixed name, or blank node label. */
    private def parseTerm(subjectPos: Boolean): RdfTerm = {
      val c = doc.charAt(pos)
      if (c == '<') RdfTerm.iri(parseIriRef())
      else if (c == '_' && pos + 1 < doc.length && doc.charAt(pos + 1) == ':') {
        pos += 2
        val start = pos
        while (pos < doc.length && (doc.charAt(pos).isLetterOrDigit ||
               doc.charAt(pos) == '_' || doc.charAt(pos) == '-')) pos += 1
        RdfTerm.bnode(doc.substring(start, pos))
      } else {
        // prefixed name: PN_PREFIX? ':' PN_LOCAL
        val start = pos
        while (pos < doc.length && doc.charAt(pos) != ':' &&
               (doc.charAt(pos).isLetterOrDigit || doc.charAt(pos) == '_' ||
                doc.charAt(pos) == '-' || doc.charAt(pos) == '.')) pos += 1
        if (pos >= doc.length || doc.charAt(pos) != ':') err("expected prefixed name")
        val prefix = doc.substring(start, pos)
        pos += 1
        // PN_LOCAL with the W3C escape forms: '\x' escapes the PN_LOCAL_ESC
        // punctuation set (the raw char enters the IRI), '%XX' percent
        // sequences pass through verbatim (W3C Turtle 2.1 §6.5)
        val local = new StringBuilder
        var go = true
        while (go && pos < doc.length) {
          val c = doc.charAt(pos)
          if (c == '\\' && pos + 1 < doc.length &&
              "_~.-!$&'()*+,;=/?#@%".indexOf(doc.charAt(pos + 1)) >= 0) {
            local.append(doc.charAt(pos + 1)); pos += 2
          } else if (c == '%' && pos + 2 < doc.length &&
                     isHex(doc.charAt(pos + 1)) && isHex(doc.charAt(pos + 2))) {
            local.append(doc.substring(pos, pos + 3)); pos += 3
          } else if (c.isLetterOrDigit || c == '_' || c == '-' ||
                     (c == '.' && pos + 1 < doc.length &&
                      (doc.charAt(pos + 1).isLetterOrDigit || doc.charAt(pos + 1) == '_'))) {
            local.append(c); pos += 1
          } else go = false
        }
        prefixes.get(prefix) match {
          case Some(ns) => RdfTerm.iri(ns + local.result())
          case None => err(s"undefined prefix '$prefix:'")
        }
      }
    }

    private def parseLiteral(): RdfTerm = {
      val q = doc.charAt(pos)
      val (body, _) =
        if (doc.startsWith(s"$q$q$q", pos)) {
          // closing delimiter scan honors escapes (rdflib emits long strings
          // for multiline literals; an embedded \""" must not close early),
          // and per the grammar the delimiter is the LAST run of quotes —
          // """a"""" parses as body `a"`.
          var close = pos + 3
          var found = -1
          while (found < 0 && close + 2 < doc.length) {
            if (doc.charAt(close) == q && !isEscaped(close) &&
                doc.charAt(close + 1) == q && doc.charAt(close + 2) == q) {
              // extend past extra quotes: delimiter is the last three
              var end = close
              while (end + 3 < doc.length && doc.charAt(end + 3) == q) end += 1
              found = end
            } else close += 1
          }
          if (found < 0) err("unterminated long string")
          val b = doc.substring(pos + 3, found); pos = found + 3; (b, true)
        } else {
          var e = pos + 1
          while (e < doc.length && !(doc.charAt(e) == q && !isEscaped(e))) {
            if (doc.charAt(e) == '\n') err("newline in short string")
            e += 1
          }
          if (e >= doc.length) err("unterminated string")
          val b = doc.substring(pos + 1, e); pos = e + 1; (b, false)
        }
      val value = NtCodec.unescape(body)
      if (pos < doc.length && doc.charAt(pos) == '@') {
        pos += 1
        val start = pos
        while (pos < doc.length && (doc.charAt(pos).isLetterOrDigit || doc.charAt(pos) == '-')) pos += 1
        RdfTerm.lang(value, doc.substring(start, pos))
      } else if (doc.startsWith("^^", pos)) {
        pos += 2
        val dt = parseTerm(subjectPos = false)
        RdfTerm.typed(value, dt.value)
      } else RdfTerm.lit(value)
    }

    private def isEscaped(i: Int): Boolean = {
      var n = 0; var j = i - 1
      while (j >= 0 && doc.charAt(j) == '\\') { n += 1; j -= 1 }
      n % 2 == 1
    }

    private def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    private def parseNumber(): RdfTerm = {
      val start = pos
      if (doc.charAt(pos) == '+' || doc.charAt(pos) == '-') pos += 1
      while (pos < doc.length && doc.charAt(pos).isDigit) pos += 1
      var isDecimal = false; var isDouble = false
      if (pos < doc.length && doc.charAt(pos) == '.' &&
          pos + 1 < doc.length && doc.charAt(pos + 1).isDigit) {
        isDecimal = true; pos += 1
        while (pos < doc.length && doc.charAt(pos).isDigit) pos += 1
      }
      if (pos < doc.length && (doc.charAt(pos) == 'e' || doc.charAt(pos) == 'E')) {
        isDouble = true; pos += 1
        if (pos < doc.length && (doc.charAt(pos) == '+' || doc.charAt(pos) == '-')) pos += 1
        while (pos < doc.length && doc.charAt(pos).isDigit) pos += 1
      }
      val lex = doc.substring(start, pos)
      val dt = if (isDouble) Ns.xsdDouble else if (isDecimal) Ns.xsdDecimal else Ns.xsdInteger
      RdfTerm.typed(lex, dt)
    }
  }
}
