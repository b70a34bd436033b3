package graft.rdf

import graft.model._
import scala.collection.mutable.ArrayBuffer

/**
 * N-Triples codec. Line-oriented: one triple per line, order-free — the one
 * RDF format that is trivially splittable, so the distributed read/write path
 * (graft.rdf.DistributedRdf) maps each line independently inside codegen'd
 * projections. Serialization matches the reference's NT fixture lines
 * (/root/reference/tests/test_convert.py:14-21): full-IRI brackets,
 * `^^<datatype>` on typed literals, space-dot terminator.
 */
object NtCodec {

  // ---------------------------------------------------------------- serialize

  /** N-Triples string escaping (ECHAR + control chars, per W3C N-Triples). */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04X")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def termToString(t: RdfTerm): String = t.kind match {
    case TermKind.Iri   => "<" + t.value + ">"
    case TermKind.BNode => "_:" + t.value
    case TermKind.Literal =>
      val base = "\"" + escape(t.value) + "\""
      if (t.lang != null) base + "@" + t.lang
      else if (t.dtype != null) base + "^^<" + t.dtype + ">"
      else base
  }

  def tripleToLine(t: Triple): String =
    s"${termToString(t.s)} ${termToString(t.p)} ${termToString(t.o)} ."

  /** Full-document serialize; rdflib's NT serializer ends with a final newline. */
  def serialize(g: ParsedGraph): String = {
    val sb = new StringBuilder
    g.triples.distinct.foreach { t => sb.append(tripleToLine(t)).append('\n') }
    sb.toString
  }

  // ------------------------------------------------------------------- parse

  /** Parse a full N-Triples document (also accepts the N-Triples subset of N3). */
  def parse(doc: String): ParsedGraph = {
    val triples = ArrayBuffer.empty[Triple]
    doc.linesIterator.foreach { line =>
      parseLine(line).foreach(triples += _)
    }
    ParsedGraph(triples.toVector.distinct, Map.empty)
  }

  /** Parse one line; None for blank/comment lines. Throws on malformed input. */
  def parseLine(line: String): Option[Triple] = {
    val s = new Scanner(line)
    s.skipWs()
    if (s.atEnd || s.peek == '#') return None
    val subj = s.readTerm()
    s.skipWs(); val pred = s.readTerm()
    s.skipWs(); val obj = s.readTerm()
    s.skipWs()
    if (s.atEnd || s.peek != '.')
      throw new IllegalArgumentException(s"N-Triples line missing terminator: $line")
    Some(Triple(subj, pred, obj))
  }

  /** Decode \-escapes in an N-Triples/Turtle quoted string body. */
  def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U' =>
            sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Minimal single-line scanner for NT terms (shared with the NT fast path). */
  private final class Scanner(line: String) {
    private var pos = 0
    def atEnd: Boolean = pos >= line.length
    def peek: Char = line.charAt(pos)
    def skipWs(): Unit = while (!atEnd && (peek == ' ' || peek == '\t')) pos += 1

    def readTerm(): RdfTerm = {
      if (atEnd) throw new IllegalArgumentException(s"Truncated N-Triples line: $line")
      peek match {
        case '<' =>
          val end = line.indexOf('>', pos)
          if (end < 0) throw new IllegalArgumentException(s"Unterminated IRI: $line")
          val v = line.substring(pos + 1, end); pos = end + 1
          RdfTerm.iri(unescape(v))
        case '_' =>
          if (pos + 1 >= line.length || line.charAt(pos + 1) != ':')
            throw new IllegalArgumentException(s"Bad blank node: $line")
          val start = pos + 2
          var e = start
          while (e < line.length && !line.charAt(e).isWhitespace) e += 1
          val label = line.substring(start, e); pos = e
          RdfTerm.bnode(label)
        case '"' =>
          // find closing quote, honoring escapes
          var e = pos + 1
          while (e < line.length && !(line.charAt(e) == '"' && !isEscaped(e))) e += 1
          if (e >= line.length) throw new IllegalArgumentException(s"Unterminated literal: $line")
          val body = unescape(line.substring(pos + 1, e))
          pos = e + 1
          if (!atEnd && peek == '@') {
            val start = pos + 1
            var t = start
            while (t < line.length && (line.charAt(t).isLetterOrDigit || line.charAt(t) == '-')) t += 1
            val tag = line.substring(start, t); pos = t
            RdfTerm.lang(body, tag)
          } else if (pos + 1 < line.length && peek == '^' && line.charAt(pos + 1) == '^') {
            pos += 2
            if (atEnd || peek != '<') throw new IllegalArgumentException(s"Bad datatype: $line")
            val end = line.indexOf('>', pos)
            val dt = line.substring(pos + 1, end); pos = end + 1
            RdfTerm.typed(body, dt)
          } else RdfTerm.lit(body)
        case other =>
          throw new IllegalArgumentException(s"Unexpected char '$other' in N-Triples line: $line")
      }
    }

    private def isEscaped(i: Int): Boolean = {
      var backslashes = 0
      var j = i - 1
      while (j >= 0 && line.charAt(j) == '\\') { backslashes += 1; j -= 1 }
      backslashes % 2 == 1
    }
  }
}
