package graft.rdf

import graft.model._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based codec fuzzing (SURVEY §5): random RDF term/triple
 * generators → serialize→parse set-equality for every format. Deterministic:
 * each case is drawn from a fixed ScalaCheck seed, so a failure reproduces
 * by seed number.
 *
 * Term domain notes:
 *  - literal values draw from the full escape-relevant space: quotes
 *    (including runs of three), backslashes (including trailing), newlines,
 *    tabs, CR, C0 control chars, non-ASCII BMP chars, surrogate-pair emoji,
 *    1k-char long strings;
 *  - IRIs draw letters/digits and URI punctuation (no '<'/'>'/space/quotes,
 *    which no IRI may contain raw);
 *  - RDF/XML restricts literal chars to the XML 1.0 Char production minus
 *    CR (the DOM parser is entitled to normalize CR per XML spec), which is
 *    exactly what any XML-based interchange can carry.
 */
class CodecFuzzSpec extends AnyFunSuite {

  private val Cases = 300

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ------------------------------------------------------------- generators

  private val iriTailChar: Gen[Char] = Gen.frequency(
    10 -> Gen.alphaNumChar,
    3 -> Gen.oneOf('/', '#', '.', '-', '_', '~', ':', '%', '?', '=', '&'),
    1 -> Gen.oneOf('é', '中'))

  private val iriGen: Gen[String] = for {
    scheme <- Gen.oneOf("http://ex.org/", "https://w3.example/", "urn:x:")
    tail <- Gen.listOf(iriTailChar).map(_.mkString).map(_.take(40))
  } yield scheme + tail

  /** Predicate IRIs keep an XML-NCName-safe local tail (RDF/XML requires a
    * splittable QName; rdflib has the same constraint). */
  private val predGen: Gen[String] = for {
    base <- Gen.oneOf("http://ex.org/p/", "https://w3.example/v#")
    local <- Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))
  } yield base + local

  private val bnodeGen: Gen[RdfTerm] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(cs => RdfTerm.bnode("b" + cs.mkString.take(10)))

  private val litChar: Gen[Char] = Gen.frequency(
    12 -> Gen.alphaNumChar,
    4 -> Gen.oneOf(' ', '"', '\'', '\\', '\n', '\t', '\r', '<', '>', '&', '@', '^', '.', ','),
    2 -> Gen.oneOf('ü', 'λ', '中', '✓'),
    1 -> Gen.choose('\u0001', '\u001f'))

  private val litValueGen: Gen[String] = Gen.frequency(
    8 -> Gen.listOf(litChar).map(_.mkString),
    2 -> Gen.listOf(litChar).map(cs => "\"\"\"" + cs.mkString + "\""),  // quote runs
    1 -> Gen.const("ends with backslash \\"),
    1 -> Gen.const("emoji 💡 pair"),
    1 -> Gen.listOfN(1000, Gen.alphaNumChar).map(_.mkString))          // long string

  private val langGen: Gen[String] = Gen.oneOf("en", "en-US", "de", "es-419", "zh-Hans")

  private val literalGen: Gen[RdfTerm] = Gen.frequency(
    4 -> litValueGen.map(RdfTerm.lit),
    2 -> Gen.zip(litValueGen, langGen).map { case (v, l) => RdfTerm.lang(v, l) },
    1 -> Gen.chooseNum(-1000000L, 1000000L).map(n => RdfTerm.typed(n.toString, Ns.xsdInteger)),
    1 -> Gen.zip(Gen.chooseNum(-999L, 999L), Gen.chooseNum(0, 99))
      .map { case (a, b) => RdfTerm.typed(s"$a.$b", Ns.xsdDecimal) },
    1 -> Gen.oneOf("true", "false").map(RdfTerm.typed(_, Ns.xsdBoolean)),
    1 -> Gen.zip(litValueGen, iriGen).map { case (v, dt) => RdfTerm.typed(v, dt) },
    1 -> litValueGen.map(RdfTerm.typed(_, Ns.xsdInteger)))  // non-canonical lexical

  private val subjGen: Gen[RdfTerm] =
    Gen.frequency(3 -> iriGen.map(RdfTerm.iri), 1 -> bnodeGen)

  private val objGen: Gen[RdfTerm] =
    Gen.frequency(2 -> iriGen.map(RdfTerm.iri), 1 -> bnodeGen, 4 -> literalGen)

  private val tripleGen: Gen[Triple] = for {
    s <- subjGen; p <- predGen; o <- objGen
  } yield Triple(s, RdfTerm.iri(p), o)

  private val graphGen: Gen[ParsedGraph] =
    Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, tripleGen))
      .map(ts => ParsedGraph(ts.toVector.distinct, Map.empty))

  private def xmlSafe(s: String): Boolean =
    s != null && s.forall(c => c == '\n' || c == '\t' || c >= ' ')

  private def xmlSafeGraph(g: ParsedGraph): ParsedGraph =
    ParsedGraph(g.triples.filter(t =>
      t.o.kind != TermKind.Literal || xmlSafe(t.o.value)), g.prefixes)

  // -------------------------------------------------------------- properties

  private def roundTrip(name: String, ser: ParsedGraph => String,
                        par: String => ParsedGraph,
                        prep: ParsedGraph => ParsedGraph = identity): Unit =
    (0 until Cases).foreach { seed =>
      val g = prep(draw(graphGen, seed.toLong))
      val doc = ser(g)
      val back =
        try par(doc)
        catch {
          case e: Exception =>
            fail(s"$name seed=$seed: parse failed: ${e.getMessage}\n--- doc:\n$doc")
        }
      assert(back.triples.toSet == g.triples.toSet,
        s"$name seed=$seed mismatch\n--- doc:\n$doc\n--- missing: ${g.triples.toSet -- back.triples.toSet}" +
          s"\n--- extra: ${back.triples.toSet -- g.triples.toSet}")
    }

  test("fuzz: NT serialize→parse set-equality (300 seeded graphs)") {
    roundTrip("nt", NtCodec.serialize, NtCodec.parse)
  }

  test("fuzz: Turtle serialize→parse set-equality (300 seeded graphs)") {
    roundTrip("turtle", TurtleCodec.serialize, TurtleCodec.parse)
  }

  test("fuzz: JSON-LD serialize→parse set-equality (300 seeded graphs)") {
    roundTrip("json-ld", JsonLdCodec.serialize, JsonLdCodec.parse)
  }

  test("fuzz: RDF/XML serialize→parse set-equality (300 seeded graphs, XML-representable chars)") {
    roundTrip("rdf-xml", RdfXmlCodec.serialize, RdfXmlCodec.parse, xmlSafeGraph)
  }

  test("fuzz: cross-format — every format parses back what Turtle carried") {
    (0 until 100).foreach { seed =>
      val g = xmlSafeGraph(draw(graphGen, 10000L + seed))
      val viaTtl = TurtleCodec.parse(TurtleCodec.serialize(g)).triples.toSet
      assert(NtCodec.parse(NtCodec.serialize(g)).triples.toSet == viaTtl, s"nt vs ttl seed=$seed")
      assert(JsonLdCodec.parse(JsonLdCodec.serialize(g)).triples.toSet == viaTtl, s"jsonld vs ttl seed=$seed")
      assert(RdfXmlCodec.parse(RdfXmlCodec.serialize(g)).triples.toSet == viaTtl, s"xml vs ttl seed=$seed")
    }
  }

  // -------------------------------------------- targeted grammar edge cases

  test("json-ld: compact form with @context prefixes and @graph wrapper parses") {
    val doc =
      """{
        |  "@context": {"sdo": "https://schema.org/", "name": "https://schema.org/name"},
        |  "@graph": [
        |    {"@id": "http://ex/a", "sdo:jobTitle": "Engineer",
        |     "name": {"@value": "Alice", "@language": "en"}},
        |    {"@id": "http://ex/b", "sdo:knows": {"@id": "http://ex/a"},
        |     "sdo:age": 42}
        |  ]
        |}""".stripMargin
    val g = JsonLdCodec.parse(doc)
    val ts = g.triples.toSet
    assert(ts.contains(Triple(RdfTerm.iri("http://ex/a"),
      RdfTerm.iri("https://schema.org/jobTitle"), RdfTerm.lit("Engineer"))))
    assert(ts.contains(Triple(RdfTerm.iri("http://ex/a"),
      RdfTerm.iri("https://schema.org/name"), RdfTerm.lang("Alice", "en"))))
    assert(ts.contains(Triple(RdfTerm.iri("http://ex/b"),
      RdfTerm.iri("https://schema.org/knows"), RdfTerm.iri("http://ex/a"))))
    assert(ts.contains(Triple(RdfTerm.iri("http://ex/b"),
      RdfTerm.iri("https://schema.org/age"), RdfTerm.typed("42", Ns.xsdInteger))))
  }

  test("rdf/xml: rdf:ID, parseType=Resource, and nested node elements parse") {
    val doc =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/v#">
        |  <rdf:Description rdf:ID="frag">
        |    <ex:knows>
        |      <ex:Person rdf:about="http://ex.org/p1">
        |        <ex:name>Nested</ex:name>
        |      </ex:Person>
        |    </ex:knows>
        |    <ex:address rdf:parseType="Resource">
        |      <ex:city>Springfield</ex:city>
        |    </ex:address>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val g = RdfXmlCodec.parse(doc)
    val ts = g.triples
    // rdf:ID subject
    assert(ts.exists(t => t.s.value == "#frag" && t.p.value == "http://ex.org/v#knows"
      && t.o.value == "http://ex.org/p1"))
    // typed nested node element emits rdf:type + its own properties
    assert(ts.contains(Triple(RdfTerm.iri("http://ex.org/p1"),
      RdfTerm.iri(Ns.rdfType), RdfTerm.iri("http://ex.org/v#Person"))))
    assert(ts.contains(Triple(RdfTerm.iri("http://ex.org/p1"),
      RdfTerm.iri("http://ex.org/v#name"), RdfTerm.lit("Nested"))))
    // parseType=Resource introduces a bnode with the inner property
    val addr = ts.find(t => t.p.value == "http://ex.org/v#address").get
    assert(addr.o.isBNode)
    assert(ts.contains(Triple(addr.o, RdfTerm.iri("http://ex.org/v#city"),
      RdfTerm.lit("Springfield"))))
  }

  test("turtle: PN_LOCAL escapes and percent sequences parse per W3C §6.5") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |ex:a\~b ex:p ex:with\,comma .
        |ex:pct%20enc ex:p ex:x .
        |""".stripMargin
    val g = TurtleCodec.parse(doc)
    val subjects = g.triples.map(_.s.value).toSet
    assert(subjects == Set("http://ex.org/a~b", "http://ex.org/pct%20enc"))
    assert(g.triples.map(_.o.value).toSet == Set("http://ex.org/with,comma", "http://ex.org/x"))
  }

  test("turtle: @base-relative IRIs resolve (fragment, absolute path, relative path)") {
    val doc =
      """@base <http://ex.org/dir/doc> .
        |<#frag> <http://ex.org/p> <rel> .
        |</abs> <http://ex.org/p> <//host/x> .
        |""".stripMargin
    val g = TurtleCodec.parse(doc)
    val terms = g.triples.flatMap(t => Seq(t.s.value, t.o.value)).toSet
    assert(terms == Set(
      "http://ex.org/dir/doc#frag", "http://ex.org/dir/rel",
      "http://ex.org/abs", "http://host/x"))
  }

  test("turtle: long strings with embedded newlines, escaped quotes, and trailing quotes") {
    val doc =
      "<http://ex/s> <http://ex/p> \"\"\"line one\nline \\\"\"\" two\"\"\" .\n" +
      "<http://ex/s> <http://ex/q> \"\"\"ends with quote\"\"\"\" .\n"
    val g = TurtleCodec.parse(doc)
    val byPred = g.triples.map(t => t.p.value -> t.o.value).toMap
    assert(byPred("http://ex/p") == "line one\nline \"\"\" two")
    assert(byPred("http://ex/q") == "ends with quote\"")
  }

  test("turtle: keyword-prefixed names and case-sensitive keywords") {
    val doc =
      """@prefix a: <http://ex.org/a#> .
        |@prefix true: <http://ex.org/t#> .
        |a:prop a a:Type .
        |true:x <http://ex.org/p> true .
        |""".stripMargin
    val g = TurtleCodec.parse(doc)
    assert(g.triples.contains(Triple(
      RdfTerm.iri("http://ex.org/a#prop"), RdfTerm.iri(Ns.rdfType), RdfTerm.iri("http://ex.org/a#Type"))))
    assert(g.triples.contains(Triple(
      RdfTerm.iri("http://ex.org/t#x"), RdfTerm.iri("http://ex.org/p"),
      RdfTerm.typed("true", Ns.xsdBoolean))))
    // keywords are case-sensitive: 'A' is NOT rdf:type
    intercept[IllegalArgumentException](TurtleCodec.parse("<http://ex/s> A <http://ex/o> ."))
  }
}
