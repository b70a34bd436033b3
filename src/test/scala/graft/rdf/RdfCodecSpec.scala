package graft.rdf

import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/**
 * Golden fixtures frozen from the reference test suite
 * (/root/reference/tests/test_convert.py, tests/
 * test_persistence_systems_generic_methods.py) — byte-for-byte for Turtle,
 * line-set for N-Triples.
 */
class RdfCodecSpec extends AnyFunSuite {

  val fixtureTtl: String =
    """@prefix owl: <http://www.w3.org/2002/07/owl#> .
      |@prefix sdo: <https://schema.org/> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |
      |<http://orcid.org/0000-0002-8742-7730> a owl:NamedIndividual,
      |        sdo:Person ;
      |    sdo:affiliation <https://surroundaustralia.com> ;
      |    sdo:email "nicholas.car@surroundaustralia.com"^^xsd:anyURI ;
      |    sdo:jobTitle "Data Systems Architect" ;
      |    sdo:name "Nicholas J. Car" .
      |""".stripMargin

  val expectedNtLines: Set[String] = Set(
    """<http://orcid.org/0000-0002-8742-7730> <https://schema.org/email> "nicholas.car@surroundaustralia.com"^^<http://www.w3.org/2001/XMLSchema#anyURI> .""",
    """<http://orcid.org/0000-0002-8742-7730> <https://schema.org/affiliation> <https://surroundaustralia.com> .""",
    """<http://orcid.org/0000-0002-8742-7730> <https://schema.org/jobTitle> "Data Systems Architect" .""",
    """<http://orcid.org/0000-0002-8742-7730> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <https://schema.org/Person> .""",
    """<http://orcid.org/0000-0002-8742-7730> <https://schema.org/name> "Nicholas J. Car" .""",
    """<http://orcid.org/0000-0002-8742-7730> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#NamedIndividual> .""")

  // reference_string_1 (test_persistence_systems_generic_methods.py:21-32)
  val referenceString1: String = fixtureTtl + "\n"

  test("turtle parse extracts the 6 fixture triples") {
    val g = TurtleCodec.parse(fixtureTtl)
    assert(g.triples.size == 6)
    assert(g.prefixes == Map(
      "owl" -> "http://www.w3.org/2002/07/owl#",
      "sdo" -> "https://schema.org/",
      "xsd" -> "http://www.w3.org/2001/XMLSchema#"))
  }

  test("golden A: ttl -> nt line set (test_convert.py:13-35)") {
    val g = TurtleCodec.parse(fixtureTtl)
    val nt = NtCodec.serialize(g)
    val lines = nt.split("\n").filter(_.nonEmpty).toSet
    assert(lines == expectedNtLines)
  }

  test("golden: generate_string turtle == reference_string_1 (exact bytes)") {
    val g = TurtleCodec.parse(fixtureTtl)
    val out = RdfIo.generateString(g, "turtle")
    assert(out == referenceString1)
  }

  test("golden: generate_string with one comment == reference_string_2") {
    val g = TurtleCodec.parse(fixtureTtl)
    val c1 = "baseURI: https://data.surroundaustralia.com/manifest/3dcaddocs"
    val out = RdfIo.generateString(g, "turtle", Seq(c1))
    assert(out == s"# $c1\n\n" + referenceString1)
  }

  test("golden: generate_string with two comments == reference_string_3") {
    val g = TurtleCodec.parse(fixtureTtl)
    val c1 = "baseURI: https://data.surroundaustralia.com/manifest/3dcaddocs"
    val c2 = "imports: https://data.surroundaustralia.com/manifest/doc"
    val out = RdfIo.generateString(g, "turtle", Seq(c1, c2))
    assert(out == s"# $c1\n# $c2\n\n" + referenceString1)
  }

  test("golden B: convert ttl->turtle with comments, exact file bytes (test_convert.py:38-62)") {
    val tmp = Files.createTempDirectory("graft")
    val in = tmp.resolve("file_01.ttl")
    Files.write(in, fixtureTtl.getBytes("UTF-8"))
    val out = GraphOps.convert(in, tmp, "turtle", Some("converted"),
      Seq("test comment one", "test comment two"))
    val got = new String(Files.readAllBytes(out), "UTF-8")
    val expected = "# test comment one\n# test comment two\n\n" + referenceString1
    assert(got == expected)
  }

  test("comment scrape round-trip (persistence_systems.py:126-136)") {
    val doc = "# baseURI: x\n# imports: y\n\n@prefix sdo: <https://schema.org/> .\n"
    val (comments, _) = RdfIo.scrapeComments(doc)
    assert(comments == Seq("baseURI: x", "imports: y"))
    val (c2, g) = RdfIo.readString(fixtureTtl, "turtle")
    assert(c2.isEmpty && g.triples.size == 6)
  }

  test("comment validation: non-turtle and '#'-prefixed rejected (persistence_systems.py:66-76)") {
    intercept[IllegalArgumentException](RdfIo.validateComments(Seq("x"), "nt"))
    intercept[IllegalArgumentException](RdfIo.validateComments(Seq("# x"), "turtle"))
    RdfIo.validateComments(Seq("ok"), "turtle")
  }

  test("all valid format tokens serialize an empty graph; invalid token throws") {
    RdfFormat.validTokens.foreach { tok =>
      RdfIo.generateString(ParsedGraph.empty, tok)
    }
    intercept[IllegalArgumentException](RdfIo.generateString(ParsedGraph.empty, "aslkdjfsadf"))
  }

  test("nt parse/serialize round trip with escapes, lang tags, bnodes") {
    val tricky = Vector(
      Triple(RdfTerm.iri("http://ex/s"), RdfTerm.iri("http://ex/p"),
        RdfTerm.lit("line1\nline2\t\"quoted\" \\slash")),
      Triple(RdfTerm.bnode("b1"), RdfTerm.iri("http://ex/p"), RdfTerm.lang("hola", "es")),
      Triple(RdfTerm.iri("http://ex/s"), RdfTerm.iri("http://ex/q"),
        RdfTerm.typed("42", Ns.xsdInteger)))
    val g = ParsedGraph(tricky, Map.empty)
    val round = NtCodec.parse(NtCodec.serialize(g))
    assert(round.triples.toSet == tricky.toSet)
  }

  test("turtle round trip preserves the triple set (incl. numbers, booleans, bnode lists)") {
    val src =
      """@prefix ex: <http://example.org/> .
        |ex:s ex:int 42 ; ex:dec 3.14 ; ex:dbl 1.0e3 ; ex:flag true ;
        |  ex:tag "hi"@en ; ex:plain "x" ; ex:link ex:o .
        |_:b1 ex:p ex:s .
        |ex:list ex:items ( ex:a ex:b ) .
        |[ ex:anon "v" ] .
        |""".stripMargin
    val g = TurtleCodec.parse(src)
    val round = TurtleCodec.parse(TurtleCodec.serialize(g))
    // bnode labels may differ; compare label-insensitively via NT with bnodes blanked
    def shape(pg: ParsedGraph): Set[String] = pg.triples.map { t =>
      def f(x: RdfTerm) = if (x.isBNode) x.copy(value = "_") else x
      Triple(f(t.s), t.p, f(t.o)).toString
    }.toSet
    assert(round.triples.size == g.triples.size)
    assert(shape(round) == shape(g))
  }

  test("rdf/xml parses the reference fixture shape (file_02.rdf)") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<rdf:RDF
        |   xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |   xmlns:sdo="https://schema.org/"
        |>
        |  <rdf:Description rdf:about="http://orcid.org/0000-0002-8742-7731">
        |    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#NamedIndividual"/>
        |    <rdf:type rdf:resource="https://schema.org/Person"/>
        |    <sdo:affiliation rdf:resource="https://surroundaustralia.com"/>
        |    <sdo:email rdf:datatype="http://www.w3.org/2001/XMLSchema#anyURI">david.habgood@surroundaustralia.com</sdo:email>
        |    <sdo:jobTitle>Applications Architect</sdo:jobTitle>
        |    <sdo:name>David Habgood</sdo:name>
        |  </rdf:Description>
        |</rdf:RDF>
        |""".stripMargin
    val g = RdfXmlCodec.parse(xml)
    assert(g.triples.size == 6)
    assert(g.triples.forall(_.s.value == "http://orcid.org/0000-0002-8742-7731"))
    val round = RdfXmlCodec.parse(RdfXmlCodec.serialize(g))
    assert(round.triples.toSet == g.triples.toSet)
  }

  test("json-ld parses the reference fixture shape (file_03.json-ld)") {
    val jsonld =
      """[
        |  {
        |    "@id": "http://orcid.org/0000-0002-8742-7732",
        |    "@type": [
        |      "http://www.w3.org/2002/07/owl#NamedIndividual",
        |      "https://schema.org/Person"
        |    ],
        |    "https://schema.org/affiliation": [ { "@id": "https://surroundaustralia.com" } ],
        |    "https://schema.org/email": [
        |      { "@type": "http://www.w3.org/2001/XMLSchema#anyURI",
        |        "@value": "jamie.feiss@surroundaustralia.com" } ],
        |    "https://schema.org/jobTitle": [ { "@value": "Programmer" } ],
        |    "https://schema.org/name": [ { "@value": "Jamie Feiss" } ]
        |  }
        |]""".stripMargin
    val g = JsonLdCodec.parse(jsonld)
    assert(g.triples.size == 6)
    val round = JsonLdCodec.parse(JsonLdCodec.serialize(g))
    assert(round.triples.toSet == g.triples.toSet)
  }

  test("cross-format convert parity: all three fixture formats yield the same shape") {
    // same person shape, different subjects, as in the reference data files
    val ttl = TurtleCodec.parse(fixtureTtl)
    val viaNt = NtCodec.parse(NtCodec.serialize(ttl))
    val viaXml = RdfXmlCodec.parse(RdfXmlCodec.serialize(ttl))
    val viaJson = JsonLdCodec.parse(JsonLdCodec.serialize(ttl))
    assert(viaNt.triples.toSet == ttl.triples.toSet)
    assert(viaXml.triples.toSet == ttl.triples.toSet)
    assert(viaJson.triples.toSet == ttl.triples.toSet)
  }

  test("convert/merge accept file:// URIs through the Hadoop-FileSystem path (S3 parity)") {
    val tmp = Files.createTempDirectory("grafturi")
    val in = tmp.resolve("file_01.ttl")
    Files.write(in, fixtureTtl.getBytes("UTF-8"))
    val inUri = "file://" + in.toAbsolutePath
    val outDirUri = "file://" + tmp.toAbsolutePath
    // file-list expansion over a URI directory
    val listed = RdfIo.prepareFilesListUri(outDirUri)
    assert(listed.size == 1 && listed.head.endsWith("file_01.ttl"))
    // convert by URI — same writer path as s3a://
    val outUri = GraphOps.convert(inUri, outDirUri, "nt", Some("viaUri"), Nil)
    assert(RdfIo.fileExists(outUri))
    val nt = new String(Files.readAllBytes(tmp.resolve("viaUri.nt")), "UTF-8")
    assert(nt.split("\n").filter(_.nonEmpty).toSet == expectedNtLines)
    // merge by URI
    val mergedUri = GraphOps.mergeUris(Seq(inUri, inUri), outDirUri, "nt")
    assert(mergedUri.endsWith("merged.nt"))
    val merged = NtCodec.parse(new String(Files.readAllBytes(tmp.resolve("merged.nt")), "UTF-8"))
    assert(merged.triples.size == 6) // identical file twice: set union collapses
  }

  test("merge: set union dedups across files (rdfx_cli.py:74-94; SOP len==6 fixture)") {
    val tmp = Files.createTempDirectory("graftmerge")
    val two = "<urn:a> <urn:b> <urn:c> .\n<urn:a> <urn:d> <urn:e> .\n"
    val four = two + "<urn:f> <urn:g> <urn:h> .\n<urn:f> <urn:i> <urn:j> .\n"
    Files.write(tmp.resolve("g1.nt"), two.getBytes)
    Files.write(tmp.resolve("g2.nt"), four.getBytes)
    val out = GraphOps.merge(Seq(tmp.resolve("g1.nt"), tmp.resolve("g2.nt")), tmp, "nt")
    assert(out.getFileName.toString == "merged.nt")
    val merged = NtCodec.parse(new String(Files.readAllBytes(out), "UTF-8"))
    assert(merged.triples.size == 4) // 2 dup triples collapse
    intercept[IllegalArgumentException](
      GraphOps.merge(Seq(tmp.resolve("nope.txt")), tmp, "nt"))
  }

  test("clean: prunes unused prefixes, preserves comments (intended rdfx_cli.py:106-152 semantics)") {
    val tmp = Files.createTempDirectory("graftclean")
    val src = "# keep me\n\n@prefix sdo: <https://schema.org/> .\n@prefix unused: <http://nowhere.org/> .\n\n<http://ex/s> sdo:name \"x\" .\n"
    val f = tmp.resolve("c.ttl")
    Files.write(f, src.getBytes)
    val out = GraphOps.clean(f)
    val got = new String(Files.readAllBytes(out), "UTF-8")
    assert(got.startsWith("# keep me\n\n"))
    assert(got.contains("@prefix sdo:"))
    assert(!got.contains("unused"))
  }

  test("format inference + file list expansion ordering (fixture-pinned)") {
    assert(RdfFormat.inferFromPath("a/b/x.ttl") == RdfFormat.Turtle)
    assert(RdfFormat.inferFromPath("x.rdf") == RdfFormat.RdfXml)
    assert(RdfFormat.inferFromPath("x.jsonld") == RdfFormat.JsonLd)
    intercept[IllegalArgumentException](RdfFormat.inferFromPath("x.docx"))
    val tmp = Files.createTempDirectory("graftlist")
    Seq("file_01.ttl", "file_02.rdf", "file_03.json-ld").foreach { n =>
      Files.write(tmp.resolve(n), "".getBytes)
    }
    val listed = RdfIo.prepareFilesList(tmp).map(_.getFileName.toString)
    assert(listed == Seq("file_01.ttl", "file_03.json-ld", "file_02.rdf"))
  }
}
