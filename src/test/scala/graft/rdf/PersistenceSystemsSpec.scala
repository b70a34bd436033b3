package graft.rdf

import graft.catalog.ParquetSnapshotCatalog
import graft.model._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class PersistenceSystemsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sampleGraph(n: Int, tag: String = "s"): ParsedGraph =
    ParsedGraph((0 until n).map(i => Triple(
      RdfTerm.iri(s"http://ex.org/$tag$i"), RdfTerm.iri("http://ex.org/p"),
      RdfTerm.lit(s"v$i"))).toVector, Map.empty)

  test("registry carries the reference's six system names") {
    assert(PersistenceSystems.names ==
      Set("String", "File", "SOP", "GraphDB", "Fuseki", "S3"))
  }

  test("String system: write returns the generated string; read scrapes comments") {
    val ps = new StringStore
    val out = ps.write(sampleGraph(1), "turtle", Seq("a comment"))
    assert(out.startsWith("# a comment\n\n"))
    val (comments, g) = ps.read(out, "turtle")
    assert(comments == Seq("a comment"))
    assert(g.triples == sampleGraph(1).triples)
  }

  test("File and S3 systems share the Hadoop-FS path (file:// URI)") {
    val dir = Files.createTempDirectory("graftps").toString
    val file = new FileStore(dir)
    val s3like = new S3Store("file://" + dir)
    val path = file.write(sampleGraph(3), "g", "nt")
    assert(path.endsWith("g.nt"))
    assert(file.exists("g.nt") && s3like.exists("g.nt"))
    val (_, viaS3) = s3like.read("g.nt")
    assert(viaS3.triples.toSet == sampleGraph(3).triples.toSet)
  }

  test("SOP system: import message fixture, 2+4 -> 6 set union, workflow resolution") {
    val root = Files.createTempDirectory("graftsop").toString
    val sop = new SopStore(spark, new ParquetSnapshotCatalog(spark, root))
    val datagraph = "urn:x-evn-master:dg"
    // seed the datagraph with 4 triples
    sop.write(sampleGraph(4, "seed"), datagraph)
    // reference fixture: insert through the WORKFLOW urn, exact response text
    // (tests/test_persistence_system_local_sop.py:70-73)
    val wf = "urn:x-evn-tag:dg:wf1:Administrator"
    val msg = sop.write(sampleGraph(2, "new"), wf)
    assert(msg == "File with 2 statements has been imported successfully. \n")
    // read back through both addressings: 4 + 2 = 6 (len(g)==6 fixture)
    assert(sop.read(datagraph)._2.triples.size == 6)
    assert(sop.read(wf)._2.triples.size == 6)
    assert(sop.assetExists(wf) && sop.assetExists(datagraph))
    assert(sop.assetCollectionSize(datagraph) == 6L)
    // O9-O11 query surface over SPARQL text
    assert(sop.query(s"ASK WHERE {GRAPH <$datagraph> {?s ?p ?o}}", datagraph) == true)
    assert(sop.query(s"SELECT (COUNT(*) AS ?count) WHERE {GRAPH <$datagraph> {?s ?p ?o}}", datagraph) == 6L)
    val rows = sop.query("SELECT * {?s ?p ?o} LIMIT 3", datagraph)
      .asInstanceOf[Seq[Map[String, String]]]
    assert(rows.size == 3 && rows.forall(_.keySet == Set("s", "p", "o")))
    intercept[IllegalArgumentException](sop.write(sampleGraph(1), "not-an-iri"))
  }

  test("SOP asset creation mints reference-shaped URNs (persistence_systems.py:592-758)") {
    val root = Files.createTempDirectory("graftsopassets").toString
    val sop = new SopStore(spark, new ParquetSnapshotCatalog(spark, root), username = "Administrator")
    // create_datagraph: named
    val dg = sop.createDatagraph(datagraphName = Some("my_data"))
    assert(dg == "urn:x-evn-master:my_data")
    assert(sop.assetExists(dg))
    // giving the full master URN as the name strips the prefix (intended
    // semantics of the reference's str.strip quirk)
    assert(sop.createDatagraph(datagraphName = Some("urn:x-evn-master:my_data")) == dg)
    // name defaulting: reference embeds getpass.getuser()+datetime.now();
    // here the wall-clock component is a caller token (determinism)
    val user = System.getProperty("user.name")
    val defaulted = sop.createDatagraph(nameToken = Some("T0"))
    assert(defaulted == s"urn:x-evn-master:Python_created_Datagraph_by_${user}_at_T0")
    intercept[IllegalArgumentException](sop.createDatagraph())
    // create_workflow: tag URN shape <master->tag>:<wf>:<user>
    val wf = sop.createWorkflow(dg, workflowName = Some("wf_1"))
    assert(wf == "urn:x-evn-tag:my_data:wf_1:Administrator")
    assert(graft.catalog.GraphCatalog.graphFromWorkflow(wf) == dg)
    assert(sop.assetExists(wf)) // master exists -> workflow URN exists
    // create_manifest: master URN with manifest defaults
    assert(sop.createManifest(manifestName = Some("man 1")) == "urn:x-evn-master:man 1")
    // create_file: imports the file's graph at the derived baseURI; a
    // second create raises the reference's already-exists error verbatim
    val dir = Files.createTempDirectory("graftsopfile")
    val f = new FileStore(dir.toString)
    f.write(sampleGraph(3, "f"), "asset", "turtle")
    val fileUri = dir.resolve("asset.ttl").toString
    val baseUri = sop.createFile(fileUri)
    assert(baseUri == s"https://data.surroundaustralia.com/file/$fileUri")
    assert(sop.assetCollectionSize(baseUri) == 3L)
    val err = intercept[IllegalArgumentException](sop.createFile(fileUri))
    assert(err.getMessage ==
      s"Asset (probably a file) already exists with baseURI: $baseUri")
  }

  test("GraphDB/Fuseki stubs validate then raise NotImplemented (reference v0.4.11 parity)") {
    intercept[IllegalArgumentException](new GraphDbStore("ftp://x", "repo"))
    intercept[IllegalArgumentException](new FusekiStore("http://x", null))
    val gdb = new GraphDbStore("http://localhost:7200", "repo")
    intercept[IllegalArgumentException](gdb.write(sampleGraph(1), "bad iri"))
    intercept[NotImplementedError](gdb.write(sampleGraph(1), "urn:g"))
    val fus = new FusekiStore("http://localhost:3030", "ds")
    intercept[NotImplementedError](fus.write(sampleGraph(1), "http://g"))
  }
}
