package graft.catalog

import graft.model._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class GraphCatalogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tripleDf(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i => TripleRow(s"urn:s:$tag:$i", 0, "urn:p", s"o$i", 2, null, null))
      .toDF()
  }

  /** Snapshot id -> its staging data dir (names are `v<id>-<writer nonce>`
    * since the optimistic-commit protocol; legacy `v<id>` also matches). */
  private def vdir(rootDir: java.nio.file.Path, iri: String, id: Long): Option[java.nio.file.Path] = {
    val d = rootDir.resolve("data").resolve(java.net.URLEncoder.encode(iri, "UTF-8"))
    if (!java.nio.file.Files.isDirectory(d)) None
    else {
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala.find(_.getFileName.toString.matches(s"v$id(-.+)?"))
      finally s.close()
    }
  }

  test("write/read round trip with snapshot ids, count, ask, select (file:// URI root)") {
    // the catalog root is a Hadoop URI, not a local path — file:// here,
    // s3a://hdfs:// in production, one code path
    val root = "file://" + Files.createTempDirectory("graftcat").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    val iri = "urn:x-evn-master:test"
    assert(!cat.exists(iri))
    assert(!cat.ask(iri))
    val id1 = cat.write(iri, tripleDf(6, "a"), leadingComments = Seq("baseURI: x"))
    assert(id1 == 1L)
    assert(cat.exists(iri) && cat.ask(iri))
    assert(cat.count(iri) == 6L) // asset_collection_size semantics
    val (comments, df) = cat.read(iri)
    assert(comments == Seq("baseURI: x"))
    assert(df.count() == 6)
    assert(cat.selectLimit(iri, 3).count() == 3) // SELECT * LIMIT n
    assert(cat.graphs() == Seq(iri))
  }

  test("append merges as set union (SOP 2+4 -> 6 fixture shape)") {
    val root = Files.createTempDirectory("graftcat2").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    val iri = "urn:g"
    cat.write(iri, tripleDf(4, "x"))
    // 2 new + 2 duplicates of existing
    import spark.implicits._
    val extra = (Seq(TripleRow("urn:s:x:0", 0, "urn:p", "o0", 2, null, null),
      TripleRow("urn:s:x:1", 0, "urn:p", "o1", 2, null, null)) ++
      (0 until 2).map(i => TripleRow(s"urn:s:y:$i", 0, "urn:p", s"o$i", 2, null, null))).toDF()
    val id2 = cat.write(iri, extra, overwrite = false)
    assert(id2 == 2L)
    assert(cat.count(iri) == 6L) // 4 + 2 new, duplicates collapsed
  }

  test("diff: CDC changelog between snapshots, delta fast path == full except") {
    import spark.implicits._
    val root = Files.createTempDirectory("graftcatdiff").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    val iri = "urn:gdiff"
    cat.write(iri, tripleDf(4, "x"))                      // v1: x0..x3
    cat.write(iri, tripleDf(2, "y"), overwrite = false)   // v2: + y0 y1
    // delta-append chain: inserts only, and ONLY the delta file set is read
    val d12 = cat.diff(iri, 1L, 2L)
    assert(!d12.queryExecution.analyzed.toString.contains("Except"),
      "append-chain diff must take the O(delta) path, not EXCEPT")
    val got12 = d12.collect().map(r => (r.getAs[String]("s"), r.getAs[String]("change"))).toSet
    assert(got12 == Set("urn:s:y:0" -> "insert", "urn:s:y:1" -> "insert"))
    // overwrite drops x0..x3+y1, keeps y0, adds z0: full two-sided diff
    val v3 = (Seq(TripleRow("urn:s:y:0", 0, "urn:p", "o0", 2, null, null)) ++
      Seq(TripleRow("urn:s:z:0", 0, "urn:p", "oz", 2, null, null))).toDF()
    cat.write(iri, v3)
    val got23 = cat.diff(iri, 2L, 3L).collect()
      .map(r => (r.getAs[String]("s"), r.getAs[String]("change"))).toSet
    assert(got23 == Set("urn:s:z:0" -> "insert",
      "urn:s:x:0" -> "delete", "urn:s:x:1" -> "delete",
      "urn:s:x:2" -> "delete", "urn:s:x:3" -> "delete",
      "urn:s:y:1" -> "delete"))
    // same id -> empty; schema still carries the change column
    assert(cat.diff(iri, 2L, 2L).count() == 0L)
    assert(cat.diff(iri, 2L, 2L).columns.contains("change"))
    // reverse direction over the append chain: falls back, flips labels
    val got21 = cat.diff(iri, 2L, 1L).collect()
      .map(r => (r.getAs[String]("s"), r.getAs[String]("change"))).toSet
    assert(got21 == Set("urn:s:y:0" -> "delete", "urn:s:y:1" -> "delete"))
    assertThrows[IllegalArgumentException](cat.diff(iri, 1L, 99L))
  }

  test("append is a delta commit: previous snapshot files stay byte-untouched") {
    val rootDir = Files.createTempDirectory("graftcat9")
    val cat = new ParquetSnapshotCatalog(spark, rootDir.toString)
    val iri = "urn:delta"
    cat.write(iri, tripleDf(4, "x"))
    val v1 = vdir(rootDir, iri, 1L).get
    def snapshotFiles(dir: java.nio.file.Path): Map[String, Seq[Byte]] = {
      val s = java.nio.file.Files.walk(dir)
      try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(p => dir.relativize(p).toString -> java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
      finally s.close()
    }
    val before = snapshotFiles(v1)
    import spark.implicits._
    val extra = (Seq(TripleRow("urn:s:x:0", 0, "urn:p", "o0", 2, null, null)) ++
      (0 until 2).map(i => TripleRow(s"urn:s:z:$i", 0, "urn:p", s"o$i", 2, null, null))).toDF()
    val id2 = cat.write(iri, extra, overwrite = false)
    // set-union semantics preserved (4 + 2 new, 1 duplicate collapsed)...
    assert(cat.count(iri) == 6L)
    // ...and the append REWROTE NOTHING: v1's files are byte-identical,
    // and the delta dir holds only the 2 genuinely-new rows
    assert(snapshotFiles(v1) == before)
    val v2 = vdir(rootDir, iri, id2).get
    assert(spark.read.parquet(v2.toString).count() == 2L)
    // time travel still sees the pre-append state
    assert(cat.readAt(iri, 1L)._2.count() == 4L)
  }

  test("null o_dtype/o_lang rows do not re-enter on append (null-safe anti-join)") {
    val root = Files.createTempDirectory("graftcat10").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    import spark.implicits._
    val withNulls = Seq(
      TripleRow("urn:s", 0, "urn:p", "lit", 2, null, null),
      TripleRow("urn:s", 0, "urn:p", "typed", 2, "urn:dt", null)).toDF()
    cat.write("urn:nulls", withNulls)
    cat.write("urn:nulls", withNulls, overwrite = false) // pure duplicate delta
    assert(cat.count("urn:nulls") == 2L)
  }

  test("compact folds a delta-append chain into one file set, history intact") {
    val rootDir = Files.createTempDirectory("graftcat12")
    val cat = new ParquetSnapshotCatalog(spark, rootDir.toString)
    val iri = "urn:compact"
    cat.write(iri, tripleDf(4, "a"))
    cat.write(iri, tripleDf(3, "b"), overwrite = false)
    // comments belong to the snapshot that committed them (append included)
    cat.write(iri, tripleDf(2, "c"), overwrite = false, leadingComments = Seq("hdr"))
    assert(cat.count(iri) == 9L)
    val id = cat.compact(iri)
    assert(id == 4L)
    assert(cat.count(iri) == 9L) // content unchanged
    assert(cat.read(iri)._1 == Seq("hdr")) // latest comments carried over
    // the compacted snapshot reads from exactly ONE file set
    val enc = java.net.URLEncoder.encode(iri, "UTF-8")
    val manifest = new String(java.nio.file.Files.readAllBytes(
      rootDir.resolve("_snapshots").resolve(enc).resolve("000000004.json")), "UTF-8")
    assert("\"paths\": \\[[^\\]]*\\]".r.findFirstIn(manifest)
      .exists(p => p.split(",").length == 1))
    // time travel to the pre-compaction chain still works
    assert(cat.readAt(iri, 3L)._2.count() == 9L)
    assert(cat.readAt(iri, 1L)._2.count() == 4L)
  }

  test("expireSnapshots keeps time travel for retained ids, deletes the rest") {
    val rootDir = Files.createTempDirectory("graftcat13")
    val cat = new ParquetSnapshotCatalog(spark, rootDir.toString)
    val iri = "urn:expire"
    cat.write(iri, tripleDf(4, "a"))                       // v1 (overwrite)
    cat.write(iri, tripleDf(3, "b"), overwrite = false)    // v2 = delta, refs v1
    cat.write(iri, tripleDf(5, "c"))                       // v3 (overwrite)
    cat.write(iri, tripleDf(2, "d"), overwrite = false)    // v4 = delta, refs v3
    val expired = cat.expireSnapshots(iri, keepLast = 2)
    assert(expired == Seq(1L, 2L))
    // retained snapshots read intact (incl. the delta chain's shared v3)
    assert(cat.snapshots(iri) == Seq(3L, 4L))
    assert(cat.readAt(iri, 3L)._2.count() == 5L)
    assert(cat.readAt(iri, 4L)._2.count() == 7L)
    assert(cat.count(iri) == 7L)
    // expired ids error instead of reading half-deleted data
    intercept[IllegalArgumentException](cat.readAt(iri, 1L))
    intercept[IllegalArgumentException](cat.readAt(iri, 2L))
    // the unreferenced file sets (v1, v2) are physically gone; v3/v4 remain
    assert(vdir(rootDir, iri, 1L).isEmpty)
    assert(vdir(rootDir, iri, 2L).isEmpty)
    assert(vdir(rootDir, iri, 3L).isDefined)
    assert(vdir(rootDir, iri, 4L).isDefined)
  }

  test("expireSnapshots never deletes a file set a retained delta still references") {
    val rootDir = Files.createTempDirectory("graftcat14")
    val cat = new ParquetSnapshotCatalog(spark, rootDir.toString)
    val iri = "urn:expire2"
    cat.write(iri, tripleDf(4, "a"))                       // v1: base file set
    cat.write(iri, tripleDf(3, "b"), overwrite = false)    // v2 refs v1+v2
    cat.write(iri, tripleDf(2, "c"), overwrite = false)    // v3 refs v1+v2+v3
    assert(cat.expireSnapshots(iri, keepLast = 1) == Seq(1L, 2L))
    // snapshot 3 still reads the full union through the retained chain:
    // v1 and v2 dirs MUST survive even though snapshots 1 and 2 are gone
    assert(cat.count(iri) == 9L)
    assert(vdir(rootDir, iri, 1L).isDefined)
    assert(vdir(rootDir, iri, 2L).isDefined)
  }

  test("compact reclaims a crashed write's orphaned uncommitted data dir") {
    val rootDir = Files.createTempDirectory("graftcat15")
    val cat = new ParquetSnapshotCatalog(spark, rootDir.toString)
    val iri = "urn:orphan"
    cat.write(iri, tripleDf(4, "a"))
    cat.write(iri, tripleDf(3, "b"))
    // simulate a writer that died between its parquet write and its
    // manifest rename: a v<id> staging dir no manifest names, below the
    // latest id (legacy suffixless shape — reclaim matches both)
    val enc = java.net.URLEncoder.encode(iri, "UTF-8")
    val dataDir = rootDir.resolve("data").resolve(enc)
    tripleDf(9, "dead").write.parquet(dataDir.resolve("v0").toString)
    assert(java.nio.file.Files.exists(dataDir.resolve("v0")))
    cat.compact(iri)
    assert(!java.nio.file.Files.exists(dataDir.resolve("v0"))) // reclaimed
    // referenced dirs untouched; content unchanged
    assert(vdir(rootDir, iri, 1L).isDefined)
    assert(cat.count(iri) == 3L)
    assert(cat.readAt(iri, 1L)._2.count() == 4L)
  }

  test("concurrent appenders both commit: loser of the manifest CAS retries") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val root = Files.createTempDirectory("graftcat17").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    val iri = "urn:race"
    cat.write(iri, tripleDf(2, "base"))
    // two writers race the same graph: each stages in a writer-unique dir,
    // the manifest rename is the CAS; the loser MUST retry with its delta
    // recomputed against the winner's snapshot (a stale anti-join would
    // re-admit the winner's rows)
    val f1 = Future(cat.write(iri, tripleDf(3, "left"), overwrite = false))
    val f2 = Future(cat.write(iri, tripleDf(4, "right"), overwrite = false))
    val ids = Set(Await.result(f1, 120.seconds), Await.result(f2, 120.seconds))
    assert(ids == Set(2L, 3L)) // both committed, distinct ids
    assert(cat.snapshots(iri) == Seq(1L, 2L, 3L))
    assert(cat.count(iri) == 9L) // 2 base + 3 + 4, nothing lost or doubled
  }

  test("append with a mismatched column set fails loudly, not silently dropping") {
    val root = Files.createTempDirectory("graftcat16").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    cat.write("urn:cols", tripleDf(2, "a"))
    import spark.implicits._
    val extraCol = tripleDf(1, "b").withColumn("provenance",
      org.apache.spark.sql.functions.lit("x"))
    val e1 = intercept[IllegalArgumentException](
      cat.write("urn:cols", extraCol, overwrite = false))
    assert(e1.getMessage.contains("provenance"))
    val missingCol = tripleDf(1, "c").drop("o_lang")
    val e2 = intercept[IllegalArgumentException](
      cat.write("urn:cols", missingCol, overwrite = false))
    assert(e2.getMessage.contains("o_lang"))
    assert(cat.count("urn:cols") == 2L) // nothing moved
  }

  test("a legacy flat _snapshots layout is migrated, not silently emptied") {
    val rootDir = Files.createTempDirectory("graftcat11")
    val cat = new ParquetSnapshotCatalog(spark, rootDir.toString)
    cat.write("urn:legacy", tripleDf(3, "a"))
    val enc = java.net.URLEncoder.encode("urn:legacy", "UTF-8")
    val snaps = rootDir.resolve("_snapshots")
    // simulate a catalog written by the old flat layout: move the manifest
    // up to _snapshots/<enc>.<id>.json and drop the per-graph dir
    val manifest = snaps.resolve(enc).resolve("000000001.json")
    java.nio.file.Files.move(manifest, snaps.resolve(s"$enc.000000001.json"))
    // remove the per-graph dir (and its Hadoop .crc sidecars) entirely
    val walk = java.nio.file.Files.walk(snaps.resolve(enc))
    try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    finally walk.close()
    // a fresh open migrates: the graph is visible, history intact, and the
    // next write continues the id sequence instead of clobbering v1
    val cat2 = new ParquetSnapshotCatalog(spark, rootDir.toString)
    assert(cat2.exists("urn:legacy"))
    assert(cat2.count("urn:legacy") == 3L)
    assert(cat2.write("urn:legacy", tripleDf(2, "b")) == 2L)
    assert(cat2.readAt("urn:legacy", 1L)._2.count() == 3L)
  }

  test("dot-prefix graph IRIs do not capture each other's snapshots") {
    val root = Files.createTempDirectory("graftcat4").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    // 'urn:g' is a dot-prefix of 'urn:g.x' after URL-encoding ('.' survives);
    // manifest matching must be exact, not startsWith
    cat.write("urn:g.x", tripleDf(7, "other"))
    assert(!cat.exists("urn:g"))
    cat.write("urn:g", tripleDf(3, "mine"))
    assert(cat.count("urn:g") == 3L)
    assert(cat.count("urn:g.x") == 7L)
    assert(cat.graphs().sorted == Seq("urn:g", "urn:g.x"))
  }

  test("workflow URN munging mirrors the SOP reference semantics") {
    // persistence_systems.py:844-865
    val wf = "urn:x-evn-tag:datagraph_name:workflow_name:Administrator"
    assert(GraphCatalog.graphFromWorkflow(wf) == "urn:x-evn-master:datagraph_name")
    assert(GraphCatalog.tagFromWorkflow(wf) == "urn:x-tags:workflow_name")
    intercept[IllegalArgumentException](GraphCatalog.graphFromWorkflow("urn:x-evn-master:dg"))
    intercept[IllegalArgumentException](GraphCatalog.tagFromWorkflow("urn:other:dg"))
  }

  test("workflow-aware exists delegates to the master graph") {
    val root = Files.createTempDirectory("graftcat5").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    val wf = "urn:x-evn-tag:dg1:wf1:Administrator"
    assert(!cat.exists(wf)) // master absent
    cat.write("urn:x-evn-master:dg1", tripleDf(2, "m"))
    assert(cat.exists(wf)) // master present -> workflow URN exists
    assert(!cat.exists("urn:x-evn-tag:dg2:wf1:Administrator"))
  }

  test("the whole catalog surface resolves workflow URNs, not just exists") {
    val root = Files.createTempDirectory("graftcat7").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    val wf = "urn:x-evn-tag:dgx:wfx:Administrator"
    // write THROUGH the workflow URN lands in the master graph
    val id = cat.write(wf, tripleDf(4, "w"))
    assert(cat.exists(wf) && cat.ask(wf)) // ask must not crash after exists passes
    assert(cat.count(wf) == 4L)
    assert(cat.count("urn:x-evn-master:dgx") == 4L)
    assert(cat.selectLimit(wf, 2).count() == 2)
    assert(cat.snapshots(wf) == Seq(id))
    assert(cat.readAt(wf, id)._2.count() == 4)
  }

  test("overwrite bumps the snapshot id and replaces content") {
    val root = Files.createTempDirectory("graftcat3").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    cat.write("urn:g", tripleDf(5, "v1"))
    cat.write("urn:g", tripleDf(2, "v2"))
    assert(cat.count("urn:g") == 2L)
  }

  test("snapshot ids survive the 9-digit zero-pad width (numeric, not lexicographic)") {
    // ids are parsed and compared numerically: a manifest named with MORE
    // digits than the %09d pad (snapshot 1e9+) must stay visible and sort
    // after id 1, not vanish and restart the id sequence
    val root = Files.createTempDirectory("graftcat8").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    cat.write("urn:big", tripleDf(2, "a"))
    // simulate a long-lived graph: hand-place a committed manifest at id 1e9
    val dir = java.nio.file.Paths.get(root, "_snapshots",
      java.net.URLEncoder.encode("urn:big", "UTF-8"))
    val m1 = new String(java.nio.file.Files.readAllBytes(
      dir.resolve("000000001.json")), "UTF-8")
    java.nio.file.Files.write(dir.resolve("1000000000.json"),
      m1.replace("\"1\"", "\"1000000000\"").getBytes("UTF-8"))
    assert(cat.snapshots("urn:big") == Seq(1L, 1000000000L))
    val id = cat.write("urn:big", tripleDf(3, "b"))
    assert(id == 1000000001L) // next id continues past the pad width
    assert(cat.count("urn:big") == 3L)
  }

  test("time travel: historical snapshots stay readable and immutable") {
    val root = Files.createTempDirectory("graftcat6").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    val id1 = cat.write("urn:tt", tripleDf(5, "v1"), leadingComments = Seq("first"))
    val id2 = cat.write("urn:tt", tripleDf(2, "v2"))
    assert(cat.snapshots("urn:tt") == Seq(id1, id2))
    val (c1, df1) = cat.readAt("urn:tt", id1)
    assert(c1 == Seq("first") && df1.count() == 5)
    assert(cat.readAt("urn:tt", id2)._2.count() == 2)
    assert(cat.read("urn:tt")._2.count() == 2) // latest == id2
    intercept[IllegalArgumentException](cat.readAt("urn:tt", 99L))
  }

  test("object-store catalog roots are rejected: rename there is not an atomic CAS") {
    // S3A rename = exists-check-then-copy, so two racing committers can both
    // win and one committed snapshot is silently lost — the reason Iceberg
    // refuses rename-based commits on S3. The gate must fire BEFORE any
    // object-store IO (no s3a jars needed to get the error).
    val e = intercept[IllegalArgumentException](
      new ParquetSnapshotCatalog(spark, "s3a://some-bucket/catalog"))
    assert(e.getMessage.contains("atomic"))
    assert(e.getMessage.contains("s3a"))
    // explicit single-writer opt-in opens the gate: construction proceeds
    // past our check (and fails later, deeper in Hadoop, for lack of s3a
    // jars in this sandbox — any non-IllegalArgumentException proves the
    // gate itself opened)
    spark.conf.set("graft.catalog.allowNonAtomicRename", "true")
    try {
      val e2 = intercept[Exception](
        new ParquetSnapshotCatalog(spark, "s3a://some-bucket/catalog"))
      assert(!e2.isInstanceOf[IllegalArgumentException])
    } finally spark.conf.unset("graft.catalog.allowNonAtomicRename")
  }

  test("nonce is host-unique: hostname tag + pid + start time + counter, no RNG") {
    val n1 = GraphCatalog.nextNonce()
    val n2 = GraphCatalog.nextNonce()
    assert(n1 != n2) // counter advances
    // 4 components: hostTag x pid x startTime x counter — the host tag is
    // what makes two driver JVMs on DIFFERENT machines collision-free
    // (pids repeat across hosts; masked start times collide mod ~4.6 h)
    assert(n1.split("x").length == 4)
    assert(n1.split("x").head == n2.split("x").head) // same host, same tag
  }

  test("a staging-write failure from a missing dir is a retryable race, not a crash") {
    // a lagging appender whose live v<id>-<nonce> staging dir a concurrent
    // compact/expire pass reclaimed sees FileNotFoundException nested in the
    // Spark job failure; writeAttempt must map that to a clean retry
    val cat = new ParquetSnapshotCatalog(
      spark, Files.createTempDirectory("graftcat19").toString)
    val fnf = new java.io.FileNotFoundException("v3-abc/part-0.parquet")
    val wrapped = new RuntimeException("job aborted",
      new java.io.IOException("task failed", fnf))
    assert(cat.causedByMissingPath(wrapped))
    assert(cat.causedByMissingPath(fnf))
    assert(!cat.causedByMissingPath(new RuntimeException("unrelated")))
    // a cause CYCLE must not hang the walk
    val a = new RuntimeException("a"); val b = new RuntimeException("b", a)
    a.initCause(b)
    assert(!cat.causedByMissingPath(a))
  }
}
