package graft.rdf

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.Files

class DistributedRdfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("readNt over a multi-file glob keeps same-label bnodes distinct per file") {
    val dir = Files.createTempDirectory("graftnt")
    // identical bnode label _:b0 in two files = two distinct nodes (rdflib
    // fresh-bnodes-per-parse merge semantics)
    Files.write(dir.resolve("a.nt"),
      "_:b0 <http://ex/p> \"va\" .\n".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.nt"),
      "_:b0 <http://ex/p> \"vb\" .\n".getBytes(StandardCharsets.UTF_8))
    val rows = DistributedRdf.readNt(spark, dir.toString + "/*.nt").collect()
    assert(rows.length == 2)
    val subjects = rows.map(_.s).toSet
    assert(subjects.size == 2, s"bnode labels conflated across files: $subjects")
    assert(rows.forall(_.s_kind == graft.model.TermKind.BNode))
  }

  test("readNt single file still parses every line") {
    val dir = Files.createTempDirectory("graftnt1")
    val nt = (0 until 100).map(i => s"<http://ex/s$i> <http://ex/p> \"$i\" .").mkString("\n")
    Files.write(dir.resolve("c.nt"), nt.getBytes(StandardCharsets.UTF_8))
    assert(DistributedRdf.readNt(spark, dir.resolve("c.nt").toString).count() == 100)
  }
}
