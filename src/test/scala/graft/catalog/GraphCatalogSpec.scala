package graft.catalog

import graft.model._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

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

  test("write/read round trip with snapshot ids, count, ask, select") {
    val root = Files.createTempDirectory("graftcat").toString
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

  test("overwrite bumps the snapshot id and replaces content") {
    val root = Files.createTempDirectory("graftcat3").toString
    val cat = new ParquetSnapshotCatalog(spark, root)
    cat.write("urn:g", tripleDf(5, "v1"))
    cat.write("urn:g", tripleDf(2, "v2"))
    assert(cat.count("urn:g") == 2L)
  }
}
