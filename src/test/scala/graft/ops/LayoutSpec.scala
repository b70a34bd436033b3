package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Morton interleave's exact bit layout, the bucketizer's edge
  * cases, and the point of the whole exercise: a Z-order-clustered write
  * confines a 2-D box predicate to a few files where a round-robin layout
  * touches every file. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("zValue interleaves bits exactly and is bijective on the grid") {
    import spark.implicits._
    val df = (for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      Layout.zValue(Seq(col("x"), col("y")), bits = 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) == 1L) // x bit 0 -> z bit 0
    assert(got((0L, 1L)) == 2L) // y bit 0 -> z bit 1
    assert(got((3L, 3L)) == 15L)
    assert(got((7L, 7L)) == 63L)
    assert(got.values.toSet.size == 64, "Morton code must be bijective")
    assertThrows[IllegalArgumentException](Layout.zValue(Nil))
    assertThrows[IllegalArgumentException](
      Layout.zValue(Seq(col("x"), col("y")), bits = 32))
  }

  test("minMaxBucket clamps to range and collapses constant columns") {
    import spark.implicits._
    val df = Seq(0L, 500L, 1000L).toDF("x")
    val b = df.select(Layout.minMaxBucket(col("x"), lit(0L), lit(1000L), 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b == Seq(0L, 8L, 15L), "max value lands in the top bucket, not 2^bits")
    val const = df.select(Layout.minMaxBucket(col("x"), lit(7L), lit(7L), 4).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(const == Set(0L), "zero span collapses to bucket 0")
  }

  test("fileStats + compactFiles: small-file dir compacts to target, rows intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    (0 until 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(32).write.parquet(dir)
    val before = Layout.fileStats(spark, dir).collect()
    assert(before.length == 32)
    assert(before.map(_.getAs[Long]("n_rows")).sum == 10000L)
    val totalBytes = before.map(_.getAs[Long]("bytes")).sum
    // target a quarter of the total -> ~4 output files
    val nOut = Layout.compactFiles(spark, dir, targetBytes = totalBytes / 4 + 1)
    assert(nOut >= 3 && nOut <= 5, s"expected ~4 output files, got $nOut")
    val after = Layout.fileStats(spark, dir).collect()
    assert(after.length == nOut)
    assert(after.map(_.getAs[Long]("n_rows")).sum == 10000L)
    assert(spark.read.parquet(dir).select(sum(col("id"))).head.getLong(0)
      == (0 until 10000).map(_.toLong).sum)
  }

  test("z-ordered layout confines a box query to few files; round-robin touches all") {
    import spark.implicits._
    val rows = (0 until 20000).map(i => (i.toLong % 1000, (i.toLong * 37) % 1000))
    val df = rows.toDF("x", "y")
    val dir = Files.createTempDirectory("graft-zorder").toString
    Layout.zorderWrite(df, Seq("x", "y"), s"$dir/z", bits = 16, targetFiles = 16)
    df.repartition(16).write.parquet(s"$dir/rr")
    def touched(path: String): Long =
      spark.read.parquet(path)
        .where(col("x").between(100, 199) && col("y").between(300, 399))
        .select(input_file_name()).distinct().count()
    val zt = touched(s"$dir/z")
    val rt = touched(s"$dir/rr")
    // the 1%-area box intersects at most a handful of Z-contiguous files;
    // a round-robin layout scatters matches across every file
    assert(rt == 16L, s"round-robin should spread matches everywhere, got $rt")
    assert(zt <= 6L, s"z-order should confine the box to few files, got $zt")
    // clustering preserves the data
    assert(spark.read.parquet(s"$dir/z").count() == 20000L)
  }
}
