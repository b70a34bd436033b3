package graft.functions

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new java.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("cosine_f is bit-identical to the HOF cosine formulation") {
    import spark.implicits._
    val dim = 64
    val df = randVecs(50, dim, 7L).toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val got = pairs.select(
      VecFunctions.cosine_f(col("va"), col("vb")).as("native"),
      Dedup.cosine(col("va").cast("array<double>"), col("vb").cast("array<double>"))
        .as("hof"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // same fold order -> identical doubles, not just approximately equal
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_f ranges and self-similarity") {
    import spark.implicits._
    val df = randVecs(20, 16, 11L).toDF("id", "v")
    val self = df.select(VecFunctions.cosine_f(col("v"), col("v"))).collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("lsh_buckets matches a driver-side recomputation of the same planes") {
    import spark.implicits._
    val nTables = 4; val nBits = 6; val dim = 16
    val vecs = randVecs(30, dim, 3L)
    val planes = VecFunctions.hyperplanes(nTables, nBits, dim, 42L)
    val expected = vecs.map { case (id, v) =>
      id -> Array.tabulate(nTables) { t =>
        var sig = 0
        for (b <- 0 until nBits) {
          var d = 0.0
          for (i <- 0 until dim) d += planes(t)(b)(i) * v(i)
          if (d >= 0) sig |= (1 << b)
        }
        sig
      }.toSeq
    }.toMap
    val got = vecs.toDF("id", "v")
      .select(col("id"), VecFunctions.lsh_buckets(col("v"), nTables, nBits, dim).as("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
      .toMap
    assert(got == expected)
  }

  test("native kernels stay inside whole-stage codegen (no ScalaUDF, no fallback)") {
    import spark.implicits._
    // repartition forces the projection out of the LocalTableScan fold
    // repartition forces the projection out of the LocalTableScan fold;
    // collect first so AQE finalizes the plan (WholeStageCodegen wrappers
    // only appear in the final adaptive plan)
    val df = randVecs(5, 8, 1L).toDF("id", "v").repartition(2)
    val q = df.select(
      VecFunctions.cosine_f(col("v"), col("v")),
      VecFunctions.lsh_buckets(col("v"), 2, 4, 8),
      VecFunctions.ivf_cells(col("v"), 4, 2, 8, 7L))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString()
    // "*(n)" is the WholeStageCodegen marker in the compact plan string
    assert(plan.contains("*(1) Project [cosinef"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("ivf_cells matches a driver-side recomputation of the same centroids") {
    import spark.implicits._
    val vecs = randVecs(20, 8, 3L)
    val got = vecs.toDF("id", "v")
      .select(col("id"), VecFunctions.ivf_cells(col("v"), 4, 2, 8, 7L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val cents = VecFunctions.ivfCentroids(4, 8, 7L)
    vecs.foreach { case (id, v) =>
      def cos(c: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        for (i <- v.indices) { dot += c(i) * v(i); na += c(i) * c(i); nb += v(i).toDouble * v(i) }
        math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
      }
      val expected = cents.indices.sortBy(i => (-cos(cents(i)), i)).take(2)
      assert(got(id) == expected, s"vec $id")
    }
  }
}
