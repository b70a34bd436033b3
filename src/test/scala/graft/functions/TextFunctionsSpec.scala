package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sim(s: String): Long = TextFunctions.simhash64(UTF8String.fromString(s))
  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("simhash64 kernel: deterministic, token-order-insensitive-ish, locality-sensitive") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    assert(sim(base) == sim(base))
    val near = base + " extra"
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    assert(hamming(sim(base), sim(near)) < hamming(sim(base), sim(far)))
    assert(hamming(sim(base), sim(near)) <= 12)
    assert(hamming(sim(base), sim(far)) >= 16)
    assert(sim("") == 0L)
  }

  test("codegen'd expression equals the interpreted kernel, from DataFrame and SQL") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaColumn = docs.select(col("doc_id"), TextFunctions.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextFunctions.register(spark)
    docs.createOrReplaceTempView("docs_tf")
    val viaSql = spark.sql("SELECT doc_id, simhash64(text) AS h FROM docs_tf")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> sim(r.getString(1))).toMap
    assert(viaColumn == expected)
    assert(viaSql == expected)
    // the expression must stay inside whole-stage codegen (no fallback) —
    // the plan string marks codegen'd spans with "*(stageId)"
    val plan = docs.select(TextFunctions.simhash64(col("text"))).queryExecution
      .executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("rolling_fingerprint: case/punctuation-normalized identity") {
    def fp(s: String) = TextFunctions.rollingFingerprint(UTF8String.fromString(s))
    assert(fp("Hello,  World!") == fp("hello world"))
    assert(fp("a b c") != fp("a b d"))
    import spark.implicits._
    val df = Seq("Hello,  World!", "hello world", "a b c").toDF("t")
    val got = df.select(TextFunctions.rolling_fingerprint(col("t"))).collect().map(_.getLong(0))
    assert(got(0) == got(1) && got(0) != got(2))
  }
}
