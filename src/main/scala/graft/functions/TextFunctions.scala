package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static text-sketch kernels + their Catalyst wrappers.
 *
 * [[Simhash64]] is a NATIVE codegen'd `Expression` (preference order (b) of
 * the build brief: composing built-ins can't express a per-token 64-bit
 * bit-vote in one pass, and a Scala UDF would pay serialization per row).
 * `doGenCode` emits a direct static call, so the whole projection stays
 * inside whole-stage codegen with zero boxing.
 *
 * The 64-bit SimHash here is the production-scale variant of the
 * oracle-checked 16-bit md5 sketch in graft.ops.Dedup (which exists for
 * cross-engine verifiability); this one is for throughput.
 */
object TextFunctions {

  /** FNV-1a 64-bit over a byte range — deterministic, dependency-free. */
  @inline private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // finalizer (splitmix64) to spread FNV's weak low bits
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit SimHash over whitespace-delimited tokens. Called from codegen. */
  def simhash64(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          val h = fnv1a(bytes, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /**
   * Rolling (Rabin-Karp-style polynomial) fingerprint of the full text,
   * case-normalized — the document-identity hash for streaming dedup where
   * recomputing md5 of a normalized copy would double the allocation.
   */
  def rollingFingerprint(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    var seenContent = false
    var pendingSep = false
    while (i < bytes.length) {
      val b0 = bytes(i)
      val c = if (b0 >= 'A' && b0 <= 'Z') (b0 + 32).toByte else b0
      val isAlnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c < 0
      if (isAlnum) {
        // emit the separator lazily so leading/trailing runs are trimmed
        if (pendingSep) { h = h * 1315423911L + ' '; pendingSep = false }
        h = h * 1315423911L + (c & 0xffL)
        seenContent = true
      } else if (seenContent) {
        pendingSep = true
      }
      i += 1
    }
    h
  }

  // Spark 4: Column wraps a ColumnNode; the bridge converts to/from Catalyst
  private val eu = org.apache.spark.sql.graftbridge.ColumnBridge
  def simhash64(c: Column): Column = eu.column(Simhash64(eu.expression(c)))
  def rolling_fingerprint(c: Column): Column =
    eu.column(RollingFingerprint(eu.expression(c)))

  /** Register simhash64/rolling_fingerprint for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => Simhash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint", exprs => RollingFingerprint(exprs.head), "built-in")
  }
}

/** 64-bit SimHash of a string column — native codegen'd expression. */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextFunctions.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** Rolling normalized fingerprint of a string column — codegen'd. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextFunctions.rollingFingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.rollingFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
