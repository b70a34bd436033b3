package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Gazetteer mention detection as a NATIVE codegen'd Catalyst expression:
 * `mention_slots(text)` returns the dense distinct-canonical ids of the
 * entities mentioned in a text column, in gazetteer pattern order.
 *
 * This is what lets the fused T1+T2+T3 extraction be a fully DECLARATIVE
 * plan (scan -> project -> explode -> project -> sink, one WholeStageCodegen
 * span) with no `mapPartitions` object boundary at all. The previous typed
 * lambda paid, per turn, a 5-field tuple deserialization (three Strings plus
 * a copied byte[]) and a tuple re-serialization; measured at local[16] the
 * job spent 120 core-seconds in GC vs 10 at local[4] — allocation rate on
 * the shared heap is THE scaling term (BENCH.md). Here the text stays a
 * Tungsten `UTF8String` end to end: the DFA walks the string's backing
 * memory via `Platform.getByte` ([[AhoCorasick.matchStatsUtf8]], zero-copy),
 * and the per-turn cost is one small int-array result.
 *
 * Thread safety: the DFA scratch arrays are per-thread ([[ThreadLocal]]) —
 * a codegen reference object is shared by every task thread of an executor.
 * The automaton itself is immutable after build and derives from the static
 * [[Gazetteer]], so it is a JVM-wide lazy singleton; only the small
 * pattern->canonical key table (data-dependent, from the canonicalization
 * stage) rides in the expression.
 *
 * @param canonKeys pattern index -> dense distinct-canonical id
 * @param nCanon    number of distinct canonical ids (sizes the dedup flags)
 */
case class MentionSlots(child: Expression, canonKeys: Seq[Int], nCanon: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val keyArr: Array[Int] = canonKeys.toArray

  @transient private lazy val scratch: ThreadLocal[MentionSlots.Scratch] =
    ThreadLocal.withInitial(() =>
      new MentionSlots.Scratch(MentionSlots.trie.numPatterns, nCanon))

  /** The codegen/eval kernel: distinct canonical ids mentioned in `s`. */
  def slotsFor(s: UTF8String): ArrayData = {
    val sc = scratch.get()
    MentionSlots.trie.matchStatsUtf8(s, sc.counts, sc.firstPos)
    val keys = keyArr
    var n = 0
    var i = 0
    while (i < sc.counts.length) {
      if (sc.counts(i) > 0) {
        val k = keys(i)
        if (!sc.seen(k)) { sc.seen(k) = true; sc.slots(n) = k; n += 1 }
      }
      i += 1
    }
    i = 0
    while (i < n) { sc.seen(sc.slots(i)) = false; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sc.slots, n))
  }

  override protected def nullSafeEval(v: Any): Any =
    slotsFor(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mentionSlots", this, classOf[MentionSlots].getName)
    defineCodeGen(ctx, ev, c => s"$ref.slotsFor($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MentionSlots =
    copy(child = newChild)
}

object MentionSlots {
  /** Gazetteer automaton: deterministic, built once per JVM on first use. */
  @transient lazy val trie: MentionMatcher = AhoCorasick.auto(Gazetteer.surfaces)

  final class Scratch(nPatterns: Int, nCanon: Int) {
    val counts = new Array[Int](nPatterns)
    val firstPos = new Array[Int](nPatterns)
    val seen = new Array[Boolean](nCanon)
    val slots = new Array[Int](nPatterns)
  }

  private[pipeline] val eu = org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column builder; null text yields no mentions (coalesced to ""). */
  def mention_slots(text: Column, canonKeys: Seq[Int], nCanon: Int): Column =
    eu.column(MentionSlots(
      eu.expression(org.apache.spark.sql.functions.coalesce(
        text, org.apache.spark.sql.functions.lit(""))),
      canonKeys, nCanon))
}

/**
 * Same-offset mention PAIRS of a text column as a native codegen'd
 * expression — the candidate-link edge kernel (T2) with no mapPartitions
 * boundary, the [[MentionSlots]] treatment applied to
 * [[Extraction.linkEdgesFused]]. Per turn it returns the pattern-index
 * pairs (i, j), i < j, whose first occurrences start at the same byte
 * offset, encoded as `i * numPatterns + j` ints; the caller decodes and
 * maps to entity ids declaratively (div/mod + element_at on a literal
 * array) and aggregates the per-pair weights — the only shuffle.
 */
case class MentionPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val scratch: ThreadLocal[MentionSlots.Scratch] =
    ThreadLocal.withInitial(() =>
      new MentionSlots.Scratch(MentionSlots.trie.numPatterns, 1))

  // the `i * numPatterns + j` Int encoding overflows silently at 46341
  // patterns (46341^2 > 2^31) — fail at first use instead of producing
  // wrong entity pairs; a gazetteer that large should widen the encoding
  // to ArrayType(LongType)
  @transient private lazy val nPatChecked: Int = {
    val n = MentionSlots.trie.numPatterns
    require(n < 46341,
      s"MentionPairs' Int pair encoding supports < 46341 patterns (gazetteer has $n); " +
        "widen the encoding to ArrayType(LongType) before scaling the gazetteer")
    n
  }

  def pairsFor(s: UTF8String): ArrayData = {
    val sc = scratch.get()
    val trie = MentionSlots.trie
    trie.matchStatsUtf8(s, sc.counts, sc.firstPos)
    val nPat = nPatChecked
    // gather matched patterns first: the pair sweep is O(k^2) over the
    // matched set, not O(nPat^2) over the gazetteer
    var k = 0
    var i = 0
    while (i < nPat) {
      if (sc.counts(i) > 0) { sc.slots(k) = i; k += 1 }
      i += 1
    }
    var n = 0
    var out: Array[Int] = null
    i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        if (sc.firstPos(sc.slots(i)) == sc.firstPos(sc.slots(j))) {
          if (out == null) out = new Array[Int](k * (k - 1) / 2)
          out(n) = sc.slots(i) * nPat + sc.slots(j)
          n += 1
        }
        j += 1
      }
      i += 1
    }
    if (out == null) MentionPairs.emptyResult
    else UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }

  override protected def nullSafeEval(v: Any): Any =
    pairsFor(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mentionPairs", this, classOf[MentionPairs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.pairsFor($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MentionPairs =
    copy(child = newChild)
}

object MentionPairs {
  private val emptyResult: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)

  /** Column builder; null text yields no pairs (coalesced to ""). */
  def mention_pairs(text: Column): Column =
    MentionSlots.eu.column(MentionPairs(
      MentionSlots.eu.expression(org.apache.spark.sql.functions.coalesce(
        text, org.apache.spark.sql.functions.lit("")))))
}
