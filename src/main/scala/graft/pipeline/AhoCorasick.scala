package graft.pipeline

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Aho-Corasick multi-pattern matcher for batched gazetteer mention detection
 * (BASELINE.json north_star stage T1). Built ONCE per executor from a
 * broadcast pattern list and reused across every row of every partition —
 * the cost model that makes trie matching beat per-row regex at 10^12-turn
 * scale: O(text + matches) per turn regardless of gazetteer size.
 *
 * The matching automaton is compiled to a dense DFA (char-indexed int
 * arrays, failure links resolved at build time), so the per-character inner
 * loop is two array reads — no hashing, no boxing, no allocation. Characters
 * outside the ASCII alphabet reset to the root state, which is exact as long
 * as patterns are ASCII (enforced at construction).
 *
 * Serializable so it can ride a Broadcast; the DFA is built lazily on first
 * use on each executor (the broadcast ships only the pattern strings).
 */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.forall(_.forall(_ < 128)), "AhoCorasick patterns must be ASCII")

  final case class Match(patternIdx: Int, start: Int)

  def numPatterns: Int = patterns.length

  private val Alpha = 128

  /** goto(state*128+c) = next state; out(state) = pattern indices ending here. */
  private final class Dfa(val goto: Array[Int], val out: Array[Array[Int]])

  @transient private lazy val dfa: Dfa = build()

  private def build(): Dfa = {
    // trie construction
    val next = ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val out = ArrayBuffer[List[Int]](Nil)
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var state = 0
      p.foreach { c =>
        state = next(state).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Char, Int]
          out += Nil
          next.size - 1
        })
      }
      out(state) = idx :: out(state)
    }
    val n = next.size
    // BFS failure links + output merge
    val fail = Array.fill(n)(0)
    val queue = mutable.Queue.empty[Int]
    next(0).values.foreach(queue += _)
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (c, t) =>
        queue += t
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(t) = if (next(f).contains(c) && next(f)(c) != t) next(f)(c) else 0
        out(t) = out(t) ++ out(fail(t))
      }
    }
    // resolve to dense DFA: goto includes failure transitions
    val goto = new Array[Int](n * Alpha)
    val bfs = mutable.Queue(0)
    val seen = new Array[Boolean](n)
    seen(0) = true
    while (bfs.nonEmpty) {
      val s = bfs.dequeue()
      var c = 0
      while (c < Alpha) {
        val ch = c.toChar
        val t = next(s).get(ch) match {
          case Some(t0) => t0
          case None => if (s == 0) 0 else goto(fail(s) * Alpha + c)
        }
        goto(s * Alpha + c) = t
        c += 1
      }
      next(s).values.foreach { t => if (!seen(t)) { seen(t) = true; bfs += t } }
    }
    new Dfa(goto, out.map(_.toArray).toArray)
  }

  /** All (pattern, start-offset) occurrences in `text`, including overlaps. */
  def findAll(text: String): Seq[Match] = {
    val a = dfa
    val result = ArrayBuffer.empty[Match]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      state = if (c < Alpha) a.goto(state * Alpha + c) else 0
      val outs = a.out(state)
      var k = 0
      while (k < outs.length) {
        result += Match(outs(k), i - patterns(outs(k)).length + 1)
        k += 1
      }
      i += 1
    }
    result.toSeq
  }

  /**
   * Zero-allocation match statistics: fills caller-provided arrays (sized
   * [[numPatterns]], reused across rows within a partition) with the
   * occurrence count and first (minimum) start offset per pattern. This is
   * the hot-path API — per-match objects were the dominant GC source at
   * 10^6-turn/s rates, and GC pause time is an Amdahl serial term that caps
   * scaling efficiency.
   */
  /**
   * Byte-level twin of [[matchStats]] over UTF-8 bytes: ASCII bytes drive
   * the same DFA; any byte >= 0x80 (UTF-8 lead/continuation) resets to the
   * root, exactly as non-ASCII chars do in the char path — ASCII patterns
   * can never span them. Offsets are BYTE offsets: within one text,
   * byte-offset equality <=> char-offset equality (identical prefix), and
   * byte-offset order matches char-offset order, so the same-offset edge
   * semantics and min-first-pos are preserved exactly. The win: the caller
   * can feed `encode(text, 'UTF-8')` binary straight from Tungsten rows —
   * no per-row UTF-16 decode, half the copied bytes, one fewer object —
   * which matters because allocation rate is what caps N->4N scaling on a
   * shared heap (BENCH.md).
   */
  def matchStatsBytes(bytes: Array[Byte], counts: Array[Int], firstPos: Array[Int]): Unit = {
    java.util.Arrays.fill(counts, 0)
    java.util.Arrays.fill(firstPos, Int.MaxValue)
    val a = dfa
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      state = if (c < Alpha) a.goto(state * Alpha + c) else 0
      val outs = a.out(state)
      var k = 0
      while (k < outs.length) {
        val idx = outs(k)
        counts(idx) += 1
        val start = i - patterns(idx).length + 1
        if (start < firstPos(idx)) firstPos(idx) = start
        k += 1
      }
      i += 1
    }
  }

  /**
   * Zero-COPY twin of [[matchStatsBytes]] over a Tungsten `UTF8String`:
   * walks the string's backing memory via `Platform.getByte` (on/off-heap
   * alike), so a text column read straight from a parquet page is matched
   * without materializing a byte[] per row — the API the codegen'd
   * [[graft.pipeline.MentionSlots]] expression drives.
   */
  def matchStatsUtf8(s: org.apache.spark.unsafe.types.UTF8String,
                     counts: Array[Int], firstPos: Array[Int]): Unit = {
    java.util.Arrays.fill(counts, 0)
    java.util.Arrays.fill(firstPos, Int.MaxValue)
    val a = dfa
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    var state = 0
    var i = 0
    while (i < n) {
      val c = org.apache.spark.unsafe.Platform.getByte(base, offset + i) & 0xff
      state = if (c < Alpha) a.goto(state * Alpha + c) else 0
      val outs = a.out(state)
      var k = 0
      while (k < outs.length) {
        val idx = outs(k)
        counts(idx) += 1
        val start = i - patterns(idx).length + 1
        if (start < firstPos(idx)) firstPos(idx) = start
        k += 1
      }
      i += 1
    }
  }

  def matchStats(text: String, counts: Array[Int], firstPos: Array[Int]): Unit = {
    java.util.Arrays.fill(counts, 0)
    java.util.Arrays.fill(firstPos, Int.MaxValue)
    val a = dfa
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      state = if (c < Alpha) a.goto(state * Alpha + c) else 0
      val outs = a.out(state)
      var k = 0
      while (k < outs.length) {
        val idx = outs(k)
        counts(idx) += 1
        val start = i - patterns(idx).length + 1
        if (start < firstPos(idx)) firstPos(idx) = start
        k += 1
      }
      i += 1
    }
  }
}
