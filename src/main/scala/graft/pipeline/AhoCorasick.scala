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
 * The matching automaton is compiled to a dense DFA (byte-indexed int
 * arrays, failure links resolved at build time), so the per-character inner
 * loop is two array reads — no hashing, no boxing, no allocation. The trie
 * is built over the patterns' UTF-8 BYTES: an all-ASCII gazetteer gets a
 * 128-wide alphabet (half the table, better cache residency) where bytes >=
 * 0x80 reset to the root (exact — ASCII patterns cannot span them); any
 * non-ASCII pattern widens the alphabet to 256 and multilingual surfaces
 * match exactly (UTF-8 is self-synchronizing: a byte-trie match of a whole
 * pattern is a true substring occurrence). All offsets are BYTE offsets —
 * identical to char offsets on ASCII text, and the established semantics of
 * the Tungsten hot path ([[matchStatsUtf8]]), which never decodes UTF-16.
 *
 * MEMORY BOUND (the 100 TB gazetteer story): the dense transition table is
 * `states * alphabet * 4` bytes with `states <= 1 + sum(pattern byte
 * lengths)`. 10^6 ten-byte aliases ~= 5 GB at alphabet 128 — near the
 * ceiling of one executor; 10^8 aliases would be ~500 GB. Construction
 * therefore ENFORCES `maxTransitionBytes` (default 1 GiB, ~2 M aliases of
 * ~10 bytes) against the worst-case bound and fails with the formula; above
 * the budget use [[AhoCorasick.sharded]], which partitions the gazetteer
 * into K automata that each fit (matching is K sequential DFA passes per
 * text — still O(K * text + matches), embarrassingly parallel across rows,
 * and bounded per-executor memory).
 *
 * Serializable so it can ride a Broadcast; the DFA is built lazily on first
 * use on each executor (the broadcast ships only the pattern strings).
 */
final class AhoCorasick(patterns: Array[String],
                        maxTransitionBytes: Long = AhoCorasick.DefaultMaxTransitionBytes)
    extends MentionMatcher {

  final case class Match(patternIdx: Int, start: Int)

  def numPatterns: Int = patterns.length

  @transient private lazy val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** 128 for all-ASCII gazetteers (halves the table), 256 otherwise. */
  private val Alpha: Int =
    if (patterns.forall(_.forall(_ < 128))) 128 else 256

  // fail fast on the DRIVER (lazy DFA build happens on executors, far too
  // late for a capacity error): worst-case states = 1 + total pattern bytes
  AhoCorasick.requireBudget(
    1L + patterns.iterator.map(p =>
      // UTF-8 length without materializing the byte arrays eagerly
      p.iterator.map(c => if (c < 0x80) 1 else if (c < 0x800) 2 else 3).sum.toLong).sum,
    Alpha, maxTransitionBytes, patterns.length)

  /** goto(state*Alpha+b) = next state; out(state) = pattern indices ending here. */
  private final class Dfa(val goto: Array[Int], val out: Array[Array[Int]],
                          val patLens: Array[Int])

  @transient private lazy val dfa: Dfa = build()

  private def build(): Dfa = {
    // trie construction over UTF-8 bytes
    val next = ArrayBuffer(mutable.HashMap.empty[Int, Int])
    val out = ArrayBuffer[List[Int]](Nil)
    patBytes.zipWithIndex.foreach { case (p, idx) =>
      var state = 0
      p.foreach { b =>
        val c = b & 0xff
        state = next(state).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Int, Int]
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
        val t = next(s).get(c) match {
          case Some(t0) => t0
          case None => if (s == 0) 0 else goto(fail(s) * Alpha + c)
        }
        goto(s * Alpha + c) = t
        c += 1
      }
      next(s).values.foreach { t => if (!seen(t)) { seen(t) = true; bfs += t } }
    }
    new Dfa(goto, out.map(_.toArray).toArray, patBytes.map(_.length))
  }

  /**
   * All (pattern, byte-start-offset) occurrences in `text`, including
   * overlaps. Byte offsets == char offsets on ASCII text.
   */
  def findAll(text: String): Seq[Match] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val a = dfa
    val result = ArrayBuffer.empty[Match]
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      state = if (c < Alpha) a.goto(state * Alpha + c) else 0
      val outs = a.out(state)
      var k = 0
      while (k < outs.length) {
        result += Match(outs(k), i - a.patLens(outs(k)) + 1)
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
   *
   * Offsets are BYTE offsets of the UTF-8 encoding: within one text,
   * byte-offset equality <=> char-offset equality (identical prefix), and
   * byte-offset order matches char-offset order, so same-offset edge
   * semantics and min-first-pos are preserved exactly.
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
        val start = i - a.patLens(idx) + 1
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
        val start = i - a.patLens(idx) + 1
        if (start < firstPos(idx)) firstPos(idx) = start
        k += 1
      }
      i += 1
    }
  }

  def matchStats(text: String, counts: Array[Int], firstPos: Array[Int]): Unit =
    matchStatsBytes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8), counts, firstPos)
}

/**
 * The matcher contract every extraction path programs against (batch
 * `Extraction`, streaming, the codegen'd `MentionSlots`/`MentionPairs`
 * expressions): zero-allocation per-pattern match statistics over a text.
 * Implementations: one dense-DFA [[AhoCorasick]] (gazetteer fits the
 * memory budget) or a [[ShardedAhoCorasick]] (it doesn't) — callers pick
 * via [[AhoCorasick.auto]] and never branch on gazetteer size themselves.
 */
sealed trait MentionMatcher extends Serializable {
  def numPatterns: Int
  def matchStats(text: String, counts: Array[Int], firstPos: Array[Int]): Unit
  def matchStatsBytes(bytes: Array[Byte], counts: Array[Int], firstPos: Array[Int]): Unit
  def matchStatsUtf8(s: org.apache.spark.unsafe.types.UTF8String,
                     counts: Array[Int], firstPos: Array[Int]): Unit
}

object AhoCorasick {
  /** 1 GiB of transition table ~= 2M ten-byte ASCII aliases — a comfortable
    * share of one production executor's heap; above this, shard. */
  val DefaultMaxTransitionBytes: Long = 1L << 30

  private def worstCaseBytes(patterns: Array[String]): (Long, Int) = {
    val alpha = if (patterns.forall(_.forall(_ < 128))) 128 else 256
    val worstStates = 1L + patterns.iterator.map(p =>
      p.iterator.map(c => if (c < 0x80) 1 else if (c < 0x800) 2 else 3).sum.toLong).sum
    (worstStates * alpha * 4L, alpha)
  }

  /**
   * The size-oblivious entry point the pipeline uses: ONE dense automaton
   * while the gazetteer fits the budget (the fast path — every production
   * call site keeps single-DFA speed), transparently sharded above it
   * (bounded memory, K passes per text). Same results either way
   * (GazetteerScaleSpec equivalence).
   */
  def auto(patterns: Array[String],
           maxTransitionBytes: Long = DefaultMaxTransitionBytes): MentionMatcher =
    if (worstCaseBytes(patterns)._1 <= maxTransitionBytes)
      new AhoCorasick(patterns, maxTransitionBytes)
    else sharded(patterns, maxTransitionBytes)

  private[pipeline] def requireBudget(worstStates: Long, alpha: Int,
                                      maxTransitionBytes: Long, nPatterns: Int): Unit = {
    val worstBytes = worstStates * alpha * 4L
    if (worstBytes > maxTransitionBytes)
      throw new IllegalArgumentException(
        f"gazetteer too large for one dense Aho-Corasick DFA: $nPatterns%d patterns -> " +
          f"<= $worstStates%d states x $alpha%d alphabet x 4 B = $worstBytes%d bytes of " +
          f"transition table (budget $maxTransitionBytes%d). Use AhoCorasick.sharded(...) — " +
          "K automata that each fit the budget, matched in K passes per text.")
  }

  /**
   * The at-scale gazetteer path: greedily partition `patterns` (in order,
   * preserving indices) into the fewest automata whose worst-case transition
   * tables each fit `maxTransitionBytes`. 10^8 aliases at a 1 GiB budget =
   * ~500 shards; matching cost is `O(shards * text_bytes + matches)` per
   * row, traded against per-executor memory staying bounded — the knob a
   * deployment tunes by corpus/gazetteer ratio.
   */
  def sharded(patterns: Array[String],
              maxTransitionBytes: Long = DefaultMaxTransitionBytes): ShardedAhoCorasick = {
    val alpha = if (patterns.forall(_.forall(_ < 128))) 128 else 256
    val maxStates = (maxTransitionBytes / (alpha * 4L)).max(2L)
    val shards = ArrayBuffer.empty[(ArrayBuffer[String], ArrayBuffer[Int])]
    var curStates = 1L
    patterns.zipWithIndex.foreach { case (p, idx) =>
      val bytes = p.iterator.map(c => if (c < 0x80) 1 else if (c < 0x800) 2 else 3).sum.toLong
      if (bytes + 1 > maxStates)
        throw new IllegalArgumentException(
          s"single pattern of $bytes UTF-8 bytes exceeds the whole shard budget " +
            s"($maxTransitionBytes bytes at alphabet $alpha)")
      if (shards.isEmpty || curStates + bytes > maxStates) {
        shards += ((ArrayBuffer.empty[String], ArrayBuffer.empty[Int]))
        curStates = 1L
      }
      shards.last._1 += p
      shards.last._2 += idx
      curStates += bytes
    }
    new ShardedAhoCorasick(
      shards.map { case (ps, idxs) =>
        (new AhoCorasick(ps.toArray, maxTransitionBytes), idxs.toArray)
      }.toIndexedSeq,
      patterns.length)
  }
}

/**
 * A gazetteer too large for one dense DFA, as K automata each within the
 * memory budget. Pattern indices are GLOBAL (the original array's), so
 * callers see the exact same contract as a single [[AhoCorasick]]: fill
 * `counts`/`firstPos` arrays sized [[numPatterns]]. Each pattern lives in
 * exactly one shard, so the scatter is conflict-free. Per-thread scratch
 * (sized to the largest shard) keeps the hot path allocation-free — the
 * same ThreadLocal discipline as the codegen'd MentionSlots expression,
 * whose automaton object is shared across a JVM's task threads.
 */
final class ShardedAhoCorasick private[pipeline](
    val shards: IndexedSeq[(AhoCorasick, Array[Int])],
    val numPatterns: Int) extends MentionMatcher {

  def numShards: Int = shards.length

  @transient private lazy val scratch: ThreadLocal[(Array[Int], Array[Int])] = {
    // maxOption: sharded(Array.empty) constructs a zero-shard matcher, which
    // must behave as a no-op rather than throw from an empty .max here
    val maxShard = shards.map(_._1.numPatterns).maxOption.getOrElse(0)
    ThreadLocal.withInitial(() => (new Array[Int](maxShard), new Array[Int](maxShard)))
  }

  def matchStatsUtf8(s: org.apache.spark.unsafe.types.UTF8String,
                     counts: Array[Int], firstPos: Array[Int]): Unit = {
    val (sc, sf) = scratch.get()
    var sh = 0
    while (sh < shards.length) {
      val (ac, globalIdx) = shards(sh)
      ac.matchStatsUtf8(s, sc, sf)
      var i = 0
      while (i < globalIdx.length) {
        counts(globalIdx(i)) = sc(i)
        firstPos(globalIdx(i)) = sf(i)
        i += 1
      }
      sh += 1
    }
  }

  def matchStatsBytes(bytes: Array[Byte], counts: Array[Int], firstPos: Array[Int]): Unit = {
    val (sc, sf) = scratch.get()
    var sh = 0
    while (sh < shards.length) {
      val (ac, globalIdx) = shards(sh)
      ac.matchStatsBytes(bytes, sc, sf)
      var i = 0
      while (i < globalIdx.length) {
        counts(globalIdx(i)) = sc(i)
        firstPos(globalIdx(i)) = sf(i)
        i += 1
      }
      sh += 1
    }
  }

  def matchStats(text: String, counts: Array[Int], firstPos: Array[Int]): Unit =
    matchStatsBytes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8), counts, firstPos)
}
