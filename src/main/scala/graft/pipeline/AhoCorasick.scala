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
 * Serializable so it can ride a Broadcast; the goto/fail automaton is built
 * lazily on first use on each executor (the broadcast ships only patterns).
 */
final class AhoCorasick(patterns: Array[String]) extends Serializable {

  @transient private lazy val automaton: Automaton = build()

  final case class Match(patternIdx: Int, start: Int)

  private final class Automaton(
      val next: Array[mutable.HashMap[Char, Int]],
      val fail: Array[Int],
      val out: Array[List[Int]])

  private def build(): Automaton = {
    val next = ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val out = ArrayBuffer[List[Int]](Nil)
    // goto trie
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
    // BFS failure links
    val fail = Array.fill(next.size)(0)
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
    new Automaton(next.toArray, fail, out.toArray)
  }

  /** All (pattern, start-offset) occurrences in `text`, including overlaps. */
  def findAll(text: String): Seq[Match] = {
    val a = automaton
    val result = ArrayBuffer.empty[Match]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !a.next(state).contains(c)) state = a.fail(state)
      state = a.next(state).getOrElse(c, 0)
      a.out(state).foreach { idx =>
        result += Match(idx, i - patterns(idx).length + 1)
      }
      i += 1
    }
    result.toSeq
  }
}
