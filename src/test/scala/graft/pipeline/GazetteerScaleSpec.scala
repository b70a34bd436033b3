package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/**
 * The 10^6–10^8-alias gazetteer story (VERDICT r4 item 2): the dense DFA's
 * memory bound is enforced with the formula in the error, the sharded
 * fallback matches the single automaton exactly, and non-ASCII surfaces are
 * supported (byte-level trie), not rejected.
 */
class GazetteerScaleSpec extends AnyFunSuite {

  /** Deterministic synthetic gazetteer: n aliases over a fixed syllable set
    * (no RNG — seeded LCG), mixed lengths, some shared prefixes. */
  private def aliases(n: Int): Array[String] = {
    val syl = Array("spark", "graf", "tab", "lo", "zen", "mark", "quer", "ix",
      "ento", "cral", "um", "ph")
    var seed = 42L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    Array.tabulate(n) { i =>
      val parts = 2 + next(3)
      (0 until parts).map(_ => syl(next(syl.length))).mkString + "_" + i
    }
  }

  test("DFA memory budget is enforced with the states*alpha*4B formula in the error") {
    val pats = aliases(1000)
    val totalBytes = pats.map(_.length).sum // all-ASCII: 1 byte per char
    // a budget below the worst-case table must be rejected at CONSTRUCTION
    // (driver-side), not at lazy build time on an executor
    val tight = (totalBytes + 1).toLong * 128L * 4L - 1
    val e = intercept[IllegalArgumentException](new AhoCorasick(pats, tight))
    assert(e.getMessage.contains("states"))
    assert(e.getMessage.contains("4 B"))
    assert(e.getMessage.contains("sharded"))
    // one byte more of budget and it builds + matches
    val ok = new AhoCorasick(pats, tight + 1)
    assert(ok.findAll("xx" + pats(7) + "yy").exists(_.patternIdx == 7))
  }

  test("sharded gazetteer (10^5 aliases) matches the single automaton exactly") {
    val pats = aliases(100000)
    // budget forces REAL sharding (multiple automata)
    val budget = 6L << 20
    val sharded = AhoCorasick.sharded(pats, budget)
    assert(sharded.numShards > 4, s"budget did not shard: ${sharded.numShards}")
    assert(sharded.numPatterns == pats.length)
    // every shard individually respects the budget's worst-case state bound
    sharded.shards.foreach { case (_, idxs) =>
      val worst = idxs.map(i => pats(i).length.toLong).sum + 1
      assert(worst * 128 * 4 <= budget)
    }
    // the equivalence oracle: ONE automaton over all 10^5 aliases (needs an
    // explicit budget — the default 1 GiB is exactly what sharding is for)
    val single = new AhoCorasick(pats, 2L << 30)
    // corpus: texts stitched from alias substrings + noise, so hits include
    // overlaps, repeats, and shared-prefix partials across shard boundaries
    val corpus = (0 until 50).map { k =>
      val i = k * 997 % pats.length
      val j = (k * 7919 + 13) % pats.length
      s"lead ${pats(i)} mid ${pats(j)}${pats(i)} tail ${pats(i).take(3)}"
    } :+ "no hits at all here"
    val nPat = pats.length
    val c1 = new Array[Int](nPat); val f1 = new Array[Int](nPat)
    val c2 = new Array[Int](nPat); val f2 = new Array[Int](nPat)
    corpus.foreach { text =>
      single.matchStats(text, c1, f1)
      sharded.matchStats(text, c2, f2)
      assert(java.util.Arrays.equals(c1, c2), s"counts diverge on: $text")
      assert(java.util.Arrays.equals(f1, f2), s"firstPos diverge on: $text")
    }
    // and the corpus actually exercised matching
    single.matchStats(corpus.head, c1, f1)
    assert(c1.sum > 0)
  }

  test("sharded matching works on the UTF8String zero-copy path too") {
    val pats = aliases(2000)
    val sharded = AhoCorasick.sharded(pats, 1L << 18)
    assert(sharded.numShards > 1)
    val single = new AhoCorasick(pats)
    val text = s"a ${pats(0)} b ${pats(1999)} c ${pats(1000)}${pats(3)}"
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
    val nPat = pats.length
    val c1 = new Array[Int](nPat); val f1 = new Array[Int](nPat)
    val c2 = new Array[Int](nPat); val f2 = new Array[Int](nPat)
    single.matchStatsUtf8(u, c1, f1)
    sharded.matchStatsUtf8(u, c2, f2)
    assert(java.util.Arrays.equals(c1, c2))
    assert(java.util.Arrays.equals(f1, f2))
    assert(c1.sum >= 4)
  }

  test("non-ASCII surfaces match exactly (alphabet widens to 256, byte offsets)") {
    // the old matcher REJECTED non-ASCII patterns outright; a multilingual
    // gazetteer must match its surfaces, at byte-offset semantics
    val pats = Array("café", "中文词", "naïve", "plain")
    val ac = new AhoCorasick(pats)
    val text = "un café naïve 中文词中文词 plain café"
    val hits = ac.findAll(text)
    def bytePos(sub: String, from: Int = 0): Int = {
      val b = text.getBytes("UTF-8")
      val s = sub.getBytes("UTF-8")
      (from to b.length - s.length).find(i => s.indices.forall(k => b(i + k) == s(k))).get
    }
    assert(hits.count(_.patternIdx == 0) == 2) // café twice
    assert(hits.count(_.patternIdx == 1) == 2) // 中文词 twice (adjacent)
    assert(hits.count(_.patternIdx == 2) == 1)
    assert(hits.count(_.patternIdx == 3) == 1)
    assert(hits.filter(_.patternIdx == 0).map(_.start).min == bytePos("café"))
    assert(hits.filter(_.patternIdx == 1).map(_.start).min == bytePos("中文词"))
    // ASCII-pattern automata still reset at multibyte input (no false hits)
    val ascii = new AhoCorasick(Array("caf"))
    assert(ascii.findAll("café caf").count(_.patternIdx == 0) == 2)
  }

  test("auto() picks the dense DFA under budget, shards above — pipeline entry point") {
    // every production call site (Extraction, StreamingExtraction, the
    // MentionSlots/MentionPairs singleton) goes through auto(): small
    // gazetteers keep single-DFA speed, oversize ones transparently shard
    val pats = aliases(5000)
    val small = AhoCorasick.auto(pats)
    assert(small.isInstanceOf[AhoCorasick])
    val big = AhoCorasick.auto(pats, 1L << 19)
    assert(big.isInstanceOf[ShardedAhoCorasick])
    val text = s"x ${pats(17)} y ${pats(4999)}"
    val c1 = new Array[Int](pats.length); val f1 = new Array[Int](pats.length)
    val c2 = new Array[Int](pats.length); val f2 = new Array[Int](pats.length)
    small.matchStats(text, c1, f1)
    big.matchStats(text, c2, f2)
    assert(java.util.Arrays.equals(c1, c2) && java.util.Arrays.equals(f1, f2))
    assert(c1.sum >= 2)
  }

  test("a single oversized pattern cannot hide inside sharding") {
    val big = "x" * 5000
    val e = intercept[IllegalArgumentException](
      AhoCorasick.sharded(Array("ok", big), maxTransitionBytes = 1L << 20))
    assert(e.getMessage.contains("exceeds"))
  }

  test("an empty pattern set shards to a no-op matcher, not a crash") {
    // sharded(Array.empty) builds a zero-shard matcher; matchStats on it
    // must be a clean no-op (the scratch sizing previously threw an
    // unrelated UnsupportedOperationException from an empty .max)
    val empty = AhoCorasick.sharded(Array.empty[String])
    assert(empty.numShards == 0 && empty.numPatterns == 0)
    empty.matchStats("any text at all", Array.empty, Array.empty)
    empty.matchStatsUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString("more text"),
      Array.empty, Array.empty)
  }
}
