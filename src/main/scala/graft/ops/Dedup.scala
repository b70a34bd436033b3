package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document deduplication suite for training-data pipelines, over the
 * `documents` table (doc_id, text, lang, source, n_chars).
 *
 * All hash material derives from md5 of token strings — deterministic,
 * engine-portable (the DuckDB oracle computes the identical signatures), and
 * codegen'd end-to-end (functions only, no UDFs).
 *
 * Scale design:
 *  - exact dedup: single hash-aggregate shuffle on the content hash;
 *  - MinHash: ONE explode + ONE groupBy with k min-aggregates (no k-way
 *    cross join) — map-side partial aggregation absorbs the token fan-out,
 *    so the shuffle carries one row per (doc, k-wide signature);
 *  - LSH banding: signatures → band keys → self-join per band bucket; the
 *    join key is the band hash, so co-candidates co-locate and the
 *    quadratic blow-up is bounded per bucket (classic MinHash-LSH);
 *  - SimHash: same one-pass aggregate shape with per-bit majority votes;
 *  - n-gram Jaccard: shingle explode + semi-joins restricted to LSH
 *    candidate pairs — never all-pairs.
 */
object Dedup {

  private def tokens(text: Column): Column = split(text, " ")

  // ---------------------------------------------------------------- exact

  /** Exact dedup on content hash: one representative (min doc_id) per group. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_docs"))

  // -------------------------------------------------------------- minhash

  val MinhashK = 16

  /** Per-seed token hash: md5("<seed>:<token>") — string min is the sketch. */
  private def seedHash(seed: Int, token: Column): Column =
    md5(concat(lit(s"$seed:"), token))

  /**
   * k=16 MinHash signature per document over DISTINCT word-bigram shingles,
   * computed in ONE explode + ONE aggregate (k min() columns), not k passes.
   * Bigram (not unigram) shingling is what makes the sketch discriminative:
   * on a shared-vocabulary corpus unigram token sets are near-identical and
   * banding degenerates to ~all-pairs (measured: 69,945 candidate pairs from
   * 500 docs with unigrams vs 25 with bigrams). Documents with fewer than
   * two tokens have no shingles and thus no signature (same on both engines).
   */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    // array_distinct (narrow, per-doc) before exploding: duplicates can't
    // change a min-aggregate, but each one would cost k md5 calls
    val exploded = bigramShingles(docs).withColumnRenamed("shingle", "tok")
    val aggs = (0 until MinhashK).map(i => min(seedHash(i, col("tok"))).as(s"sig_$i"))
    exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  val LshBands = 4
  val LshRows = 4 // MinhashK / LshBands

  /** Band key: md5 over the band's concatenated signature rows. */
  private def bandKey(b: Int): Column =
    md5(concat_ws("|", (0 until LshRows).map(r => col(s"sig_${b * LshRows + r}")): _*))

  /**
   * Largest LSH band-bucket size for a signature table (0 when no bucket
   * has two members). Used by the verify harness to assert the SQL oracle's
   * full-quadratic-expansion model and [[lshCandidatePairs]]'s star-expanded
   * >maxBucket branch cannot silently diverge on the data under test.
   */
  def maxBandBucket(signatures: DataFrame): Long = {
    val banded = signatures.select(
      col("doc_id"),
      posexplode(array((0 until LshBands).map(bandKey): _*)).as(Seq("band", "key")))
    banded.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /**
   * Oversize-bucket logging WITHOUT a dedicated driver job: the sizing
   * aggregate carries an `observe` metric (CollectMetrics rides the
   * existing job — the counts table is persisted, so the metric fires once
   * at first materialization, not per consumer), and a once-per-session
   * QueryExecutionListener surfaces it as a warn. Lazy by design: the
   * warning lands when the query actually executes.
   */
  // weak keys: a stopped SparkSession must be collectable — a strong set
  // here would leak every session ever guarded in a long-lived multi-session
  // JVM (the registered listener dies with its session's listener bus)
  private val guardListenerSessions =
    java.util.Collections.newSetFromMap(
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]()))

  private def ensureGuardListener(spark: org.apache.spark.sql.SparkSession): Unit =
    if (guardListenerSessions.add(spark)) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.get("lsh_bucket_guard").foreach { row =>
            val oversize = if (row.isNullAt(0)) 0L else row.getLong(0)
            if (oversize > 0)
              log.warn(s"lshCandidatePairs: $oversize bucket(s) exceed maxBucket=${row.getInt(1)} " +
                s"(largest: ${row.getLong(2)} members); emitting star pairs (member, bucket-min) " +
                "for them instead of full quadratic expansion")
          }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
    }

  /**
   * MinHash-LSH candidate pairs: documents sharing at least one band bucket.
   * Returns distinct (doc_a, doc_b), doc_a < doc_b.
   *
   * Bucket-size guard (the 100 TB safety valve): real web corpora have
   * DEGENERATE buckets — boilerplate/empty documents whose signatures all
   * collide — and an unbounded per-bucket `collect_set` would assemble one
   * multi-GB array on a single executor. Buckets are therefore sized first:
   *  - size <= maxBucket: full quadratic pair expansion via a bounded
   *    collect_set (banding keeps honest buckets near-duplicate-only, so
   *    this is the common case and stays ONE aggregate);
   *  - size > maxBucket: STAR expansion — every member pairs with the
   *    bucket's min doc_id. Linear output, bounded shuffle, and nothing is
   *    SILENTLY dropped: every member stays connected to its bucket
   *    representative, so candidate-level bucket connectivity is preserved.
   *    Known tradeoff (logged, not hidden): if a downstream verifier
   *    REJECTS the representative's edges (e.g. the rep fails Jaccard
   *    against two members that are true near-dups of each other), the
   *    untested member–member edge is lost — full expansion would have
   *    tested it. In practice oversize buckets are degenerate
   *    identical-boilerplate collisions that exact dedup already collapsed,
   *    and the cap defaults high (4096).
   *
   * The banded projection is persisted: it is read by the sizing aggregate
   * and both expansion branches, and recomputing it means re-running the
   * MinHash signature subtree (shingle explode over the full corpus) per
   * consumer. It is 4 small rows per document — the cheapest artifact in
   * the dedup pipeline. Persist LIFECYCLE is the caller's via `scope`: pass
   * a [[CacheScope.withScope]] scope and materialize inside it (as
   * [[DedupPipeline.runTo]] does) to unpersist the intermediates at a
   * defined completion point; the unmanaged default leaves eviction to the
   * block-manager LRU (right for the session-lifetime memoized artifacts).
   */
  /** The default degenerate-bucket cap — shared with the Verify harness's
    * oracle-divergence guard so the two bounds cannot drift apart. */
  val DefaultMaxBucket = 4096

  def lshCandidatePairs(signatures: DataFrame, maxBucket: Int = DefaultMaxBucket,
                        scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val banded = scope.persist(signatures.select(
      col("doc_id"),
      posexplode(array((0 until LshBands).map(bandKey): _*)).as(Seq("band", "key"))))
    ensureGuardListener(signatures.sparkSession)
    val counts = scope.persist(banded.groupBy("band", "key")
      .agg(count(lit(1)).as("n"), min("doc_id").as("rep"))
      .where(col("n") >= 2)
      // the oversize warning rides this aggregate (no dedicated count job);
      // metric column order is pinned by the listener above
      .observe("lsh_bucket_guard",
        sum(when(col("n") > maxBucket, 1L)).as("oversize_buckets"),
        max(lit(maxBucket)).as("max_bucket"),
        max(col("n")).as("largest_bucket")))
    val small = banded
      .join(counts.where(col("n") <= maxBucket).select("band", "key"), Seq("band", "key"))
      .groupBy("band", "key")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids")) - i - 1), y =>
          struct(x.as("doc_a"), y.as("doc_b")))))).as("pair"))
      .select(col("pair.doc_a"), col("pair.doc_b"))
    val oversize = banded
      .join(counts.where(col("n") > maxBucket).select("band", "key", "rep"), Seq("band", "key"))
      .where(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
    small.union(oversize).distinct()
  }

  // -------------------------------------------------------------- simhash

  val SimhashBits = 16

  /**
   * 16-bit SimHash over token md5 nibbles: bit b = majority vote of
   * (nibble_b >= 8) across all token occurrences. Output: bit string column
   * `simhash` (e.g. "0110...") — portable across engines, no 64-bit
   * arithmetic needed (the production-scale variant on xxhash64 lives in
   * TextFunctions.simhash64 and is property-tested in Scala).
   */
  def simhash(docs: DataFrame): DataFrame =
    simhashOver(docs.select(col("doc_id"), explode(tokens(col("text"))).as("shingle")))

  /** SimHash bit-vote aggregate over any (doc_id, shingle) table. */
  def simhashOver(shingled: DataFrame): DataFrame = {
    val exploded = shingled.select(col("doc_id"), md5(col("shingle")).as("h"))
    val votes = (0 until SimhashBits).map { b =>
      sum(when(substring(col("h"), b + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"v_$b")
    }
    exploded.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((0 until SimhashBits).map(b =>
          when(col(s"v_$b") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  // ------------------------------------------------------- n-gram jaccard

  /**
   * Word-bigram array per doc, built NARROW (zip_with over two slices of the
   * token array) — the earlier `posexplode` + `lead()` window formulation
   * cost a full shuffle + per-doc sort just to pair adjacent tokens.
   */
  private def bigramArray(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word-bigram shingles per doc (per-doc dedup is narrow too). */
  def bigramShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), array_distinct(bigramArray(col("text"))).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))

  /**
   * Bigram-Jaccard similarity for candidate pairs (from LSH): intersection
   * via shingle join, |A| and |B| via per-doc counts. Score rounded to 6 dp.
   *
   * Docs are semi-joined down to pair MEMBERS before shingling: the
   * candidate set is a vanishing fraction of the corpus (that is what LSH
   * is for), so exploding shingles for non-members — the plan references
   * the shingle table three times — would dominate the stage for rows that
   * can never reach the output.
   */
  /** Pair-member doc ids (both sides of the candidate pairs). */
  def pairMembers(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()

  def ngramJaccard(docs: DataFrame, pairs: DataFrame): DataFrame =
    ngramJaccardFromShingles(
      bigramShingles(docs.join(pairMembers(pairs), Seq("doc_id"), "leftsemi")), pairs)

  /**
   * Jaccard over a prebuilt member-shingle table — the plan references it
   * three times (two intersection joins + the size aggregate), so callers
   * that already materialize stage artifacts should persist it once and
   * pass it here instead of re-exploding per reference.
   */
  def ngramJaccardFromShingles(sh: DataFrame, pairs: DataFrame): DataFrame = {
    // NOT pinned: callers route through CacheScope-managed persists
    // (DedupPipeline.runTo unpersists at its completion point — a
    // localCheckpoint here would leak past that lifecycle), and `sh` is
    // already persisted by every caller, so the recomputed aggregate is one
    // scan of the cached shingle frame per reference.
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
  }

  /**
   * SimHash near-duplicate pairs via CHUNK BANDING (bit-sampling LSH for
   * hamming distance): split the 16-bit sketch into 4 chunks of 4 bits —
   * any pair within hamming distance 3 must agree on at least one whole
   * chunk (pigeonhole), so the candidate join is keyed on (chunk index,
   * chunk value) and never all-pairs; exact hamming verification runs on
   * candidates only. The same shape scales to the 64-bit native sketch
   * (16 x 4-bit chunks ≡ hamming <= 15 guarantee) — this portable variant
   * is the oracle-checkable one.
   */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val chunks = 4
    val chunkLen = SimhashBits / chunks
    // BIGRAM sketch input: on a shared-vocabulary corpus unigram-token
    // sketches collide en masse (measured: 35k candidate pairs from 500
    // docs) — the same degeneracy bigram shingling fixes for MinHash.
    // NOT persisted here: this frame is consumed exactly once, by
    // hammingBandedPairs, which persists its own derived input covering
    // both join sides (a second cache entry was pure overhead).
    val sh = simhashOver(bigramShingles(docs))
      .withColumn("sim_num", conv(col("simhash"), 2, 10).cast("long"))
    hammingBandedPairs(sh.select(col("doc_id"), col("sim_num"),
      array((0 until chunks).map(c =>
        substring(col("simhash"), c * chunkLen + 1, chunkLen)): _*).as("keys")),
      maxHamming, scope)
  }

  /**
   * Shared band-join-verify core for both SimHash widths: explode the
   * chunk keys, self-join on (chunk position, key), verify BEFORE dedup —
   * hamming is deterministic per pair, so duplicate candidates (pairs
   * agreeing on several chunks) collapse identically, and the dedup
   * shuffle carries only the few verified survivors, not every candidate
   * the banding emitted. The verify is one xor + popcount on the numeric
   * sketch. Input (doc_id, sim_num, keys) is persisted here: both join
   * sides read it, and recomputing it means two full sketch scans.
   */
  private def hammingBandedPairs(sketches: DataFrame, maxHamming: Int,
                                 scope: CacheScope): DataFrame = {
    val sk = scope.persist(sketches)
    val banded = sk.select(col("doc_id"), col("sim_num"),
      posexplode(col("keys")).as(Seq("chunk", "key")))
    banded.select(col("doc_id").as("doc_a"), col("sim_num").as("num_a"),
        col("chunk"), col("key"))
      .join(banded.select(col("doc_id").as("doc_b"), col("sim_num").as("num_b"),
        col("chunk"), col("key")), Seq("chunk", "key"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("num_a").bitwiseXOR(col("num_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
  }

  /**
   * The PRODUCTION-scale variant of [[simhashNearDups]]: 64-bit native
   * sketch ([[graft.functions.TextFunctions.simhash64]], codegen'd), banded
   * into 4 chunks of 16 bits — chunk-match probability for unrelated docs
   * is 2^-16 (vs 1/16 for the 4-bit chunks of the portable 16-bit
   * miniature, whose candidate join degenerates at corpus scale), and the
   * pigeonhole guarantee for hamming <= 3 holds identically. Not
   * SQL-oracle-checkable (xxhash64 sketch); pigeonhole-verified in OpsSpec.
   */
  def simhashNearDups64(docs: DataFrame, maxHamming: Int = 3,
                        scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val chunks = 4
    hammingBandedPairs(docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.simhash64(col("text")).as("sim_num"))
      .select(col("doc_id"), col("sim_num"),
        array((0 until chunks).map(c =>
          shiftright(col("sim_num"), c * 16).bitwiseAND(lit(0xffffL))): _*).as("keys")),
      maxHamming, scope)
  }

  // ------------------------------------------------- embedding near-dup

  /**
   * Cosine similarity between two double-array columns via built-in HOFs —
   * the SQL-expressible formulation kept for documentation/tests; hot paths
   * use the native fused kernel [[graft.functions.VecFunctions.cosine_f]]
   * (bit-identical fold order, no per-pair intermediate array).
   */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /**
   * Embedding-cosine near-duplicate pairs, blocked by `label` (the
   * coarse-bucket stand-in; at scale the blocker is the ANN index in
   * graft.ops.Ann). Emits pairs with cosine >= threshold, rounded to 6 dp.
   */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = embeddings.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, "label")
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", round(
        graft.functions.VecFunctions.cosine_f(col("ea"), col("eb")), 6))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /**
   * Embedding near-dup at scale: the blocker is the LSH index itself —
   * candidate pairs share a (table, bucket) hyperplane-LSH cell, so the
   * self-join key is the bucket and shuffle volume is bounded by bucket
   * occupancy, never all-pairs (the label-blocked variant above needs a
   * trusted coarse label; this one does not). Same hyperplane family as
   * [[graft.ops.Ann.lshTopK]]. Emits distinct (vec_a < vec_b) pairs with
   * round-6 cosine >= threshold.
   */
  def embeddingNearDupsLsh(embeddings: DataFrame, threshold: Double,
                           nTables: Int = graft.ops.Ann.DefaultTables,
                           nBits: Int = graft.ops.Ann.DefaultBits,
                           dim: Int = graft.ops.Ann.DefaultDim): DataFrame = {
    def bucketed(idCol: String, vecCol: String) =
      embeddings.select(col("vec_id").as(idCol), col("embedding").as(vecCol),
        posexplode(graft.functions.VecFunctions.lsh_buckets(col("embedding"), nTables, nBits, dim))
          .as(Seq("table", "bucket")))
    // verify BEFORE dedup (the hammingBandedPairs pattern): cosine is a
    // deterministic function of the pair, so duplicate candidates (pairs
    // sharing several LSH cells) collapse identically — and the dedup
    // exchange then carries only (id, id, cos) for threshold SURVIVORS
    // instead of every candidate with both raw embedding arrays attached
    bucketed("vec_a", "ea").join(bucketed("vec_b", "eb"), Seq("table", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", round(
        graft.functions.VecFunctions.cosine_f(col("ea"), col("eb")), 6))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .dropDuplicates("vec_a", "vec_b")
  }

  // ------------------------------------------------- bloom decontamination

  /**
   * Bloom-prefiltered membership split — the probe-side pruning pattern for
   * decontaminating a NEW batch against a reference corpus at 100 TB. A
   * plain anti-join shuffles the entire new batch on the key; a Bloom
   * filter built from the reference answers "definitely not present" for
   * the overwhelming majority of new keys WITHOUT any shuffle of the probe
   * side, so only the tiny "maybe" fraction (true matches + false
   * positives) pays the exact verification join.
   *
   * Mechanics: the filter is `mBits` bits packed into 64-bit words as a
   * (slot, bits) table — built with one explode (k positions per reference
   * key, `xxhash64(i, key) mod mBits`) and one `bit_or` aggregate, sized
   * `mBits/64` rows max regardless of corpus size. The probe side takes k
   * BROADCAST joins on the slot (row-aligned — no explode, no re-group, no
   * shuffle of the probe) and a bit-test per position. Bloom filters have
   * no false negatives, so the "clean" frame is exact by construction;
   * false-positive rate ~(1 - e^(-k·n/m))^k only affects how much work the
   * verify join sees.
   *
   * Returns (definitelyClean, maybePresent). [[bloomDecontaminate]]
   * composes the exact end-to-end result.
   */
  def bloomSplit(probe: DataFrame, refKeys: DataFrame, keyCol: String,
                 mBits: Long = 1L << 20, k: Int = 5): (DataFrame, DataFrame) = {
    require(k >= 1 && k <= 16, s"k=$k hash functions out of range")
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits=$mBits must be a power of two >= 64")
    def slotE(i: Int, c: String) =
      expr(s"pmod(xxhash64($i, `$c`), ${mBits}L) div 64")
    def maskE(i: Int, c: String) =
      expr(s"shiftleft(cast(1 as bigint), " +
        s"cast(pmod(xxhash64($i, `$c`), ${mBits}L) % 64 as int))")
    val refCol = refKeys.columns.head
    val pairs = (0 until k).map(i =>
      struct(slotE(i, refCol).as("slot"), maskE(i, refCol).as("mask")))
    // pinned (lazily): the k probe-side joins below each reference this
    // frame — unpinned, the reference-corpus explode + bit_or aggregate
    // re-ran once PER HASH FUNCTION (k full passes over the reference).
    // The frame is ≤ mBits/64 rows regardless of corpus size.
    val bloom = refKeys.select(explode(array(pairs: _*)).as("sm"))
      .select(col("sm.slot").as("slot"), col("sm.mask").as("mask"))
      .groupBy("slot").agg(expr("bit_or(mask)").as("bits"))
      .localCheckpoint(false)
    var p = probe
    for (i <- 0 until k) {
      val b = bloom.select(col("slot").as(s"_bs$i"), col("bits").as(s"_bb$i"))
      p = p.withColumn(s"_sl$i", slotE(i, keyCol))
        .withColumn(s"_mk$i", maskE(i, keyCol))
        .join(broadcast(b), col(s"_sl$i") === col(s"_bs$i"), "left_outer")
    }
    val maybe = (0 until k)
      .map(i => (coalesce(col(s"_bb$i"), lit(0L))
        .bitwiseAND(col(s"_mk$i"))) =!= lit(0L))
      .reduce(_ && _)
    val scratch = (0 until k).flatMap(i => Seq(s"_sl$i", s"_mk$i", s"_bs$i", s"_bb$i"))
    (p.where(!maybe).drop(scratch: _*), p.where(maybe).drop(scratch: _*))
  }

  /**
   * Exact decontamination with Bloom pruning: rows of `probe` whose
   * `keyCol` does NOT appear in `refKeys` — bit-identical to a plain
   * left-anti join (the Bloom routing never changes the answer, only which
   * rows pay the verify join), which is exactly what makes it
   * oracle-checkable against engines with no Bloom at all.
   */
  def bloomDecontaminate(probe: DataFrame, refKeys: DataFrame, keyCol: String,
                         mBits: Long = 1L << 20, k: Int = 5): DataFrame = {
    val (clean, maybe) = bloomSplit(probe, refKeys, keyCol, mBits, k)
    val ref = refKeys.select(col(refKeys.columns.head).as(keyCol)).distinct()
    clean.unionByName(maybe.join(ref, Seq(keyCol), "left_anti"))
  }
}
