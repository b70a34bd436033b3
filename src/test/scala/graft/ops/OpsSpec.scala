package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup groups identical texts and keeps min doc_id") {
    import spark.implicits._
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(d).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 2)
    val dup = got.find(_._2 == 1L).get
    assert(dup._3 == 2L)
  }

  test("minhash: identical docs share signatures; LSH surfaces them as candidates") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(d)
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(3L))
    val pairs = Dedup.lshCandidatePairs(sigs).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("degenerate LSH buckets emit bounded star pairs, not a quadratic blow-up") {
    import spark.implicits._
    // 5,000 identical texts -> identical signatures -> every band bucket
    // holds all 5,000 docs. Full expansion would be ~12.5M pairs; the
    // bucket guard (maxBucket default 4096 < 5000) emits star pairs to the
    // bucket min instead: exactly n-1 pairs, all anchored at doc 0.
    val d = (0L until 5000L).map(i => (i, "the same boilerplate text again and again"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(Dedup.minhashSignatures(d)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 4999)
    assert(pairs.forall(_._1 == 0L))
    assert(pairs.map(_._2).toSet == (1L until 5000L).toSet)
  }

  test("small LSH buckets keep full pair expansion under the guard") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e")).toDF("doc_id", "text")
    val full = Dedup.lshCandidatePairs(Dedup.minhashSignatures(d)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // forcing the cap below the bucket size switches to star pairs
    val star = Dedup.lshCandidatePairs(Dedup.minhashSignatures(d), maxBucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == Set((1L, 2L), (1L, 3L)))
  }

  test("bigram jaccard: identical docs score 1.0; disjoint docs score 0.0") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.ngramJaccard(d, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got((1L, 3L)) == 0.0)
  }

  test("simhash: identical docs equal; near-identical docs are close in hamming distance") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, base + " extra"),
      (4L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(got(1L) == got(2L))
    // 16-bit sketch: near-identical must be strictly closer than unrelated
    assert(hamming(got(1L), got(3L)) < hamming(got(1L), got(4L)))
    assert(hamming(got(1L), got(3L)) <= 5)
  }

  test("simhash chunk-banding finds near-dups within hamming 3, never misses by pigeonhole") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, base + " extra few words appended"),
      (4L, (1 to 60).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.simhashNearDups(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 0L) // identical docs: hamming 0
    // exhaustive check vs the sketch table: every pair within hamming 3 is found
    val sketches = Dedup.simhashOver(Dedup.bigramShingles(d)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    for (a <- sketches.keys; b <- sketches.keys if a < b) {
      val h = ham(sketches(a), sketches(b))
      if (h <= 3) assert(got.get((a, b)).contains(h.toLong), s"missed ($a,$b) at hamming $h")
      else assert(!got.contains((a, b)))
    }
  }

  test("simhash64 chunk-banding: pigeonhole-complete within hamming 3 on the real corpus") {
    val found = Dedup.simhashNearDups64(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sketches = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var expected = 0
    for (a <- sketches.keys; b <- sketches.keys if a < b) {
      val h = java.lang.Long.bitCount(sketches(a) ^ sketches(b)).toLong
      if (h <= 3) {
        expected += 1
        assert(found.get((a, b)).contains(h), s"missed ($a,$b) at hamming $h")
      }
    }
    assert(found.size == expected)
  }

  test("cosine column matches a scala-side computation") {
    import spark.implicits._
    val d = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = d.select(Dedup.cosine(col("a").cast("array<double>"),
      col("b").cast("array<double>"))).head().getDouble(0)
    val exp = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("LSH ANN achieves >= 0.6 recall@10 vs brute force on real embeddings") {
    val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Ann.bruteForceTopK(embeddings, queryIds, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val lsh = Ann.lshTopK(embeddings, queryIds, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = queryIds.map { q =>
      val b = brute(q)
      lsh.get(q).map(l => (l intersect b).size.toDouble / b.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall $mean, per-query $recalls")
  }

  test("dedup pipeline: exact dups, near-dup clusters, and uniques get the right verdicts") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = (1 to 29).map(i => s"tok$i").mkString(" ") + " tokX" // high jaccard vs base
    val other = (1 to 30).map(i => s"zzz$i").mkString(" ")
    val d = Seq(
      (1L, base), (2L, base),   // 2 is an exact dup of 1
      (3L, near),               // near-dup of 1 -> same cluster, canonical 1
      (4L, other), (5L, other), // 5 exact dup of 4; cluster {4}
      (6L, "completely different unique text here")).toDF("doc_id", "text")
    val got = DedupPipeline.run(spark, d, 0.8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getString(3))).toMap
    assert(got(1L) == ((1L, true, "kept")))
    assert(got(2L) == ((1L, false, "exact_dup")))
    assert(got(3L) == ((1L, false, "near_dup")))
    assert(got(4L) == ((4L, true, "kept")))
    assert(got(5L) == ((4L, false, "exact_dup")))
    assert(got(6L) == ((6L, true, "kept")))
  }

  test("DedupPipeline.runTo releases every persisted intermediate once the output is written") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = java.nio.file.Files.createTempDirectory("graftdedupout").toString + "/verdicts"
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, base + " tokX"),
      (4L, "entirely different text here")).toDF("doc_id", "text")
    val verdicts = DedupPipeline.runTo(spark, d, out)
    assert(verdicts.count() == 4)
    assert(verdicts.where(col("keep")).count() < 4) // it actually deduped
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"persisted RDDs leaked past the completion point: $leaked")
  }

  test("IVF ANN achieves >= 0.6 recall@10 vs brute force on real embeddings") {
    val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Ann.bruteForceTopK(embeddings, queryIds, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = Ann.ivfTopK(embeddings, queryIds, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = queryIds.map { q =>
      val b = brute(q)
      ivf.get(q).map(l => (l intersect b).size.toDouble / b.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall $mean, per-query $recalls")
  }

  test("TRAINED IVF achieves >= 0.6 recall@10 at nProbe=4 (vs 0.38 seeded at the same probes)") {
    // all 500 vectors as queries: the round-3 done-bar (recall@10 >= 0.6 at
    // nProbe=4) measured corpus-wide, not on a lucky handful
    val queryIds = (0L until 500L).toSeq
    val brute = Ann.bruteForceTopK(embeddings, queryIds, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = Ann.ivfTopKTrained(embeddings, queryIds, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = queryIds.map { q =>
      val b = brute(q)
      ivf.get(q).map(l => (l intersect b).size.toDouble / b.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall $mean over ${queryIds.size} queries")
  }

  test("materialized IVF index: probe scan is partition-pruned to the probed cells") {
    val cents = Ann.trainIvfCentroids(embeddings).map(_.toSeq).toSeq
    val idx = java.nio.file.Files.createTempDirectory("graftivfidx").toString + "/index"
    Ann.writeIvfIndex(embeddings, idx, cents)
    // the index table is physically partitioned by cell (one dir per cell)
    val cellDirs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length == Ann.IvfTrainedCells)
    val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
    val res = Ann.ivfTopKIndexed(spark, idx, embeddings, queryIds, 10, cents)
    // identical results to the non-indexed trained path (same centroids,
    // same probes; floats round-trip parquet exactly)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(asSet(res) == asSet(Ann.ivfTopKTrained(embeddings, queryIds, 10)))
    // the probe plan prunes the index scan to the probed cells: a static
    // `cell IN (...)` lands in the scan's PartitionFilters, and strictly
    // fewer than all cell directories are read
    val planStr = res.queryExecution.executedPlan.toString()
    val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*IN".r
    assert(pf.findFirstIn(planStr).isDefined,
      s"no cell IN (...) PartitionFilters on the index scan:\n$planStr")
    import graft.functions.VecFunctions.ivf_cells_trained
    val probedCells = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(explode(ivf_cells_trained(col("embedding"), cents, Ann.IvfTrainedProbes)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(probedCells.size < Ann.IvfTrainedCells,
      s"test premise: 5 queries at nProbe=4 must not probe every cell ($probedCells)")
  }

  test("incremental IVF index: appended deltas answer identically to a from-scratch rebuild") {
    // base index on corpus A; two appended batches B1, B2 (per-cell delta
    // files with the SAME frozen centroids); queries over the appended
    // index must equal the same queries over a from-scratch A∪B1∪B2 index
    val corpusA = embeddings.where(col("vec_id") % 3 =!= 0)
    val corpusB1 = embeddings.where(col("vec_id") % 3 === 0 && col("vec_id") % 2 === 0)
    val corpusB2 = embeddings.where(col("vec_id") % 3 === 0 && col("vec_id") % 2 =!= 0)
    val cents = Ann.trainIvfCentroids(corpusA).map(_.toSeq).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graftivfinc")
    val inc = tmp.toString + "/inc"
    val full = tmp.toString + "/full"
    Ann.writeIvfIndex(corpusA, inc, cents)
    val baseStats = Ann.ivfIndexStats(spark, inc)
    assert(baseStats.appended == 0L && !Ann.shouldRetrainIvf(spark, inc))
    Ann.appendIvfIndex(corpusB1, inc, cents)
    Ann.appendIvfIndex(corpusB2, inc, cents)
    Ann.writeIvfIndex(embeddings, full, cents)
    val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val resInc = Ann.ivfTopKIndexed(spark, inc, embeddings, queryIds, 10, cents)
    assert(asSet(resInc) == asSet(
      Ann.ivfTopKIndexed(spark, full, embeddings, queryIds, 10, cents)))
    // probe scan over the appended index is still partition-pruned
    val planStr = resInc.queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*IN".r.findFirstIn(planStr).isDefined,
      s"no cell IN (...) PartitionFilters on the appended index scan:\n$planStr")
    // the retrain policy sees the appended fraction (B = 1/3 of the corpus,
    // above the 0.25 default threshold)
    val stats = Ann.ivfIndexStats(spark, inc)
    assert(stats.total == baseStats.total + corpusB1.count() + corpusB2.count())
    assert(stats.appendedFraction > 0.25 && Ann.shouldRetrainIvf(spark, inc))
    // appends landed as DELTA FILES inside existing cell dirs, not a rewrite
    val cellDirs = new java.io.File(inc).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.exists(d => d.listFiles().count(_.getName.endsWith(".parquet")) >= 3),
      "expected base + two delta part files in at least one cell dir")
  }

  test("IVF maintenance policy: retrain above threshold, compact-only below") {
    val corpusA = embeddings.where(col("vec_id") % 3 =!= 0)
    val corpusSmall = embeddings.where(col("vec_id") % 3 === 0 && col("vec_id") < 100)
    val corpusRest = embeddings.where(col("vec_id") % 3 === 0 && col("vec_id") >= 100)
    val cents = Ann.trainIvfCentroids(corpusA).map(_.toSeq).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graftivfmnt")
    val idx = tmp.toString + "/idx"
    Ann.writeIvfIndex(corpusA, idx, cents)
    val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    // small append (< 25% of the index) -> compact-only: same assignments,
    // old centroids stay valid, results bit-identical, deltas folded
    Ann.appendIvfIndex(corpusSmall, idx, cents)
    assert(!Ann.shouldRetrainIvf(spark, idx))
    val before = asSet(Ann.ivfTopKIndexed(spark, idx, embeddings, queryIds, 10, cents))
    val compacted = tmp.toString + "/compacted"
    assert(Ann.maintainIvfIndex(spark, idx, compacted).isEmpty)
    assert(asSet(Ann.ivfTopKIndexed(spark, compacted, embeddings, queryIds, 10, cents)) == before)
    assert(Ann.ivfIndexStats(spark, compacted).appended == 0L) // gen reset
    // assignments preserved verbatim: per-cell counts identical
    def cellCounts(p: String) = spark.read.parquet(p).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cellCounts(compacted) == cellCounts(idx))

    // big append (> 25%) -> retrain on the index's own content: returned
    // centroids equal training on the equivalent union corpus, and the
    // rebuilt index answers like a from-scratch build with them
    Ann.appendIvfIndex(corpusRest, compacted, cents)
    assert(Ann.shouldRetrainIvf(spark, compacted))
    val retrained = tmp.toString + "/retrained"
    val newCents = Ann.maintainIvfIndex(spark, compacted, retrained)
    assert(newCents.isDefined)
    val expectCents = Ann.trainIvfCentroids(embeddings).map(_.toSeq).toSeq
    assert(newCents.get == expectCents)
    val scratch = tmp.toString + "/scratch"
    Ann.writeIvfIndex(embeddings, scratch, expectCents)
    assert(asSet(Ann.ivfTopKIndexed(spark, retrained, embeddings, queryIds, 10, newCents.get)) ==
      asSet(Ann.ivfTopKIndexed(spark, scratch, embeddings, queryIds, 10, expectCents)))
    assert(Ann.ivfIndexStats(spark, retrained).appended == 0L)
  }

  test("PQ: codes are in range, deterministic, and ADC matches a manual recomputation") {
    import graft.functions.VecFunctions.d2Round6
    val cbs = Pq.trainCodebooks(embeddings)
    assert(cbs.length == Pq.Blocks && cbs.forall(_.length == Pq.Codes) &&
      cbs.forall(_.forall(_.length == Pq.SubDim)))
    val cbSeq: Seq[Seq[Seq[Double]]] = cbs.toSeq.map(_.toSeq.map(_.toSeq))
    val codes = Pq.encode(embeddings, cbSeq).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.length == Pq.Blocks && cs.forall(c => c >= 0 && c < Pq.Codes)))
    // re-run training: bit-identical codebooks (no RNG anywhere)
    val cbs2 = Pq.trainCodebooks(embeddings)
    assert(cbs.zip(cbs2).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    // ADC score for one (query, vector) pair == manual table-lookup sum
    val res = Pq.adcTopK(embeddings, Seq(0L), 5, cbSeq).collect()
    assert(res.length == 5 && res.forall(_.getLong(0) == 0L))
    val q = embeddings.where(col("vec_id") === 0L).collect()(0)
      .getSeq[Float](1).toArray.map(_.toDouble)
    val top = res.minBy(_.getLong(3))
    val nb = top.getLong(1)
    val expected = (0 until Pq.Blocks).foldLeft(0.0) { (acc, m) =>
      val sub = java.util.Arrays.copyOfRange(q, m * Pq.SubDim, (m + 1) * Pq.SubDim)
      acc + d2Round6(cbs(m)(codes(nb)(m)), sub)
    }
    assert(top.getDouble(2) == math.rint(expected * 1e6) / 1e6)
    // approx distances are ranked ascending with vec_id ties
    val sorted = res.sortBy(_.getLong(3))
    assert(sorted.sliding(2).forall { case Array(a, b) =>
      a.getDouble(2) < b.getDouble(2) ||
        (a.getDouble(2) == b.getDouble(2) && a.getLong(1) < b.getLong(1)) })
  }

  test("IVFPQ index: partition-pruned probes, no raw embeddings, append == rebuild") {
    val cents = Ann.trainIvfCentroids(embeddings).map(_.toSeq).toSeq
    val cbs: Seq[Seq[Seq[Double]]] =
      Pq.trainCodebooks(embeddings).toSeq.map(_.toSeq.map(_.toSeq))
    val tmp = java.nio.file.Files.createTempDirectory("graftivfpq")
    val idx = tmp.toString + "/idx"
    Pq.writeIvfPqIndex(embeddings, idx, cents, cbs)
    // the index holds codes + generation, NOT raw embeddings (the memory story)
    val schema = spark.read.parquet(idx).schema.fieldNames.toSet
    assert(schema == Set("vec_id", "codes", "idx_gen", "cell"))
    val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
    val res = Pq.ivfPqTopK(spark, idx, embeddings, queryIds, 10, cents, cbs)
    val planStr = res.queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*IN".r.findFirstIn(planStr).isDefined,
      s"no cell IN (...) PartitionFilters on the IVFPQ scan:\n$planStr")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val full = asSet(res)
    assert(full.size == 50)
    // delta-append parity: index built on A then appended with B answers
    // exactly like the full build (same frozen cents + codebooks)
    val inc = tmp.toString + "/inc"
    Pq.writeIvfPqIndex(embeddings.where(col("vec_id") % 2 === 0), inc, cents, cbs)
    Pq.appendIvfPqIndex(embeddings.where(col("vec_id") % 2 =!= 0), inc, cents, cbs)
    assert(asSet(Pq.ivfPqTopK(spark, inc, embeddings, queryIds, 10, cents, cbs)) == full)
  }

  test("PQ ADC recall@10 vs brute force on real embeddings") {
    // random 64-dim vectors are PQ's worst case (no cluster structure to
    // exploit; 32-bit codes); the bar is an honest floor measured on this
    // corpus, not a claim of production recall — real embedding spaces
    // cluster and quantize far better (and production raises Codes/Blocks)
    val cbSeq: Seq[Seq[Seq[Double]]] =
      Pq.trainCodebooks(embeddings).toSeq.map(_.toSeq.map(_.toSeq))
    val queryIds = (0L until 100L).toSeq
    val brute = Ann.bruteForceTopK(embeddings, queryIds, 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pq = Pq.adcTopK(embeddings, queryIds, 10, cbSeq).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = queryIds.map { q =>
      val b = brute(q)
      pq.get(q).map(l => (l intersect b).size.toDouble / b.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ ADC mean recall@10 over ${queryIds.size} queries: $mean%.3f")
    assert(mean >= 0.15, s"mean recall $mean")
  }

  test("IVF training is deterministic (same centroids on re-run)") {
    val c1 = Ann.trainIvfCentroids(embeddings)
    val c2 = Ann.trainIvfCentroids(embeddings)
    assert(c1.length == graft.ops.Ann.IvfTrainedCells)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("LSH-blocked embedding near-dups: distinct ordered pairs, all above threshold") {
    val got = Dedup.embeddingNearDupsLsh(embeddings, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, c) => a < b && c >= 0.3 })
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
  }

  test("PageRank over a path graph matches a hand-computed fixpoint step") {
    import spark.implicits._
    // path graph A - B - C: after any number of iterations B (the hub)
    // must outrank A and C, which stay symmetric
    val edges = Seq(("A", "B", 1L), ("B", "C", 1L)).toDF("entity_a", "entity_b", "weight")
    val got = GraphAnalytics.pageRank(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set("A", "B", "C"))
    assert(got("A") == got("C")) // symmetry: same degree, same rank
    assert(got("B")._2 > got("A")._2) // hub outranks leaves
    assert(got("B")._1 == 2L && got("A")._1 == 1L)
    // independent recomputation of the 3-iteration, round-6 recurrence
    val n = 3.0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    var pa = r6(1.0 / n); var pb = pa; var pc = pa
    for (_ <- 1 to 3) {
      val (na, nb2, nc) = (
        r6((1.0 - 0.85) / n + 0.85 * (pb / 2)),
        r6((1.0 - 0.85) / n + 0.85 * (pa / 1 + pc / 1)),
        r6((1.0 - 0.85) / n + 0.85 * (pb / 2)))
      pa = na; pb = nb2; pc = nc
    }
    assert(got("A")._2 == pa && got("B")._2 == pb && got("C")._2 == pc)
    // rank mass stays ~1 (sanity: no dangling leakage in this graph)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-3)
  }

  test("retention cohorts match a hand-computed grid") {
    import spark.implicits._
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // users 1,2 first active week 0; user 3 first active week 1.
    // week 1: user 1 returns; week 2: users 2 and 3 return.
    val events = Seq(
      (1L, ts(0), 1L), (2L, ts(1), 2L),            // week 0: users 1, 2
      (1L, ts(8), 3L), (3L, ts(9), 4L),            // week 1: user 1 back, user 3 new
      (2L, ts(15), 5L), (3L, ts(16), 6L))          // week 2: users 2, 3
      .toDF("user_id", "ts", "event_id")
      .withColumn("event_type", lit("x")).withColumn("value", lit(0.0))
    val got = Sessionize.retentionCohorts(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),   // cohort week 0: both active at offset 0
      (0L, 1L) -> ((1L, 2L, 0.5)),   // user 1 back a week later
      (0L, 2L) -> ((1L, 2L, 0.5)),   // user 2 back two weeks later
      (1L, 0L) -> ((1L, 1L, 1.0)),   // cohort week 1: user 3
      (1L, 1L) -> ((1L, 1L, 1.0))))  // user 3 back a week later
  }

  test("madOutliers: robust to the very outlier moments would absorb") {
    import spark.implicits._
    // values 1..9 plus 100 -> median = 5.00 (scaled 500; rank ceil(5) of
    // n=10); sorted deviations {0,100,100,200,200,300,300,400,400,9500}
    // -> MAD = 200 (rank 5). The 100.0 is the only |z| > 3.5.
    val events = ((1L to 9L).map(i => (i, "a", i.toDouble)) :+ ((10L, "a", 100.0)))
      .toDF("event_id", "event_type", "value")
    val got = Sketches.madOutliers(df = events, valueCol = "value",
      groupCol = "event_type").collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(got.keySet == Set(10L))
    assert(math.abs(got(10L) - 9500.0 / (1.4826 * 200.0)) < 1e-4)
  }

  test("sourceTopTerms ranks source-distinctive terms, k per source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha common", "s1"), (2L, "alpha common", "s1"),
      (3L, "beta common", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Ranking.sourceTopTerms(docs, k = 1).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // 'common' spans both sources (sf 2 -> ln(1)=0); alpha/beta are the
    // distinctive winners
    assert(got == Map("s1" -> "alpha", "s2" -> "beta"))
  }

  test("modularity: two cliques bridge — positive intra-dense contributions") {
    import spark.implicits._
    // K3 {1,2,3} + K3 {4,5,6} + bridge 3-4; communities given exactly
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("entity_a", "entity_b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("entity_id", "community")
    val got = GraphAnalytics.modularity(edges, labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // m=7; each community: 3 intra edges, degree mass 7 (6 clique + 1 bridge)
    // Q_c = 3/7 - (7/14)^2 = 0.428571 - 0.25 = 0.178571
    assert(got(1L) == ((3L, 3L, 7L, 0.178571)))
    assert(got(4L) == ((3L, 3L, 7L, 0.178571)))
  }

  test("invertedIndex: df-filtered, doc-sorted, capped posting lists") {
    import spark.implicits._
    val docs = Seq((3L, "b a"), (1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, minDf = 2, maxPostings = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // 'c' has df 1 -> filtered; 'a' df 3 but postings capped at 2 (sorted)
    assert(got == Map("a" -> ((3L, "1,2")), "b" -> ((2L, "1,3"))))
  }

  test("tokenEntropy: uniform distribution maxes entropy, constant doc is 0") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x x x x"), (3L, "a a b b")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // doc 1: 4 distinct of 4 -> H = ln 4; doc 2: one token -> H = 0;
    // doc 3: two at p=0.5 -> H = ln 2
    assert(got(1L)._1 == 4L && got(1L)._2 == 4L && got(1L)._3 == 1.0)
    assert(math.abs(got(1L)._4 - math.log(4.0)) < 1e-6)
    assert(got(2L) == ((4L, 1L, 0.25, 0.0)))
    assert(math.abs(got(3L)._4 - math.log(2.0)) < 1e-6)
  }

  test("convStats rolls up turns, roles, tools, and char mass per conversation") {
    import spark.implicits._
    val turns = Seq(
      ("c1", 0, "user", "hello", Some("search")),
      ("c1", 1, "assistant", "hi there!", None),
      ("c2", 0, "user", "x", None))
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
    val got = TextAnalysis.convStats(turns).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got("c1") == ((2L, 1L, 1L, 14L, 9L, 7.0)))
    assert(got("c2") == ((1L, 1L, 0L, 1L, 1L, 1.0)))
  }

  test("zscoreOutliers flags only rows beyond the threshold, exactly once") {
    import spark.implicits._
    // group a: nine 10.00s and one 20.00 -> the 20 is the single outlier
    // (z = 3); group b: symmetric pair, |z| = 1 each, nothing flagged
    val events = ((1L to 9L).map(i => (i, "a", 10.0)) :+ ((10L, "a", 20.0))) ++
      Seq((11L, "b", 1.0), (12L, "b", 3.0))
    val df = events.toDF("event_id", "event_type", "value")
    val got = Sketches.zscoreOutliers(df, "value", "event_type").collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.keySet == Set(10L))
    assert(math.abs(got(10L) - 3.0) < 1e-6)
  }

  test("latestByKey keeps exactly the newest row per key (event_id tiebreak)") {
    import spark.implicits._
    def ts(s: Int) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      (1L, "view", 1L, ts(10), 1.0), (1L, "view", 2L, ts(20), 2.0),
      (1L, "view", 3L, ts(20), 3.0),                       // ts tie -> id 3 wins
      (1L, "click", 4L, ts(5), 4.0), (2L, "view", 5L, ts(1), 5.0))
      .toDF("user_id", "event_type", "event_id", "ts", "value")
    val got = Sessionize.latestByKey(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, "view") -> 3L, (1L, "click") -> 4L, (2L, "view") -> 5L))
  }

  test("exactQuantiles selects the ceil(q*n)-th order statistic per group") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("a", i.toDouble)).toDF("event_type", "value")
    val got = Sketches.exactQuantiles(df, "value", "event_type")
      .collect().map(r => r.getDouble(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
    // n=10: q=0.25 -> rank 3, 0.5 -> 5, 0.9 -> 9, 0.99 -> 10
    assert(got == Map(0.25 -> ((3L, 3.0)), 0.5 -> ((5L, 5.0)),
      0.9 -> ((9L, 9.0)), 0.99 -> ((10L, 10.0))))
  }

  test("nodeSimilarity: common-neighbor Jaccard on a hand-checked graph") {
    import spark.implicits._
    // path 1-3, 2-3, 3-4: nodes 1,2,4 all have exactly {3} as neighborhood
    // -> jaccard 1.0 pairwise; pairs through node 3's hub only.
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("entity_a", "entity_b")
    val got = GraphAnalytics.nodeSimilarity(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == Map(
      (1L, 2L) -> ((1L, 1L, 1L, 1.0)),
      (1L, 4L) -> ((1L, 1L, 1L, 1.0)),
      (2L, 4L) -> ((1L, 1L, 1L, 1.0))))
  }

  test("transitions count per-user ordered pairs with per-src probabilities") {
    import spark.implicits._
    def ts(s: Int) = new java.sql.Timestamp(s * 1000L)
    // user 1: view -> click -> view; user 2: view -> click. Transitions:
    // view->click x2, click->view x1; src 'view' total 2, 'click' total 1.
    val events = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "view"),
      (2L, ts(1), 4L, "view"), (2L, ts(5), 5L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("view", "click") -> ((2L, 1.0)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("propsRollup extracts the JSON field and ignores garbage/missing") {
    import spark.implicits._
    val events = Seq(
      ("a", """{"k": 3}"""), ("a", """{"k": 5}"""),
      ("a", """{"other": 1}"""), ("b", """not json""")
    ).toDF("event_type", "props")
    val got = Sessionize.propsRollup(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // a: 3 events, 2 carry k (3+5); b: parse failure -> NULL everywhere
    assert(got == Map("a" -> ((3L, 2L, 8L, 3L)), "b" -> ((1L, 0L, -1L, -1L))))
  }

  test("sourceReport counts within-source duplicate fingerprints exactly") {
    import spark.implicits._
    // srcA: "Hello!" and "hello" normalize to the same fingerprint (1 dup
    // among 3 docs); srcB: 1 unique doc
    val docs = Seq(
      (1L, "Hello!", "srcA"), (2L, "hello", "srcA"), (3L, "bye", "srcA"),
      (4L, "hello", "srcB"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = TextAnalysis.sourceReport(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("srcA") == ((3L, 2L, 1L, 14L, 0.333333)))
    assert(got("srcB") == ((1L, 1L, 0L, 5L, 0.0)))
  }

  test("MP4 demux: frame payloads are true mdat slices with box-table offsets") {
    val assets = Multimodal.mp4Assets(spark, docs.limit(60))
    val samples = Multimodal.demuxMp4Samples(assets).collect()
    assert(samples.nonEmpty)
    samples.groupBy(_.doc_id).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_.sample_idx)
      assert(sorted.length == (id % 13 + 3).toInt)
      // offsets = 587 + 4n + prefix sums of the parsed sizes
      var off = 587L + 4 * sorted.length
      sorted.foreach { s =>
        assert(s.sample_offset == off, s"doc $id sample ${s.sample_idx}")
        assert(s.payload.length == s.sample_size)
        off += s.sample_size
      }
      // the sliced bytes match an independent LCG regeneration of mdat
      var st = id | 1
      sorted.foreach { s =>
        s.payload.foreach { b =>
          st = st * 6364136223846793005L + 1442695040888963407L
          assert(b == ((st >>> 33) & 0xff).toByte, s"doc $id payload byte differs")
        }
      }
    }
    // the MediaFrame shaping keeps dims from tkhd
    val frames = Multimodal.frameSampleMp4(assets).collect()
    assert(frames.forall(f => f.width == (f.doc_id % 16 + 1) * 16 &&
      f.height == (f.doc_id % 9 + 1) * 16))
  }

  test("multimodal: synthesized payloads are 16 md5 bytes; stub features are deterministic") {
    val assets = Multimodal.synthesizeAssets(spark, docs)
    val feats1 = Multimodal.extractFeatures(assets).collect().sortBy(_.doc_id)
    val feats2 = Multimodal.extractFeatures(assets).collect().sortBy(_.doc_id)
    assert(feats1.map(_.byte_sum).sameElements(feats2.map(_.byte_sum)))
    assert(feats1.forall(_.n_bytes == 16L))
    assert(feats1.forall(_.feature.length == 4))
    val meta = Multimodal.assetMetadata(assets)
    assert(meta.where(col("media_type").isin("image", "audio", "video")).count() == meta.count())
  }

  test("multimodal resize/frame-sample: deterministic stub transforms over real batch plumbing") {
    val assets = Multimodal.synthesizeAssets(spark, docs)
    val resized = Multimodal.resizeStub(assets, 8, 8).collect()
    assert(resized.forall(a => a.width == 8 && a.height == 8 && a.payload.nonEmpty))
    val nVideos = assets.filter(_.media_type == "video").count()
    val frames = Multimodal.frameSample(assets, 3).collect()
    assert(frames.length == 3 * nVideos)
    assert(frames.forall(_.payload.length == 16))
    // frames of one video differ (byte rotation) but are deterministic
    val byDoc = frames.groupBy(_.doc_id).values.head.sortBy(_.frame_idx)
    assert(byDoc.map(_.payload.toSeq).distinct.length == byDoc.length)
    val again = Multimodal.frameSample(assets, 3).collect()
      .groupBy(_.doc_id)(byDoc.head.doc_id).sortBy(_.frame_idx)
    assert(again.map(_.payload.toSeq).toSeq == byDoc.map(_.payload.toSeq).toSeq)
  }

  test("stratified sample is deterministic and respects per-stratum quotas") {
    val s1 = Sampling.stratifiedSample(docs, "lang", Map("en" -> 8, "de" -> 4))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val s2 = Sampling.stratifiedSample(docs, "lang", Map("en" -> 8, "de" -> 4))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2)) // no RNG: identical across runs
    assert(s1.nonEmpty)
    val byLang = Sampling.stratifiedSample(docs, "lang", Map("en" -> 8, "de" -> 4))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "de")) // unquoted strata dropped
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~8/16 of en, ~4/16 of de (hash buckets are uniform-ish, not exact)
    assert(math.abs(byLang("en").toDouble / totals("en") - 0.5) < 0.15)
    assert(math.abs(byLang("de").toDouble / totals("de") - 0.25) < 0.15)
  }

  test("top-k per group keeps exactly k best rows per stratum, ties broken by key") {
    val got = Sampling.topKPerGroup(
      docs.select(col("doc_id"), col("lang"), col("n_chars")), "lang", "n_chars", 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val byLang = got.groupBy(_._1)
    assert(byLang.values.forall(_.length == 3))
    byLang.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted(Ordering[Long].reverse))
    }
  }

  test("top-k per group plan keeps the map-side WindowGroupLimit pushdown") {
    // Spark 4's WindowGroupLimit pushes the rank<=k filter map-side, which
    // is what bounds few-group skew at k rows/group/task — a refactor that
    // silently loses it would make topKPerGroup funnel whole groups through
    // single reducers at scale.
    val plan = Sampling.topKPerGroup(
      docs.select(col("doc_id"), col("lang"), col("n_chars")), "lang", "n_chars", 3)
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("WindowGroupLimit"), s"WindowGroupLimit missing from plan:\n$plan")
  }

  test("sequence packing plan has NO per-stratum window (distributed prefix sum)") {
    import spark.implicits._
    val d = Seq((1L, "en", 3000L), (2L, "en", 3000L)).toDF("doc_id", "lang", "n_chars")
    val plan = Sampling.packSequences(d, "lang", "n_chars", 4096)
      .queryExecution.optimizedPlan.toString()
    // a Window.partitionBy(stratum) running sum = ONE sequential task per
    // stratum — the 100x-scale killer the two-pass prefix sum removes
    assert(!plan.contains("Window"), s"unexpected Window node in plan:\n$plan")
  }

  test("sequence packing matches the window formulation across many partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // adversarial layout: few strata, many partitions, keys arriving shuffled
    val rows = (0 until 1000).map(i => ((i * 7919) % 1000L, s"l${i % 3}", (i % 97 + 1).toLong))
    val d = rows.toDF("doc_id", "lang", "n_chars").repartition(16)
    val got = Sampling.packSequences(d, "lang", "n_chars", 512, numPartitions = 13)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = d.withColumn("cum_tokens", sum(col("n_chars")).over(w).cast("long"))
      .withColumn("bin", floor((col("cum_tokens") - col("n_chars")) / 512).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("sequence packing: bins respect the running-size relaxation, deterministic") {
    import spark.implicits._
    val d = Seq((1L, "en", 3000L), (2L, "en", 3000L), (3L, "en", 3000L),
      (4L, "de", 5000L), (5L, "de", 100L)).toDF("doc_id", "lang", "n_chars")
    val got = Sampling.packSequences(d, "lang", "n_chars", 4096).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // en: cum 3000/6000/9000 -> starts at 0/3000/6000 -> bins 0,0,1
    assert(got(1L) == ((3000L, 0L)) && got(2L) == ((6000L, 0L)) && got(3L) == ((9000L, 1L)))
    // de: doc 4 starts at 0 (bin 0, straddles capacity - allowed), doc 5 starts at 5000 (bin 1)
    assert(got(4L)._2 == 0L && got(5L)._2 == 1L)
  }

  test("scrubbing redacts emails and URLs, counts redactions") {
    import spark.implicits._
    val d = Seq(
      (1L, "contact me at alice.smith+x@ex-ample.org or https://ex.org/a?b=1 thanks"),
      (2L, "no pii here at all"),
      (3L, "I typed <EMAIL> literally"), // pre-existing token is NOT a redaction
      (4L, "see https://ex.org/u/a@b.com now")). // email inside a URL: two hits
      toDF("doc_id", "text")
    val got = Sampling.scrubText(d).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(1L)._1 == "contact me at <EMAIL> or <URL> thanks")
    assert(got(1L)._2 == 2L)
    assert(got(2L) == (("no pii here at all", 0L)))
    assert(got(3L) == (("I typed <EMAIL> literally", 0L)))
    assert(got(4L)._2 == 2L)
  }

  test("text analysis columns are well-formed on the real corpus") {
    val tc = TextAnalysis.tokenCounts(docs).collect()
    assert(tc.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
    val q = TextAnalysis.qualityScores(docs).collect()
    assert(q.forall { r =>
      val quality = r.getDouble(5)
      quality >= 0.0 && quality <= 1.0
    })
    val langs = TextAnalysis.langId(docs).select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "fr", "zh")))
    val fp = TextAnalysis.fingerprints(docs).collect()
    assert(fp.forall(_.getString(1).length == 32))
  }
}
