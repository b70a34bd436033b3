package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization — the memory-bounded ANN path that completes the
 * similarity-search suite (brute force = exactness baseline, LSH/IVF =
 * candidate pruning, PQ = code compression): each 64-dim vector is split
 * into [[Blocks]] sub-vectors, each quantized to one of [[Codes]] trained
 * sub-centroids, so a vector stores as `Blocks` small ints (here 8 × 4
 * bits = 4 bytes vs 256 raw — the layout that fits a billion vectors in
 * executor memory). Queries score by Asymmetric Distance Computation
 * (ADC): the query precomputes a tiny (block × code) distance table and
 * every corpus vector's approximate distance is `Blocks` table lookups —
 * no float math per candidate at all.
 *
 * Scale shape: encoding is one narrow codegen'd projection
 * ([[graft.functions.PqCodes]]); ADC is a crossJoin against the BROADCAST
 * query-table frame (queries × blocks × codes doubles — kilobytes) with
 * the lookup-sum as one `aggregate` HOF over the codes array, then a
 * per-query top-k window. The corpus never shuffles; at 100 TB the scan
 * reads the 4-byte codes column, not the 256-byte embeddings.
 *
 * Determinism (oracle-exact, like the trained IVF): training collects a
 * bounded sample in vec_id order and runs per-block farthest-first init +
 * a fixed number of Lloyd iterations where every ranking uses
 * [[graft.functions.VecFunctions.d2Round6]] (round-6 squared L2 via the
 * dot-product identity — the form `round(list_dot_product(a,a) -
 * 2*list_dot_product(a,b) + list_dot_product(b,b), 6)` reproduces
 * bit-exactly in DuckDB) with ties to the lowest vec_id / code, and means
 * fold members in vec_id order. The SQL oracle re-derives the same
 * codebooks, codes, and ADC scores from the data — no literal leaks.
 */
object Pq {

  val Blocks = 8
  val SubDim = 8
  val Codes = 16
  val TrainSample = 500L
  val Iters = 3

  import graft.functions.VecFunctions.d2Round6

  /** Per-block codebooks `[block][code][subdim]`, trained deterministically
    * on the `vec_id < sampleMax` sample (raw sub-vectors, no
    * normalization — PQ quantizes magnitudes too). */
  def trainCodebooks(embeddings: DataFrame, nCodes: Int = Codes,
                     iters: Int = Iters,
                     sampleMax: Long = TrainSample): Array[Array[Array[Double]]] = {
    val sample: Array[Array[Double]] = embeddings
      .where(col("vec_id") < sampleMax)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(sample.nonEmpty, "PQ training requires a non-empty sample")
    Array.tabulate(Blocks) { m =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, m * SubDim, (m + 1) * SubDim))
      val k = math.min(nCodes, subs.length)
      // farthest-first init: c0 = first sample's sub-vector; each next pick
      // maximizes the min round-6 d² to the chosen set, ties to the FIRST
      // (= lowest vec_id — the sample is collected in vec_id order)
      val cents = scala.collection.mutable.ArrayBuffer(subs(0))
      val minD = subs.map(s => d2Round6(cents(0), s))
      while (cents.length < k) {
        var best = 0
        var i = 1
        while (i < subs.length) { if (minD(i) > minD(best)) best = i; i += 1 }
        val c = subs(best)
        cents += c
        i = 0
        while (i < subs.length) {
          val v = d2Round6(c, subs(i))
          if (v < minD(i)) minD(i) = v
          i += 1
        }
      }
      var cs = cents.toArray
      for (_ <- 1 to iters) {
        // assignment: round-6 d², strict < keeps the lowest code on ties
        val assign = subs.map { s =>
          var bj = 0; var bd = d2Round6(cs(0), s)
          var j = 1
          while (j < k) {
            val v = d2Round6(cs(j), s)
            if (v < bd) { bj = j; bd = v }
            j += 1
          }
          bj
        }
        cs = Array.tabulate(k) { j =>
          val members = subs.indices.filter(assign(_) == j)
          if (members.isEmpty) cs(j) // empty cluster keeps its centroid
          else {
            val mArr = new Array[Double](SubDim)
            var d = 0
            while (d < SubDim) {
              var acc = subs(members.head)(d)
              members.tail.foreach(i => acc += subs(i)(d))
              mArr(d) = acc / members.length
              d += 1
            }
            mArr
          }
        }
      }
      cs
    }
  }

  /** (vec_id, codes array<int>) — one narrow codegen'd projection. */
  def encode(embeddings: DataFrame, codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    embeddings.select(col("vec_id"),
      graft.functions.VecFunctions.pq_codes(col("embedding"), codebooks).as("codes"))

  /**
   * ADC top-k: per query, the k corpus vectors with the smallest
   * approximate (ADC) round-6 squared distance, ties to the lowest
   * vec_id. The per-query (block × code) distance tables are computed on
   * the driver (queries × Blocks × Codes round-6 doubles — kilobytes,
   * same bounded-collect pattern as the probe cells of the indexed IVF)
   * and broadcast; the per-row score is `Blocks` array lookups folded in
   * block order inside one `aggregate` HOF.
   */
  def adcTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cbArr = codebooks.map(_.map(_.toArray).toArray).toArray
    val queryVecs: Array[(Long, Array[Double])] = embeddings
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    val tables = queryVecs.toSeq.map { case (qid, qv) =>
      val dtable: Seq[Seq[Double]] = (0 until Blocks).map { m =>
        val sub = java.util.Arrays.copyOfRange(qv, m * SubDim, (m + 1) * SubDim)
        cbArr(m).toSeq.map(cent => d2Round6(cent, sub))
      }
      (qid, dtable)
    }
    val qdf = tables.toDF("query_id", "dtable")
    val approx = aggregate(sequence(lit(0), lit(Blocks - 1)), lit(0.0),
      (acc, m) => acc + element_at(element_at(col("dtable"), m + 1),
        element_at(col("codes"), m + 1) + 1))
    val w = Window.partitionBy("query_id").orderBy(col("approx_d2").asc, col("vec_id"))
    encode(embeddings, codebooks)
      .crossJoin(broadcast(qdf))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("approx_d2", round(approx, 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("approx_d2"), col("rank").cast("long").as("rank"))
  }

  // ------------------------------------------------------------------ IVFPQ

  /**
   * The composed billion-vector layout: IVF cell as the PHYSICAL partition
   * key (probes prune to `nProbe` directories, as in
   * [[Ann.ivfTopKIndexed]]) and PQ codes as the ROW payload — the index
   * stores `vec_id + 8 codes (+ generation)` and NOT the raw embedding,
   * which is the whole point: a 10^9 × 64-float corpus (256 GB raw)
   * indexes in ~12 GB. Same `idx_gen` discipline as [[Ann.writeIvfIndex]]
   * so the delta-append/maintenance story carries over.
   */
  def writeIvfPqIndex(embeddings: DataFrame, path: String,
                      cents: Seq[Seq[Double]],
                      codebooks: Seq[Seq[Seq[Double]]]): Unit = {
    import graft.functions.VecFunctions.{ivf_cells_trained, pq_codes}
    embeddings
      .select(col("vec_id"),
        pq_codes(col("embedding"), codebooks).as("codes"),
        lit(0).as("idx_gen"),
        element_at(ivf_cells_trained(col("embedding"), cents, 1), 1).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** [[Ann.appendIvfIndex]] for the IVFPQ layout: new vectors encoded with
    * the FROZEN centroids + codebooks, appended as per-cell delta files. */
  def appendIvfPqIndex(newVectors: DataFrame, path: String,
                       cents: Seq[Seq[Double]],
                       codebooks: Seq[Seq[Seq[Double]]]): Unit = {
    import graft.functions.VecFunctions.{ivf_cells_trained, pq_codes}
    newVectors
      .select(col("vec_id"),
        pq_codes(col("embedding"), codebooks).as("codes"),
        lit(1).as("idx_gen"),
        element_at(ivf_cells_trained(col("embedding"), cents, 1), 1).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /**
   * IVFPQ top-k served from the materialized index: the queries' probe
   * cells land as a STATIC `cell IN (...)` partition filter (only the
   * probed directories are listed or read), and scoring inside them is
   * pure ADC — the per-(query, cell) broadcast rows carry the query's
   * distance table, and each candidate costs `Blocks` array lookups. The
   * exact-cosine re-rank of the plain IVF path is gone by design (the
   * index has no raw vectors); production recalls the top candidates'
   * raw vectors from the primary store when exactness matters.
   */
  def ivfPqTopK(spark: SparkSession, indexPath: String, embeddings: DataFrame,
                queryIds: Seq[Long], k: Int,
                cents: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
                nProbe: Int = Ann.IvfTrainedProbes): DataFrame = {
    import spark.implicits._
    import graft.functions.VecFunctions.cosineRound6
    val centArr = cents.map(_.toArray).toArray
    val cbArr = codebooks.map(_.map(_.toArray).toArray).toArray
    val queryVecs: Array[(Long, Array[Double])] = embeddings
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    // driver-side probe selection + distance tables (bounded: queries ×
    // nProbe cells, queries × Blocks × Codes doubles) — the same round-6
    // cosine ranking as the ivf_cells_trained kernel, ties to lowest cell
    val probeRows: Seq[(Long, Int, Seq[Seq[Double]])] = queryVecs.toSeq.flatMap {
      case (qid, qv) =>
        val cellRank = centArr.indices
          .sortBy(c => (-cosineRound6(centArr(c), qv), c)).take(nProbe)
        val dtable: Seq[Seq[Double]] = (0 until Blocks).map { m =>
          val sub = java.util.Arrays.copyOfRange(qv, m * SubDim, (m + 1) * SubDim)
          cbArr(m).toSeq.map(cent => d2Round6(cent, sub))
        }
        cellRank.map(c => (qid, c, dtable))
    }
    val qdf = probeRows.toDF("query_id", "cell", "dtable")
    val probeCells = probeRows.map(_._2).distinct.sorted
    val corpus = spark.read.parquet(indexPath)
      .where(col("cell").isin(probeCells: _*))
    val approx = aggregate(sequence(lit(0), lit(Blocks - 1)), lit(0.0),
      (acc, m) => acc + element_at(element_at(col("dtable"), m + 1),
        element_at(col("codes"), m + 1) + 1))
    val w = Window.partitionBy("query_id").orderBy(col("approx_d2").asc, col("vec_id"))
    corpus.join(broadcast(qdf), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("approx_d2", round(approx, 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("approx_d2"), col("rank").cast("long").as("rank"))
  }
}
