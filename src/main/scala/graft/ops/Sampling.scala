package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus-selection operators for training-data pipelines:
 * stratified sampling and per-group top-k. Both are pure narrow/window
 * dataflow — no RNG (reproducible across engines and reruns), no driver
 * state, shuffle only where the semantics demand one (the per-group
 * window).
 */
object Sampling {

  /**
   * Hash bucket 0..15 from the first hex nibble of md5(key) — deterministic
   * and ENGINE-PORTABLE (the DuckDB oracle computes the identical bucket,
   * unlike xxhash64 which only Spark has). One nibble = 1/16 rate
   * granularity, which is what corpus-level sampling needs; finer rates
   * chain a second nibble.
   */
  def hashBucket16(key: Column): Column =
    (instr(lit("0123456789abcdef"), substring(md5(key.cast("string")), 1, 1)) - 1)
      .cast("int")

  /**
   * Stratified deterministic sample: within each stratum (e.g. lang,
   * source), keep documents whose hash bucket falls below the stratum's
   * quota of 16ths. Rows from strata without a quota are dropped. A narrow
   * filter — NO shuffle, NO RNG: the same doc is kept in every run and on
   * every engine, which is what makes ablation corpora comparable.
   *
   * @param quotas stratum value -> kept buckets out of 16 (e.g. "en" -> 4
   *               keeps ~25% of English docs)
   */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       quotas: Map[String, Int], keyCol: String = "doc_id"): DataFrame = {
    val quota = quotas.foldLeft(lit(0)) { case (acc, (v, q)) =>
      when(col(stratumCol) === v, q).otherwise(acc)
    }
    docs.where(hashBucket16(col(keyCol)) < quota)
  }

  /**
   * Top-k rows per group by a score column (ties broken by the key for
   * determinism): the "best N documents per domain/language" selection.
   * One shuffle on the group key; the rank prunes inside the window — at
   * scale prefer a pre-aggregated candidate cut if k << group size.
   */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   k: Int, keyCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol).desc, col(keyCol))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
  }

  /**
   * Sequence packing for context-window assembly: within each stratum,
   * documents in stable key order are assigned to consecutive bins by the
   * running token count — `bin = floor((cumsum(tokens) - tokens) /
   * capacity)` (i.e. the bin the document STARTS in). Deterministic, no
   * driver loop — the distributed approximation of greedy sequence packing
   * (bins may straddle capacity by at most one document, the standard
   * streaming-packing relaxation). Token values must be non-null.
   *
   * Scale design — a TWO-PASS DISTRIBUTED PREFIX SUM, not a per-stratum
   * window: `Window.partitionBy(stratum)` puts each stratum on ONE task, so
   * with a handful of languages a 100 TB corpus would funnel through a
   * handful of reducers sorting and scanning serially. Instead:
   *
   *   1. ONE range shuffle orders rows by (stratum, key) across ALL
   *      shuffle partitions (a stratum spans many partitions, sorted within
   *      each). The result is persisted — load-bearing, not a cache hint:
   *      it pins the sampled range boundaries so both passes observe the
   *      SAME physical partitioning (a production pipeline materializes
   *      this stage to a table instead, as Pipeline does).
   *   2. A per-(partition, stratum) token-subtotal aggregate — at most
   *      `partitions x strata` rows — is collected, cumulative offsets are
   *      computed on the driver and broadcast.
   *   3. A NARROW per-partition scan resumes each partition's running sum
   *      from its broadcast offset and assigns bins.
   *
   * Identical output to the window formulation (verified by the q_pack
   * oracle), with per-task work bounded by partition size, never by
   * stratum size.
   */
  def packSequences(docs: DataFrame, stratumCol: String, tokenCol: String,
                    capacity: Int, keyCol: String = "doc_id",
                    numPartitions: Int = 0,
                    scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = docs.sparkSession
    val nPart =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val base = docs.select(col(keyCol), col(stratumCol), col(tokenCol))
    val parted = scope.persist(base
      .repartitionByRange(nPart, col(stratumCol), col(keyCol))
      .sortWithinPartitions(col(stratumCol), col(keyCol))
      .withColumn("_pid", spark_partition_id()))
    // pass 1: per-(partition, stratum) subtotals -> driver-side scan-left.
    // Range partitioning places lower (stratum, key) ranges in lower
    // partition ids, so a stratum's offset for partition p is the sum of
    // its subtotals in partitions < p.
    val subtotals = parted.groupBy(col("_pid"), col(stratumCol))
      .agg(sum(col(tokenCol)).cast("long").as("sub"))
      .collect()
      .map(r => (r.getInt(0), r.get(1)) -> r.getLong(2))
    val offsets: Map[(Int, Any), Long] = subtotals
      .groupBy(_._1._2)
      .flatMap { case (_, rows) =>
        val inOrder = rows.sortBy(_._1._1)
        inOrder.map(_._1).zip(inOrder.scanLeft(0L)(_ + _._2))
      }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(base.schema.fields ++ Seq(
      StructField("cum_tokens", LongType, nullable = false),
      StructField("bin", LongType, nullable = false)))
    val cap = capacity.toLong
    // pass 2: narrow scan — rows arrive sorted by (stratum, key); resume
    // the running sum from the broadcast offset at each stratum change
    parted.mapPartitions { rows =>
      val off = bc.value
      var cur: Any = null
      var started = false
      var run = 0L
      rows.map { r =>
        val pid = r.getInt(3)
        val st = r.get(1)
        if (!started || st != cur) {
          cur = st; started = true
          run = off.getOrElse((pid, st), 0L)
        }
        val tok = r.getAs[Number](2).longValue()
        run += tok
        Row(r.get(0), st, r.get(2), run, Math.floorDiv(run - tok, cap))
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Text scrubbing: redact emails and URLs (the baseline PII/noise pass a
   * training corpus runs before tokenization). Pure codegen'd
   * regexp_replace projection — narrow, no UDF; extend the pattern list
   * for phone numbers / ids as policy requires.
   */
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val UrlRe = "https?://[^\\s]+"

  def scrubText(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("scrubbed",
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"), UrlRe, "<URL>"))
      // counted on the INPUT, not the output: a pre-existing literal
      // '<EMAIL>' in the text is not a redaction, and an email inside a URL
      // is two pattern hits even though the URL replace swallows its token
      .withColumn("n_redactions",
        (regexp_count(col(textCol), lit(EmailRe)) +
          regexp_count(col(textCol), lit(UrlRe))).cast("long"))

  /**
   * Sliding-window document chunking — context-window preparation: split
   * each document's token stream into `window`-token chunks every `stride`
   * tokens (overlap = window − stride), the standard long-document
   * training shape. Pure narrow projection (split → sequence of starts →
   * explode → slice/join); output size is len/stride rows per doc and
   * nothing shuffles. Chunk boundaries are integer arithmetic and chunk
   * text is verbatim token joins — deterministic by construction.
   */
  def chunkDocuments(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        least(lit(window), size(col("t")) - col("start")).cast("long").as("n_tokens"),
        array_join(slice(col("t"), col("start") + 1, lit(window)), " ").as("chunk"))

  /**
   * Training-mix allocation: per-language (or any stratum) quotas filled
   * by a deterministic pseudo-random order — md5(doc_id) then doc_id, the
   * repo's zero-RNG sampling convention — so the mix is reproducible
   * across runs and engines. Quotas arrive as integers (callers derive
   * them from mixture weights; integer quotas avoid cross-engine
   * float×budget rounding). One stratum-keyed rank window
   * (WindowGroupLimit caps per-partition state at max quota).
   */
  def mixtureSample(stratumDocs: DataFrame, stratumCol: String,
                    quotas: Seq[(String, Int)]): DataFrame = {
    val spark = stratumDocs.sparkSession
    import spark.implicits._
    val q = quotas.toDF(stratumCol, "quota")
    stratumDocs.join(broadcast(q), Seq(stratumCol))
      .withColumn("rk", row_number().over(
        Window.partitionBy(stratumCol)
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .where(col("rk") <= col("quota"))
      .select(col("doc_id"), col(stratumCol), col("rk").cast("long").as("rk"))
  }
}
