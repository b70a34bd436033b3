package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation, over the `documents`
 * table. Every op is a pure codegen'd projection/aggregate (functions only)
 * with a formula shared verbatim with the DuckDB oracle.
 */
object TextAnalysis {

  private val stopwords = Seq("the", "a")

  /**
   * Token counting: whitespace tokens + a BPE-ish regex segmentation
   * (letter runs | digit runs | single non-alphanumeric-non-space).
   */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("bpe_tokens"))

  /**
   * Quality scoring: length stats, stopword ratio, letter ratio, and a
   * composite [0,1] quality score — the usual cheap pre-filter features of
   * a corpus-cleaning pipeline.
   */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val letters = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
    val chars = length(col("text")).cast("double")
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      round(chars / nTok, 6).as("avg_token_span"),
      round(stopHits / nTok, 6).as("stopword_ratio"),
      round(letters / chars, 6).as("letter_ratio"),
      // composite: long-enough docs with few stopwords and high letter mass
      round(least(nTok / lit(64.0), lit(1.0)) * (lit(1.0) - stopHits / nTok) * (letters / chars), 6)
        .as("quality"))
  }

  /**
   * Heuristic language ID from character statistics (n-gram-frequency
   * heuristic): vowel ratio and stopword presence vote between en/es/de/fr
   * buckets; `zh` when non-ASCII mass dominates. On the synthetic corpus
   * the interest is determinism + engine parity, not linguistic accuracy.
   */
  def langId(docs: DataFrame): DataFrame = {
    val chars = length(col("text")).cast("double")
    val vowels = length(regexp_replace(col("text"), "[^aeiou]", "")).cast("double")
    val nonAscii = length(regexp_replace(col("text"), "[ -~]", "")).cast("double")
    val theHits = (length(col("text")) - length(regexp_replace(col("text"), "the", ""))).cast("double") / 3.0
    docs.select(
      col("doc_id"),
      round(vowels / chars, 6).as("vowel_ratio"),
      round(nonAscii / chars, 6).as("non_ascii_ratio"),
      theHits.cast("long").as("the_hits"),
      when(nonAscii / chars > 0.3, "zh")
        .when(theHits >= 3, "en")
        .when(vowels / chars > 0.34, "es")
        .when(vowels / chars > 0.30, "fr")
        .otherwise("de").as("predicted_lang"))
  }

  /**
   * Fuzzy vocabulary matching — blocked edit-distance pairing over the
   * corpus vocabulary (typo/variant normalization, the token-level face of
   * entity-alias resolution). The self-join is BLOCKED on (first
   * character) with a ±1 length band before the Levenshtein verify: a
   * 10^8-token vocabulary never goes all-pairs, each block is
   * first-letter-sized, and the length predicate prunes before the O(n·m)
   * distance runs. The standard blocking tradeoff (a first-character edit
   * escapes the block) is the documented recall cost.
   *
   * Determinism: Levenshtein is integer DP with one answer; document
   * frequencies are integer counts; `tok_a < tok_b` orients each pair
   * exactly once.
   */
  def fuzzyVocabPairs(docs: DataFrame, maxDist: Int = 1): DataFrame = {
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    def side(n: String) = vocab.select(
      col("tok").as(s"tok_$n"), col("df").as(s"df_$n"),
      substring(col("tok"), 1, 1).as(s"blk_$n"), length(col("tok")).as(s"len_$n"))
    side("a").join(side("b"),
        col("blk_a") === col("blk_b") &&
          abs(col("len_a") - col("len_b")) <= 1 &&
          col("tok_a") < col("tok_b"))
      .where(levenshtein(col("tok_a"), col("tok_b")) <= maxDist)
      .select(col("tok_a"), col("tok_b"),
        levenshtein(col("tok_a"), col("tok_b")).cast("long").as("dist"),
        col("df_a"), col("df_b"))
  }

  /**
   * Document fingerprint: md5 over the normalized text (lowercase,
   * non-alphanumeric runs collapsed to single spaces, trimmed) — the
   * canonical near-identity key for fuzzy-exact dedup.
   */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("fingerprint"))

  /**
   * Lexical diversity per document — type-token ratio and Shannon entropy
   * of the token distribution: the diversity signal (alongside the
   * Gopher-style repetition scores in [[NgramQuality]]) that separates
   * natural prose from keyword-stuffed or template text.
   *
   * Shape at 100 TB: explode → ONE (doc_id, tok) hash aggregate (map-side
   * combined), then a doc-keyed rollup whose entropy fold operates on the
   * per-doc DISTINCT token list (bounded by vocabulary, not length).
   *
   * Determinism: the entropy sum is a cross-row FLOAT fold, so its order
   * is PINNED — `array_sort(collect_list(struct(tok, c)))` folds terms in
   * token order, matching the oracle's `list(... ORDER BY tok)` +
   * `list_reduce` exactly (the established q_perplexity pattern); each
   * term is computed from the same integer c/n pair on both engines.
   */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val n = col("n_tokens").cast("double")
    cnt.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        array_sort(collect_list(struct(col("tok"), col("c")))).as("terms"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / n, 6).as("ttr"),
        round(aggregate(col("terms"), lit(0.0),
          (acc, t) => acc - (t.getField("c").cast("double") / n) *
            log(t.getField("c").cast("double") / n)), 6).as("entropy"))
  }

  /**
   * Per-conversation rollup over the transcript table — the
   * conversation-level quality/shape report (turn counts, role balance,
   * tool usage, character mass) that drives transcript filtering before
   * KG extraction or training-mix assembly.
   *
   * Shape at 100 TB: ONE hash aggregate on conv_id, everything map-side
   * combinable; integers plus one rounded division. No windows — turn
   * ordering is irrelevant to the rollup, so hot conversations cost
   * nothing special.
   */
  def convStats(turns: DataFrame): DataFrame =
    turns
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("tool").isNotNull, 1L).otherwise(0L)).as("n_tool"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        max(length(col("text")).cast("long")).as("max_turn_chars"))
      .select(col("conv_id"), col("n_turns"), col("n_user"), col("n_tool"),
        col("total_chars"), col("max_turn_chars"),
        round(col("total_chars").cast("double") / col("n_turns").cast("double"), 6)
          .as("avg_turn_chars"))

  /**
   * Inverted index construction — term → sorted posting list of doc_ids,
   * the retrieval-side primitive (BM25 serving, contamination lookups,
   * dedup-cluster audits all read one). Emitted as (term, df,
   * comma-joined postings capped at `maxPostings`).
   *
   * Shape at 100 TB: one distinct on (doc_id, term) — map-side combined —
   * then ONE term-keyed aggregate. The cap bounds the stop-word row (an
   * uncapped "the" posting would be a single row spanning the corpus);
   * `df` stays exact beyond the cap, which is what ranking needs — full
   * stop-word postings are useless to retrieval and are the rows every
   * production index drops or tiers out anyway. Term-key skew is the same
   * Zipf story as q_perplexity: the aggregate is a partial-agg collapse,
   * not a join, so the hot key costs one reducer one `maxPostings` list.
   *
   * Determinism: postings sort by doc_id before the cap; counts are
   * integers; the string join renders integers identically everywhere.
   */
  def invertedIndex(docs: DataFrame, minDf: Long = 2, maxPostings: Int = 1000)
      : DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        slice(sort_array(collect_list(col("doc_id"))), 1, maxPostings).as("p"))
      .where(col("df") >= minDf)
      .select(col("term"), col("df"), concat_ws(",", col("p")).as("postings"))

  /**
   * Per-source curation report — the domain-level dashboard row a web-scale
   * corpus curator reads before setting crawl/filter policy: per `source`,
   * document counts, distinct-fingerprint counts (the same normalized-md5
   * fingerprint `fingerprints` emits), the implied within-source duplicate
   * count/rate, and character mass.
   *
   * Shape at 100 TB: one hash aggregate on (source, fingerprint) — the raw
   * corpus collapses map-side to distinct fingerprints per source — then a
   * source-keyed rollup of the (tiny) per-fingerprint counts. Never a
   * distinct over raw text; the md5 is 16 bytes per row. Per-source skew
   * (one giant crawl domain) only concentrates the SECOND, already
   * collapsed aggregate.
   *
   * Determinism: counts and char sums are integers; rates are
   * exactly-rounded divisions of integer-valued doubles.
   */
  def sourceReport(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("source"), col("n_chars"),
      md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("fingerprint"))
    fp.groupBy("source", "fingerprint")
      .agg(count(lit(1)).as("n_fp"), sum(col("n_chars")).as("chars_fp"))
      .groupBy("source")
      .agg(
        sum(col("n_fp")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        (sum(col("n_fp")) - count(lit(1))).as("n_dups"),
        sum(col("chars_fp")).as("total_chars"))
      .select(col("source"), col("n_docs"), col("n_distinct"), col("n_dups"),
        col("total_chars"),
        round(col("n_dups").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"),
        round(col("total_chars").cast("double") / col("n_docs").cast("double"), 6)
          .as("avg_chars"))
  }

  /**
   * Boilerplate removal, CCNet/C4-style: segment every document into
   * fixed-width non-overlapping token windows (the "line" proxy for a
   * corpus without newline structure), count how many DISTINCT documents
   * each exact segment occurs in, and drop segments shared by `minDocs`+
   * documents — nav bars, license footers, and template text repeat
   * verbatim across pages; real content doesn't. Returns per document:
   * segment counts, removed-segment count, kept token mass, and the md5 of
   * the retained text (segments re-joined in document order) so a
   * downstream verifier can check actual content, not just counts.
   *
   * Shape at 100 TB: one explode + ONE hash aggregate keyed on segment
   * text (map-side combine collapses repeats per partition; the md5-sized
   * key could replace raw text in the exchange for very long windows),
   * then a doc-keyed rollup. The hot key is the boilerplate itself —
   * exactly the key hash aggregation absorbs map-side. Never all-pairs.
   *
   * Determinism: exact string segments (no hashing in the dedup decision),
   * integer counts, and the retained text concatenates kept segments
   * ordered by segment index.
   */
  def boilerplate(docs: DataFrame, window: Int = 8, minDocs: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    val nseg = ceil(size(toks).cast("double") / window).cast("int")
    val segs = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nseg - 1),
        i => concat_ws(" ", slice(toks, i * window + 1, lit(window)))))
        .as(Seq("seg_idx", "seg")))
    val freq = segs.groupBy("seg").agg(countDistinct(col("doc_id")).as("n_docs"))
    val kept = filter(
      array_sort(collect_list(struct(col("seg_idx"), col("seg"), col("n_docs")))),
      x => x.getField("n_docs") < minDocs)
    segs.join(freq, Seq("seg"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("n_docs") >= minDocs, lit(1L)).otherwise(lit(0L))).as("n_removed"),
        sum(when(col("n_docs") < minDocs, size(split(col("seg"), " ")).cast("long"))
          .otherwise(lit(0L))).as("kept_tokens"),
        md5(array_join(transform(kept, x => x.getField("seg")), " ")).as("retained_md5"))
  }
}
