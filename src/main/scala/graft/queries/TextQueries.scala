package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface layered on top of the reference's
  * string primitives (SURVEY.md §2 O2/O11: split/concat/format at
  * pageRank_v2.java:117,207-213, generalized to corpus analytics).
  *
  * Every query is a narrow, whole-stage-codegen'd per-row pipeline: no
  * shuffle except final aggregations, so at 100 TB these scale linearly
  * with input splits and the parquet scan only reads `text` plus the
  * few metadata columns actually referenced (column pruning).
  *
  * Numeric discipline for oracle parity: counts are integer; every
  * ratio is a SINGLE double division of two exact integers (one IEEE op
  * is bit-deterministic across engines); the fingerprint is an int64
  * polynomial rolling hash mod 2³¹−1 folded left-to-right, which
  * DuckDB's `list_reduce` reproduces step-for-step.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Codegen'd n-gram position explode over a (doc_id, text) relation:
    * one row per gram start, as (doc_id, w, i) with i ∈ [1,
    * size(w)−n+1]; consumers project `element_at(w, i+k)`.
    *
    * The POINT is what it avoids: building the gram array with a
    * higher-order `transform(sequence(…), i -> …)` and exploding
    * that. Higher-order functions are `CodegenFallback` expressions —
    * one lambda interpretation per ELEMENT, and the fallback knocks
    * the whole stage out of whole-stage codegen. The r10 sf10 probe
    * measured the difference on the same 27.5M-bigram corpus: 14.5s
    * for the transform-explode vs 3.3s for this shape (explode a
    * `sequence()` of ints, then `element_at` projections AFTER the
    * generator — every expression codegen'd, the generator included).
    * Same rows, same order, ~4.4× throughput; d03's signature pass
    * and t06's gram pass compound it further.
    *
    * The `when` guard keeps the generator input total under
    * InferFiltersFromGenerate (the rule clones the input into an
    * inferred size>0 predicate evaluated BESIDE the row filter — see
    * the DedupQueries.shingles note); without it, a short doc feeds
    * `sequence(1, 0)`, which helpfully counts DOWN, yielding i=0 and
    * an ANSI element_at(w, 0) error.
    */
  private[graft] def gramPositions(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), col("w"),
        explode(when(size(col("w")) >= n,
          sequence(lit(1), size(col("w")) - (n - 1)))
          .otherwise(expr("CAST(array() AS array<int>)"))).as("i"))

  /** Occurrences of literal `pat` in `text`: (len − len(remove)) / |pat|. */
  private def occ(pat: String): Column =
    ((length(col("text")) -
      length(expr(s"replace(text, '$pat', '')"))) / lit(pat.length))
      .cast(LongType)

  // Whitespace token count + char stats. size(split) is exact because
  // the corpus is single-space separated (TESTDATA.md synthetic text).
  def t01_tokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        length(col("text")).cast(LongType).as("len_chars"),
        (length(col("text")).cast(DoubleType) /
          size(split(col("text"), " ")).cast(DoubleType)).as("chars_per_token"))

  // BPE-ish sub-word tokenization: a regex token inventory (letter runs
  // vs digit runs), the standard pre-tokenizer shape. regexp_extract_all
  // is codegen'd; the pattern is shared verbatim with the oracle.
  def t02_bpe_tokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        expr("CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS BIGINT)")
          .as("n_subtokens"),
        expr("CAST(size(regexp_extract_all(text, '[0-9]+', 0)) AS BIGINT)")
          .as("n_digit_runs"))

  // Language-ID by n-gram profile scoring: per-language trigram
  // profiles, score = Σ occurrences, argmax with a fixed tiebreak
  // order. (On this synthetic corpus the `lang` label is independent of
  // the text, so the JUDGE of quality is determinism, not accuracy —
  // the operator shape is the real n-gram-profile classifier.)
  def t03_langid(s: SparkSession, dir: String): DataFrame = {
    val sEn = (occ("the") + occ("row") + occ("fast")).as("s_en")
    val sDe = (occ("win") + occ("batch") + occ("group")).as("s_de")
    val sFr = (occ("que") + occ("col") + occ("merge")).as("s_fr")
    val sEs = (occ("dat") + occ("part") + occ("val")).as("s_es")
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), sEn, sDe, sFr, sEs)
      .select(col("doc_id"), col("lang"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
          col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es").as("pred_lang"))
  }

  // Quality scoring: length, stopword ratio, digit ratio, mean token
  // length — the standard pre-training heuristics (C4/Gopher-style),
  // each a pruned-scan narrow map.
  def t04_quality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        expr("CAST(size(filter(split(text, ' '), w -> w = 'the' OR w = 'a')) AS BIGINT)")
          .as("n_stop"),
        expr("CAST(size(regexp_extract_all(text, '[0-9]', 0)) AS BIGINT)")
          .as("n_digit"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_stop").cast(DoubleType) / col("n_tokens").cast(DoubleType))
          .as("stop_ratio"),
        (col("n_digit").cast(DoubleType) / length(col("text")).cast(DoubleType))
          .as("digit_ratio"),
        ((length(col("text")) - col("n_tokens") + lit(1)).cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("mean_tok_len"))

  /** Shared polynomial rolling hash h ← (31·h + ascii(c)) mod 2³¹−1,
    * folded over the characters of `c` left to right. Sequential per-row
    * fold — order is defined, so Spark and DuckDB agree bit-for-bit.
    * Also the primitive under the dedup family's shingle hashing.
    */
  def polyHash(c: String): Column =
    // Codegen'd custom expression ([[graft.functions.PolyHash]]): same
    // fold as aggregate(transform(split(c, ''), ascii)) but one static
    // call per row instead of a materialized per-character array.
    graft.functions.GraftExpressions.polyHash(col(c))

  /** DuckDB twin of [[polyHash]] (list_reduce needs the seed prepended). */
  def polyHashSql(c: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($c, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % 2147483647)"

  // Document fingerprinting: whole-text rolling hash (content id for
  // exact dedup at scale: 8-byte key instead of the full text through
  // the shuffle).
  def t05_fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        polyHash("text").as("fp"),
        md5(col("text")).as("md5"))

  /** Repetition-gate thresholds (see [[t06_repetition]]): flag when the
    * most frequent bigram exceeds [[TopBigramMax]] of all bigram
    * occurrences, or more than [[DupTrigramMax]] of trigram occurrences
    * are repeats — the Gopher-style "repetitive document" signals.
    */
  private val TopBigramMax = 0.08
  private val DupTrigramMax = 0.05

  // Repetition signals (Gopher-style quality filtering): per document,
  // the top-bigram occurrence fraction and the duplicate-trigram
  // fraction, plus the gate flag. Scale shape: ONE scan of `text`
  // explodes a tagged union of bigrams and trigrams, then two hash
  // aggregations — (doc_id, n, gram) counts, then per-doc stats. Both
  // shuffles partial-aggregate map-side, and because a document's
  // grams are co-located in its input split, the second shuffle moves
  // ~one row per (doc, n) — no join, no second scan of the corpus.
  def t06_repetition(s: SparkSession, dir: String): DataFrame = {
    // Chained codegen'd generators ([[gramPositions]]): explode gram
    // starts, then explode a 2-element tagged array per start — the
    // bigram always, the trigram when it fits (null otherwise,
    // filtered). Same (doc, n, g) rows as the old single
    // transform-built union, with every expression codegen'd.
    // positions 1..size−1 (bigram starts; the ≥3-token doc gate is
    // t06's own, applied on top of the generic 2-gram explode)
    val pos = gramPositions(t(s, dir, "documents"), 2)
      .filter(size(col("w")) >= 3)
    def tok(k: Int) = element_at(col("w"), col("i") + k)
    val grams = pos
      .select(col("doc_id"), explode(array(
        struct(lit(2).as("n"), concat_ws(" ", tok(0), tok(1)).as("g")),
        struct(lit(3).as("n"),
          when(col("i") <= size(col("w")) - 2,
            concat_ws(" ", tok(0), tok(1), tok(2))).as("g")))).as("t"))
      .filter(col("t.g").isNotNull)
      .select(col("doc_id"), col("t.n").as("n"), col("t.g").as("g"))
    val stats = grams
      .groupBy(col("doc_id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("n") === 2, col("c"))).as("maxb"),
        sum(when(col("n") === 2, col("c"))).as("totb"),
        count(when(col("n") === 3, lit(1))).as("dist3"),
        sum(when(col("n") === 3, col("c"))).as("tot3"))
    // Each fraction is ONE double division of two exact integers, so
    // the gate comparisons see bit-identical values in both engines.
    stats.select(col("doc_id"),
      (col("maxb").cast(DoubleType) / col("totb").cast(DoubleType))
        .as("top_bigram_frac"),
      ((col("tot3") - col("dist3")).cast(DoubleType) / col("tot3").cast(DoubleType))
        .as("dup_trigram_frac"))
      .withColumn("is_repetitive",
        col("top_bigram_frac") > TopBigramMax ||
          col("dup_trigram_frac") > DupTrigramMax)
  }

  // Token-rarity scoring — the frequency-dictionary join under LM
  // quality heuristics (rare-token density without a model): a global
  // token→count dictionary (one low-cardinality agg), then each doc
  // joins its tokens against the BROADCAST dictionary and aggregates
  // total/mean corpus frequency. At 100 TB the dictionary is the
  // vocabulary — megabytes — so the doc side never shuffles for the
  // join; the per-doc agg partial-aggregates map-side (tokens of a doc
  // are co-located). All-integer until the single mean division.
  def t07_rarity(s: SparkSession, dir: String): DataFrame = {
    // The token relation is re-DERIVED per consumer, not cached: both
    // consumers collapse it map-side (the dictionary agg to ~|V| rows
    // per partition, the probe agg to ~one row per doc), so each pays
    // a narrow codegen'd explode — while persisting the raw explode
    // materializes a |tokens|-sized cache through MEMORY_AND_DISK,
    // the exact pathology the r10 sf10 probe measured at 742s on
    // d03's shingle cache (BENCH_NOTES "the cached shingle explode";
    // this cache was its t-family twin: removing it cut t07's sf10
    // cold 20.5s → ~4s).
    def toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val dict = broadcast(toks.groupBy(col("w"))
      .agg(count(lit(1)).as("freq")))
    toks.join(dict, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("freq")).as("total_freq"),
        min(col("freq")).as("rarest_freq"))
      .withColumn("mean_freq",
        col("total_freq").cast(DoubleType) / col("n_tokens").cast(DoubleType))
  }

  /** PII surface patterns for [[t08_redact]]. Deliberately
    * backslash-free ([.] instead of \.) so one literal survives the
    * Scala → Spark-SQL-string → regex and Scala → DuckDB paths
    * unchanged, and RE2 (DuckDB) and java.util.regex (Spark) agree on
    * every construct used (character classes + bounded repetition
    * only — no lookaround, no escapes).
    */
  private[queries] val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  private[queries] val PhonePat = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  private[queries] val Ipv4Pat =
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  // PII redaction — the standard curation scrub before text enters a
  // training corpus: emails, phone numbers, and IPv4 addresses are
  // rewritten to typed placeholders, with per-doc match counts so the
  // scrub's activity is observable (the no-silent-rewrites principle;
  // same stance as d02_posting_audit). Counts are measured on the
  // ORIGINAL text, independent of replacement order; the rewrite
  // applies email → phone → ip so an address inside an email never
  // double-redacts. Map-only, codegen'd, pruned scan — the t01–t05
  // scale shape. On this synthetic corpus every count is provably 0
  // and clean_text == text, which the oracle hash-checks end to end
  // (precision: no false positives on clean text); recall on planted
  // PII is pinned in the fixture spec.
  def t08_redact(s: SparkSession, dir: String): DataFrame =
    redact(t(s, dir, "documents"))

  /** [[t08_redact]] on any (doc_id, text) relation — the fixture spec
    * feeds planted PII through the same operator.
    */
  private[graft] def redact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(s"CAST(size(regexp_extract_all(text, '$EmailPat', 0)) AS BIGINT)")
        .as("n_emails"),
      expr(s"CAST(size(regexp_extract_all(text, '$PhonePat', 0)) AS BIGINT)")
        .as("n_phones"),
      expr(s"CAST(size(regexp_extract_all(text, '$Ipv4Pat', 0)) AS BIGINT)")
        .as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailPat, "<EMAIL>"),
          PhonePat, "<PHONE>"),
        Ipv4Pat, "<IP>").as("clean_text"))

  /** Fixed-point quantum for [[t09_lm_score]]'s per-bigram probability
    * terms: each smoothed probability is quantized to int64 (floor of
    * prob × 2³⁰) so the per-doc sum is order-free and engine-exact —
    * the p05/PQ determinism design. 2³⁰ (not 2⁴⁰) bounds the per-doc
    * sum at n_bigrams × 2³⁰, safe in int64 up to ~10⁸-token documents.
    */
  private val LmQuant = 1L << 30

  // Bigram language-model scoring — the classic statistical-LM quality
  // filter for training corpora (a perplexity proxy without a neural
  // model): train add-one-smoothed bigram probabilities on the corpus
  // itself in one pass, then score each document by its mean bigram
  // probability P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V).
  //
  // Scale shape — t07's dictionary pattern, not a corpus-sized
  // shuffle: the bigram dictionary is ONE aggregation whose map-side
  // combine collapses each partition to its distinct bigrams, so the
  // exchange moves ~|partitions|·|distinct bigrams| rows, never
  // |tokens|; its w1 marginals and the smoothed-probability table
  // derive from the dictionary (k rows); the scoring pass re-derives
  // the narrow codegen'd explode and joins the BROADCAST term table
  // (at 100 TB the dictionary is the bigram vocabulary — Zipf-bounded,
  // tens of MB; for an open-domain corpus, hash grams to int64 first
  // like t05's fingerprint to shrink it ~10×), then partial-aggregates
  // to ~one row per doc before the final |docs|-sized exchange. The
  // corpus is scanned twice (both passes narrow, whole-stage-codegen)
  // and NOTHING token-sized is cached or shuffled — the first cut
  // pre-aggregated (doc, w1, w2) and shuffled it twice, which the
  // sf10 probe measured at 141s; this shape is 13s.
  //
  // Determinism: counts are exact int64; each probability term is two
  // IEEE ops (one division, one multiply) then floored to int64
  // ([[LmQuant]]), so the per-doc sum is order-free; the final mean is
  // a fixed two-division sequence on exact integers.
  def t09_lm_score(s: SparkSession, dir: String): DataFrame = {
    // Narrow codegen'd bigram explode ([[gramPositions]]) — re-derived
    // per pass, never materialized (the d03/t07 |tokens|-cache lesson).
    def grams = gramPositions(t(s, dir, "documents"), 2)
      .select(col("doc_id"),
        element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"))
    val big = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    // w1's history count is the sum of its bigram counts — derived
    // from the dictionary, not another corpus pass.
    val uni = big.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = broadcast(t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(count_distinct(col("w")).as("vocab")))
    val term = broadcast(big.join(uni, Seq("w1")).crossJoin(vocab)
      .select(col("w1"), col("w2"),
        floor((col("c2") + lit(1L)).cast(DoubleType) /
          (col("c1") + col("vocab")).cast(DoubleType) * lit(LmQuant))
          .cast(LongType).as("term_fp")))
    grams.join(term, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("term_fp")).as("sum_prob_fp"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_prob_fp"),
        (col("sum_prob_fp").cast(DoubleType) /
          col("n_bigrams").cast(DoubleType) /
          lit(LmQuant).cast(DoubleType)).as("avg_prob"))
  }

  /** IDF fixed-point quantum for [[t10_tfidf]]: the inverse document
    * frequency n_docs/df is kept as ONE int64 floor division
    * `(n_docs · 2²⁰) div df` — exact in both engines (no log, no
    * float), ordering-equivalent to the textbook idf for ranking
    * within a document. 2²⁰ bounds tf·idf_fp under int64 for any
    * realistic corpus (tf ≤ 10⁸ tokens · 2²⁰·n/df ≤ 2⁴³ at n/df ≤
    * 10⁷).
    */
  private val IdfQuant = 1L << 20

  /** Keywords kept per document by [[t10_tfidf]]. */
  private val TfidfK = 3

  // TF-IDF keyword extraction — per document, the top-[[TfidfK]] terms
  // by tf·idf (the classic relevance/keyword signal a curation
  // pipeline attaches to every doc before topic bucketing).
  //
  // Scale shape — t07's dictionary pattern end to end: the (doc, term)
  // tf aggregation partial-aggregates map-side (a doc's tokens are
  // co-located in its split), the document-frequency dictionary
  // derives from tf's OUTPUT (never a second corpus pass) and is
  // vocabulary-sized, so it BROADCASTS back onto tf; n_docs is a
  // 1-row broadcast scalar. Nothing token-sized is cached; the score
  // is exact int64 ([[IdfQuant]]), so top-k membership is
  // engine-deterministic with the (score desc, term asc) total order.
  //
  // Ranking plan — operator selection is REGIME-dependent, measured
  // at sf10 (SCALE.md "k-per-group crossover"): with |docs| groups
  // and only ~|vocab-per-doc|/|partitions| ≈ 1–2 rows per group per
  // partition, the custom GroupedTopK's partial heap pass prunes
  // nothing and pays a groups-sized hash map per partition (32.7s vs
  // 23.0s at sf10) — so t10 takes the stock WindowGroupLimit plan,
  // while s07/q39 (few groups × millions of rows each, the inverse
  // regime) keep the heap operator that wins there 1.6–2.9×.
  def t10_tfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = broadcast(tf.groupBy(col("w")).agg(count(lit(1)).as("df")))
    val nd = broadcast(t(s, dir, "documents").agg(count(lit(1)).as("nd")))
    val scored = tf.join(dfreq, Seq("w")).crossJoin(nd)
      .select(col("doc_id"), col("w"), col("tf"), col("df"),
        (col("tf") * expr(s"(nd * $IdfQuant) DIV df")).as("score_fp"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("w").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TfidfK).drop("rn")
  }

  /** Collocation-mining knobs ([[t11_collocations]]): margin floors
    * keep the lift estimate stable (rare-word pairs have huge noisy
    * lift — the standard PMI pathology), k bounds the report.
    */
  private val CollocMin = 50L
  private val CollocK = 20

  // Collocation mining — the corpus-phrase discovery step (PMI-style
  // lift): for bigram (w1, w2), lift = P(w1,w2) / (P(w1)·P(w2)) =
  // c12·N / (c1·c2) > 1 means the pair co-occurs more than its parts
  // predict; the global top-[[CollocK]] by lift is the phrase
  // dictionary a tokenizer or n-gram LM bootstraps from.
  //
  // Scale shape — t09's dictionary pattern: ONE bigram-dictionary
  // aggregation (map-side combined, the exchange moves distinct
  // bigrams, never tokens); both marginals and the total derive from
  // the dictionary's OUTPUT (no second corpus pass — c1/c2 are
  // bigram-start/end marginals, the standard bigram-model
  // convention); the final report is a TakeOrderedAndProject over the
  // vocab²-bounded scored relation — top-k without a global sort.
  // Lift is THREE IEEE ops in fixed order (double(c12)·N / c1 / c2)
  // on exact int64 inputs, so ordering and values are bit-identical
  // in both engines; ties break on (w1, w2).
  def t11_collocations(s: SparkSession, dir: String): DataFrame = {
    def grams = gramPositions(t(s, dir, "documents"), 2)
      .select(element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"))
    val big = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val uni1 = broadcast(big.groupBy(col("w1")).agg(sum(col("c12")).as("c1")))
    val uni2 = broadcast(big.groupBy(col("w2")).agg(sum(col("c12")).as("c2")))
    val tot = broadcast(big.agg(sum(col("c12")).as("n")))
    big.join(uni1, Seq("w1")).join(uni2, Seq("w2")).crossJoin(tot)
      .filter(col("c1") >= CollocMin && col("c2") >= CollocMin)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        (col("c12").cast(DoubleType) * col("n") / col("c1") / col("c2"))
          .as("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(CollocK)
  }

  /** Global-count floor for [[t12_heavy_hitters]] — shared verbatim
    * with the oracle's HAVING clause.
    */
  private val HhMin = 100L

  // Heavy hitters (frequent items) with a pigeonhole candidate
  // prefilter — the tier the t-family's "one map-side-combined
  // aggregation" posture needs when the VOCABULARY itself is the
  // problem: a plain groupBy(token) ships every distinct token of
  // every partition through the exchange, and at 100 TB of text the
  // n-gram long tail (trillions of distinct keys) is orders of
  // magnitude bigger than the answer. Two passes, both bounded:
  //
  //  1. Candidate generation: per input split, count tokens exactly in
  //     a local hash map (bounded by the split's distinct count, which
  //     maxPartitionBytes bounds by SIZE — never by corpus vocabulary)
  //     and emit only tokens whose LOCAL count ≥ ⌈T/P⌉. Pigeonhole
  //     guarantees zero false negatives: a token with global count ≥ T
  //     over P partitions must reach T/P in at least one of them. The
  //     same-RDD construction (P read off the very RDD being mapped)
  //     makes the bound airtight rather than assumed. ≤ P·⌈corpus/T⌉
  //     candidates survive — workload-sized, not vocabulary-sized.
  //  2. Exact recount: one more corpus scan, semi-joined against the
  //     BROADCAST candidate set before the exchange, so the shuffle
  //     moves candidate tokens only; the final HAVING ≥ T makes the
  //     output exact and partitioning-independent (the candidate set
  //     varies with the split layout; the answer provably cannot).
  //
  // The kernel is a deliberate mapPartitions (like q25's MR shape and
  // the m-family decode kernels): the local-count-then-threshold step
  // is exactly what partial aggregation canNOT express — a filter on
  // the PARTIAL value is illegal in general, and Catalyst rightly
  // refuses to push HAVING below the exchange.
  def t12_heavy_hitters(s: SparkSession, dir: String): DataFrame =
    heavyHitters(t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w")), HhMin)

  /** Broadcast ceiling for the candidate prefilter — candidates above
    * this fall back to the plain groupBy (a vocabulary-sized broadcast
    * is exactly the failure the two-pass design exists to avoid, and
    * it would fail on the DRIVER, the worst place).
    */
  private val HhCandCap = 2000000L

  /** [[t12_heavy_hitters]]' kernel, factored on (tokens, threshold) so
    * the spec can drive the degenerate regimes. Two guards keep the
    * scale posture honest rather than silently inverted (r13 advice):
    *
    *  - `lo ≤ 1` (i.e. P ≥ T): the pigeonhole floor ⌈T/P⌉ admits EVERY
    *    distinct token — the prefilter is vacuous and "candidates"
    *    means the whole vocabulary. Fall back to the plain
    *    one-exchange groupBy, which ships strictly less than the
    *    vacuous plan (no second scan, no vocabulary broadcast).
    *  - candidate count > [[HhCandCap]]: the pigeonhole bound
    *    P·⌈corpus/T⌉ is workload-sized only while T ≫ P; if the data
    *    still produces a broadcast-hostile candidate set, take the
    *    plain groupBy instead of OOMing the driver.
    *
    * Both fallbacks return the identical exact answer — the final
    * `HAVING n ≥ T` is what makes the output partitioning- and
    * path-independent; the prefilter only ever changes what the
    * exchange carries.
    */
  private[graft] def heavyHitters(toks: DataFrame, hhMin: Long): DataFrame = {
    val s = toks.sparkSession
    import s.implicits._
    def plain = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= hhMin)
    val rdd = toks.as[String].rdd
    val p = rdd.getNumPartitions
    val lo = (hhMin + p - 1) / p
    if (lo <= 1L) plain
    else {
      // The candidate set lands on the DRIVER once, via take(cap+1):
      // the pigeonhole bound keeps it workload-sized, take() bounds
      // driver memory at cap+1 rows even when the data breaks that
      // bound (one extra row is all the cap check needs), and —
      // unlike the previous persist()+count() — nothing stays pinned
      // in executor memory after the call (the r14 advice leak: three
      // bench samples per scale each left a cached candidate relation
      // behind until the family-boundary eviction). The recount pass
      // then broadcasts the localized set, same plan shape as before.
      val cand = s.createDataset(rdd.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach(w => m.update(w, m.getOrElse(w, 0L) + 1L))
        m.iterator.collect { case (w, c) if c >= lo => w }
      }).distinct().take(HhCandCap.toInt + 1)
      if (cand.length > HhCandCap) plain
      else toks
        .join(broadcast(s.createDataset(cand.toSeq).toDF("w")), Seq("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= hhMin)
    }
  }

  /** t03's score + argmax CTEs, un-prefixed (`sc`, then the final
    * select) — shared by the t03 oracle and the curation pipeline's
    * ([[PipelineQueries]]) language gate.
    */
  private[queries] val LangScoreCte: String =
    """sc AS (SELECT doc_id, lang,
      |  (LENGTH(text)-LENGTH(REPLACE(text,'the','')))/3
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'row','')))/3
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'fast','')))/4 AS s_en,
      |  (LENGTH(text)-LENGTH(REPLACE(text,'win','')))/3
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'batch','')))/5
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'group','')))/5 AS s_de,
      |  (LENGTH(text)-LENGTH(REPLACE(text,'que','')))/3
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'col','')))/3
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'merge','')))/5 AS s_fr,
      |  (LENGTH(text)-LENGTH(REPLACE(text,'dat','')))/3
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'part','')))/4
      |    + (LENGTH(text)-LENGTH(REPLACE(text,'val','')))/3 AS s_es
      |  FROM documents)""".stripMargin

  private[queries] val LangPredSelect: String =
    """SELECT doc_id, lang,
      |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
      |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
      |       WHEN s_fr >= s_es THEN 'fr'
      |       ELSE 'es' END AS pred_lang
      |FROM sc""".stripMargin

  /** t04's base-count CTE (`b`) + ratio select, shared like
    * [[LangScoreCte]].
    */
  private[queries] val QualityBaseCte: String =
    """b AS (SELECT doc_id, text,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
      |      w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop,
      |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]')) AS BIGINT) AS n_digit
      |  FROM documents)""".stripMargin

  private[queries] val QualitySelect: String =
    """SELECT doc_id, n_tokens,
      |  CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |  CAST(n_digit AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) AS digit_ratio,
      |  CAST(LENGTH(text) - n_tokens + 1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |    AS mean_tok_len
      |FROM b""".stripMargin

  val oracle: Map[String, String] = Map(
    "t07_rarity" ->
      """WITH toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
        |  FROM documents),
        |dict AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM toks GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(freq) AS BIGINT) AS total_freq,
        |  MIN(freq) AS rarest_freq,
        |  CAST(SUM(freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_freq
        |FROM toks JOIN dict USING (w)
        |GROUP BY doc_id""".stripMargin,
    "t01_tokens" ->
      """SELECT doc_id,
        |  CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(LENGTH(text) AS BIGINT) AS len_chars,
        |  CAST(LENGTH(text) AS DOUBLE) / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)
        |    AS chars_per_token
        |FROM documents""".stripMargin,
    "t02_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_subtokens,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS BIGINT) AS n_digit_runs
        |FROM documents""".stripMargin,
    "t03_langid" -> s"WITH $LangScoreCte\n$LangPredSelect",
    "t12_heavy_hitters" ->
      s"""WITH toks AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w
         |  FROM documents)
         |SELECT w, CAST(COUNT(*) AS BIGINT) AS n
         |FROM toks GROUP BY w HAVING COUNT(*) >= $HhMin""".stripMargin,
    "t08_redact" ->
      s"""SELECT doc_id,
         |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '$EmailPat')) AS BIGINT) AS n_emails,
         |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '$PhonePat')) AS BIGINT) AS n_phones,
         |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '$Ipv4Pat')) AS BIGINT) AS n_ips,
         |  REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
         |    '$EmailPat', '<EMAIL>', 'g'),
         |    '$PhonePat', '<PHONE>', 'g'),
         |    '$Ipv4Pat', '<IP>', 'g') AS clean_text
         |FROM documents""".stripMargin,
    "t04_quality" -> s"WITH $QualityBaseCte\n$QualitySelect",
    // Same training pass re-expressed relationally; the shape needn't
    // mirror the single-scan Spark plan, only the values.
    "t09_lm_score" ->
      s"""WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w
         |  FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
         |dg AS (SELECT doc_id, g[1] AS w1, g[2] AS w2,
         |    CAST(COUNT(*) AS BIGINT) AS occ
         |  FROM (SELECT doc_id,
         |      UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)), i -> [w[i], w[i+1]])) AS g
         |    FROM w)
         |  GROUP BY 1, 2, 3),
         |big AS (SELECT w1, w2, CAST(SUM(occ) AS BIGINT) AS c2
         |  FROM dg GROUP BY 1, 2),
         |uni AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1
         |  FROM big GROUP BY 1),
         |v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab
         |  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)),
         |term AS (SELECT w1, w2,
         |    CAST(FLOOR(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + vocab AS DOUBLE)
         |      * $LmQuant) AS BIGINT) AS term_fp
         |  FROM big JOIN uni USING (w1), v)
         |SELECT doc_id, CAST(SUM(occ) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(occ * term_fp) AS BIGINT) AS sum_prob_fp,
         |  CAST(SUM(occ * term_fp) AS DOUBLE) / CAST(SUM(occ) AS DOUBLE)
         |    / CAST($LmQuant AS DOUBLE) AS avg_prob
         |FROM dg JOIN term USING (w1, w2)
         |GROUP BY 1""".stripMargin,
    "t11_collocations" ->
      s"""WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w
         |  FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
         |dg AS (SELECT g[1] AS w1, g[2] AS w2
         |  FROM (SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)),
         |      i -> [w[i], w[i+1]])) AS g
         |    FROM w)),
         |big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM dg GROUP BY 1, 2),
         |u1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY 1),
         |u2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM big GROUP BY 1),
         |n AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM big)
         |SELECT w1, w2, c12, c1, c2,
         |  CAST(c12 AS DOUBLE) * n / c1 / c2 AS lift
         |FROM big JOIN u1 USING (w1) JOIN u2 USING (w2), n
         |WHERE c1 >= $CollocMin AND c2 >= $CollocMin
         |ORDER BY lift DESC, w1, w2 LIMIT $CollocK""".stripMargin,
    // Same scoring re-expressed relationally; `//` is DuckDB's int64
    // floor division = Spark's DIV on the same exact integers.
    "t10_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
         |  FROM documents),
         |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
         |scored AS (SELECT doc_id, w, tf, df,
         |    tf * ((nd * $IdfQuant) // df) AS score_fp
         |  FROM tf JOIN dfreq USING (w), nd)
         |SELECT doc_id, w, tf, df, score_fp FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score_fp DESC, w ASC) AS rn
         |  FROM scored) WHERE rn <= $TfidfK""".stripMargin,
    "t05_fingerprint" ->
      s"""SELECT doc_id,
         |  ${polyHashSql("text")} AS fp,
         |  MD5(text) AS md5
         |FROM documents""".stripMargin,
    // The oracle computes the two signals in independent CTE chains
    // (bigram counts; per-doc trigram distinct) — same values, shape
    // needn't mirror the single-scan Spark plan.
    "t06_repetition" ->
      s"""WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w
         |  FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 3),
         |bg AS (SELECT doc_id,
         |  UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)), i -> w[i] || ' ' || w[i+1])) AS g
         |  FROM w),
         |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         |bs AS (SELECT doc_id,
         |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
         |  FROM bc GROUP BY 1),
         |tri AS (SELECT doc_id, CAST(LEN(w) - 2 AS BIGINT) AS tot,
         |  CAST(LEN(LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS BIGINT) AS dist
         |  FROM w)
         |SELECT bs.doc_id, top_bigram_frac,
         |  CAST(tot - dist AS DOUBLE) / CAST(tot AS DOUBLE) AS dup_trigram_frac,
         |  top_bigram_frac > $TopBigramMax
         |    OR CAST(tot - dist AS DOUBLE) / CAST(tot AS DOUBLE) > $DupTrigramMax
         |    AS is_repetitive
         |FROM bs JOIN tri ON bs.doc_id = tri.doc_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t07_rarity" -> (t07_rarity _),
    "t01_tokens" -> (t01_tokens _),
    "t02_bpe_tokens" -> (t02_bpe_tokens _),
    "t03_langid" -> (t03_langid _),
    "t04_quality" -> (t04_quality _),
    "t05_fingerprint" -> (t05_fingerprint _),
    "t06_repetition" -> (t06_repetition _),
    "t08_redact" -> (t08_redact _),
    "t09_lm_score" -> (t09_lm_score _),
    "t10_tfidf" -> (t10_tfidf _),
    "t11_collocations" -> (t11_collocations _),
    "t12_heavy_hitters" -> (t12_heavy_hitters _),
  )
}
