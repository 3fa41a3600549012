package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed query a training-data
  * pipeline actually ships, rather than its stages in isolation:
  *
  *   language gate (t03's n-gram classifier)
  *     ∧ quality floors (t04's C4/Gopher-style heuristics)
  *     ∧ one-doc-per-near-dup-cluster (d06's keepers)
  *
  * All three gates are the families' own relations composed with two
  * doc-keyed equi-joins (one of them a semi-join) — no new shuffle
  * shape, and at 100 TB each input is the already-materialized output
  * of its stage, so curation costs two hash joins over pruned
  * columns. The oracle splices the same three CTE groups
  * ([[TextQueries.LangScoreCte]], [[TextQueries.QualityBaseCte]],
  * [[DedupQueries.neardupLabelsCte]]) and applies identical
  * predicates, so the kept set is hash-checked end to end.
  */
object PipelineQueries {

  /** Quality gates (see the sf0.01 distributions in the scaladoc of
    * the spec): length floor, a stopword-ratio band (too low = word
    * salad, too high = boilerplate), a digit-ratio ceiling (the
    * standard gate; this corpus has no digits, so it passes all rows
    * here), and a mean-token-length ceiling.
    */
  private val MinTokens = 30L
  private val StopLo = 0.01
  private val StopHi = 0.15
  private val MaxDigitRatio = 0.2
  private val MaxMeanTokLen = 5.0
  private val TargetLang = "en"

  def p01_curate(s: SparkSession, dir: String): DataFrame = {
    // Stage outputs are materialized once and the composition reads
    // them — the pipeline contract SCALE.md documents (at cluster
    // scale these are the stages' bucketed output tables). Unpinned,
    // every run re-executes the classifier and quality scans.
    val lang = SharedRelations(s, dir, "curate_lang") {
      TextQueries.t03_langid(s, dir).select(col("doc_id"), col("pred_lang"))
    }
    val qual = SharedRelations(s, dir, "curate_quality") {
      TextQueries.t04_quality(s, dir)
    }
    val keepers = SharedRelations(s, dir, "curate_keepers") {
      DedupQueries.d06_neardup_clusters(s, dir)
        .filter(col("is_keeper")).select(col("doc_id"))
    }
    qual.join(lang, Seq("doc_id"))
      .join(keepers, Seq("doc_id"), "left_semi")
      .filter(col("pred_lang") === TargetLang &&
        col("n_tokens") >= MinTokens &&
        col("stop_ratio") >= StopLo && col("stop_ratio") <= StopHi &&
        col("digit_ratio") <= MaxDigitRatio &&
        col("mean_tok_len") <= MaxMeanTokLen)
      .select(col("doc_id"), col("pred_lang"), col("n_tokens"),
        col("stop_ratio"), col("mean_tok_len"))
  }

  /** Per-language sample cap and the salt-lane fanout of the skew-proof
    * top-N (see [[p02_balanced_sample]]).
    */
  private val SampleCap = 40
  private val SaltLanes = 8

  /** Language-balanced deterministic sample — the corpus-balancing step
    * of a training-data pipeline: keep at most [[SampleCap]] documents
    * per language, chosen by a content hash so the draw is (a)
    * deterministic across engines/runs — md5(text) is the order key,
    * doc_id the tiebreak — and (b) unbiased by ingest order.
    *
    * Scale shape: the naive form is one Window over
    * `partitionBy(lang)`, which funnels each language onto a SINGLE
    * task — the classic stratum-skew trap when one language is 90% of
    * a 100 TB corpus. Instead, q26's salting pattern applied to top-N:
    * phase 1 ranks within (lang, salt-lane) — [[SaltLanes]] parallel
    * tasks per language, each keeping ≤ cap rows — and phase 2 ranks
    * the ≤ lanes·cap survivors per language exactly. Lossless for ANY
    * lane assignment: a global top-cap row is necessarily within the
    * top-cap of its own lane, so phase 1 never drops a winner — which
    * is why the salt (doc_id mod lanes) needn't appear in the oracle.
    */
  def p02_balanced_sample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("text").cast("binary")).as("key"))
    val lane = Window.partitionBy(col("lang"), col("salt"))
      .orderBy(col("key"), col("doc_id"))
    val survivors = docs
      .withColumn("salt", pmod(col("doc_id"), lit(SaltLanes)))
      .withColumn("lrn", row_number().over(lane))
      .filter(col("lrn") <= SampleCap)
    val w = Window.partitionBy(col("lang")).orderBy(col("key"), col("doc_id"))
    survivors
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SampleCap)
      .select(col("doc_id"), col("lang"), col("rn"))
  }

  /** Tokens per packed training sequence and the shard fanout of the
    * packing (see [[p03_pack]]).
    */
  private val PackBudget = 512L
  private val PackShards = 16L

  /** Deterministic sequence packing — the concat-and-chunk step LLM
    * pretraining uses: documents are laid head-to-tail in a fixed
    * order and split into [[PackBudget]]-token sequences, so each doc
    * gets (chunk, offset) coordinates; a doc may straddle a chunk
    * boundary, exactly like the real pipeline (the tokenizer's
    * attention mask handles the seam).
    *
    * Scale shape: a single global cumulative sum would be ONE task at
    * 100 TB (an unpartitioned ORDER BY window), so packing is
    * per-shard: shard = doc_id mod [[PackShards]], each shard packs
    * independently (one cumsum task per shard — at cluster scale set
    * shards ≈ 4× executor count) and chunks are keyed (shard, chunk).
    * Determinism: coordinates depend only on (doc_id, n_tokens) —
    * invariant across partitioning, cluster size, and engine, which
    * the DuckDB oracle proves.
    */
  def p03_pack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " "))
          .cast(org.apache.spark.sql.types.LongType).as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(PackShards)))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"),
        floor(col("start") / lit(PackBudget.toDouble)).as("chunk"),
        (col("start") % lit(PackBudget)).as("off"))
  }

  /** n-gram length and the eval-shard modulus of the contamination
    * check (see [[p04_contamination]]): docs with
    * `doc_id % EvalMod == 0` play the held-out eval set.
    */
  private val ContamN = 8
  private val EvalMod = 20L

  /** Train/eval contamination check — the benchmark-decontamination
    * step of a training-data pipeline: a training document is flagged
    * when any of its word-[[ContamN]]-grams also appears in the eval
    * set (the standard n-gram-collision definition; real pipelines use
    * 8–13-grams — at this corpus' ~30-word vocabulary 8-grams are
    * already discriminative: only genuine near-dup pairs straddling
    * the split collide).
    *
    * Scale shape: the eval side is DISTINCT n-grams of a benchmark
    * suite — megabytes, not terabytes — so it is `broadcast()` and the
    * train grams never shuffle for the join; the train-side exchanges
    * are the per-doc distinct-gram aggregate (map-side partials
    * collapse each doc's repeats fully — a doc's grams are co-located
    * in its input split) and the ~one-row-per-doc count.
    * At larger eval sets, swap the gram string for its 64-bit hash to
    * shrink the broadcast 10× (t05's fingerprint machinery) — kept as
    * strings here so the oracle stays a plain string equi-join.
    */
  def p04_contamination(s: SparkSession, dir: String): DataFrame = {
    // Codegen'd position explode (TextQueries.gramPositions), distinct
    // per-doc grams via an aggregate whose map-side partial collapses
    // each doc's repeats fully (a doc's grams are co-located in its
    // split) — NOT a cached distinct-array relation: the r10 sf10
    // sweep measured the `doc_ngrams8` SharedRelations cache at a
    // 281s median (an interpreted transform lambda feeding a
    // |grams|-sized MEMORY_AND_DISK materialization, the d03/d04
    // pathology); this shape re-derives two narrow explodes and runs
    // 5.9s counted / 39.2s fully materialized at the same scale.
    // n_ngrams (the per-doc DISTINCT gram count) falls out of the
    // same aggregate.
    def ng = TextQueries.gramPositions(Tables(s, dir, "documents"), ContamN)
      .select(col("doc_id"),
        array_join(slice(col("w"), col("i"), lit(ContamN)), " ").as("g"))
    val evalGrams = ng.filter(pmod(col("doc_id"), lit(EvalMod)) === 0)
      .select(col("g")).distinct()
      .withColumn("hit", lit(1L))
    ng.filter(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("occ"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("n_ngrams"), col("n_hit"),
        (col("n_hit").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_ngrams").cast(org.apache.spark.sql.types.DoubleType))
          .as("contamination"),
        (col("n_hit") > 0L).as("is_contaminated"))
  }

  /** Fixed-point quantum for [[p05_mixture]]'s weight normalization —
    * the k-means-means / PQ-ADC determinism design: quantize each
    * per-source term to int64, sum EXACTLY (order-free), divide once.
    */
  private val MixQuant = 1099511627776L // 2^40

  /** Source-mixture weighting — the domain-balancing step of a
    * training-data pipeline: per source, its token share and a
    * temperature-flattened sampling weight w_s ∝ share_s^τ (τ = 0.5,
    * the standard multilingual/domain-mixing rule: sqrt flattening
    * upsamples small sources, downsamples dominant ones). `boost` =
    * weight/share is the per-source oversampling factor the sampler
    * applies (> 1 below-average sources, < 1 above-average).
    *
    * Shares are over TOKENS, not documents (what mixture weights mean
    * in practice). Scale shape: one low-cardinality source aggregation
    * (map-side combining), then two 1-row broadcast scalars (total
    * tokens, total quantized weight) — the 100 TB corpus is scanned
    * once and only k source rows ever cross the driver-free plan.
    * Determinism: tokens sum exactly as int64; sqrt is IEEE
    * correctly-rounded in both engines; the weight normalizer sums
    * int64-quantized terms ([[MixQuant]]) so normalization is
    * order-free and the oracle hash-exact.
    */
  def p05_mixture(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val bySrc = Tables(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("toks"))
    val tot = broadcast(bySrc.agg(sum(col("toks")).as("tot")))
    val sh = bySrc.crossJoin(tot)
      .select(col("source"), col("n_docs"), col("toks"),
        (col("toks").cast(DoubleType) / col("tot").cast(DoubleType)).as("share"))
      .withColumn("wq", floor(sqrt(col("share")) * MixQuant).cast(LongType))
    val wsum = broadcast(sh.agg(sum(col("wq")).as("ws")))
    sh.crossJoin(wsum)
      .select(col("source"), col("n_docs"), col("toks"), col("share"),
        (col("wq").cast(DoubleType) / col("ws").cast(DoubleType)).as("weight"))
      .withColumn("boost", col("weight") / col("share"))
  }

  /** Base sampling rate for [[p07_mixture_sample]]: an average-share
    * source keeps ~half its documents; `boost` scales that per source
    * (capped at 1 — no source can admit more than everything).
    */
  private val BaseRate = 0.5
  /** Admission-bucket domain for [[p07_mixture_sample]]. */
  private val SampleQuant = 1000000L

  /** Deterministic mixture-materializing sampler — the step that turns
    * [[p05_mixture]]'s per-source weights into an actual sampled
    * corpus: each document is admitted iff its content-hash bucket
    * falls below its source's threshold floor(min(1, BaseRate·boost) ×
    * [[SampleQuant]]). Hashing the CONTENT (not the id) keeps the
    * decision re-ingest-stable and engine-portable (same discipline as
    * [[p06_split]]); per-source admission rates then converge to the
    * mixture weights by uniformity of the hash.
    *
    * Scale shape: p05's k-row weight table broadcasts; the corpus side
    * is one narrow map (hash + compare) — the 100 TB scan never
    * shuffles. Determinism: boost is p05's order-free fixed-point
    * ratio; the threshold is two IEEE ops (multiply by the exact 0.5,
    * multiply by 10⁶) then floor — identical in both engines.
    */
  def p07_mixture_sample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val thr = broadcast(p05_mixture(s, dir)
      .select(col("source"),
        floor(least(lit(1.0), lit(BaseRate) * col("boost")) * lit(SampleQuant))
          .cast(LongType).as("thr")))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        pmod(TextQueries.polyHash("text"), lit(SampleQuant)).as("bucket"))
      .join(thr, Seq("source"))
      .select(col("doc_id"), col("source"), col("bucket"), col("thr"),
        (col("bucket") < col("thr")).as("admitted"))
  }

  /** Split fractions for [[p06_split]]: buckets 0–79 train, 80–89
    * val, 90–99 test.
    */
  private val ValLo = 80L
  private val TestLo = 90L

  /** Deterministic train/val/test assignment — hash the CONTENT (not
    * the id: re-ingests with new ids keep their split; the leakage
    * discipline every pipeline needs) into 100 buckets and band them
    * 80/10/10. The hash is the engine's shared polynomial rolling hash
    * ([[TextQueries.polyHash]], codegen'd, DuckDB-reproducible), so
    * the assignment is identical on any engine, partitioning, or
    * cluster size. Pure narrow map — no shuffle at any scale.
    */
  def p06_split(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        pmod(TextQueries.polyHash("text"), lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < ValLo, "train")
          .when(col("bucket") < TestLo, "val")
          .otherwise("test"))

  /** Curriculum stages ([[p08_curriculum]]): length-bucket count and
    * the per-bucket hash-lane fanout. 8 stages × 8 lanes = 64
    * (bucket, lane) cells; positions are contiguous in (bucket, lane)
    * order.
    */
  private val CurrStages = 8L
  private val CurrLanes = 8L
  private val CurrBucketW = 32L

  // Curriculum ordering — the data-ordering step of curriculum
  // training: every document gets a GLOBAL training position such
  // that shorter (easier) docs come first, in
  // [[CurrStages]] length-bucket stages. A naive global
  // `row_number() OVER (ORDER BY …)` is one task at any scale; this
  // is the two-level form that parallelizes without losing
  // determinism: docs land in (bucket, lane) cells (lane =
  // content-hash mod [[CurrLanes]]), a 64-row cell-count relation
  // yields broadcast exclusive offsets via one tiny-window cumsum,
  // and position = cell offset + rank within the cell under the
  // (hash, doc_id) total order. Each cell ranks independently —
  // 64 parallel units here, |stages|·|lanes| tunable to the cluster —
  // and the assignment is invariant to partitioning and cluster size
  // (the p03/p06 stance: coordinates derive only from content).
  // Within a stage the inter-lane order is arbitrary-but-deterministic,
  // which is exactly what a curriculum needs (stages ordered, intra-
  // stage shuffled).
  def p08_curriculum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " "))
          .cast(org.apache.spark.sql.types.LongType).as("nt"),
        TextQueries.polyHash("text").as("h"))
      .select(col("doc_id"), col("h"),
        least(graft.functions.GraftExpressions.floorDiv(
          col("nt"), lit(CurrBucketW)), lit(CurrStages - 1)).as("bucket"),
        pmod(col("h"), lit(CurrLanes)).as("lane"))
    val cells = d.groupBy(col("bucket"), col("lane"))
      .agg(count(lit(1)).as("c"))
    val wOff = Window.orderBy(col("bucket"), col("lane"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = broadcast(
      cells.withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
        .select(col("bucket"), col("lane"), col("off")))
    val wRank = Window.partitionBy(col("bucket"), col("lane"))
      .orderBy(col("h"), col("doc_id"))
    d.join(offs, Seq("bucket", "lane"))
      .withColumn("pos", col("off") + row_number().over(wRank) - 1)
      .select(col("doc_id"), col("bucket"), col("lane"), col("pos"))
  }

  // Per-source corpus report card — the audit table a data-governance
  // pass publishes before a source enters the training mix: volume
  // (docs, tokens), exact-duplicate exposure (docs whose content hash
  // repeats anywhere in the corpus — cross-source, so a source
  // re-scraping another's pages is visible), language spread, and the
  // corpus-level stopword ratio as a quality proxy. Numeric
  // discipline: every mean/ratio is ONE double division of two exact
  // int64 sums (never an average of doubles — accumulation order
  // would diverge between engines). Scale shape: one corpus scan into
  // a source-keyed aggregation (map-side combined), plus a
  // digest-keyed dup count whose shuffle moves 16-byte digests — the
  // d01 discipline.
  def p09_source_report(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        expr("CAST(size(filter(split(text, ' '), w -> w = 'the' OR w = 'a')) AS BIGINT)")
          .as("n_stop"))
    val dupKeys = d.groupBy(col("h")).agg(count(lit(1)).as("copies"))
      .filter(col("copies") > 1).select(col("h"))
    val flagged = d.join(dupKeys, Seq("h"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("dup_docs"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("toks"),
        sum(col("n_stop")).as("stop"),
        count_distinct(col("lang")).as("n_langs"))
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("toks"), col("n_langs"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        (col("toks").cast("double") / col("n_docs").cast("double"))
          .as("mean_toks"),
        (col("stop").cast("double") / col("toks").cast("double"))
          .as("stop_ratio"))
  }

  /** p05's full oracle query — also spliced as [[p07_mixture_sample]]'s
    * weight CTE, so the sampler is checked against the same weights.
    */
  private val P05Sql: String = s"""
      |WITH b AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS toks
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(toks) AS BIGINT) AS tot FROM b),
      |sh AS (SELECT source, n_docs, toks,
      |    CAST(toks AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
      |    CAST(FLOOR(SQRT(CAST(toks AS DOUBLE) / CAST(tot AS DOUBLE))
      |      * $MixQuant) AS BIGINT) AS wq
      |  FROM b, t),
      |w AS (SELECT CAST(SUM(wq) AS BIGINT) AS ws FROM sh)
      |SELECT source, n_docs, toks, share,
      |  CAST(wq AS DOUBLE) / CAST(ws AS DOUBLE) AS weight,
      |  (CAST(wq AS DOUBLE) / CAST(ws AS DOUBLE)) / share AS boost
      |FROM sh, w""".stripMargin

  val oracle: Map[String, String] = Map(
    "p09_source_report" -> """
      |WITH d AS (SELECT doc_id, source, lang, MD5(text) AS h,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS nt,
      |    CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
      |      w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop
      |  FROM documents),
      |dk AS (SELECT h FROM d GROUP BY h HAVING COUNT(*) > 1),
      |fl AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS dup_docs
      |  FROM d WHERE h IN (SELECT h FROM dk) GROUP BY 1),
      |ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(nt) AS BIGINT) AS toks,
      |    CAST(SUM(n_stop) AS BIGINT) AS stop,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM d GROUP BY 1)
      |SELECT ag.source, n_docs, toks, n_langs,
      |  CAST(COALESCE(fl.dup_docs, 0) AS BIGINT) AS dup_docs,
      |  CAST(toks AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_toks,
      |  CAST(stop AS DOUBLE) / CAST(toks AS DOUBLE) AS stop_ratio
      |FROM ag LEFT JOIN fl ON ag.source = fl.source""".stripMargin,
    "p08_curriculum" -> s"""
      |WITH d AS (SELECT doc_id,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS nt,
      |    ${TextQueries.polyHashSql("text")} AS h
      |  FROM documents),
      |b AS (SELECT doc_id, h,
      |    LEAST(nt // $CurrBucketW, ${CurrStages - 1}) AS bucket,
      |    h % $CurrLanes AS lane
      |  FROM d),
      |cnt AS (SELECT bucket, lane, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM b GROUP BY 1, 2),
      |off AS (SELECT bucket, lane,
      |    CAST(COALESCE(SUM(c) OVER (ORDER BY bucket, lane
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS off
      |  FROM cnt)
      |SELECT doc_id, bucket, lane,
      |  off + ROW_NUMBER() OVER (PARTITION BY bucket, lane
      |    ORDER BY h, doc_id) - 1 AS pos
      |FROM b JOIN off USING (bucket, lane)""".stripMargin,
    "p03_pack" -> s"""
      |WITH toks AS (
      |  SELECT doc_id,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
      |    doc_id % $PackShards AS shard
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, shard,
      |    -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT, which would
      |    -- leak into off's type; Spark's stays BIGINT
      |    CAST(COALESCE(SUM(n_tokens) OVER (
      |      PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS start
      |  FROM toks)
      |SELECT doc_id, shard,
      |  CAST(FLOOR(start / ${PackBudget}.0) AS BIGINT) AS chunk,
      |  start % $PackBudget AS off
      |FROM packed""".stripMargin,
    // The oracle is the UNSALTED definition — phase 1 is lossless, so
    // the two must agree row-for-row (DuckDB md5() = Spark md5 over
    // UTF-8 bytes, both lowercase hex).
    "p02_balanced_sample" -> s"""
      |SELECT doc_id, lang, rn FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id)
      |      AS rn
      |  FROM documents)
      |WHERE rn <= $SampleCap""".stripMargin,
    "p06_split" -> s"""
      |SELECT doc_id,
      |  ${TextQueries.polyHashSql("text")} % 100 AS bucket,
      |  CASE WHEN ${TextQueries.polyHashSql("text")} % 100 < $ValLo THEN 'train'
      |       WHEN ${TextQueries.polyHashSql("text")} % 100 < $TestLo THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin,
    "p05_mixture" -> P05Sql,
    // p05's weight table as a CTE, then one hash-and-compare per doc.
    "p07_mixture_sample" -> s"""
      |WITH mix AS ($P05Sql),
      |thr AS (SELECT source,
      |    CAST(FLOOR(LEAST(1.0, $BaseRate * boost) * $SampleQuant) AS BIGINT)
      |      AS thr
      |  FROM mix)
      |SELECT d.doc_id, d.source,
      |  ${TextQueries.polyHashSql("d.text")} % $SampleQuant AS bucket,
      |  thr,
      |  ${TextQueries.polyHashSql("d.text")} % $SampleQuant < thr AS admitted
      |FROM documents d JOIN thr USING (source)""".stripMargin,
    "p04_contamination" -> s"""
      |WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w
      |  FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= $ContamN),
      |ng AS (SELECT doc_id, CAST(LEN(gs) AS BIGINT) AS n_ngrams,
      |    UNNEST(gs) AS g
      |  FROM (SELECT doc_id,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(w) - ${ContamN - 2}),
      |      i -> ARRAY_TO_STRING(w[i:i+${ContamN - 1}], ' '))) AS gs
      |    FROM w)),
      |ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % $EvalMod = 0),
      |hits AS (SELECT tr.doc_id, MAX(tr.n_ngrams) AS n_ngrams,
      |    CAST(SUM(CASE WHEN ev.g IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      |      AS n_hit
      |  FROM ng tr LEFT JOIN ev ON tr.g = ev.g
      |  WHERE tr.doc_id % $EvalMod != 0
      |  GROUP BY 1)
      |SELECT doc_id, n_ngrams, n_hit,
      |  CAST(n_hit AS DOUBLE) / CAST(n_ngrams AS DOUBLE) AS contamination,
      |  n_hit > 0 AS is_contaminated
      |FROM hits""".stripMargin,
    "p01_curate" -> {
      val r = DedupQueries.NeardupRounds
      DedupQueries.neardupLabelsCte(r) + s""",
        |${TextQueries.LangScoreCte},
        |lp AS (${TextQueries.LangPredSelect}),
        |${TextQueries.QualityBaseCte},
        |q AS (${TextQueries.QualitySelect}),
        |k AS (SELECT d.doc_id
        |  FROM documents d LEFT JOIN l$r ON d.doc_id = l$r.doc_id
        |  WHERE d.doc_id = COALESCE(l$r.cluster, d.doc_id))
        |SELECT q.doc_id, lp.pred_lang, q.n_tokens, q.stop_ratio,
        |  q.mean_tok_len
        |FROM q
        |JOIN lp ON q.doc_id = lp.doc_id
        |JOIN k ON q.doc_id = k.doc_id
        |WHERE lp.pred_lang = '$TargetLang'
        |  AND q.n_tokens >= $MinTokens
        |  AND q.stop_ratio >= $StopLo AND q.stop_ratio <= $StopHi
        |  AND q.digit_ratio <= $MaxDigitRatio
        |  AND q.mean_tok_len <= $MaxMeanTokLen""".stripMargin
    },
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curate" -> (p01_curate _),
    "p02_balanced_sample" -> (p02_balanced_sample _),
    "p03_pack" -> (p03_pack _),
    "p04_contamination" -> (p04_contamination _),
    "p05_mixture" -> (p05_mixture _),
    "p06_split" -> (p06_split _),
    "p07_mixture_sample" -> (p07_mixture_sample _),
    "p08_curriculum" -> (p08_curriculum _),
    "p09_source_report" -> (p09_source_report _),
  )
}
