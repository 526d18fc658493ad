package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Text-analysis tier over the `documents` corpus: token statistics,
  * quality scoring, language ID, and document fingerprinting — the
  * per-document scans a training-data pipeline runs before dedup.
  * All pure column expressions over one parquet scan each; no shuffles
  * except where an aggregation is the point.
  */
object TextAnalytics {

  // ------------------------------------------------------- token stats
  /** Whitespace token counting + quality signals (length, stopword
    * ratio, average word length) and a keep/drop quality label.
    */
  private def textStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_bytes", length(trim(col("text"))).cast("long"))
      .withColumn("n_stop", TextFunctions.markerCount("toks", TextFunctions.Stopwords))
      .withColumn("avg_word_len",
        length(regexp_replace(trim(col("text")), " ", "")).cast("double") / col("n_words"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
      .withColumn("quality_label",
        when(col("n_words") >= 10 && col("stop_ratio") <= 0.5, "keep").otherwise("drop"))
      .select("doc_id", "n_words", "n_bytes", "n_stop", "avg_word_len", "stop_ratio", "quality_label")
  }

  private val textStatsOracle =
    """WITH t AS (
      |  SELECT doc_id, trim(text) AS tt, string_split(trim(text), ' ') AS w FROM documents)
      |SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_words,
      |  CAST(length(tt) AS BIGINT) AS n_bytes,
      |  CAST(len(list_filter(w, t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is'))) AS BIGINT) AS n_stop,
      |  CAST(length(replace(tt, ' ', '')) AS DOUBLE) / len(w) AS avg_word_len,
      |  CAST(len(list_filter(w, t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is'))) AS DOUBLE) / len(w) AS stop_ratio,
      |  CASE WHEN len(w) >= 10
      |        AND CAST(len(list_filter(w, t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is'))) AS DOUBLE) / len(w) <= 0.5
      |       THEN 'keep' ELSE 'drop' END AS quality_label
      |FROM t""".stripMargin

  // -------------------------------------------------------- language ID
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "du"))

  /** Marker-word language ID: score each language profile by marker-
    * token occurrences; argmax with fixed priority order; 'und' when no
    * profile matches. (A production n-gram model plugs into the same
    * shape — per-profile score columns + argmax.)
    */
  private def langId(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
    val scored = langMarkers.foldLeft(base) { case (df, (code, words)) =>
      df.withColumn(s"s_$code", TextFunctions.markerCount("toks", words))
    }
    val Seq(en, es, de, fr) = langMarkers.map(m => col(s"s_${m._1}"))
    scored
      .withColumn("lang_pred",
        when(en > 0 && en >= es && en >= de && en >= fr, "en")
          .when(es > 0 && es >= de && es >= fr, "es")
          .when(de > 0 && de >= fr, "de")
          .when(fr > 0, "fr")
          .otherwise("und"))
      .select("doc_id", "lang", "s_en", "s_es", "s_de", "s_fr", "lang_pred")
  }

  private val langIdOracle = {
    def cnt(words: Seq[String]) =
      s"len(list_filter(w, t -> t IN ${words.map(w => s"'$w'").mkString("(", ", ", ")")}))"
    val Seq(en, es, de, fr) = langMarkers.map(m => cnt(m._2))
    s"""WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
       |s AS (SELECT doc_id, lang,
       |  CAST($en AS BIGINT) AS s_en, CAST($es AS BIGINT) AS s_es,
       |  CAST($de AS BIGINT) AS s_de, CAST($fr AS BIGINT) AS s_fr FROM t)
       |SELECT doc_id, lang, s_en, s_es, s_de, s_fr,
       |  CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |       WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
       |       WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
       |       WHEN s_fr > 0 THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM s""".stripMargin
  }

  // ------------------------------------------------------ fingerprints
  /** Document fingerprinting: content hash (md5) + order-sensitive
    * rolling hash over the token stream (detects reorderings that the
    * set-based dedup ops miss).
    */
  private def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(
        col("doc_id"),
        md5(col("text")).as("content_md5"),
        TextFunctions.rollingFingerprint("toks").as("rolling_fp"))
  }

  private val fingerprintOracle =
    """SELECT doc_id, md5(text) AS content_md5,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(trim(text), ' '),
      |                     t -> CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT))),
      |    (acc, v) -> (acc * 31 + v) % 1000000007) AS rolling_fp
      |FROM documents""".stripMargin

  // ------------------------------------------------------ tokenization
  /** BPE-style pre-tokenization count: the GPT-2 pre-tokenizer regex
    * family without lookahead (RE2-safe, so DuckDB computes the
    * identical token stream) — a letter run, a digit run, or a
    * punctuation run, each with an optional leading space; leftover
    * whitespace tokenizes per character. Token *counting* is the
    * pipeline-budgeting primitive (does a document fit a context
    * window; cost estimation) — it needs the boundaries, not the BPE
    * merges, so no vocabulary is involved.
    */
  private val BpeishPattern = """ ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s"""

  private def tokenize(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0))).cast("long"))
      .withColumn("n_ws_tokens", size(TextFunctions.tokens(col("text"))).cast("long"))
      .select(col("doc_id"), col("n_bpe_tokens"), col("n_ws_tokens"),
        // nullif guard: an empty document has 0 tokens — Spark's
        // double division yields NULL but DuckDB's IEEE default yields
        // inf; nullif pins both engines to NULL
        (length(col("text")).cast("double") / nullif(col("n_bpe_tokens"), lit(0L)))
          .as("chars_per_token"))
  }

  private val tokenizeOracle =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$BpeishPattern')) AS BIGINT) AS n_bpe_tokens,
       |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_ws_tokens,
       |  CAST(length(text) AS DOUBLE) / nullif(len(regexp_extract_all(text, '$BpeishPattern')), 0) AS chars_per_token
       |FROM documents""".stripMargin

  // ---------------------------------------------------- dataset split
  /** Deterministic train/val/test assignment: md5(doc_id) mapped to
    * [0,1), thresholded 80/10/10. Hash-based splits are THE reproducible
    * way to partition a training corpus — stable under reruns, joins,
    * and incremental ingest (a doc's split never depends on what else
    * is in the batch). Summarized per (split, lang) for the gate; the
    * per-doc assignment column is what a pipeline would persist.
    */
  private def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("u",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0"))
      .withColumn("split",
        when(col("u") < 0.8, "train").when(col("u") < 0.9, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  private val datasetSplitOracle =
    """WITH d AS (
      |  SELECT *, CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) / 4294967296.0 AS u
      |  FROM documents)
      |SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
      |       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM d GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- per-source caps
  /** Data-mixing cap: keep at most 20 documents per source, chosen by
    * md5(doc_id) order — the deterministic subsample a corpus-mixing
    * step applies to over-represented sources. Hash order (not doc_id
    * order) makes the kept set an unbiased sample yet stable across
    * reruns; the rank-limit plans as WindowGroupLimit, so each
    * partition keeps only k rows in flight.
    */
  private def capPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 20)
      .select(col("source"), col("doc_id"), col("rn"))
  }

  private val capPerGroupOracle =
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 20""".stripMargin

  // --------------------------------------------- quality filter chain
  /** Gopher/C4-style document quality filter: word-count bounds, a
    * repetition cap (most-frequent-token share), a minimum stopword
    * ratio, and mean-word-length bounds, with the FIRST failing rule
    * recorded — the standard pre-training corpus gate. The repetition
    * signal needs per-token counts, so it runs as explode → two-level
    * aggregate (token counts, then per-doc max) joined back onto the
    * per-doc scan signals — all shuffle-partitioned by doc, nothing
    * driver-side, and at 100 TB the explode feeds the same hash
    * aggregation the dedup tier already scales on.
    */
  /** Memoized per (session, dir) like the dedup tier's pair graph: the
    * gate is consumed by FOUR registered queries (text_quality_filter,
    * pipeline_funnel, dedup_verdicts, cluster_representatives) and a
    * pipeline computes the per-doc verdict frame once per corpus —
    * re-deriving the token explode + repetition rollup per consumer was
    * the dominant standalone cost left in the sf1 graph tier
    * (VERDICT r9 finding 4). `text_quality_filter` is registered ahead
    * of the other consumers, so the bench's per-pass build cost lands
    * in that named entry.
    */
  private[queries] def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "quality_gate")(
      qualityFilterOf(Tables.documents(spark, dir)))

  /** [[qualityFilter]] over a caller-supplied (doc_id, text) frame —
    * every signal is within-document, so the gate applies unchanged to
    * a micro-batch slice (the streaming dedup-verdicts twin).
    */
  private[graft] def qualityFilterOf(docs: DataFrame): DataFrame = {
    // rep_ratio = max per-token count / total tokens — a WITHIN-ROW
    // signal: the max multiplicity is the longest equal-run of the
    // sorted token array via the higher-order aggregate() (interpreted
    // lambda, NOT whole-stage codegen — the win here is the removed
    // explode → (doc,token) shuffle → per-doc rollup → join, i.e. two
    // token-volume exchanges gone; same longs, same one double
    // division). The isNotNull filter mirrors the old inner join's
    // drop of NULL-text docs (explode of a NULL array emitted no row).
    val maxRun = expr(
      """aggregate(array_sort(toks),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
        |  (acc, t) -> named_struct(
        |    'prev', t,
        |    'run',  IF(acc.prev <=> t, acc.run + 1L, 1L),
        |    'best', greatest(acc.best, IF(acc.prev <=> t, acc.run + 1L, 1L))),
        |  acc -> acc.best)""".stripMargin)
    docs
      .filter(col("text").isNotNull)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_stop", TextFunctions.markerCount("toks", TextFunctions.Stopwords))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
      .withColumn("avg_word_len",
        length(regexp_replace(trim(col("text")), " ", "")).cast("double") / col("n_words"))
      .withColumn("rep_ratio", maxRun.cast("double") / col("n_words"))
      .withColumn("fail_reason",
        when(col("n_words") < 20, "too_few_words")
          .when(col("rep_ratio") > 0.12, "repetitive")
          .when(col("stop_ratio") < 0.03, "low_stopwords")
          .when(col("avg_word_len") < 2.0 || col("avg_word_len") > 12.0, "odd_word_length")
          .otherwise("ok"))
      .withColumn("passes", col("fail_reason") === "ok")
      .select("doc_id", "n_words", "rep_ratio", "stop_ratio", "avg_word_len",
        "fail_reason", "passes")
  }

  private[queries] val qualityFilterOracle =
    """WITH t AS (
      |  SELECT doc_id, trim(text) AS tt, string_split(trim(text), ' ') AS w FROM documents),
      |base AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'to', 'and', 'in', 'is'))) AS DOUBLE) / len(w) AS stop_ratio,
      |    CAST(length(replace(tt, ' ', '')) AS DOUBLE) / len(w) AS avg_word_len
      |  FROM t),
      |rep AS (
      |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS rep_ratio
      |  FROM (SELECT doc_id, t2.t, count(*) AS c
      |        FROM (SELECT doc_id, unnest(w) AS t FROM t) t2 GROUP BY 1, 2)
      |  GROUP BY 1),
      |j AS (SELECT base.*, rep.rep_ratio FROM base JOIN rep USING (doc_id)),
      |r AS (
      |  SELECT *, CASE
      |    WHEN n_words < 20 THEN 'too_few_words'
      |    WHEN rep_ratio > 0.12 THEN 'repetitive'
      |    WHEN stop_ratio < 0.03 THEN 'low_stopwords'
      |    WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 'odd_word_length'
      |    ELSE 'ok' END AS fail_reason
      |  FROM j)
      |SELECT doc_id, n_words, rep_ratio, stop_ratio, avg_word_len, fail_reason,
      |       fail_reason = 'ok' AS passes
      |FROM r""".stripMargin

  // -------------------------------------------------------- PII scrub
  /** PII redaction: email and phone patterns replaced with typed
    * placeholder tokens, with pre-scrub match counts. The corpus is
    * synthetic word soup, so deterministic per-document contact lines
    * are appended first — that exercises identical regex semantics in
    * both engines (patterns are RE2-safe: no lookaround, no \\d/\\s
    * class shorthands whose unicode scope differs) rather than
    * trivially matching nothing. The scrub-hash equality proves
    * byte-identical redaction output cross-engine.
    */
  private val EmailPat = TextFunctions.EmailPattern
  private val PhonePat = TextFunctions.PhonePattern

  private def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("decorated",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"), lit(" now")))
      .withColumn("n_emails", TextFunctions.countEmails(col("decorated")))
      .withColumn("n_phones", TextFunctions.countPhones(col("decorated")))
      .withColumn("scrubbed", TextFunctions.scrubPii(col("decorated")))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("scrubbed")).as("scrub_hash"))
  }

  private val piiScrubOracle =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@mail.example.com or +1-555-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS decorated
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(decorated, '$EmailPat')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(decorated, '$PhonePat')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(decorated, '$EmailPat', '<EMAIL>', 'g'), '$PhonePat', '<PHONE>', 'g')) AS scrub_hash
       |FROM d""".stripMargin

  // --------------------------------------------- stratified sampling
  /** Deterministic stratified (per-source) sampling — the corpus-mixing
    * step that takes different rates from different sources. Membership
    * is an md5 threshold on a salted doc key (independent of
    * `dataset_split`'s hash: different salt, different stream), so the
    * sample is reproducible, batch-content-independent, and composable
    * with the split. Output is the per-source audit: configured rate,
    * kept count, and realized rate.
    */
  private val SampleRates: Seq[(String, Double)] =
    Seq("src0" -> 0.5, "src1" -> 0.25)
  private val DefaultRate = 0.1

  private def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = SampleRates.foldLeft(lit(DefaultRate)) { case (e, (s, r)) =>
      when(col("source") === s, lit(r)).otherwise(e)
    }
    Tables.documents(spark, dir)
      .withColumn("u",
        expr("CAST(conv(substr(md5(CONCAT('smp', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0"))
      .withColumn("rate", rate)
      .groupBy(col("source"))
      .agg(max(col("rate")).as("rate"),
        count(lit(1)).as("n_total"),
        sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("n_kept"))
      // QRound: integer ratio — exact-boundary class (ROUND_AUDIT U3)
      .withColumn("realized", QRound.col(col("n_kept").cast("double") / col("n_total"), 6))
  }

  private val stratifiedSampleOracle = {
    val rateCase = SampleRates.map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $DefaultRate END")
    s"""WITH d AS (
       |  SELECT source,
       |    CAST(CAST('0x' || substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) / 4294967296.0 AS u,
       |    $rateCase AS rate
       |  FROM documents),
       |g AS (
       |  SELECT source, max(rate) AS rate, count(*) AS n_total,
       |         CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |  FROM d GROUP BY 1)
       |SELECT source, rate, n_total, n_kept,
       |       ${QRound.duck("CAST(n_kept AS DOUBLE) / n_total", 6)} AS realized
       |FROM g""".stripMargin
  }

  // -------------------------------------------- repetition gates
  /** Gopher-style intra-document repetition signals (Rae et al. 2021
    * §A1.1): duplicate-token fraction, top-bigram share, and the share
    * of trigram occurrences inside duplicated trigrams — the gates
    * that catch boilerplate loops and degenerate generations BEFORE
    * expensive cross-doc dedup. Each signal is one explode + per-(doc,
    * gram) rollup + per-doc fold, all term-partitioned; ratios are
    * exact-integer divisions rounded to 6 decimals, and the top-bigram
    * argmax pins ties with md5(gram) so both engines pick the same
    * winner.
    */
  /** Memoized like the quality gate: the signals feed BOTH the
    * registered `doc_repetition` and `pipeline_funnel`'s repetition
    * stage — a pipeline computes them once per corpus. Registration
    * order puts `pipeline_funnel` first, so each bench pass pays this
    * build inside that named entry.
    */
  private def docRepetition(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "doc_repetition")(docRepetitionFresh(spark, dir))

  private def docRepetitionFresh(spark: SparkSession, dir: String): DataFrame = {
    // (r17) EVERY signal is within-row: gram multiplicities come from
    // the fused tokenCounts RLE over the row's own shingle arrays, so
    // the two explode → (doc, gram) exchanges, the two per-doc rollups
    // and both joins disappear — the whole frame is one map over the
    // scan (§2.3/§2.4). Null semantics mirror the old left joins: a doc
    // with no bigrams/trigrams had NO rollup row, so n_bi/top_bi/
    // n_tri/dup_tri are NULL there (the final coalesce handles them).
    // top_bi consumes only the WINNING COUNT, never the winning gram —
    // max multiplicity == the old rank-1-by-(c desc) count (r16).
    def counts(k: Int): Column = graft.plans.TextExpressions.tokenCounts(
      TextFunctions.wordShingles("toks", k))
    val maxC: Column => Column = a => array_max(transform(a, s => s.getField("c")))
    val dupC: Column => Column = a => aggregate(
      a, lit(0L), (acc, s) =>
        acc + when(s.getField("c") > 1, s.getField("c")).otherwise(0L))
    val uni = Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_dist"),
        counts(2).as("bc"), counts(3).as("tc"))
      .select(col("doc_id"), col("n_tok"), col("n_dist"),
        // n_bi/n_tri = total gram occurrences = n_tok-k+1 when any exist
        when(col("n_tok") >= 2, col("n_tok") - 1L).as("n_bi"),
        when(col("n_tok") >= 2, maxC(col("bc"))).as("top_bi"),
        when(col("n_tok") >= 3, col("n_tok") - 2L).as("n_tri"),
        when(col("n_tok") >= 3, dupC(col("tc"))).as("dup_tri"))
    uni
      // QRound: integer ratios — exact-boundary class (ROUND_AUDIT U3)
      .select(col("doc_id"), col("n_tok"),
        QRound.col(lit(1.0) - col("n_dist").cast("double") / col("n_tok"), 6)
          .as("dup_token_frac"),
        QRound.col(coalesce(col("top_bi").cast("double") / col("n_bi"), lit(0.0)), 6)
          .as("top_bigram_share"),
        QRound.col(coalesce(col("dup_tri").cast("double") / col("n_tri"), lit(0.0)), 6)
          .as("dup_trigram_share"))
  }

  private val docRepetitionOracle =
    s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |uni AS (SELECT doc_id, len(w) AS n_tok, len(list_distinct(w)) AS n_dist FROM t),
      |bic AS (
      |  SELECT doc_id, g, count(*) AS c FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(w) >= 2
      |      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
      |      ELSE [] END) AS g
      |    FROM t) s
      |  GROUP BY 1, 2),
      |biagg AS (
      |  SELECT doc_id, sum(c) AS n_bi, max(CASE WHEN rn = 1 THEN c END) AS top_bi FROM (
      |    SELECT bic.*, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, md5(g)) AS rn
      |    FROM bic) r
      |  GROUP BY 1),
      |triagg AS (
      |  SELECT doc_id, sum(c) AS n_tri,
      |         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM (
      |    SELECT doc_id, g, count(*) AS c FROM (
      |      SELECT doc_id, unnest(CASE WHEN len(w) >= 3
      |        THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |        ELSE [] END) AS g
      |      FROM t) s
      |    GROUP BY 1, 2) c
      |  GROUP BY 1)
      |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
      |       ${QRound.duck("1.0 - n_dist / CAST(n_tok AS DOUBLE)", 6)} AS dup_token_frac,
      |       ${QRound.duck("coalesce(top_bi / CAST(n_bi AS DOUBLE), 0.0)", 6)} AS top_bigram_share,
      |       ${QRound.duck("coalesce(dup_tri / CAST(n_tri AS DOUBLE), 0.0)", 6)} AS dup_trigram_share
      |FROM uni LEFT JOIN biagg USING (doc_id) LEFT JOIN triagg USING (doc_id)""".stripMargin

  // ----------------------------------------- n-gram LM perplexity
  private val LmAddK = 0.5

  /** CCNet-style LM quality bucketing (Wenzek et al. 2020): train a
    * language model ON the corpus, score every document's
    * cross-entropy under it, and split the corpus into head / middle /
    * tail thirds — the bucketing the LLaMA data pipeline filtered
    * with. The LM here is an add-k-smoothed conditional character-
    * bigram model (kenlm's 5-gram replaced by the largest model both
    * engines can replay exactly): p(c2|c1) = (cnt(c1c2)+k)/(cnt(c1·)+
    * k·V). Shapes, all corpus-scale-safe:
    *  - (doc, gram) counts: one fused-codegen explode + rollup, read
    *    twice (model + scoring) off one checkpoint;
    *  - model / context tables are vocabulary-sized rollups of that
    *    frame; V and N are broadcast scalars;
    *  - per-gram -c·ln(p) contributions quantize to pico-unit longs
    *    before the per-doc sum (order-independent, primitive agg);
    *  - the tercile rank never global-sorts docs: ranks = (docs with
    *    strictly smaller rounded xent — a value-histogram cumsum,
    *    bounded by the 6-decimal VALUE SPACE, not the corpus) + a
    *    row_number windowed WITHIN each xent value (distributed), and
    *    the head/middle/tail split is exact integer arithmetic
    *    rank*3 vs N — no ntile, no single-partition sort.
    */
  private def ngramLmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val W = org.apache.spark.sql.expressions.Window
    // per-doc gram counts are complete WITHIN the row — the fused
    // tokenCounts RLE emits the identical (doc_id, g, c) rows the old
    // explode → groupBy(doc_id, g) rollup produced, without shuffling
    // one row per character position (r17, guide §2.3/§2.4)
    val dg = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(graft.plans.TextExpressions.tokenCounts(
        TextFunctions.charNgrams("text", 2))).as("s"))
      .select(col("doc_id"), col("s.t").as("g"), col("s.c").as("c"))
      .localCheckpoint() // model AND scoring read it
    val model = dg.groupBy(col("g")).agg(sum(col("c")).as("cg"))
    val ctx = model.groupBy(substring(col("g"), 1, 1).as("c1")).agg(sum(col("cg")).as("cc"))
    val vocab = model.agg(countDistinct(substring(col("g"), 2, 1)).as("v"))
    // -ln p(c2|c1) depends only on the gram — compute it once per MODEL
    // cell (char-bigram vocab, bounded by charset² at any corpus scale)
    // instead of once per (doc, gram) row, and attach it with ONE
    // broadcast hash join instead of two (model + ctx) over the big
    // frame. The expression and its long/double inputs are identical,
    // so the per-row product -c·lnp is bit-identical to the old form.
    val lnp = model
      .join(broadcast(ctx), substring(col("g"), 1, 1) === col("c1"))
      .crossJoin(broadcast(vocab))
      .select(col("g"),
        log((col("cg") + LmAddK) / (col("cc") + col("v") * LmAddK)).as("lnp"))
    val doc = dg
      .join(broadcast(lnp), "g")
      // pico-unit longs, not DECIMAL(38,12): round(x,12)·1e12 is an
      // exact integer while |x| <= 2^53/1e12 ~ 9007 per gram term
      // (t = c·(-ln p); -ln p <= ln((cc+vk)/k) ~ 40, so c must stay
      // under ~225 per (doc, bigram) — true for natural text, NOT for
      // adversarial repetition), the long sum is order-independent,
      // and the hot per-gram agg stays primitive instead of boxing a
      // BigDecimal per row; both engines convert the identical integer
      // sum to double the same way. Outside those bounds a silent long
      // wrap in Spark would diverge from DuckDB's overflow error, so
      // BOTH invariants are enforced per row / per doc via
      // raise_error — a mismatch fails loudly, never silently.
      .withColumn("t", {
        val tPico = round(round(-col("c") * col("lnp"), 12) * 1e12)
        when(abs(tPico) <= lit(9.0e15), tPico.cast("long"))
          .otherwise(raise_error(concat(
            lit("lm_perplexity: per-gram pico term exceeds exact-long range: "),
            tPico.cast("string"))))
      })
      .groupBy(col("doc_id"))
      // QRound on the final ratio: exact-pico-integer / 1e12 / count is
      // a terminating-decimal-capable ratio (ROUND_AUDIT U3)
      .agg(sum(col("c")).as("n_grams"),
        QRound.col(sum(col("t")).cast("double") / 1e12 / sum(col("c")), 6).as("cross_entropy"),
        sum(abs(col("t"))).as("__abs_sum"))
      // |sum| <= sum|t|, so one guarded magnitude per doc proves the
      // signed pico sum never wrapped 2^62 — and a guard sum that
      // itself wraps 2^63 lands NEGATIVE (the >= 0 arm catches it);
      // wrapping a full 2^64 back to small-positive would take >2000
      // terms at the per-row gate's 9e15 cap, i.e. a doc of ~10^6
      // maximal-surprise gram OCCURRENCES packed into maximal-count
      // repeats — orders beyond the corpus profile either engine runs
      .withColumn("cross_entropy",
        when(col("__abs_sum") >= 0 && col("__abs_sum") < lit(4.6e18), col("cross_entropy"))
          .otherwise(raise_error(lit("lm_perplexity: per-doc pico sum overflow"))))
      .drop("__abs_sum")
      // one row per doc, read by the histogram, the total, and the
      // final decorate — materialize instead of re-scoring three times
      .localCheckpoint()
    val hist = doc.groupBy(col("cross_entropy")).agg(count(lit(1)).as("cnt"))
      .withColumn("below", coalesce(
        sum(col("cnt")).over(W.orderBy(col("cross_entropy"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("cross_entropy"), col("below"))
    val total = doc.agg(count(lit(1)).as("n"))
    doc.join(hist, "cross_entropy")
      .withColumn("rk", col("below") +
        row_number().over(W.partitionBy(col("cross_entropy")).orderBy(col("doc_id"))))
      .crossJoin(broadcast(total))
      .withColumn("bucket",
        when(col("rk") * 3 <= col("n"), "head")
          .when(col("rk") * 3 <= col("n") * 2, "middle").otherwise("tail"))
      .select(col("doc_id"), col("n_grams"), col("cross_entropy"), col("bucket"))
  }

  private val ngramLmOracle =
    s"""WITH dg AS (
       |  SELECT doc_id, g, count(*) AS c FROM (
       |    SELECT doc_id, unnest(CASE WHEN length(trim(text)) >= 2
       |      THEN list_transform(range(1, length(trim(text))), i -> substr(trim(text), i, 2))
       |      ELSE [] END) AS g
       |    FROM documents) t
       |  GROUP BY 1, 2),
       |model AS (SELECT g, sum(c) AS cg FROM dg GROUP BY 1),
       |ctx AS (SELECT substr(g, 1, 1) AS c1, sum(cg) AS cc FROM model GROUP BY 1),
       |vv AS (SELECT count(DISTINCT substr(g, 2, 1)) AS v FROM model),
       |doc AS (
       |  SELECT dg.doc_id, CAST(sum(dg.c) AS BIGINT) AS n_grams,
       |         ${QRound.duck(
             "CAST(sum(CAST(round(round(-dg.c * ln((model.cg + " + LmAddK +
               ") / (ctx.cc + " + LmAddK + " * vv.v)), 12) * 1e12) AS BIGINT)) AS DOUBLE)" +
               " / 1e12 / sum(dg.c)", 6)} AS cross_entropy
       |  FROM dg JOIN model USING (g)
       |  JOIN ctx ON substr(dg.g, 1, 1) = ctx.c1
       |  CROSS JOIN vv
       |  GROUP BY 1),
       |tot AS (SELECT count(*) AS n FROM doc),
       |r AS (SELECT doc.*, row_number() OVER (ORDER BY cross_entropy, doc_id) AS rk FROM doc)
       |SELECT doc_id, n_grams, cross_entropy,
       |       CASE WHEN rk * 3 <= n THEN 'head'
       |            WHEN rk * 3 <= 2 * n THEN 'middle' ELSE 'tail' END AS bucket
       |FROM r CROSS JOIN tot""".stripMargin

  // ------------------------------------------------ pipeline funnel
  /** The whole preprocessing funnel as ONE declarative plan — the
    * per-source survival report a pipeline owner reads after every
    * ingest: total → C4-style quality gate (text_quality_filter's
    * exact predicate) → Gopher repetition gates (doc_repetition's
    * signals, thresholds tuned to this corpus's tail) → exact-dedup
    * canonical (first doc per content hash). Stages NEST: each count
    * is survivors of all previous gates, so the row reads left to
    * right as the funnel narrows. Composing the registered gate
    * queries keeps the semantics in one place; Catalyst fuses the
    * shared scans, and every stage is the same per-doc rollup shape
    * that already holds at corpus scale. Retention is the number
    * mixture planning consumes.
    */
  private def pipelineFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val keep = docs.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
    val q = qualityFilter(spark, dir).select(col("doc_id"), col("passes"))
    val rep = docRepetition(spark, dir).select(col("doc_id"),
      (col("dup_token_frac") <= 0.65 && col("top_bigram_share") <= 0.10 &&
        col("dup_trigram_share") <= 0.05).as("rep_ok"))
    docs.join(keep, "h").join(q, "doc_id").join(rep, "doc_id")
      .withColumn("is_canon", col("doc_id") === col("keep_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("passes") && col("rep_ok"), 1L).otherwise(0L)).as("n_repetition_ok"),
        sum(when(col("passes") && col("rep_ok") && col("is_canon"), 1L).otherwise(0L))
          .as("n_unique"))
      // QRound: integer ratio — exact-boundary class (ROUND_AUDIT U3)
      .withColumn("retention",
        QRound.col(col("n_unique").cast("double") / col("n_total"), 6))
  }

  private val pipelineFunnelOracle =
    s"""WITH q AS ($qualityFilterOracle),
       |rep AS ($docRepetitionOracle),
       |d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
       |keep AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY 1),
       |f AS (
       |  SELECT d.source, q.passes,
       |         (rep.dup_token_frac <= 0.65 AND rep.top_bigram_share <= 0.10
       |          AND rep.dup_trigram_share <= 0.05) AS rep_ok,
       |         d.doc_id = keep.keep_id AS is_canon
       |  FROM d JOIN keep USING (h) JOIN q ON d.doc_id = q.doc_id
       |  JOIN rep ON d.doc_id = rep.doc_id)
       |SELECT source, count(*) AS n_total,
       |       CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       |       CAST(sum(CASE WHEN passes AND rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition_ok,
       |       CAST(sum(CASE WHEN passes AND rep_ok AND is_canon THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |       ${QRound.duck(
             "CAST(sum(CASE WHEN passes AND rep_ok AND is_canon THEN 1 ELSE 0 END) AS DOUBLE)" +
               " / count(*)", 6)} AS retention
       |FROM f GROUP BY 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    // quality gate FIRST: it is the memoized frame three later
    // consumers (pipeline_funnel here, dedup_verdicts and
    // cluster_representatives in the dedup tier) read, so its named
    // entry is where each bench pass pays the build
    GraftQuery("text_quality_filter", Some(qualityFilterOracle), qualityFilter),
    GraftQuery("pipeline_funnel", Some(pipelineFunnelOracle), pipelineFunnel),
    GraftQuery("ngram_lm_perplexity", Some(ngramLmOracle), ngramLmPerplexity),
    GraftQuery("doc_repetition", Some(docRepetitionOracle), docRepetition),
    GraftQuery("text_stats", Some(textStatsOracle), textStats),
    GraftQuery("text_lang_id", Some(langIdOracle), langId),
    GraftQuery("text_fingerprint", Some(fingerprintOracle), fingerprint),
    GraftQuery("text_tokenize", Some(tokenizeOracle), tokenize),
    GraftQuery("dataset_split", Some(datasetSplitOracle), datasetSplit),
    GraftQuery("cap_per_group", Some(capPerGroupOracle), capPerGroup),
    GraftQuery("doc_pii_scrub", Some(piiScrubOracle), piiScrub),
    GraftQuery("stratified_sample", Some(stratifiedSampleOracle), stratifiedSample),
  )
}
