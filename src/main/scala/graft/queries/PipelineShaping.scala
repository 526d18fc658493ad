package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Pipeline-shaping tier: the operators that turn a cleaned corpus
  * into model-ready training batches, plus the warehouse-side history
  * build —
  *
  *  - corpus n-gram statistics (the LM-data profile every mixture
  *    decision starts from),
  *  - document chunking (overlapping token windows — the unit a
  *    context-length-bounded trainer actually consumes),
  *  - sequence packing (concat-and-cut assignment of docs to
  *    fixed-size context windows, the step that decides padding waste),
  *  - boilerplate-span detection (per-doc share of shingles repeated
  *    across the corpus — the C4-style "remove repeated lines" signal),
  *  - SCD Type-2 interval build (gaps-and-islands change suppression
  *    over an event stream — the classic warehouse dimension history).
  *
  * Scale posture: every operator is explode → partial-agg → key-join /
  * window with an explicit partitioning key; nothing is all-pairs and
  * nothing sorts globally (packing windows partition by `source`, SCD2
  * windows by `user_id` — at 100 TB those are the natural shard keys
  * and each group's sort is a spillable per-partition sort).
  */
object PipelineShaping {

  // ----------------------------------------------------- n-gram counts
  /** Corpus-wide top-50 word bigrams with occurrence and document
    * frequency — the n-gram profile used for mixture weighting and
    * contamination screens. One explode pass; the rollup's partial
    * aggregation absorbs the heavy hitters map-side, and the top-50 is
    * a TakeOrderedAndProject (per-partition heap), never a global sort.
    */
  private def ngramCounts(spark: SparkSession, dir: String): DataFrame = {
    // (r17) the fused tokenCounts RLE emits one (doc, bigram, c) row per
    // DISTINCT bigram per doc, so n_occurrences = Σc and n_docs becomes a
    // plain count — the per-occurrence explode AND the countDistinct
    // Expand both disappear (§2.3).
    Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"), explode(graft.plans.TextExpressions.tokenCounts(
        TextFunctions.wordShingles("toks", 2))).as("s"))
      .groupBy(col("s.t").as("bigram"))
      .agg(sum(col("s.c")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("bigram"))
      .limit(50)
  }

  private val ngramCountsOracle =
    """WITH bg AS (
      |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
      |    THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
      |    ELSE [] END) AS bigram
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents))
      |SELECT bigram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
      |FROM bg GROUP BY 1
      |ORDER BY n_occurrences DESC, bigram
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------- document chunking
  private val ChunkSize = 32
  private val ChunkStride = 24 // 8-token overlap between consecutive chunks

  /** Overlapping token-window chunks (32 tokens, stride 24): each doc
    * expands to ceil(n/stride) chunks, the final one partial. Chunk
    * starts come from `sequence()` + `posexplode` and the chunk text
    * from `slice` — all codegen'd builtins over the one token array,
    * so the expansion rides the scan with zero shuffles; the md5 chunk
    * hash is the dedupable unit downstream chunk-level dedup keys on.
    */
  private def docChunking(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        posexplode(sequence(lit(1), size(col("toks")), lit(ChunkStride)))
          .as(Seq("chunk_idx", "start")),
        col("toks"))
      .withColumn("chunk", slice(col("toks"), col("start"), lit(ChunkSize)))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  private val docChunkingOracle =
    s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |ch AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, $ChunkStride)) AS start FROM t)
       |SELECT doc_id, (start - 1) // $ChunkStride AS chunk_idx,
       |       CAST(len(list_slice(w, start, start + ${ChunkSize - 1})) AS BIGINT) AS n_tokens,
       |       md5(array_to_string(list_slice(w, start, start + ${ChunkSize - 1}), ' ')) AS chunk_hash
       |FROM ch""".stripMargin

  // ---------------------------------------------------- sequence packing
  private val CtxTokens = 256

  /** Concat-and-cut sequence packing: docs are concatenated in doc_id
    * order within each source and cut into 256-token context windows;
    * a doc belongs to the window its first token lands in. Output is
    * the per-(source, bin) packing manifest — doc count, token count,
    * id range — the thing a batch loader materializes. The running
    * offset is ONE window cumsum partitioned by `source` (the shard
    * key a real pipeline packs within), so no global sort exists and
    * sources pack in parallel; the manifest rollup reuses the same
    * (source)-keyed exchange.
    */
  private def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("dl"))
      .withColumn("cum", sum(col("dl")).over(w))
      .withColumn("bin", expr(s"(cum - dl) div $CtxTokens"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  private val sequencePackingOracle =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |o AS (
       |  SELECT source, doc_id, dl,
       |         sum(dl) OVER (PARTITION BY source ORDER BY doc_id
       |                       ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT source, CAST((cum - dl) // $CtxTokens AS BIGINT) AS bin,
       |       count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS n_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM o GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- boilerplate spans
  /** Per-document boilerplate ratio: the share of a doc's distinct
    * word-3-shingles that occur in at least one OTHER document — the
    * corpus-level repeated-span signal C4-style cleaning thresholds
    * on. Document frequency is a rollup OF the shingle table (shingle-
    * keyed, reused exchange) joined back on the shingle key; candidate
    * volume is the shingle table itself, never doc-pairs.
    */
  private def boilerplateSpans(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("shs", array_distinct(TextFunctions.wordShingles("toks", 3)))
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_shingles"))
      // QRound: integer ratio — exact-boundary class (ROUND_AUDIT U3)
      .withColumn("dup_ratio",
        QRound.col(col("n_dup_shingles").cast("double") / col("n_shingles"), 6))
  }

  private val boilerplateOracle =
    s"""WITH sh AS (
      |  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
      |    THEN list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |    ELSE [] END) AS sh
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
      |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
      |SELECT doc_id, count(*) AS n_shingles,
      |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
      |       ${QRound.duck("CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS dup_ratio
      |FROM sh JOIN df USING (sh)
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------ SCD Type-2
  /** SCD Type-2 history build over the event stream: consecutive
    * same-type events per user collapse into one validity interval
    * (gaps-and-islands change suppression), each interval closed by
    * the next change's start and the last left open (`is_current`).
    * All three window stages — change flag, island id, interval close
    * — partition by `user_id`, so the plan has ONE user-keyed exchange
    * and the interval rollup rides it. Timestamps surface as epoch
    * microseconds (exact BIGINTs both engines).
    */
  private def scd2UserState(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wIsl = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(wOrd).isNull ||
          col("event_type") =!= lag(col("event_type"), 1).over(wOrd), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(wRun))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("event_type"),
        min(unix_micros(col("ts"))).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wIsl))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1L).otherwise(0L))
  }

  private val scd2Oracle =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, event_id
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_type, ts_us, event_id,
      |         CASE WHEN lag(event_type) OVER w IS NULL
      |                OR event_type <> lag(event_type) OVER w
      |              THEN 1 ELSE 0 END AS chg
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |runs AS (
      |  SELECT user_id, event_type, ts_us,
      |         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      |  FROM flagged),
      |iv AS (
      |  SELECT user_id, run_id, min(event_type) AS event_type,
      |         CAST(min(ts_us) AS BIGINT) AS valid_from_us, count(*) AS n_events
      |  FROM runs GROUP BY 1, 2)
      |SELECT user_id, run_id, event_type, valid_from_us,
      |       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to_us,
      |       n_events,
      |       CAST(CASE WHEN lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
      |            THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM iv""".stripMargin

  // ------------------------------------------------ chunk-level dedup
  /** Exact dedup at the CHUNK level: the md5 chunk hashes from
    * `doc_chunking` rolled up to (canonical chunk, duplicate count,
    * distinct source docs) for every hash seen more than once — how a
    * pipeline dedups long documents whose full-text hashes differ but
    * whose windows repeat (quotes, boilerplate, templated spans).
    * Same plan family as dedup_exact, one level finer: the explode
    * rides the scan, the rollup is one hash-keyed exchange.
    */
  private def dedupChunks(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        posexplode(sequence(lit(1), size(col("toks")), lit(ChunkStride)))
          .as(Seq("chunk_idx", "start")),
        col("toks"))
      .withColumn("chunk_hash",
        md5(concat_ws(" ", slice(col("toks"), col("start"), lit(ChunkSize)))))
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_dups"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_dups") >= 2)
  }

  private val dedupChunksOracle =
    s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |ch AS (
       |  SELECT doc_id,
       |         CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_idx,
       |         md5(array_to_string(list_slice(w, start, start + ${ChunkSize - 1}), ' ')) AS chunk_hash
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1, $ChunkStride)) AS start FROM t) s)
       |SELECT chunk_hash, count(*) AS n_dups, count(DISTINCT doc_id) AS n_docs,
       |       min(doc_id) AS canonical_doc
       |FROM ch
       |GROUP BY 1 HAVING count(*) >= 2""".stripMargin

  // ------------------------------------------------------ forward fill
  /** Per-user forward fill (LOCF imputation): every event carries the
    * value of the user's most recent `purchase` — the feature-
    * engineering backfill that turns sparse signals into dense
    * training columns. One user-partitioned window (`last(...,
    * ignoreNulls)` over an unbounded-preceding frame); the carried
    * value is the raw stored double (no arithmetic), so equality is
    * bit-exact cross-engine. A deterministic 1-in-20 user sample keeps
    * the dumped result compact; the filter pushes to the scan.
    */
  private def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") % 20 === 0)
      .withColumn("pv",
        when(col("event_type") === "purchase", col("value")))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        last(col("pv"), ignoreNulls = true).over(w).as("last_purchase_value"))
  }

  private val forwardFillOracle =
    """SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type,
      |       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |         OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
      |               ROWS UNBOUNDED PRECEDING) AS last_purchase_value
      |FROM events
      |WHERE user_id % 20 = 0""".stripMargin

  // -------------------------------------------- incremental agg merge
  /** Incremental materialized-view maintenance: per-user lifetime
    * aggregates kept as MERGEABLE partials (count → sum, decimal sum →
    * sum, max → max), with a delta slice folded into the base partials
    * instead of recomputing from scratch. The merge is a union of two
    * partial tables + one re-aggregation on the view key — at 100 TB
    * the base partials are a compact keyed table and each refresh
    * touches only the delta, which is the entire point of the pattern.
    * The DuckDB oracle computes the view from raw events in one pass,
    * proving merge == full recompute exactly (decimal sums make the
    * fold order-independent).
    */
  private def incrementalAggMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").cast("decimal(18,2)").as("v"))
    // deterministic 80/20 base/delta slice by event_id — stands in for
    // "yesterday's partials" + "today's arrivals"
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("v")).as("sum_value"),
          max(col("ts_us")).as("last_ts_us"))
    val base = partials(e.filter(col("event_id") % 5 =!= 4))
    val delta = partials(e.filter(col("event_id") % 5 === 4))
    base.unionByName(delta)
      .groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"),
        // exact decimal merge; surfaced as double per the oracle
        // convention (DECIMAL(18,2) holds every partial exactly)
        sum(col("sum_value")).cast("decimal(18,2)").cast("double").as("sum_value"),
        max(col("last_ts_us")).as("last_ts_us"))
      // QRound, not native round (r15 FULL_ORACLE_sf10 finding): a mean
      // of 2-decimal values over a 2-5-smooth count lands EXACTLY on a
      // 7-digit half-boundary (4130.78/64 = 64.5434375), where Spark's
      // shortest-repr HALF_UP rounds up and DuckDB's binary round goes
      // down — 5 of 150k sf10 groups sampled it. See ROUND_AUDIT.md U3.
      .withColumn("avg_value",
        QRound.col(col("sum_value") / col("n_events"), 6))
  }

  private val incrementalAggOracle =
    s"""SELECT user_id, count(*) AS n_events,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value,
      |       CAST(max(epoch_ns(ts) // 1000) AS BIGINT) AS last_ts_us,
      |       ${QRound.duck("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)", 6)} AS avg_value
      |FROM events
      |GROUP BY 1""".stripMargin

  // ------------------------------------- content-defined chunking
  private val CdcMod = 8L // boundary when md5(token) % 8 == 0 → mean chunk ≈ 8 tokens

  /** Content-defined chunking (the FastCDC/rsync family): a chunk
    * boundary falls AFTER any token whose hash ≡ 0 (mod 8), so
    * boundaries are decided by content alone — unlike fixed-stride
    * `doc_chunking`, an insertion near the front shifts every later
    * fixed chunk but leaves all content-defined chunks after the next
    * boundary untouched (the self-synchronizing property dedup storage
    * systems rely on). Segment ids are a strictly-before running sum of
    * boundary flags on one doc-partitioned window; chunk reconstruction
    * is the same doc+segment rollup as `substring_scrub`'s rebuild; the
    * `shared` flag (chunk content seen in ≥2 docs) comes from one
    * chunk-hash rollup joined back — explode → window → two rollups,
    * everything partitioned by doc or chunk hash, nothing global.
    */
  private def contentDefinedChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** Frame-level CDC chunking over any (doc_id, text) frame — split out
    * so the self-synchronizing property is directly testable: chunk a
    * shifted corpus and compare hash sets against the original.
    */
  def cdcChunksOf(docs: DataFrame): DataFrame = {
    // Chunk spans are derived WITHIN each source row by array
    // higher-order functions (the winnowing-fingerprint precedent,
    // r16): boundary positions -> spans -> per-span slice+hash, all
    // inside whole-stage codegen. The r15 form exploded every token
    // through a doc-partitioned window cumsum and then REBUILT chunks
    // with a collect_list+sort shuffle — two token-volume exchanges and
    // a per-doc sort just to recover adjacency the row already held.
    // Outputs are bit-identical: same boundary rule (md5(token) mod 8
    // after the token), same 1-based chunk_idx = #boundaries strictly
    // before the chunk, same space-joined md5 chunk hash.
    val chunks = docs
      .withColumn("toks", TextFunctions.tokens(col("text")))
      // 1-based positions of tokens a chunk ENDS on; a final partial
      // chunk ends on the last token even without a boundary there
      .withColumn("ends", expr(
        s"""filter(transform(toks, (t, i) ->
           |  IF(CAST(conv(substr(md5(t), 1, 8), 16, 10) AS LONG) % $CdcMod = 0,
           |     CAST(i + 1 AS LONG), CAST(0 AS LONG))), x -> x > 0)""".stripMargin))
      .withColumn("ends", expr(
        """CASE WHEN size(toks) <= 0 THEN array()
          |WHEN size(ends) > 0 AND element_at(ends, -1) = size(toks) THEN ends
          |ELSE concat(ends, array(CAST(size(toks) AS LONG))) END""".stripMargin))
      .select(col("doc_id"), col("toks"), explode(expr(
        """transform(ends, (e, k) -> named_struct(
          |  'chunk_idx', CAST(k + 1 AS LONG),
          |  'start', IF(k = 0, CAST(1 AS LONG), element_at(ends, k) + CAST(1 AS LONG)),
          |  'end', e))""".stripMargin)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        (col("c.end") - col("c.start") + lit(1L)).as("n_tokens"),
        md5(array_join(expr(
          "slice(toks, CAST(c.start AS INT), CAST(c.end - c.start + 1 AS INT))"), " "))
          .as("chunk_hash"))
    val dupes = chunks.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .select(col("chunk_hash"), (col("nd") >= 2).as("shared"))
    chunks.join(dupes, "chunk_hash")
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("chunk_hash"), col("shared"))
  }

  private val contentDefinedChunksOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, u.p AS p, u.tok AS tok,
       |         CASE WHEN CAST(CAST('0x' || substr(md5(u.tok), 1, 8) AS UBIGINT) AS BIGINT)
       |                   % $CdcMod = 0 THEN 1 ELSE 0 END AS b
       |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
       |          i -> struct_pack(p := i, tok := w[i]))) AS u
       |        FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)) t),
       |seg AS (
       |  SELECT doc_id, p, tok,
       |         coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY p
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
       |  FROM tok),
       |chunks AS (
       |  SELECT doc_id, seg + 1 AS chunk_idx, CAST(count(*) AS BIGINT) AS n_tokens,
       |         md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_hash
       |  FROM seg GROUP BY 1, 2),
       |dupes AS (
       |  SELECT chunk_hash, count(DISTINCT doc_id) >= 2 AS shared
       |  FROM chunks GROUP BY 1)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, n_tokens, chunk_hash, shared
       |FROM chunks JOIN dupes USING (chunk_hash)""".stripMargin

  // ------------------------------------------- corpus snapshot diff
  /** Release-to-release corpus diff — the regression report a dataset
    * pipeline publishes with every snapshot: per-doc status derived
    * from CONTENT (full-outer join on doc_id, content-hash compare),
    * never from knowledge of how the snapshot was produced. The
    * second snapshot is derived deterministically from the corpus
    * (doc_id%11==3 removed, %11==5 revised, %11==7 cloned under a new
    * id — the dedup_incremental precedent for in-env snapshots); the
    * QUERY sees only the two (doc_id, text) frames. One co-partitioned
    * full-outer join on the id, hashes computed in the scan projection
    * — at 100 TB both sides bucket by doc_id and the join is
    * shuffle-free.
    */
  private def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val snapA = docs.select(col("doc_id"), md5(col("text")).as("ha"))
    val bBase = docs.filter(pmod(col("doc_id"), lit(11)) =!= 3)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(11)) === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    val bAdd = docs.filter(pmod(col("doc_id"), lit(11)) === 7)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val snapB = bBase.select(col("doc_id"), col("text")).union(bAdd)
      .select(col("doc_id"), md5(col("text")).as("hb"))
    snapA.join(snapB, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged").as("status"))
  }

  private val corpusDiffOracle =
    """WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents),
      |b AS (
      |  SELECT doc_id, md5(CASE WHEN doc_id % 11 = 5 THEN text || ' rev2' ELSE text END) AS hb
      |  FROM documents WHERE doc_id % 11 != 3
      |  UNION ALL
      |  SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id % 11 = 7)
      |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |       CASE WHEN a.doc_id IS NULL THEN 'added'
      |            WHEN b.doc_id IS NULL THEN 'removed'
      |            WHEN ha != hb THEN 'changed'
      |            ELSE 'unchanged' END AS status
      |FROM a FULL OUTER JOIN b USING (doc_id)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("ngram_counts", Some(ngramCountsOracle), ngramCounts),
    GraftQuery("content_defined_chunks", Some(contentDefinedChunksOracle), contentDefinedChunks),
    GraftQuery("corpus_diff", Some(corpusDiffOracle), corpusDiff),
    GraftQuery("doc_chunking", Some(docChunkingOracle), docChunking),
    GraftQuery("sequence_packing", Some(sequencePackingOracle), sequencePacking),
    GraftQuery("boilerplate_spans", Some(boilerplateOracle), boilerplateSpans),
    GraftQuery("scd2_user_state", Some(scd2Oracle), scd2UserState),
    GraftQuery("forward_fill", Some(forwardFillOracle), forwardFill),
    GraftQuery("incremental_agg_merge", Some(incrementalAggOracle), incrementalAggMerge),
    GraftQuery("dedup_chunks", Some(dedupChunksOracle), dedupChunks),
  )
}
