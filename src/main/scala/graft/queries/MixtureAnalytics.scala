package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Data-mixture diagnostics: the information-theoretic and sampling
  * operators that decide WHAT goes into a training mix —
  *
  *  - per-document unigram entropy (gibberish / repetition signal),
  *  - per-source KL divergence from the corpus distribution (which
  *    sources skew the mix),
  *  - weight-proportional sampling without replacement (importance
  *    sampling for mixture construction).
  *
  * Determinism discipline: every entropy/divergence term is a double
  * computed from exact integer counts, quantized to DECIMAL(38,12)
  * BEFORE the per-group sum — decimal addition is order-independent,
  * so the fold needs no sorted collect and scales to any group size.
  * Sampling keys derive from md5 (identical hex cross-engine).
  */
object MixtureAnalytics {

  private def toks(text: Column): Column = split(trim(text), " ")

  // ------------------------------------------------------- doc entropy
  /** Per-document unigram (Shannon) entropy in nats, plus the
    * normalized form (entropy / ln(distinct_terms), 1.0 for uniform):
    * low-entropy documents are repetition-heavy — the cheap quality
    * gate before expensive model-based scoring. One explode → one
    * (doc,term) rollup; the per-doc total rides a doc-partitioned
    * window on the same exchange the final rollup reuses.
    */
  private def docEntropy(spark: SparkSession, dir: String): DataFrame = {
    // (r17) per-doc term counts AND the doc total are within-row (fused
    // tokenCounts RLE + array size): the per-occurrence exchange and the
    // doc-partitioned window both disappear — only the final per-doc
    // rollup shuffles, one row per distinct term (§2.3/§2.4).
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n"),
        explode(graft.plans.TextExpressions.tokenCounts(col("w"))).as("s"))
      .select(col("doc_id"), col("n"), col("s.c").as("c"))
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("term_ent",
        round(-col("p") * log(col("p")), 12).cast(DecimalType(38, 12)))
      .groupBy(col("doc_id"))
      // QRound on the final: a sum of 12-decimal quantized terms is a
      // terminating decimal that can land exactly on the 7-digit half
      // (ROUND_AUDIT U3)
      .agg(count(lit(1)).as("n_distinct"),
        max(col("n")).as("n_tokens"),
        QRound.col(sum(col("term_ent")).cast("double"), 6).as("entropy"))
      // QRound for uniformity with the U3 sweep: the ln(n_distinct)
      // denominator is irrational so a knife edge is unlikely, but the
      // ratio is still a rational-valued rounding surface by the
      // four-class rule (ADVICE r15)
      .withColumn("norm_entropy",
        when(col("n_distinct") > 1,
          QRound.col(col("entropy") / log(col("n_distinct").cast("double")), 6))
          .otherwise(lit(0.0)))
  }

  private val docEntropyOracle =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents),
      |tc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
      |p AS (
      |  SELECT doc_id, t, c, sum(c) OVER (PARTITION BY doc_id) AS n
      |  FROM tc),
      |e AS (
      |  SELECT doc_id, n,
      |         CAST(round(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 12)
      |              AS DECIMAL(38,12)) AS term_ent
      |  FROM p)
      |SELECT doc_id, count(*) AS n_distinct, CAST(max(n) AS BIGINT) AS n_tokens,
      |       ${QRound.duck("CAST(sum(term_ent) AS DOUBLE)", 6)} AS entropy,
      |       CASE WHEN count(*) > 1
      |            THEN ${QRound.duck(QRound.duck("CAST(sum(term_ent) AS DOUBLE)", 6) + " / ln(CAST(count(*) AS DOUBLE))", 6)}
      |            ELSE 0.0 END AS norm_entropy
      |FROM e GROUP BY 1""".stripMargin

  // ------------------------------------------------ source divergence
  /** KL(source ‖ corpus) over unigram distributions: how far each
    * source's language drifts from the corpus mix — the signal that
    * reweights or caps a source. Term tables are term-partitioned
    * rollups; the corpus distribution joins back on the term key;
    * totals broadcast. Contributions quantize to decimal before the
    * per-source sum (order-independent at any vocabulary size).
    */
  private def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    // (r17) per-(source, term) counts = Σ of per-doc counts: the fused
    // tokenCounts RLE feeds the rollup one row per distinct term per doc
    // instead of one per occurrence — same sums (§2.3).
    val tok = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.plans.TextExpressions.tokenCounts(toks(col("text")))).as("s"))
    val bySrc = tok.groupBy(col("source"), col("s.t").as("t"))
      .agg(sum(col("s.c")).as("cs"))
    val srcTot = bySrc.groupBy(col("source")).agg(sum(col("cs")).as("ns"))
    val global = bySrc.groupBy(col("t")).agg(sum(col("cs")).as("cg"))
    val gTot = global.agg(sum(col("cg")).as("ng"))
    bySrc
      .join(global, "t")
      .join(srcTot, "source")
      .crossJoin(broadcast(gTot))
      .withColumn("ps", col("cs").cast("double") / col("ns"))
      .withColumn("pg", col("cg").cast("double") / col("ng"))
      .withColumn("kl_term",
        round(col("ps") * log(col("ps") / col("pg")), 12).cast(DecimalType(38, 12)))
      .groupBy(col("source"))
      // QRound on the final: sum of 12-decimal terms — exact-boundary
      // class (U3) and tiny-negative signed-zero class (U2)
      .agg(count(lit(1)).as("n_terms"),
        max(col("ns")).as("n_tokens"),
        QRound.col(sum(col("kl_term")).cast("double"), 6).as("kl_divergence"))
  }

  private val sourceDivergenceOracle =
    s"""WITH tok AS (
      |  SELECT source, unnest(string_split(trim(text), ' ')) AS t FROM documents),
      |bs AS (SELECT source, t, count(*) AS cs FROM tok GROUP BY 1, 2),
      |st AS (SELECT source, sum(cs) AS ns FROM bs GROUP BY 1),
      |g AS (SELECT t, sum(cs) AS cg FROM bs GROUP BY 1),
      |gt AS (SELECT sum(cg) AS ng FROM g),
      |k AS (
      |  SELECT bs.source, st.ns,
      |         CAST(round((CAST(cs AS DOUBLE) / ns) *
      |                ln((CAST(cs AS DOUBLE) / ns) / (CAST(cg AS DOUBLE) / ng)), 12)
      |              AS DECIMAL(38,12)) AS kl_term
      |  FROM bs JOIN g USING (t) JOIN st USING (source) CROSS JOIN gt)
      |SELECT source, count(*) AS n_terms, CAST(max(ns) AS BIGINT) AS n_tokens,
      |       ${QRound.duck("CAST(sum(kl_term) AS DOUBLE)", 6)} AS kl_divergence
      |FROM k GROUP BY 1""".stripMargin

  // ------------------------------------------------- weighted sampling
  private val SampleK = 50

  /** Weight-proportional sampling without replacement (Efraimidis–
    * Spirakis): key = -ln(u)/w with u an md5-derived uniform, keep the
    * k smallest keys. Deterministic (rerun- and partition-stable),
    * and the top-k is a TakeOrderedAndProject — a per-partition heap,
    * no global sort, no per-group state. The mixture-construction
    * sampler: longer documents (weight = n_chars) are proportionally
    * more likely, yet every document has a nonzero chance.
    */
  private def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      // u in (0,1]: (h+1) / 2^32 over the first 8 md5 hex chars
      .withColumn("u",
        (expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS LONG)") + 1.0)
          / 4294967296.0)
      .withColumn("skey", round(-log(col("u")) / col("n_chars"), 12))
      .orderBy(col("skey"), col("doc_id"))
      .limit(SampleK)
      .select(col("doc_id"), col("source"), col("n_chars"), col("skey"))
  }

  private val weightedSampleOracle =
    s"""SELECT doc_id, source, n_chars,
       |       round(-ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) + 1.0)
       |                 / 4294967296.0) / n_chars, 12) AS skey
       |FROM documents
       |ORDER BY skey, doc_id
       |LIMIT $SampleK""".stripMargin

  // ------------------------------------------- percentile normalization
  /** Quantile normalization: each event's value mapped to its
    * percent-rank within its event type (uniform [0,1] feature, robust
    * to outliers and scale). One type-partitioned sort; the unique
    * (value, event_id) order makes ranks deterministic cross-engine.
    * Deterministic 1-in-20 user sample bounds the dump.
    */
  private def percentileNormalization(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id") % 20 === 0)
      // QRound: percent_rank = (rank-1)/(n-1), an integer ratio —
      // exact-boundary class (ROUND_AUDIT U3)
      .select(col("event_id"), col("event_type"), col("value"),
        QRound.col(percent_rank().over(w), 6).as("pct_rank"))
  }

  private val percentileNormOracle =
    s"""SELECT event_id, event_type, value,
      |       ${QRound.duck(
          "percent_rank() OVER (PARTITION BY event_type " +
            "ORDER BY value, event_id)", 6)} AS pct_rank
      |FROM events
      |WHERE user_id % 20 = 0""".stripMargin

  // ----------------------------------------------- LOO target encoding
  /** Leave-one-out target encoding of the event type: each event's
    * feature is the mean `value` of all OTHER events of its type —
    * (group_sum − own) / (n − 1) — the categorical encoding that
    * avoids leaking a row's own target. Group sums are decimal-exact
    * window aggregates on ONE type-partitioned exchange; singleton
    * groups (no "others") yield NULL on both engines. Same 1-in-20
    * sample discipline; note the sample is applied AFTER the group
    * statistics so the encoding reflects the full population.
    */
  private def targetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
    Tables.events(spark, dir)
      .withColumn("gs",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .withColumn("gn", count(lit(1)).over(w))
      .filter(col("user_id") % 20 === 0)
      // QRound: (2-decimal sum) / (count-1) — exact-boundary class
      // (ROUND_AUDIT U3); the gn>1 guard keeps the input finite
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("gn") > 1,
          QRound.col((col("gs") - col("value")) / (col("gn") - 1), 6))
          .otherwise(lit(null)).as("loo_mean"))
  }

  private val targetEncodingOracle =
    s"""WITH g AS (
      |  SELECT event_id, event_type, value, user_id,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS gs,
      |         count(*) OVER w AS gn
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type))
      |SELECT event_id, event_type, value,
      |       CASE WHEN gn > 1 THEN ${QRound.duck("(gs - value) / (gn - 1)", 6)} END AS loo_mean
      |FROM g
      |WHERE user_id % 20 = 0""".stripMargin

  // --------------------------------------------------- DSIR selection
  private val DsirBuckets = 1024
  private val DsirTarget = "src0"
  private val DsirAddK = 0.5

  /** DSIR — Data Selection via Importance Resampling (Xie et al.
    * 2023): rank the raw pool by how target-like it looks under
    * hashed n-gram feature distributions, select the top fifth. The
    * feature space is fixed at [[DsirBuckets]] md5-hashed unigram
    * buckets, so BOTH distribution estimates are bucket-count rollups
    * bounded by the bucket space, never the corpus; the per-doc score
    * logw = Σ_b c_db·(ln p̂_target(b) − ln p̂_raw(b)) quantizes each
    * term to DECIMAL(38,12) before the doc fold (order-independent),
    * with add-k smoothing so unseen buckets stay finite. Selection is
    * the same scale-safe rank as ngram_lm_perplexity: a value-
    * histogram cumsum (bounded by the 6-decimal value space) plus a
    * within-value row_number — no global sort of the pool; the top-20%
    * cut is exact integer arithmetic rank·5 ≤ N. The paper resamples
    * with Gumbel noise; the deterministic top-k variant keeps an exact
    * cross-engine oracle, and a seeded Gumbel column would bolt on as
    * one more md5-derived uniform.
    */
  private def dsirSelection(spark: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val bCol = expr("CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)") % DsirBuckets
    // (r17) per-doc bucket counts = Σ of per-doc TERM counts over the
    // term→bucket map: the fused tokenCounts RLE hashes each DISTINCT
    // term once (md5 was the hot per-occurrence cost) and the bucket
    // rollup sums pre-counted rows (§2.3; same counts by construction).
    val dgb = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(graft.plans.TextExpressions.tokenCounts(toks(col("text")))).as("s"))
      .select(col("doc_id"), col("source"), col("s.t").as("t"), col("s.c").as("tc"))
      .select(col("doc_id"), col("source"), bCol.as("b"), col("tc"))
      .groupBy(col("doc_id"), col("source"), col("b")).agg(sum(col("tc")).as("c"))
      .localCheckpoint() // read by both distribution rollups + scoring
    val ct = dgb.filter(col("source") === DsirTarget)
      .groupBy(col("b")).agg(sum(col("c")).as("tc"))
    val cr = dgb.filter(col("source") =!= DsirTarget)
      .groupBy(col("b")).agg(sum(col("c")).as("rc"))
    val nt = ct.agg(coalesce(sum(col("tc")), lit(0L)).as("ntot"))
    val nr = cr.agg(coalesce(sum(col("rc")), lit(0L)).as("rtot"))
    val lam = dgb.select(col("b")).distinct()
      .join(ct, Seq("b"), "left").join(cr, Seq("b"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        (log((coalesce(col("tc"), lit(0L)) + DsirAddK) /
             (col("ntot") + lit(DsirBuckets) * DsirAddK)) -
         log((coalesce(col("rc"), lit(0L)) + DsirAddK) /
             (col("rtot") + lit(DsirBuckets) * DsirAddK))).as("lam"))
    val doc = dgb.filter(col("source") =!= DsirTarget)
      .join(lam, "b")
      .withColumn("term", round(col("c") * col("lam"), 12).cast(DecimalType(38, 12)))
      .groupBy(col("doc_id"), col("source"))
      // QRound, not native round (r15 FULL_ORACLE_sf10 finding): a doc
      // whose decimal term-sum is a TINY NEGATIVE rounds to 0.0 in
      // Spark (BigDecimal has no signed zero) but -0.0 in DuckDB (IEEE
      // keeps the sign) — repr-exact compares split on the sign of
      // zero. QRound's floor form lands both engines on +0.0.
      .agg(sum(col("c")).as("n_feats"),
        QRound.col(sum(col("term")).cast("double"), 6).as("logw"))
      // one row per scored doc, read by the histogram, the total, and
      // the final decorate — materialize instead of re-scoring thrice
      .localCheckpoint()
    val hist = doc.groupBy(col("logw")).agg(count(lit(1)).as("cnt"))
      .withColumn("above", coalesce(
        sum(col("cnt")).over(W.orderBy(col("logw").desc)
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("logw"), col("above"))
    val total = doc.agg(count(lit(1)).as("n"))
    doc.join(hist, "logw")
      .withColumn("rk", col("above") +
        row_number().over(W.partitionBy(col("logw")).orderBy(col("doc_id"))))
      .crossJoin(broadcast(total))
      .withColumn("selected", col("rk") * 5 <= col("n"))
      .select(col("doc_id"), col("source"), col("n_feats"), col("logw"),
        col("rk"), col("selected"))
  }

  private val dsirOracle =
    s"""WITH dgb AS (
       |  SELECT doc_id, source, b, count(*) AS c FROM (
       |    SELECT doc_id, source,
       |           CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT) % $DsirBuckets AS b
       |    FROM (SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS t
       |          FROM documents) u) v
       |  GROUP BY 1, 2, 3),
       |ct AS (SELECT b, sum(c) AS tc FROM dgb WHERE source = '$DsirTarget' GROUP BY 1),
       |cr AS (SELECT b, sum(c) AS rc FROM dgb WHERE source <> '$DsirTarget' GROUP BY 1),
       |nt AS (SELECT coalesce(sum(tc), 0) AS ntot FROM ct),
       |nr AS (SELECT coalesce(sum(rc), 0) AS rtot FROM cr),
       |lam AS (
       |  SELECT allb.b,
       |         ln((coalesce(ct.tc, 0) + $DsirAddK) / (nt.ntot + $DsirBuckets * $DsirAddK)) -
       |         ln((coalesce(cr.rc, 0) + $DsirAddK) / (nr.rtot + $DsirBuckets * $DsirAddK)) AS lam
       |  FROM (SELECT DISTINCT b FROM dgb) allb
       |  LEFT JOIN ct ON allb.b = ct.b
       |  LEFT JOIN cr ON allb.b = cr.b
       |  CROSS JOIN nt CROSS JOIN nr),
       |doc AS (
       |  SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n_feats,
       |         ${QRound.duck("CAST(sum(CAST(round(c * lam, 12) AS DECIMAL(38,12))) AS DOUBLE)", 6)} AS logw
       |  FROM dgb JOIN lam USING (b)
       |  WHERE source <> '$DsirTarget'
       |  GROUP BY 1, 2),
       |tot AS (SELECT count(*) AS n FROM doc),
       |r AS (SELECT doc.*, row_number() OVER (ORDER BY logw DESC, doc_id) AS rk FROM doc)
       |SELECT doc_id, source, n_feats, logw, rk, rk * 5 <= n AS selected
       |FROM r CROSS JOIN tot""".stripMargin

  // ------------------------------------------ temperature mixture
  /** α-temperature mixture allocation (the XLM-R / mT5 sampling rule,
    * α = 0.5): source s gets share n_s^α / Σ n_t^α of the token
    * budget, flattening the natural size distribution so small
    * sources aren't drowned. α = 0.5 makes the power an IEEE-exact
    * `sqrt` (bit-identical both engines, unlike pow); the per-source
    * sqrts quantize to DECIMAL(38,9) before the total so the
    * denominator folds order-independently. Budget = half the corpus
    * tokens. Everything downstream of the per-source token rollup is
    * arithmetic on one source-count frame — at 100 TB the only real
    * work is the one corpus scan + per-source sum; `epochs` > 1 on a
    * source means the budget upsamples it (the number a mixture
    * designer actually reads).
    */
  private def mixtureAlphaSample(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(spark, dir)
      .select(col("source"), size(toks(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("s", round(sqrt(col("n_tokens").cast("double")), 9)
        .cast(DecimalType(38, 9)))
    val tot = bySrc.agg(sum(col("s")).as("stot"), sum(col("n_tokens")).as("ntot"))
    // QRound on share and epochs: DECIMAL(38,9)/DECIMAL(38,9) reduces
    // to an integer ratio — exact-boundary class (ROUND_AUDIT U3)
    bySrc.crossJoin(broadcast(tot))
      .withColumn("share",
        QRound.col(col("s").cast("double") / col("stot").cast("double"), 6))
      .withColumn("alloc_tokens",
        floor(col("share") * floor(col("ntot") / 2)).cast("long"))
      .withColumn("epochs",
        QRound.col(col("alloc_tokens").cast("double") / col("n_tokens"), 6))
      .select(col("source"), col("n_tokens"), col("share"),
        col("alloc_tokens"), col("epochs"))
  }

  private val mixtureAlphaOracle = {
    val share = QRound.duck("CAST(s AS DOUBLE) / CAST(stot AS DOUBLE)", 6)
    s"""WITH bysrc AS (
      |  SELECT source, sum(len(string_split(trim(text), ' '))) AS n_tokens
      |  FROM documents GROUP BY 1),
      |q AS (SELECT source, n_tokens,
      |             CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 9) AS DECIMAL(38,9)) AS s
      |      FROM bysrc),
      |tot AS (SELECT sum(s) AS stot, sum(n_tokens) AS ntot FROM q)
      |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |       $share AS share,
      |       CAST(floor($share * floor(ntot / 2)) AS BIGINT) AS alloc_tokens,
      |       ${QRound.duck(s"CAST(floor($share * floor(ntot / 2)) AS DOUBLE) / n_tokens", 6)} AS epochs
      |FROM q CROSS JOIN tot""".stripMargin
  }

  // --------------------------------------------- mixture manifest
  /** The α-temperature mixture OPERATIONALIZED: per-source token
    * allocations from [[mixtureAlphaSample]] (reused, not re-derived)
    * turned into the actual document selection a pipeline materializes.
    * Within each source, docs enter in rerun-stable md5 order and are
    * kept while the running token total stays inside the source's
    * allocation (inclusive cut: the doc that would cross the budget is
    * dropped). One source-partitioned window carries both the rank and
    * the running sum — a single per-source sort, never a global one —
    * and the one-row-per-source allocation frame broadcasts onto the
    * corpus scan.
    * Together with `training_order` this completes the path from
    * mixture DESIGN (shares) to mixture DELIVERY (the doc manifest).
    */
  private def mixtureManifest(spark: SparkSession, dir: String): DataFrame = {
    val alloc = mixtureAlphaSample(spark, dir)
      .select(col("source"), col("alloc_tokens"))
    val wSel = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .withColumn("sel_rank", row_number().over(wSel).cast("long"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(wSel.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(alloc), "source")
      .filter(col("cum_tokens") <= col("alloc_tokens"))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("sel_rank"), col("cum_tokens"))
  }

  private val mixtureManifestOracle =
    s"""WITH alloc AS ($mixtureAlphaOracle),
       |sel AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
       |         CAST(row_number() OVER w AS BIGINT) AS sel_rank,
       |         CAST(sum(len(string_split(trim(text), ' '))) OVER w AS BIGINT) AS cum_tokens
       |  FROM documents
       |  WINDOW w AS (PARTITION BY source
       |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT source, doc_id, sel.n_tokens AS n_tokens, sel_rank, cum_tokens
       |FROM sel JOIN alloc USING (source)
       |WHERE cum_tokens <= alloc_tokens""".stripMargin

  // ------------------------------------------------ training order
  /** Curriculum-ordered training manifest: within each source, docs
    * ascend by difficulty (n_chars — the cheap proxy; swap the join
    * key for ngram_lm_perplexity's cross_entropy when model-based
    * difficulty is wanted); sources interleave in strides so no
    * window of the schedule is single-source. The global position is
    * ARITHMETIC — (src_rank−1)·n_src + src_index — not a global sort:
    * per-source ranks ride source-partitioned windows (distributed),
    * the source index is a broadcast-scale frame, and the schedule is
    * rerun-stable. NOTE: global_pos is a SPARSE total order, not a
    * dense permutation — once a smaller source exhausts, its stride
    * slots stay empty (positions remain unique and monotone per
    * source, which is all a sort-by-position trainer needs; a dense
    * renumbering would cost a global window over the whole corpus).
    * This is the last artifact a data pipeline emits — the order the
    * trainer actually consumes.
    */
  private def trainingOrder(spark: SparkSession, dir: String): DataFrame = {
    val srcIdx = Tables.documents(spark, dir).select(col("source")).distinct()
      .withColumn("si",
        row_number().over(Window.orderBy(col("source"))).cast("long") - 1)
      .withColumn("nsrc", count(lit(1)).over(
        Window.partitionBy().orderBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
      .withColumn("src_rank", row_number().over(wSrc).cast("long"))
      .join(broadcast(srcIdx), "source")
      .withColumn("global_pos", (col("src_rank") - 1) * col("nsrc") + col("si"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("src_rank"), col("global_pos"))
  }

  private val trainingOrderOracle =
    """WITH si AS (
      |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS si,
      |         count(*) OVER () AS nsrc
      |  FROM (SELECT DISTINCT source FROM documents)),
      |r AS (
      |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
      |         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS src_rank
      |  FROM documents)
      |SELECT r.doc_id, r.source, r.n_chars, r.src_rank,
      |       (r.src_rank - 1) * si.nsrc + si.si AS global_pos
      |FROM r JOIN si USING (source)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("dsir_selection", Some(dsirOracle), dsirSelection),
    GraftQuery("mixture_alpha_sample", Some(mixtureAlphaOracle), mixtureAlphaSample),
    GraftQuery("mixture_manifest", Some(mixtureManifestOracle), mixtureManifest),
    GraftQuery("training_order", Some(trainingOrderOracle), trainingOrder),
    GraftQuery("doc_entropy", Some(docEntropyOracle), docEntropy),
    GraftQuery("source_divergence", Some(sourceDivergenceOracle), sourceDivergence),
    GraftQuery("weighted_sample", Some(weightedSampleOracle), weightedSample),
    GraftQuery("percentile_normalization", Some(percentileNormOracle), percentileNormalization),
    GraftQuery("target_encoding", Some(targetEncodingOracle), targetEncoding),
  )
}
