package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Corpus-mining tier: the term-weighting and clustering operators a
  * training-data pipeline runs after cleaning — TF-IDF keyword
  * extraction, BM25 retrieval scoring, and k-means over embeddings
  * (the operator that trains an IVF index's coarse quantizer).
  *
  * Determinism: IDF/BM25 logs are doubles computed from exact integer
  * counts (identical inputs both engines) and rounded to 6 decimals
  * before any ranking; BM25's per-document sum quantizes each term's
  * contribution to DECIMAL(28,9) first so the 3-term addition is
  * order-independent; k-means centroid updates are the IVF
  * decimal-sum-per-dimension pattern, and every argmin is pinned by
  * round(dist, 6) + centroid-id tiebreak.
  */
object CorpusMining {

  /** Tokens: lowercase alpha-numeric runs. The same RE2-safe class
    * splits in Spark (Java regex) and DuckDB (RE2) identically.
    */
  private def tokensCol: Column =
    filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= lit(""))

  private val duckToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  // -------------------------------------------------------------- TF-IDF
  /** Top-5 TF-IDF terms per document. One explode pass builds the
    * (doc, term) frequency table; document frequency is a rollup OF
    * that table (same exchange, reused by AQE); the vocabulary-sized
    * df side broadcasts back onto tf, so the per-doc ranking is the
    * only doc-keyed shuffle. At 100 TB tf is huge but stays
    * (doc,term)-partitioned end-to-end; df/N are vocabulary/scalar
    * sized — exactly the sides that broadcast.
    */
  private def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    // per-doc term counts are complete WITHIN the row: the fused
    // tokenCounts RLE emits the identical (doc_id, term, tf) rows the
    // old explode → groupBy(doc_id, term) rollup produced, without
    // shuffling one row per token occurrence (r17, guide §2.3/§2.4)
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.plans.TextExpressions.tokenCounts(tokensCol)).as("s"))
      .select(col("doc_id"), col("s.t").as("term"), col("s.c").as("tf"))
    // ln((N+1)/(df+1)) depends only on the term — hoist it into the
    // vocabulary-sized df table (identical expression over identical
    // long inputs → bit-identical double), so the per-(doc,term) row
    // pays one multiply instead of one ln.
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))))
      .select(col("term"), col("df"),
        log((col("n_docs") + 1.0) / (col("df") + 1.0)).as("lnidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_r").desc, col("term"))
    // no broadcast hint on dfT: vocabulary size is unbounded at corpus
    // scale, so let AQE pick broadcast vs shuffle from the actual size
    // (a forced hint would bypass the threshold and can OOM at 100 TB)
    tf.join(dfT, "term")
      .withColumn("tfidf_r", round(col("tf") * col("lnidf"), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf_r"), col("rn"))
  }

  private val tfidfOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, t.term
       |  FROM documents, unnest($duckToks) AS t(term)),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT doc_id, term, tf, df, tfidf_r, rn FROM (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf_r,
       |         row_number() OVER (
       |           PARTITION BY tf.doc_id
       |           ORDER BY round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) DESC, tf.term) AS rn
       |  FROM tf JOIN df USING (term) CROSS JOIN n) s
       |WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------------------- BM25
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25Terms = Seq("spark", "window", "join")

  /** BM25 retrieval scoring: top-20 documents for a fixed 3-term
    * query. Term statistics (df, avgdl, N) are tiny and broadcast;
    * the only doc-keyed work is the per-doc length rollup and the
    * filtered tf — the query-term filter lands BEFORE the tf group-by,
    * so the scored side is |docs containing a query term|, not the
    * full posting table. Each term's contribution quantizes to
    * DECIMAL(28,9) before the per-doc sum, making the 3-double
    * addition order-independent cross-engine.
    */
  /** BM25 per-doc scores WITHOUT the final top-k, so retrieval
    * compositions (hybrid_search_rrf) can reuse the exact same scored
    * frame the registered `bm25_search` ranks.
    */
  /** Memoized per (session, dir) (r16): the scored frame is read by
    * `bm25_search` AND both hybrid-RRF fusions — a retrieval stack
    * scores the lexical list once per corpus. `bm25_search` registers
    * ahead of the fusions, so each bench pass pays the build there.
    */
  private[queries] def bm25Scored(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "bm25_scored")(bm25ScoredFresh(spark, dir))

  private def bm25ScoredFresh(spark: SparkSession, dir: String): DataFrame = {
    // dl is WITHIN-ROW (array size); the old explode → groupBy(doc_id)
    // rollup emitted no row for token-less docs, mirrored here by the
    // dl > 0 filter. tf for the 3 query terms is within-row too (fused
    // tokenCounts RLE — identical rows, no per-occurrence shuffle, r17)
    val dl = Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokensCol).cast("long").as("dl"))
      .filter(col("dl") > 0)
    // avgdl = exact BIGINT sum / exact count — one double division
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n_docs"))
    val tfq = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(graft.plans.TextExpressions.tokenCounts(
        filter(tokensCol, t => t.isInCollection(Bm25Terms)))).as("s"))
      .select(col("doc_id"), col("s.t").as("term"), col("s.c").as("tf"))
    val dfq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tfq.join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c",
        col("idf") * (col("tf") * (Bm25K1 + 1.0)) /
          (col("tf") + lit(Bm25K1) *
            (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
    contrib
      .groupBy(col("doc_id"))
      // QRound on the final: a sum of 9-decimal quantized terms is a
      // terminating decimal — exact-boundary class (ROUND_AUDIT U3)
      .agg(
        QRound.col(sum(round(col("c"), 9).cast(DecimalType(28, 9))).cast("double"), 6)
          .as("score"),
        count(lit(1)).as("n_terms"))
  }

  private def bm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25Scored(spark, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  /** The WITH-clause body shared by the bm25 oracle and the
    * hybrid-fusion oracle (same scoring, reused verbatim so the two
    * oracles can't drift apart).
    */
  private[queries] val bm25OracleScoredCtes =
    s"""toks AS (
       |  SELECT doc_id, t.term
       |  FROM documents, unnest($duckToks) AS t(term)),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl, count(*) AS n_docs FROM dl),
       |tfq AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
       |  WHERE term IN ('spark', 'window', 'join') GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY 1),
       |contrib AS (
       |  SELECT tfq.doc_id,
       |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * (tf * (${Bm25K1} + 1.0))
       |      / (tf + ${Bm25K1} * (1.0 - ${Bm25B} + ${Bm25B} * dl.dl / avgdl)) AS c
       |  FROM tfq JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
       |bm25_scored AS (
       |  SELECT doc_id,
       |         ${QRound.duck("CAST(SUM(CAST(round(c, 9) AS DECIMAL(28,9))) AS DOUBLE)", 6)} AS score,
       |         CAST(count(*) AS BIGINT) AS n_terms
       |  FROM contrib
       |  GROUP BY 1)""".stripMargin

  private val bm25Oracle =
    s"""WITH $bm25OracleScoredCtes
       |SELECT doc_id, score, n_terms
       |FROM bm25_scored
       |ORDER BY score DESC, doc_id
       |LIMIT 20""".stripMargin

  // ------------------------------------------------------------- k-means
  private val KmeansK = 8

  /** Squared L2 distance between a double-array centroid and a float
    * vector, as the same sequential fold both engines run.
    */
  private def dist2Col(centCol: String, vecCol: String): Column =
    graft.plans.VectorExpressions.l2Dist2(col(centCol), col(vecCol))

  private def duckDist2(centCol: String, vecCol: String): String =
    s"""list_aggregate(list_transform(range(1, len($centCol) + 1),
       |  i -> ($centCol[i] - $vecCol[i]::DOUBLE) * ($centCol[i] - $vecCol[i]::DOUBLE)), 'sum')""".stripMargin

  /** K-means over the embedding corpus — 2 Lloyd iterations, k=8,
    * md5-ordered seeds — the coarse-quantizer training step an IVF
    * index needs. Every stage is a join or an aggregation:
    * assignment = crossJoin against the k-row broadcast centroid
    * table + rank-1 argmin (WindowGroupLimit); update = the
    * unexploded 64-column decimal-sum pattern from ann_ivf (one pass,
    * order-independent, bit-stable doubles). Nothing iterates on the
    * driver and no stage materializes O(n·k) state beyond the argmin
    * shuffle, so iteration count and k scale independently of corpus
    * size. Output: final assignment + rounded distance per vector.
    */
  private def kmeansEmbeddings(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(spark, dir)
      .select(col("vec_id"), col("cid").as("cluster"), col("d").as("dist2_r"))

  /** The trained assignment frame `(vec_id, e, cid, d)` after the
    * final Lloyd round — shared by `kmeans_embeddings` (which only
    * re-labels it), `semdedup` (which deduplicates within cells) and
    * `semdedup_cell_stats` (the sweep-cost ledger).
    *
    * Memoized per (session, dir) like the quality gate and the SimHash
    * pair graph (r16): the three consumers each re-trained the full
    * 2-round Lloyd chain (~2 s/run at sf0.1) for the SAME model — a
    * pipeline trains the coarse quantizer once per corpus. Registration
    * order puts `kmeans_embeddings` first, so each bench pass pays the
    * training build inside that named entry.
    */
  private def kmeansAssign(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "kmeans_assign")(kmeansAssignFresh(spark, dir))

  private def kmeansAssignFresh(spark: SparkSession, dir: String): DataFrame = {
    // checkpoint the vector table once: it appears four times in the
    // unrolled Lloyd plan (seeds, two assignments, one update) and a
    // leaf checkpoint replaces four parquet scans + fan-out exchanges
    // with one materialization
    val v = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding").as("e"))
      .localCheckpoint()
    // deterministic seeds: the k smallest md5(vec_id) — a TakeOrdered
    // (per-partition heap), not a global sort
    val wSeed = Window.orderBy(col("skey"), col("vec_id"))
    val seeds = v.withColumn("skey", md5(col("vec_id").cast("string")))
      .orderBy(col("skey"), col("vec_id")).limit(KmeansK)
      .withColumn("cid", row_number().over(wSeed).cast("long") - 1)
      .select(col("cid"), transform(col("e"), x => x.cast("double")).as("cv"))

    // QRound, not native round (r15 knife-edge audit): the Lloyd chain
    // is the same iterative class as neardup_pagerank — an argmin flip
    // on a shortest-repr knife edge in round 1 moves a centroid and
    // diverges every downstream assignment; distances are pure IEEE
    // rational folds on bit-identical inputs, exactly what QRound
    // stabilizes (n·k distance values per round sample edges at scale)
    // (r17) the argmin over the k=8 centroids is WITHIN-ROW once the
    // codebook rides along as ONE broadcast array row: no ×k fan-out
    // and no per-iteration vec_id exchange + sort (§2.4 — at corpus
    // scale each assign was a full shuffle of the vector table).
    // array_min's struct comparison orders by (d, cid) — exactly the
    // old row_number(orderBy(d, cid)) = 1 winner over identical
    // QRound'd distances.
    def assign(cents: DataFrame): DataFrame = {
      val carr = cents.agg(
        array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbs"))
      v.crossJoin(broadcast(carr))
        .withColumn("best", array_min(transform(col("cbs"), cb =>
          struct(
            QRound.col(graft.plans.VectorExpressions
              .l2Dist2(cb.getField("cv"), col("e")), 6).as("d"),
            cb.getField("cid").as("cid")))))
        .select(col("vec_id"), col("e"),
          col("best").getField("cid").as("cid"),
          col("best").getField("d").as("d"))
    }

    // a centroid that captures zero vectors this round keeps its
    // previous position (deterministic re-seed via left join +
    // coalesce) so the output always has exactly k cells — the IVF
    // coarse-quantizer contract
    def update(assigned: DataFrame, prev: DataFrame): DataFrame = {
      val dims = 1 to 64
      val dimSums = dims.map(i =>
        sum(element_at(col("e"), i).cast("double").cast(DecimalType(30, 12))).as(s"s$i")) :+
        count(lit(1)).as("cnt")
      val means = assigned.groupBy(col("cid"))
        .agg(dimSums.head, dimSums.tail: _*)
        .select(col("cid"),
          array(dims.map(i => col(s"s$i").cast("double") / col("cnt")): _*).as("mv"))
      prev.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
    }

    assign(update(assign(seeds), seeds))
  }

  /** Shared oracle CTE chain for the 2-round Lloyd plan (v .. a2, the
    * final assignment keeping each vector) — used by `kmeans_embeddings`
    * and `semdedup`.
    */
  private val kmeansOracleCtes = {
    val d2 = duckDist2("cv", "e")
    s"""v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |seeds AS (
       |  SELECT e, rn - 1 AS cid FROM (
       |    SELECT e, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |    FROM v) s
       |  WHERE rn <= $KmeansK),
       |c0 AS (SELECT cid, list_transform(e, x -> x::DOUBLE) AS cv FROM seeds),
       |a1 AS (
       |  SELECT vec_id, e, cid FROM (
       |    SELECT v.vec_id, v.e, c0.cid,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY ${QRound.duck(d2, 6)}, c0.cid) AS rn
       |    FROM v CROSS JOIN c0) s
       |  WHERE rn = 1),
       |s1 AS (
       |  SELECT cid, g.i AS pos,
       |         CAST(SUM(CAST(e[g.i]::DOUBLE AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
       |  FROM a1 CROSS JOIN generate_series(1, 64) g(i)
       |  GROUP BY 1, 2),
       |c1m AS (SELECT cid, list(m ORDER BY pos) AS mv FROM s1 GROUP BY 1),
       |c1 AS (SELECT c0.cid, coalesce(c1m.mv, c0.cv) AS cv
       |       FROM c0 LEFT JOIN c1m USING (cid)),
       |a2 AS (
       |  SELECT vec_id, e, cid, d FROM (
       |    SELECT v.vec_id, v.e, c1.cid, ${QRound.duck(d2, 6)} AS d,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY ${QRound.duck(d2, 6)}, c1.cid) AS rn
       |    FROM v CROSS JOIN c1) s
       |  WHERE rn = 1)""".stripMargin
  }

  private val kmeansOracle =
    s"""WITH $kmeansOracleCtes
       |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, d AS dist2_r
       |FROM a2""".stripMargin

  // --------------------------------------------------------- SemDeDup
  // eps is corpus-tuned in the paper (their web corpora dedup up to
  // 50% of rows); the synthetic embeddings are near-orthogonal (max
  // pairwise cos ~0.51), so the demo threshold sits in the observed
  // within-cluster tail to exercise real drops at test scale.
  private val SemDedupEps = 0.40

  /** Identical-association dot product for the DuckDB twin. */
  private def duckDotQ(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), 'sum')"

  /** Chunk cap for the within-cell pair sweep. With k fixed, a skewed
    * (or adversarially degenerate) cell grows the sweep as |cell|^2
    * with nothing to catch it before the scale budget trips (VERDICT
    * r10 finding 3); chunking bounds any cell's contribution to
    * ceil(|cell|/cap) * cap^2/2 — linear in the cell for fixed cap.
    * 2500 sits at the sf1 MEAN cell size (20k vecs / 8 cells), so the
    * policy engages live on sf1's above-average cells (its dropped
    * mass visible in `semdedup_cell_stats`) and is inert at the sf0.1
    * and sf0.01 correctness-gate scales (max cell ~hundreds).
    */
  private val SemCellCap = 2500

  /** Farthest-first chunking of the k-means cells: rank members by the
    * sweep's priority order (round(dist2,6) DESC, vec_id — the paper
    * keeps the LOW centroid-similarity member of a duplicate group)
    * and split every cell into chunks of at most `cap` members. The
    * pairwise sweep joins on (cid, sub), so priority stays exact
    * within a chunk and cross-chunk pairs are forgone — the
    * split-don't-scan analogue of the LSH tier's bucket cap, mirrored
    * in the DuckDB twin. Parameterized for the planted-mega-cell spec.
    */
  private[graft] def semCellChunks(a: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("d").desc, col("vec_id"))
    a.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("sub", ((col("rn") - 1) / cap).cast("long"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication with the
    * pairwise work bounded to k-means cells. Cluster members are
    * ordered farthest-from-centroid first (the paper keeps the LOW
    * centroid-similarity example of a duplicate group — the most
    * distinctive one); a vector is dropped iff some member EARLIER in
    * that order has cosine >= eps with it, which is exactly the
    * paper's matrix sweep and needs no connected components. Shapes:
    * the dup scan is a self equi-join on (cell, chunk) — pairs scale
    * with sum(min(|cell|, cap) * |cell|), and at corpus scale k grows
    * with n (SemDeDup uses k ~ n/10k) so cells stay O(1) and the scan
    * stays linear, with [[semCellChunks]] as the skew backstop; each
    * surviving pair costs one fused codegen'd dot (norms precomputed
    * per vector, not per pair). Precedence pins on (round(dist2,6)
    * DESC, vec_id) — materialized as the chunk rank, so "earlier" is
    * one integer compare — and cosines round to 6 decimals, so the
    * DuckDB oracle replays the whole pipeline hash-exactly.
    */
  private def semDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.VectorExpressions
    // the assignment frame appears on both sides of the pair join and
    // in the final decorate: materialize once
    val a = semCellChunks(kmeansAssign(spark, dir), SemCellCap)
      .withColumn("vn", sqrt(VectorExpressions.dotF32(col("e"), col("e"))))
      .localCheckpoint()
    val u = a.select(col("vec_id").as("uid"), col("e").as("ue"),
      col("cid"), col("sub"), col("rn").as("urn"), col("vn").as("un"))
    val dupPrior = u.join(a, Seq("cid", "sub"))
      .filter(col("urn") < col("rn"))
      .withColumn("cos",
        round(VectorExpressions.dotF32(col("ue"), col("e")) / (col("un") * col("vn")), 6))
      .filter(col("cos") >= SemDedupEps)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dup_prior"))
    a.join(dupPrior, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").as("cluster"), col("d").as("dist2_r"),
        coalesce(col("n_dup_prior"), lit(0L)).as("n_dup_prior"),
        (coalesce(col("n_dup_prior"), lit(0L)) === 0).as("kept"))
  }

  /** Chunked assignment twin: rn/sub replay [[semCellChunks]]. */
  private val duckSemChunks =
    s"""an AS (SELECT vec_id, e, cid, d, sqrt(${duckDotQ("e", "e")}) AS vn,
       |  row_number() OVER (PARTITION BY cid ORDER BY d DESC, vec_id) AS rn
       |  FROM a2),
       |anc AS (SELECT *, (rn - 1) // $SemCellCap AS sub FROM an)""".stripMargin

  private val semDedupOracle =
    s"""WITH $kmeansOracleCtes,
       |$duckSemChunks,
       |dup AS (
       |  SELECT v.vec_id, count(*) AS n_dup_prior
       |  FROM anc u JOIN anc v ON u.cid = v.cid AND u.sub = v.sub AND u.rn < v.rn
       |  WHERE round(${duckDotQ("u.e", "v.e")} / (u.vn * v.vn), 6) >= $SemDedupEps
       |  GROUP BY 1)
       |SELECT anc.vec_id, CAST(anc.cid AS BIGINT) AS cluster, anc.d AS dist2_r,
       |       CAST(coalesce(dup.n_dup_prior, 0) AS BIGINT) AS n_dup_prior,
       |       coalesce(dup.n_dup_prior, 0) = 0 AS kept
       |FROM anc LEFT JOIN dup ON anc.vec_id = dup.vec_id""".stripMargin

  /** Cell-size accounting for the semdedup sweep — the
    * `dedup_band_stats` pattern for the k-means cells (VERDICT r10
    * finding 3): cell count and mass, the largest cell, the ACTUAL
    * chunked sweep cost in pairs, and how many cells/vectors/pairs the
    * [[SemCellCap]] chunking bound touched. A pipeline reads this
    * BEFORE semdedup: a mega-cell shows up here as capped mass, not as
    * a melted-down budget.
    */
  private def semdedupCellStats(spark: SparkSession, dir: String): DataFrame = {
    val chunks = semCellChunks(kmeansAssign(spark, dir), SemCellCap)
      .groupBy(col("cid"), col("sub")).agg(count(lit(1)).as("n"))
    val perCell = chunks.groupBy(col("cid"))
      .agg(sum(col("n")).as("nc"),
        sum(expr("n * (n - 1) div 2")).as("swept"))
    perCell.agg(
      count(lit(1)).cast("long").as("n_cells"),
      sum(col("nc")).cast("long").as("n_vecs"),
      max(col("nc")).cast("long").as("max_cell"),
      sum(col("swept")).cast("long").as("sweep_pairs"),
      sum(when(col("nc") > SemCellCap, 1L).otherwise(0L)).cast("long").as("capped_cells"),
      sum(when(col("nc") > SemCellCap, col("nc")).otherwise(0L)).cast("long").as("vecs_in_capped"),
      sum(when(col("nc") > SemCellCap,
        expr("nc * (nc - 1) div 2") - col("swept")).otherwise(0L))
        .cast("long").as("pairs_avoided"))
  }

  private val semdedupCellStatsOracle =
    s"""WITH $kmeansOracleCtes,
       |an AS (SELECT vec_id, cid,
       |  row_number() OVER (PARTITION BY cid ORDER BY d DESC, vec_id) AS rn FROM a2),
       |ch AS (SELECT cid, (rn - 1) // $SemCellCap AS sub, count(*) AS n
       |       FROM an GROUP BY 1, 2),
       |pc AS (SELECT cid, sum(n) AS nc, sum(n * (n - 1) // 2) AS swept
       |       FROM ch GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |       CAST(sum(nc) AS BIGINT) AS n_vecs,
       |       CAST(max(nc) AS BIGINT) AS max_cell,
       |       CAST(sum(swept) AS BIGINT) AS sweep_pairs,
       |       CAST(sum(CASE WHEN nc > $SemCellCap THEN 1 ELSE 0 END) AS BIGINT) AS capped_cells,
       |       CAST(sum(CASE WHEN nc > $SemCellCap THEN nc ELSE 0 END) AS BIGINT) AS vecs_in_capped,
       |       CAST(sum(CASE WHEN nc > $SemCellCap THEN nc * (nc - 1) // 2 - swept ELSE 0 END) AS BIGINT) AS pairs_avoided
       |FROM pc""".stripMargin

  // ------------------------------------------------------- PMI bigrams
  private val PmiMinCount = 5

  /** Pointwise-mutual-information collocations: the top-50 bigrams
    * whose parts co-occur far more than independence predicts — the
    * phrase-mining signal tokenizer/vocab builders rank merge
    * candidates with. Unigram and bigram tables are each one explode +
    * rollup; the PMI join keys on the two component terms, so both
    * sides stay term-partitioned (vocabulary-sized — AQE picks
    * broadcast when they fit, shuffle when they don't); corpus totals
    * are scalars and broadcast. All logs are over exact integer counts
    * rounded to 6 decimals before ranking, with the bigram as the
    * unique tiebreak.
    */
  private def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    // (r17) corpus counts = Σ of per-doc counts: pre-counting each doc's
    // terms/bigrams in the row (fused tokenCounts RLE) feeds the global
    // rollups one row per DISTINCT gram per doc instead of one per
    // occurrence — same sums, smaller hash-agg input (§2.3).
    val toksDf = Tables.documents(spark, dir).select(tokensCol.as("toks"))
    val uni = toksDf
      .select(explode(graft.plans.TextExpressions.tokenCounts(col("toks"))).as("s"))
      .groupBy(col("s.t").as("term")).agg(sum(col("s.c")).as("cu"))
    val nUni = uni.agg(sum(col("cu")).as("n_uni"))
    val big = toksDf
      .select(explode(graft.plans.TextExpressions.tokenCounts(
        graft.plans.TextExpressions.wordShingles(col("toks"), 2))).as("s"))
      .groupBy(col("s.t").as("bigram")).agg(sum(col("s.c")).as("cb"))
      .filter(col("cb") >= PmiMinCount)
    val nBig = toksDf
      .select(sum(greatest(size(col("toks")) - 1, lit(0))).as("n_big"))
    big
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("term").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("term").as("w2"), col("cu").as("c2")), "w2")
      .crossJoin(broadcast(nBig))
      .crossJoin(broadcast(nUni))
      .withColumn("pmi", round(
        log((col("cb").cast("double") / col("n_big")) /
          ((col("c1").cast("double") / col("n_uni")) *
            (col("c2").cast("double") / col("n_uni")))), 6))
      .select(col("bigram"), col("cb").as("n_cooccur"),
        col("c1"), col("c2"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(50)
  }

  private val pmiOracle =
    s"""WITH t AS (SELECT $duckToks AS l FROM documents),
       |uni AS (
       |  SELECT u.term, CAST(count(*) AS BIGINT) AS cu
       |  FROM t, unnest(l) AS u(term) GROUP BY 1),
       |nu AS (SELECT CAST(sum(cu) AS BIGINT) AS n_uni FROM uni),
       |bg AS (
       |  SELECT b.bigram, CAST(count(*) AS BIGINT) AS cb
       |  FROM t, unnest(CASE WHEN len(l) >= 2
       |    THEN list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])
       |    ELSE [] END) AS b(bigram)
       |  GROUP BY 1 HAVING count(*) >= $PmiMinCount),
       |nb AS (SELECT CAST(sum(greatest(len(l) - 1, 0)) AS BIGINT) AS n_big FROM t)
       |SELECT bigram, cb AS n_cooccur, u1.cu AS c1, u2.cu AS c2,
       |       round(ln((CAST(cb AS DOUBLE) / n_big) /
       |         ((CAST(u1.cu AS DOUBLE) / n_uni) * (CAST(u2.cu AS DOUBLE) / n_uni))), 6) AS pmi
       |FROM bg
       |JOIN uni u1 ON u1.term = string_split(bigram, ' ')[1]
       |JOIN uni u2 ON u2.term = string_split(bigram, ' ')[2]
       |CROSS JOIN nb CROSS JOIN nu
       |ORDER BY pmi DESC, bigram
       |LIMIT 50""".stripMargin

  // ------------------------------------------------------ vocab growth
  /** Vocabulary-growth (Heaps' law) profile: per 100-document bucket,
    * the new-term count, cumulative vocabulary, and cumulative tokens
    * — the curve that tells a tokenizer/vocab builder when the corpus
    * stops yielding new types. "New" = first occurrence, computed as a
    * per-term min-doc rollup (one term-keyed exchange); the running
    * sums are a window over the BUCKET rollup (corpus/100 rows — at
    * real scale use coarser buckets; the heavy work is all in the
    * term rollup, which scales).
    */
  private def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    // (r17) per-bucket token totals are within-row sums of array sizes
    // (no explode at all), and "first doc per term" only needs each
    // doc's DISTINCT terms — array_distinct cuts the term-keyed
    // exchange to one row per (doc, distinct term) (§2.3).
    val tokensPerBucket = Tables.documents(spark, dir)
      .select(expr("doc_id DIV 100").as("bucket"), size(tokensCol).cast("long").as("nt"))
      // mirror the old explode: a token-less doc contributed no rows, so
      // a bucket of only token-less docs must stay absent, not sum to 0
      .filter(col("nt") > 0)
      .groupBy(col("bucket"))
      .agg(sum(col("nt")).as("n_tokens"))
    val newTerms = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(tokensCol)).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
      .groupBy(expr("fd DIV 100").as("bucket"))
      .agg(count(lit(1)).as("n_new_terms"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokensPerBucket
      .join(newTerms, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("n_new_terms"), lit(0L)).as("n_new_terms"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_vocab", sum(col("n_new_terms")).over(w))
  }

  private val vocabGrowthOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, u.t FROM documents, unnest($duckToks) AS u(t)),
       |tb AS (SELECT doc_id // 100 AS bucket, count(*) AS n_tokens FROM tok GROUP BY 1),
       |nt AS (
       |  SELECT fd // 100 AS bucket, count(*) AS n_new_terms
       |  FROM (SELECT t, min(doc_id) AS fd FROM tok GROUP BY 1) s
       |  GROUP BY 1)
       |SELECT bucket, n_tokens, coalesce(n_new_terms, 0) AS n_new_terms,
       |       CAST(sum(n_tokens) OVER o AS BIGINT) AS cum_tokens,
       |       CAST(sum(coalesce(n_new_terms, 0)) OVER o AS BIGINT) AS cum_vocab
       |FROM tb LEFT JOIN nt USING (bucket)
       |WINDOW o AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)""".stripMargin

  // ------------------------------------------------------ BPE training
  /** Byte-pair-encoding merge-loop vocabulary training — the step
    * `pmi_bigrams`/`vocab_growth` rank candidates for but nothing
    * performed until now. Classic Sennrich BPE, distributed:
    *
    *  - the corpus collapses ONCE to a (word, freq) table — vocabulary-
    *    sized, not corpus-sized, so each merge round is a group-by over
    *    at most |vocab| rows no matter how many TB of text fed it;
    *  - each word's symbol sequence is one string of '<sym>' cells, so
    *    re-tokenizing after a merge is a single codegen'd `replace`
    *    (left-to-right, non-overlapping in both engines — exactly BPE's
    *    greedy merge order, and the wrappers make cell boundaries
    *    unambiguous even through runs of identical symbols);
    *  - pair counts come from the split cells (adjacent pairs, overlap
    *    counted, weighted by word freq) — one partial-agg'd group-by;
    *  - the argmax pair per round is a DRIVER scalar by design (same
    *    license as dedup_components' convergence check): an N-round
    *    loop needs N tiny actions, each over a pair table bounded by
    *    the symbol vocabulary. Ties pin on md5(lhs||' '||rhs) so both
    *    engines pick the same pair at equal counts;
    *  - each round's word table is checkpointed — round r+1 plans
    *    against a leaf scan, not a growing replace-chain.
    *
    * The DuckDB oracle replays the identical loop as an unrolled CTE
    * chain, so the merge table AND the final vocabulary hash-match
    * exactly.
    */
  private val BpeRounds = 6

  /** Tokens containing '<' or '>' would make the '<sym>' cell encoding
    * ambiguous (the per-char wrapper turns a literal '>' into '<>>'),
    * so both engines drop them before symbol encoding.
    */
  private def bpeTokenOk(w: Column): Column =
    length(w) > 0 && !w.contains("<") && !w.contains(">")

  private def bpeWordTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(bpeTokenOk(col("w")))
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("freq"))
      .select(regexp_replace(col("w"), "(.)", "<$1>").as("s"), col("freq"))

  /** Runs the merge loop; returns (merge rows, final word-symbol table). */
  private def bpeLoop(spark: SparkSession, dir: String)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    var words = bpeWordTable(spark, dir).localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= BpeRounds && !exhausted) {
      val pairs = words
        .withColumn("sy", split(trim(col("s"), "<>"), "><"))
        .withColumn("pr", expr(
          "transform(slice(sy, 2, size(sy) - 1), (x, i) -> struct(sy[i] AS lhs, x AS rhs))"))
        .select(col("freq"), explode(col("pr")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, md5(concat_ws(" ", col("lhs"), col("rhs"))))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, rr, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, l, rr, l + rr, cnt))
        // Column-API replace: the merged pair reaches the plan as a
        // literal, never re-parsed as SQL text — a token containing a
        // quote or backslash cannot break or alter the pattern.
        words = words
          .withColumn("s",
            replace(col("s"), lit(s"<$l><$rr>"), lit(s"<$l$rr>")))
          .localCheckpoint()
        r += 1
      }
    }
    (merges.result(), words)
  }

  private def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeLoop(spark, dir)._1.toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
  }

  private def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    bpeLoop(spark, dir)._2
      .select(col("freq"), explode(split(trim(col("s"), "<>"), "><")).as("sym"))
      .groupBy(col("sym"))
      .agg(sum(col("freq")).as("freq"))

  /** Apply the trained BPE vocabulary back to the corpus: per-document
    * word / BPE-token / char counts and the chars-per-token compression
    * ratio (the metric a tokenizer is actually judged by). The word ->
    * symbol-count map falls out of the final merge-loop word table
    * (symbols concatenate back to the original word, so the key is
    * recovered with one translate); the corpus side joins against that
    * vocabulary-sized map — AQE broadcasts it — and one doc rollup
    * finishes. No per-document re-tokenization: at 100 TB the encode
    * cost is one hash join, not a per-row merge replay.
    */
  private def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val wordTok = bpeLoop(spark, dir)._2.select(
      translate(col("s"), "<>", "").as("w"),
      size(split(trim(col("s"), "<>"), "><")).cast("long").as("n_sym"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(bpeTokenOk(col("w")))
      .join(wordTok, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_bpe_tokens"),
        sum(length(col("w"))).cast("long").as("n_chars"))
      // QRound: integer ratio with per-doc (often 2-5-smooth) token
      // counts as denominators — the incremental_agg_merge sf10 hit's
      // exact shape (ROUND_AUDIT U3), swept r16
      .withColumn("chars_per_token",
        QRound.col(col("n_chars").cast("double") / col("n_bpe_tokens"), 6))
  }

  private def bpeTokenizeOracle =
    s"""WITH $bpeOracleCtes,
       |wt AS (SELECT replace(replace(s, '<', ''), '>', '') AS w,
       |              len(string_split(trim(s, '<>'), '><')) AS n_sym
       |       FROM w$BpeRounds),
       |dt AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
       |       CAST(sum(len(w)) AS BIGINT) AS n_chars,
       |       ${QRound.duck("sum(len(w)) / CAST(sum(n_sym) AS DOUBLE)", 6)} AS chars_per_token
       |FROM dt JOIN wt USING (w)
       |WHERE len(w) > 0 AND w NOT LIKE '%<%' AND w NOT LIKE '%>%'
       |GROUP BY 1""".stripMargin

  private def bpeOracleCtes: String = {
    val base =
      """w0 AS (
        |  SELECT regexp_replace(w, '(.)', '<\1>', 'g') AS s, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 AND w NOT LIKE '%<%' AND w NOT LIKE '%>%' GROUP BY w)""".stripMargin
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (SELECT pr[1] AS lhs, pr[2] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(sy)), i -> [sy[i], sy[i+1]])) AS pr
         |        FROM (SELECT freq, string_split(trim(s, '<>'), '><') AS sy FROM w${r - 1}))
         |  GROUP BY 1, 2),
         |b$r AS (SELECT lhs, rhs, cnt FROM p$r ORDER BY cnt DESC, md5(lhs || ' ' || rhs) LIMIT 1),
         |w$r AS (SELECT replace(s, '<' || b.lhs || '><' || b.rhs || '>', '<' || b.lhs || b.rhs || '>') AS s, freq
         |  FROM w${r - 1}, b$r b)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  private val bpeMergesOracle = {
    val tail = (1 to BpeRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_round, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count FROM b$r")
      .mkString("\nUNION ALL ")
    s"WITH $bpeOracleCtes\n$tail"
  }

  private val bpeVocabOracle =
    s"""WITH $bpeOracleCtes
       |SELECT sym, CAST(sum(freq) AS BIGINT) AS freq FROM (
       |  SELECT freq, unnest(string_split(trim(s, '<>'), '><')) AS sym FROM w$BpeRounds)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------- Naive Bayes lang classifier
  /** Multinomial Naive Bayes document classifier, the fastText-style
    * model shape a corpus pipeline trains for language-ID / quality
    * gating (reference's analytic tier has no learned classifiers; this
    * is the LLM-pipeline extension). Train on even doc_ids, score odd:
    *
    *   pred(d) = argmax_c [ ln P(c) + Σ_t tf(d,t) · ln((cnt(c,t)+1)/(tot_c+V)) ]
    *
    * Spark shape: the model (lang × vocab counts, lang totals, priors,
    * V) is vocabulary-sized — the side that broadcasts; the scored side
    * stays (doc,term)-partitioned through one explode + one rollup to
    * (doc,lang) and a per-doc argmax via rank-limit, i.e. the tfidf
    * shuffle shape. Laplace add-1 smoothing means the test×lang grid is
    * dense in lang (5 classes) — a crossJoin with a broadcast 5-row
    * frame, not a blowup. Per-(doc,lang) log-likelihood sums quantize
    * each term's contribution to DECIMAL(28,9) (order-independent);
    * argmax pinned by round(score,6) + lang tiebreak.
    */
  private def nbLangClassifier(spark: SparkSession, dir: String): DataFrame = {
    // ONE (doc, lang, term) tf frame feeds BOTH the training counts and
    // the test tf side — the r15 shape re-ran the token explode + shuffle
    // four times (classCnt / vocab / test tf each had their own lineage;
    // 50-Exchange initial plan, 23 jobs). Values are unchanged: per-class
    // counts are the sum of per-doc tfs.
    // (r17) lang is constant within a doc, so the (doc, lang, term)
    // rollup is WITHIN-ROW: the fused tokenCounts RLE emits the
    // identical rows without the per-occurrence exchange (§2.3/§2.4).
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(graft.plans.TextExpressions.tokenCounts(tokensCol)).as("s"))
      .select(col("doc_id"), col("lang"), col("s.t").as("term"), col("s.c").as("tf"))
    val train = tf.filter(col("doc_id") % 2 === 0)
    val classCnt = train.groupBy(col("lang").as("clang"), col("term"))
      .agg(sum(col("tf")).as("cnt"))
    // model-side rollups derive FROM classCnt (vocabulary-sized), not
    // from the raw token stream: classTot reuses classCnt's exchange,
    // vocab is a distinct over V·5 rows instead of the full corpus
    val classTot = classCnt.groupBy(col("clang")).agg(sum(col("cnt")).as("tot"))
    val vocab = classCnt.select(col("term")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val trainDocs = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val priors = trainDocs.groupBy(col("lang").as("clang"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(trainDocs.agg(count(lit(1)).as("n"))))
      .withColumn("lnprior", log(col("nd").cast("double") / col("n")))
      .select(col("clang"), col("lnprior"))
    // The smoothed log-likelihood depends only on (clang, term) — so it
    // is computed ONCE per model cell on the vocabulary-sized side (V·5
    // rows: vocab × classes, left-filled with cnt=0 exactly like the
    // old test-side na.fill), not once per scored (doc,term,class) row.
    // The identical expression over the identical long inputs yields
    // bit-identical doubles; the scored side then needs ONE broadcast
    // hash join (dense in clang, so an inner join on term both drops
    // OOV terms — the old vocab semi-join — and fans each test term out
    // to its 5 class rows — the old classTot crossJoin).
    val denseLik = vocab.crossJoin(broadcast(classTot))
      .join(broadcast(classCnt), Seq("clang", "term"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(vSize))
      .withColumn("lnlik",
        log((col("cnt") + lit(1)).cast("double") / (col("tot") + col("v"))))
      .select(col("term"), col("clang"), col("lnlik"))
    val scores = tf.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang").as("true_lang"), col("term"), col("tf"))
      .join(broadcast(denseLik), "term")
      .withColumn("c", col("tf") * col("lnlik"))
      .groupBy(col("doc_id"), col("true_lang"), col("clang"))
      .agg(sum(round(col("c"), 9).cast(DecimalType(28, 9))).cast("double").as("ll"))
      .join(broadcast(priors), "clang")
      .withColumn("score", round(col("ll") + col("lnprior"), 6))
    // argmax as one aggregation instead of a doc-partitioned window
    // (removes a sort + the window exchange): min_by over the ordering
    // struct (-score, clang) picks exactly the old row_number()=1 row —
    // highest score, smallest clang on ties; score < 0 always (lnprior
    // is a log of a proper fraction), so -score has no ±0.0 edge. The
    // trailing presentation orderBy(doc_id) is dropped: the oracle
    // compare is sorted-normalized, and the global range sort was a full
    // extra exchange + sampling pass on the output.
    scores
      .groupBy(col("doc_id"), col("true_lang"))
      .agg(min_by(col("clang"),
        struct((-col("score")).as("ns"), col("clang"))).as("pred_lang"))
      .select(col("doc_id"), col("true_lang"), col("pred_lang"),
        (col("true_lang") === col("pred_lang")).cast("long").as("correct"))
  }

  private val nbLangOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, t.term
       |  FROM documents, unnest($duckToks) AS t(term)),
       |tr AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
       |cc AS (SELECT lang AS clang, term, CAST(count(*) AS BIGINT) AS cnt FROM tr GROUP BY 1, 2),
       |ct AS (SELECT clang, CAST(sum(cnt) AS BIGINT) AS tot FROM cc GROUP BY 1),
       |vocab AS (SELECT DISTINCT term FROM tr),
       |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
       |pri AS (
       |  SELECT lang AS clang, ln(CAST(count(*) AS DOUBLE) / n.n) AS lnprior
       |  FROM documents CROSS JOIN (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0) n
       |  WHERE doc_id % 2 = 0 GROUP BY 1, n.n),
       |tt AS (
       |  SELECT doc_id, lang AS true_lang, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM toks WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
       |ttv AS (SELECT tt.* FROM tt JOIN vocab USING (term)),
       |grid AS (
       |  SELECT ttv.doc_id, ttv.true_lang, ttv.tf, ct.clang, ct.tot,
       |         COALESCE(cc.cnt, 0) AS cnt, vs.v
       |  FROM ttv CROSS JOIN ct
       |  LEFT JOIN cc ON cc.clang = ct.clang AND cc.term = ttv.term
       |  CROSS JOIN vs),
       |sc AS (
       |  SELECT doc_id, true_lang, clang,
       |         round(CAST(SUM(CAST(round(tf * ln(CAST(cnt + 1 AS DOUBLE) / (tot + v)), 9)
       |                              AS DECIMAL(28,9))) AS DOUBLE)
       |               + any_value(lnprior), 6) AS score
       |  FROM grid JOIN pri USING (clang)
       |  GROUP BY 1, 2, 3),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, clang) AS rn
       |  FROM sc)
       |SELECT doc_id, true_lang, clang AS pred_lang,
       |       CAST(true_lang = clang AS BIGINT) AS correct
       |FROM rk WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------- logistic-regression classifier
  private val LrSteps = 3

  /** Sigmoid quantization scale, shared by the engine ([[pCol]]) and all
    * oracle sigmoid sites — the ONE knob that must agree across engines
    * (r14 post-commit regression: engine moved to 6, oracle stayed at 9,
    * and the weights diverged at the 8th decimal on the sf0.01 corpus).
    * 6 decimals keeps the 1-ULP exp() flip probability at ~1e-10 per
    * doc-step — never sampled even at sf100.
    */
  private val LrPScale = 6

  /** Logistic-regression quality classifier trained IN-ENGINE: 3
    * unrolled full-batch gradient-descent steps (lr = 1.0, w₀ = 0) on
    * two shape features — word count and average word length — against
    * the lang='en' target. The point is the mechanics a learned
    * quality filter needs at corpus scale, with none of the usual
    * nondeterminism: every per-doc gradient contribution is rounded to
    * 9dp and summed as DECIMAL(28,9) (order-independent, so the same
    * weights fall out of any partitioning), weights re-round to 9dp
    * per step, and the step count is fixed — a static 3-deep plan over
    * one checkpointed feature table, weights carried as a 1-row
    * broadcast frame, nothing on the driver.
    */
  private def lrQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    // every double quantization is QRound, not round: the iterative
    // chain samples 50k sigmoid/gradient values per step, and the r14
    // full-registry sf1 oracle run caught a weight landing on a 1e-10
    // knife edge where the two engines' native round semantics split
    // (see [[QRound]])
    val wcount = size(graft.functions.TextFunctions.tokens(col("text"))).cast("double")
    val feats = Tables.documents(spark, dir).select(
        col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        QRound.col(wcount / 100.0, 9).as("x1"),
        QRound.col(col("n_chars") / wcount / 10.0, 9).as("x2"))
      .localCheckpoint()
    // the sigmoid is the chain's ONE transcendental: JVM Math.exp and
    // DuckDB/libm exp differ by 1 ULP on ~0.3% of inputs (measured,
    // r14), and a 1-ULP difference flips a quantization boundary with
    // probability ulp/step. At 9 decimals that is ~1e-7 per doc-step —
    // the r14 sf1 sweep hit one in 50k docs x 3 steps. p quantizes at
    // 6 decimals (~1e-10 per doc-step: never, even at sf100); every
    // DOWNSTREAM op is plain IEEE arithmetic on the quantized values,
    // bit-identical across engines by construction.
    def pCol: Column = QRound.col(
      lit(1.0) / (lit(1.0) +
        exp(-(col("w0") + col("w1") * col("x1") + col("w2") * col("x2")))), LrPScale)
    var w = spark.range(1).select(
      lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"))
    for (_ <- 1 to LrSteps) {
      val g = feats.crossJoin(broadcast(w))
        .withColumn("p", pCol)
        .withColumn("r", col("p") - col("y"))
        .agg(
          sum(QRound.col(col("r"), 9).cast(DecimalType(28, 9))).as("s0"),
          sum(QRound.col(col("r") * col("x1"), 9).cast(DecimalType(28, 9))).as("s1"),
          sum(QRound.col(col("r") * col("x2"), 9).cast(DecimalType(28, 9))).as("s2"),
          count(lit(1)).as("n"))
      w = w.crossJoin(broadcast(g)).select(
        QRound.col(col("w0") - col("s0").cast("double") / col("n"), 9).as("w0"),
        QRound.col(col("w1") - col("s1").cast("double") / col("n"), 9).as("w1"),
        QRound.col(col("w2") - col("s2").cast("double") / col("n"), 9).as("w2"))
    }
    feats.crossJoin(broadcast(w))
      .withColumn("p", pCol)
      .agg(
        max(col("w0")).as("w0"), max(col("w1")).as("w1"), max(col("w2")).as("w2"),
        count(lit(1)).as("n_docs"),
        // QRound: 0/1 averages are integer ratios over the doc count —
        // exact-boundary class (ROUND_AUDIT U3), swept r16
        QRound.col(avg(when((col("p") >= 0.5) === (col("y") === 1.0), 1.0)
          .otherwise(0.0)), 6).as("train_acc"),
        QRound.col(avg(when(col("p") >= 0.5, 1.0).otherwise(0.0)), 6).as("pred_pos_rate"))
  }

  private val lrQualityOracle = {
    def step(k: Int) =
      s"""g$k AS (
         |  SELECT CAST(sum(CAST(${QRound.duck("p - y", 9)} AS DECIMAL(28,9))) AS DOUBLE) AS s0,
         |         CAST(sum(CAST(${QRound.duck("(p - y) * x1", 9)} AS DECIMAL(28,9))) AS DOUBLE) AS s1,
         |         CAST(sum(CAST(${QRound.duck("(p - y) * x2", 9)} AS DECIMAL(28,9))) AS DOUBLE) AS s2,
         |         count(*) AS n
         |  FROM (SELECT f.*, ${QRound.duck("1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2)))", LrPScale)} AS p
         |        FROM feats f CROSS JOIN w${k - 1}t)),
         |w${k}t AS (
         |  SELECT ${QRound.duck("w0 - s0/n", 9)} AS w0, ${QRound.duck("w1 - s1/n", 9)} AS w1,
         |         ${QRound.duck("w2 - s2/n", 9)} AS w2
         |  FROM w${k - 1}t CROSS JOIN g$k)""".stripMargin
    s"""WITH feats AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |         ${QRound.duck("len(string_split(trim(text), ' ')) / 100.0", 9)} AS x1,
       |         ${QRound.duck("n_chars / len(string_split(trim(text), ' ')) / 10.0", 9)} AS x2
       |  FROM documents),
       |w0t AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
       |               CAST(0.0 AS DOUBLE) AS w2),
       |${(1 to LrSteps).map(step).mkString(",\n")}
       |SELECT w0, w1, w2, CAST(count(*) AS BIGINT) AS n_docs,
       |       ${QRound.duck("avg(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END)", 6)} AS train_acc,
       |       ${QRound.duck("avg(CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END)", 6)} AS pred_pos_rate
       |FROM (SELECT f.*, w.*, ${QRound.duck("1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2)))", LrPScale)} AS p
       |      FROM feats f CROSS JOIN w${LrSteps}t w)
       |GROUP BY 1, 2, 3""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("bpe_merges", Some(bpeMergesOracle), bpeMerges),
    GraftQuery("bpe_vocab", Some(bpeVocabOracle), bpeVocab),
    GraftQuery("bpe_tokenize", Some(bpeTokenizeOracle), bpeTokenize),
    GraftQuery("tfidf_top_terms", Some(tfidfOracle), tfidfTopTerms),
    GraftQuery("bm25_search", Some(bm25Oracle), bm25Search),
    GraftQuery("kmeans_embeddings", Some(kmeansOracle), kmeansEmbeddings),
    GraftQuery("semdedup_cell_stats", Some(semdedupCellStatsOracle), semdedupCellStats),
    GraftQuery("semdedup", Some(semDedupOracle), semDedup),
    GraftQuery("pmi_bigrams", Some(pmiOracle), pmiBigrams),
    GraftQuery("vocab_growth", Some(vocabGrowthOracle), vocabGrowth),
    GraftQuery("nb_lang_classifier", Some(nbLangOracle), nbLangClassifier),
    GraftQuery("lr_quality_classifier", Some(lrQualityOracle), lrQualityClassifier),
  )
}
