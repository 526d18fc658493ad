package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions
import graft.sources.Tables

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
  * ranking over `documents` and a dense cosine ranking over
  * `embeddings` — the standard two-tower retrieval composition a RAG /
  * training-data curation stack runs (fuse sparse + dense candidates,
  * keep the union's best). Cormack et al.'s RRF: score(d) = Σ_lists
  * 1/(k + rank_list(d)) with k = 60.
  *
  * Scale shape: each list is an independent top-20 — BM25 reuses
  * `CorpusMining.bm25Scored` (term-filtered before any doc-keyed
  * work), the dense side is the `ann_bruteforce` broadcast-probe scan
  * against ONE query vector. Both lists collapse via orderBy+limit
  * (TakeOrdered: per-partition k-row heaps, driver merges k×parts
  * rows), so ranks are assigned by a window over ≤20 rows, never a
  * global sort. The fusion join is 20×20 rows — size-independent of
  * the corpus. At 100 TB the dense list swaps for the persisted
  * `ann_index_probe` path; the fusion stays identical.
  */
object RetrievalFusion {

  private val RrfK = 60
  private val ProbeVecId = 100L
  private val ListK = 20
  private val FusedK = 10
  private val IndexNProbe = 2

  private def dotCol(a: String, b: String): Column =
    VectorExpressions.dotF32(col(a), col(b))

  private def duckDot(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), 'sum')"

  /** Lexical list: BM25 top-20, ranks over the collapsed 20-row frame. */
  private def lexTop(spark: SparkSession, dir: String): DataFrame =
    CorpusMining.bm25Scored(spark, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(ListK)
      .withColumn("lex_rank",
        row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))

  /** Rank the dense candidate frame (vec_id, vn, e + broadcast pe/pn)
    * down to the top-20 cosine list.
    */
  private def denseTop(cands: DataFrame): DataFrame =
    cands
      .filter(col("vec_id") =!= ProbeVecId)
      .withColumn("simr", round(dotCol("pe", "e") / (col("pn") * col("vn")), 6))
      .orderBy(col("simr").desc, col("vec_id"))
      .limit(ListK)
      .withColumn("vec_rank",
        row_number().over(
          Window.orderBy(col("simr").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id"), col("vec_rank"))

  /** RRF fusion over the union of the two 20-row lists. */
  private def fuse(lex: DataFrame, dense: DataFrame): DataFrame =
    lex.join(dense, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        col("lex_rank"), col("vec_rank"))
      // QRound: sum of unit fractions 1/(k+r) is a small-denominator
      // rational — exact-boundary class (ROUND_AUDIT U3, e.g. 1/64)
      .withColumn("rrf",
        QRound.col(
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 9))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(FusedK)

  private def hybridSearchRrf(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("vn", sqrt(dotCol("e", "e")))
    val probe = vecs
      .filter(col("vec_id") === ProbeVecId)
      .select(col("e").as("pe"), col("vn").as("pn"))
    fuse(lexTop(spark, dir), denseTop(vecs.crossJoin(broadcast(probe))))
  }

  /** The 100 TB form of [[hybridSearchRrf]]: the dense list's scan is
    * PRUNED through the persisted ANN index's coarse quantizer — the
    * probe picks its 2 nearest cells from the broadcast centroid table
    * (the same decimal-pinned cell rule as `ann_index_probe`) and only
    * embeddings in those cells are scored. On a corpus whose clusters
    * are real this is lossless vs the brute-force list (proven in
    * ScalePostureSpec on a clustered corpus); on overlapping clusters
    * it is the standard IVF recall trade — either way the scored rows
    * drop from n to ~nprobe/ncells of the corpus and the fusion logic
    * is shared verbatim with the brute-force form.
    */
  private def hybridSearchRrfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("e"))
      .withColumn("vn", sqrt(dotCol("e", "e")))
    val probe = vecs
      .filter(col("vec_id") === ProbeVecId)
      .select(col("e").as("pe"), col("vn").as("pn"))
    val cells = SimilarityQueries.ivfCentroids(spark, dir)
      .crossJoin(broadcast(probe))
      .withColumn("cd", round(SimilarityQueries.l2Dist2(col("cvec"), col("pe")), 6))
      .orderBy(col("cd"), col("c_label")).limit(IndexNProbe)
      .select(col("c_label"))
    val cands = vecs
      .join(broadcast(cells), vecs("label") === col("c_label"))
      .crossJoin(broadcast(probe))
    fuse(lexTop(spark, dir), denseTop(cands))
  }

  private val hybridSearchRrfOracle =
    s"""WITH ${CorpusMining.bm25OracleScoredCtes},
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
       |  FROM (SELECT doc_id, score FROM bm25_scored ORDER BY score DESC, doc_id LIMIT $ListK)),
       |v AS (
       |  SELECT vec_id, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn
       |  FROM embeddings),
       |p AS (SELECT e AS pe, vn AS pn FROM v WHERE vec_id = $ProbeVecId),
       |ds AS (
       |  SELECT vec_id, round(${duckDot("pe", "e")} / (pn * vn), 6) AS simr
       |  FROM v CROSS JOIN p WHERE vec_id <> $ProbeVecId
       |  ORDER BY simr DESC, vec_id LIMIT $ListK),
       |dense AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY simr DESC, vec_id) AS BIGINT) AS vec_rank
       |  FROM ds)
       |SELECT COALESCE(lex.doc_id, dense.vec_id) AS doc_id, lex_rank, vec_rank,
       |       ${QRound.duck(s"COALESCE(1.0::DOUBLE / ($RrfK + lex_rank), 0.0) + COALESCE(1.0::DOUBLE / ($RrfK + vec_rank), 0.0)", 9)} AS rrf
       |FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.vec_id
       |ORDER BY rrf DESC, doc_id
       |LIMIT $FusedK""".stripMargin

  private def duckL2(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a) + 1), i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE)), 'sum')"

  private val hybridSearchRrfIndexedOracle =
    s"""WITH ${CorpusMining.bm25OracleScoredCtes},
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
       |  FROM (SELECT doc_id, score FROM bm25_scored ORDER BY score DESC, doc_id LIMIT $ListK)),
       |v AS (
       |  SELECT vec_id, label, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn
       |  FROM embeddings),
       |p AS (SELECT e AS pe, vn AS pn FROM v WHERE vec_id = $ProbeVecId),
       |cent AS (
       |  SELECT label, g.i AS pos,
       |         CAST(SUM(CAST(embedding[g.i]::DOUBLE AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
       |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)
       |  GROUP BY 1, 2),
       |cvecs AS (
       |  SELECT label AS c_label, list_transform(list(m ORDER BY pos), x -> x::FLOAT) AS cvec
       |  FROM cent GROUP BY 1),
       |cells AS (
       |  SELECT c_label FROM cvecs CROSS JOIN p
       |  ORDER BY round(${duckL2("cvec", "pe")}, 6), c_label LIMIT $IndexNProbe),
       |ds AS (
       |  SELECT vec_id, round(${duckDot("pe", "e")} / (pn * vn), 6) AS simr
       |  FROM v JOIN cells ON v.label = cells.c_label CROSS JOIN p
       |  WHERE vec_id <> $ProbeVecId
       |  ORDER BY simr DESC, vec_id LIMIT $ListK),
       |dense AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY simr DESC, vec_id) AS BIGINT) AS vec_rank
       |  FROM ds)
       |SELECT COALESCE(lex.doc_id, dense.vec_id) AS doc_id, lex_rank, vec_rank,
       |       ${QRound.duck(s"COALESCE(1.0::DOUBLE / ($RrfK + lex_rank), 0.0) + COALESCE(1.0::DOUBLE / ($RrfK + vec_rank), 0.0)", 9)} AS rrf
       |FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.vec_id
       |ORDER BY rrf DESC, doc_id
       |LIMIT $FusedK""".stripMargin

  // ------------------------------------------------- MMR re-ranking
  private val MmrLambda = 0.7
  private val MmrPicks = 5

  /** Maximal Marginal Relevance (Carbonell & Goldstein '98): greedily
    * re-rank the dense top-20 candidate list for diversity —
    * pick_s = argmax_d λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s). The
    * standard final-stage diversification a retrieval / hard-negative
    * pipeline runs after candidate generation.
    *
    * Scale shape: the DISTRIBUTED part is candidate generation (the
    * same broadcast-probe scan `ann_bruteforce` uses, TakeOrdered to
    * 20 rows). The greedy loop is inherently sequential but runs on
    * the COLLAPSED k-row frame: 5 rounds of join/agg over ≤20 rows +
    * a 20×20 pairwise sim table, all broadcast, size-independent of
    * the corpus. Ties break by vec_id; every similarity is rounded to
    * 6dp before the greedy compare so both engines walk the same path.
    */
  private def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("vn", sqrt(dotCol("e", "e")))
    val probe = vecs
      .filter(col("vec_id") === ProbeVecId)
      .select(col("e").as("pe"), col("vn").as("pn"))
    val cands = vecs.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= ProbeVecId)
      .withColumn("rel", round(dotCol("pe", "e") / (col("pn") * col("vn")), 6))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(ListK)
      .select(col("vec_id"), col("e"), col("rel"))
      .localCheckpoint()
    val sims = cands.as("x").join(cands.as("y"),
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(
          VectorExpressions.dotF32(col("x.e"), col("y.e")) /
            (sqrt(VectorExpressions.dotF32(col("x.e"), col("x.e"))) *
              sqrt(VectorExpressions.dotF32(col("y.e"), col("y.e")))), 6)
          .as("sim"))
      .localCheckpoint()
    // pick 1: pure relevance; the max-sim penalty term is 0 on an empty set
    var picked = cands
      .orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), col("rel"),
        lit(1L).as("pick"), round(lit(MmrLambda) * col("rel"), 6).as("mmr"))
      .localCheckpoint()
    for (s <- 2 to MmrPicks) {
      val selIds = picked.select(col("vec_id").as("sid"))
      val maxSim = sims.join(broadcast(selIds), col("b") === col("sid"))
        .groupBy(col("a")).agg(max(col("sim")).as("ms"))
      val pick = cands
        .join(broadcast(selIds), col("vec_id") === col("sid"), "left_anti")
        .join(broadcast(maxSim), col("vec_id") === col("a"))
        .withColumn("mmr",
          round(lit(MmrLambda) * col("rel") - lit(1 - MmrLambda) * col("ms"), 6))
        .orderBy(col("mmr").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("rel"), lit(s.toLong).as("pick"), col("mmr"))
      picked = picked.union(pick).localCheckpoint()
    }
    picked
  }

  private val mmrRerankOracle = {
    val steps = (2 to MmrPicks).map { s =>
      s"""s$s AS (
         |  SELECT c.vec_id, c.rel, CAST($s AS BIGINT) AS pick,
         |         round($MmrLambda * c.rel - ${1 - MmrLambda} * m.ms, 6) AS mmr
         |  FROM cand c
         |  JOIN (SELECT a, max(sim) AS ms FROM sims
         |        JOIN sel${s - 1} ON b = sel${s - 1}.vec_id GROUP BY a) m
         |    ON c.vec_id = m.a
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${s - 1})
         |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
         |sel$s AS (SELECT vec_id FROM sel${s - 1} UNION SELECT vec_id FROM s$s)"""
        .stripMargin
    }.mkString(",\n")
    val unions = (1 to MmrPicks)
      .map(s => s"SELECT vec_id, rel, pick, mmr FROM s$s").mkString("\nUNION ALL\n")
    s"""WITH v AS (
       |  SELECT vec_id, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn
       |  FROM embeddings),
       |p AS (SELECT e AS pe, vn AS pn FROM v WHERE vec_id = $ProbeVecId),
       |cand AS (
       |  SELECT vec_id, e, round(${duckDot("pe", "e")} / (pn * vn), 6) AS rel
       |  FROM v CROSS JOIN p WHERE vec_id <> $ProbeVecId
       |  ORDER BY rel DESC, vec_id LIMIT $ListK),
       |sims AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |         round(${duckDot("x.e", "y.e")} /
       |               (sqrt(${duckDot("x.e", "x.e")}) * sqrt(${duckDot("y.e", "y.e")})), 6) AS sim
       |  FROM cand x JOIN cand y ON x.vec_id <> y.vec_id),
       |s1 AS (
       |  SELECT vec_id, rel, CAST(1 AS BIGINT) AS pick, round($MmrLambda * rel, 6) AS mmr
       |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
       |sel1 AS (SELECT vec_id FROM s1),
       |$steps
       |$unions""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("hybrid_search_rrf", Some(hybridSearchRrfOracle), hybridSearchRrf),
    GraftQuery("hybrid_search_rrf_indexed",
      Some(hybridSearchRrfIndexedOracle), hybridSearchRrfIndexed),
    GraftQuery("mmr_rerank", Some(mmrRerankOracle), mmrRerank),
  )
}
