package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.plans.VectorExpressions
import graft.sources.Tables

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (Array[Float] vectors).
  *
  * - `ann_bruteforce`: exact top-k cosine for a probe set. The probe
  *   side broadcasts; similarity uses the codegen'd fused dot-product
  *   expression (graft.plans.FloatVecDot — one loop, no intermediate
  *   arrays); top-k is a rank-limit (WindowGroupLimit), so per-
  *   partition state is k rows per probe.
  * - `embedding_neardup`: top-50 most-similar candidate pairs from a
  *   banded hyperplane LSH (4 bands, scale-adaptive 12-24 bits per
  *   band — see [[ndSigBits]]). Candidates are pairs whose band
  *   signature matches in at least one band, with each bucket capped
  *   at its [[NdBucketCap]] lowest vec_ids — one equi-join over the
  *   capped buckets plus a distinct over the bounded candidate set,
  *   never an all-pairs product, so candidate volume is bounded by
  *   buckets × cap²/2 even when correlated clusters pile into shared
  *   buckets (`embedding_band_stats` discloses occupancy and capped
  *   mass). For genuine near-dups (cos >= 0.999) any-of-4-bands recall
  *   stays > 0.99 at every width — asserted on planted duplicates in
  *   ScalePostureSpec. Norms are precomputed once per vector, so each
  *   surviving candidate costs exactly one fused-dot pass.
  * - `ann_ivf`: IVF-style two-stage search — coarse quantize to
  *   per-label centroids, probe only the 2 nearest cells; the fine
  *   search touches ~2/10ths of the corpus and both stages stay as
  *   joins, never a driver loop.
  *
  * Similarities are rounded to 6 decimals before ranking so the
  * Spark/DuckDB float fold association can't flip an ordering.
  */
object SimilarityQueries {

  /** Fused double-precision dot product (codegen'd custom expression;
    * bit-identical to the sequential fold the DuckDB oracle runs).
    */
  private def dotCol(a: String, b: String): Column =
    VectorExpressions.dotF32(col(a), col(b))

  /** DuckDB twin with identical association order. */
  private def duckDot(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), 'sum')"

  /** ANN probe workload: every 100th vec_id, BOUNDED at id < 20000 so
    * the probe set is a FIXED batch (200 queries) once the corpus
    * passes 20k vectors instead of a set that grows with the corpus.
    * Round 11's decade probe caught the unbounded form: with probes
    * ∝ n, every probes×corpus search stage is quadratic per decade BY
    * WORKLOAD (ann_pq CPU grew 146× across the sf1→sf10 decade while
    * its per-probe cost grew 10× — exactly linear). At 100 TB the
    * query batch is what it is regardless of corpus size; fixing it
    * makes the measured growth the ENGINE's per-probe corpus scaling
    * (linear full scan for brute/pq, cell-bounded for ivf). The bound
    * is dormant at every oracle gate scale (sf ≤ 1 has ≤ 20k vectors)
    * and mirrored verbatim in every consumer's DuckDB oracle.
    */
  private val ProbeIdBound = 20000L
  private def probeFilter(id: Column): Column =
    id % 100 === 0 && id < ProbeIdBound

  /** Vectors + precomputed L2 norm (one pass per vector, not per pair). */
  private def vecsWithNorm(spark: SparkSession, dir: String, idAs: String, vecAs: String, normAs: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as(idAs), col("embedding").as(vecAs))
      .withColumn(normAs, sqrt(dotCol(vecAs, vecAs)))

  // --------------------------------------------------------- brute force
  private def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val vecs = vecsWithNorm(spark, dir, "vec_id", "e", "vn")
    val probes = vecsWithNorm(spark, dir, "probe_id", "pe", "pn")
      .filter(probeFilter(col("probe_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("simr").desc, col("vec_id"))
    vecs.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("simr", round(dotCol("pe", "e") / (col("pn") * col("vn")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), col("simr"), col("rn"))
  }

  private val annBruteforceOracle =
    s"""WITH v AS (
       |  SELECT vec_id, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn
       |  FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, e AS pe, vn AS pn FROM v WHERE vec_id % 100 = 0 AND vec_id < $ProbeIdBound),
       |s AS (
       |  SELECT probe_id, vec_id, round(${duckDot("pe", "e")} / (pn * vn), 6) AS simr
       |  FROM v CROSS JOIN p WHERE vec_id <> probe_id)
       |SELECT probe_id, vec_id, simr, rn FROM (
       |  SELECT s.*, row_number() OVER (PARTITION BY probe_id ORDER BY simr DESC, vec_id) AS rn
       |  FROM s) t
       |WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------- hard negatives
  /** Hard-negative mining for contrastive training: for every anchor
    * in the probe set, the top-5 most-similar vectors carrying a
    * DIFFERENT label — the near-boundary negatives a contrastive or
    * reranker objective wants, where random negatives are too easy.
    * Same broadcast-probe scan as `ann_bruteforce`, with the
    * label-mismatch filter applied BEFORE ranking so the per-probe
    * top-k heap never buffers a same-label row; at corpus scale the
    * scan side swaps for an IVF-pruned candidate set exactly as
    * `ann_ivf_pq` composes (cells are label-correlated, so prune to
    * the probe's nearest FOREIGN cells).
    */
  private def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("e"))
      .withColumn("vn", sqrt(dotCol("e", "e")))
    val probes = Tables.embeddings(spark, dir)
      .filter(probeFilter(col("vec_id")))
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("embedding").as("pe"))
      .withColumn("pn", sqrt(dotCol("pe", "pe")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("simr").desc, col("vec_id"))
    vecs.crossJoin(broadcast(probes))
      .filter(col("label") =!= col("probe_label"))
      .withColumn("simr", round(dotCol("pe", "e") / (col("pn") * col("vn")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("probe_label"), col("vec_id"),
        col("label"), col("simr"), col("rn"))
  }

  private val hardNegativesOracle =
    s"""WITH v AS (
       |  SELECT vec_id, label, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn
       |  FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, label AS probe_label, e AS pe, vn AS pn
       |      FROM v WHERE vec_id % 100 = 0 AND vec_id < $ProbeIdBound),
       |s AS (
       |  SELECT probe_id, probe_label, vec_id, label,
       |         round(${duckDot("pe", "e")} / (pn * vn), 6) AS simr
       |  FROM v CROSS JOIN p WHERE label <> probe_label)
       |SELECT probe_id, probe_label, vec_id, label, simr, rn FROM (
       |  SELECT s.*, row_number() OVER (PARTITION BY probe_id ORDER BY simr DESC, vec_id) AS rn
       |  FROM s) t
       |WHERE rn <= 5""".stripMargin

  // ------------------------------------------------------ near-dup pairs
  private val NdBands = 4
  /** Maximum planes (= signature bits) per band; the EFFECTIVE width is
    * scale-adaptive (see [[ndSigBits]]). LSH sizing: random-pair
    * collision probability per band is ~2^-bits at the corpus's
    * typical pair angle, so bits must track log2(n) — round 10 raised
    * a fixed 8 to a fixed 12 when the 20k-vector sf1 probe saturated
    * it, and round 11's decade probe showed the same saturation one
    * decade later (candidate CPU grew 73× across the sf0.1→sf1 decade:
    * with FIXED bits and cluster populations ∝ n, per-bucket occupancy
    * grows ∝ n and the banded join's candidate volume ∝ n²). Instead
    * of chasing the corpus with a constant, each query derives the
    * width from the corpus itself: bits = clamp(ceil(log2(n)), 12, 24)
    * — +log2(growth) bits per decade holds expected bucket occupancy
    * CONSTANT, so candidates scale with the corpus, not its square.
    * Each band owns a 24-plane budget and a width-w signature uses its
    * FIRST w planes (so it equals the low w bits of the full-width
    * one), which keeps the oracle static: DuckDB derives the same bits
    * from its own count(*) and iterates the same plane range. At the
    * oracle gate scales (≤ 2k vectors) the 12-bit floor is binding, so
    * gate outputs are unchanged from a fixed-12-bit design.
    */
  private val NdBandPlanes = 24 // 4 bands x 24 planes = 96 hyperplanes
  private val NdMinBits = 12

  /** Per-(band, signature) bucket cap for the candidate self-join. The
    * adaptive width holds RANDOM collisions constant across decades,
    * but CORRELATED vectors (the corpus's label clusters, any real
    * embedding space's dense regions) agree on sign bits with
    * probability far above 1/2 — their shared buckets grow ~linearly
    * with n no matter how many planes are added, and the self-join's
    * candidate volume grows with their square (round 11's decade probe
    * measured embedding_neardup at 36-42× CPU per decade ≈ n^1.6 with
    * the adaptive width alone). The cap keeps the `NdBucketCap` lowest
    * vec_ids per bucket (deterministic; mirrored in the DuckDB oracle
    * via QUALIFY), bounding pair volume at buckets × cap²/2 — the
    * MinHash-LSH 400-row precedent. Occupancy, swept-pair cost and
    * capped mass are disclosed by `embedding_band_stats`.
    */
  // env-overridable for caps-engaged verification runs (see Caps):
  // the value interpolates into both the Spark plan and the QUALIFY
  // clause of the DuckDB oracle, so an engaged run stays hash-exact
  private val NdBucketCap = Caps.env("GRAFT_CAP_ND_BUCKET", 400)

  /** Verify-join strategy gate for [[neardupPairs]]: corpora at or
    * under this row count broadcast the (id, embedding, norm) map to
    * keep the cap-bounded pair stream out of every exchange (proven
    * hash-exact + 3.1x/decade at 2M vectors, ~0.7 GB); above it the
    * lookups become shuffle-hash joins — a forced broadcast() hint is
    * honored unconditionally by Spark and fails outright past the hard
    * ~8 GB/512M-row broadcast limit instead of degrading. 8M rows
    * ≈ 2.8 GB at 64-float embeddings: comfortable against both the
    * broadcast limit and a 48g driver, an order below the failure
    * point.
    */
  private val NdVerifyBroadcastMaxRows: Long =
    Caps.envLong("GRAFT_ND_BCAST_MAX", 8000000L)

  /** Effective per-band signature width for an n-vector corpus:
    * ceil(log2(n)) clamped to [NdMinBits, NdBandPlanes]. */
  def ndSigBits(nVecs: Long): Int = {
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(math.max(2L, nVecs) - 1)
    math.min(NdBandPlanes, math.max(NdMinBits, ceilLog2))
  }

  private lazy val ndPlanes: Seq[Seq[Double]] = mdPlanes(NdBands * NdBandPlanes)

  /** `bits`-wide signature of one LSH band: bit j = sign of plane
    * (band*NdBandPlanes+j) dotted with the vector, j < bits. Only the
    * EFFECTIVE planes are computed (the band's plane budget is
    * NdBandPlanes; a narrower width uses its first `bits` planes, so a
    * width-w signature is exactly the low w bits of the full one).
    * Plane constants are the same md5-derived literals as
    * [[lshBucketCol]], so DuckDB reproduces them exactly.
    */
  private def ndSigCol(vecCol: String, band: Int, bits: Int): Column =
    VectorExpressions.planeSig(col(vecCol),
      ndPlanes.slice(band * NdBandPlanes, band * NdBandPlanes + bits))

  /** Banded-LSH near-dup candidate pairs over a (vec_id, embedding)
    * frame: pairs whose band signature matches in >= 1 of the 4 bands,
    * with their rounded cosine. Pure equi-join candidate generation —
    * the 100 TB shape. Public for the planted-recall spec.
    */
  /** A (vec_id, embedding) frame exploded to one row per LSH band with
    * its sigBits-wide signature, plus the precomputed norm — the join-ready
    * shape for banded candidate generation. Works on static AND
    * streaming frames (stateless column work), which is what makes the
    * streaming near-dup lookup a plain stream-static equi-join.
    */
  def bandKeyed(v: DataFrame, idAs: String, vecAs: String,
      normAs: String, bandAs: String, sigAs: String,
      sigsAs: String = "sigs_all", sigBits: Int = NdMinBits): DataFrame =
    v.select(col("vec_id").as(idAs), col("embedding").as(vecAs))
      .withColumn(normAs, sqrt(dotCol(vecAs, vecAs)))
      // keep the full per-band signature array alongside the exploded
      // (band, sig) join key: a downstream join can then keep ONLY the
      // first band in which a pair collides (`firstCollidingBand`) —
      // exact pair-dedup as a stateless column filter, no distinct()
      .withColumn(sigsAs, array((0 until NdBands).map(l =>
        ndSigCol(vecAs, l, sigBits)): _*))
      .select(col(idAs), col(vecAs), col(normAs), col(sigsAs),
        posexplode(col(sigsAs)).as(Seq(bandAs, sigAs)))

  /** TRUE iff `bandCol` (0-based) is the first band in which the two
    * signature arrays agree — keeps exactly one row per colliding pair
    * after a banded self/stream-static join, with no stateful dedup.
    * Valid only when NEITHER side is bucket-capped (under a cap, use
    * [[firstLiveCollidingBand]] with a [[bandKeyedCappedIndex]] side).
    */
  def firstCollidingBand(sigsA: String, sigsB: String, bandCol: String): Column =
    !exists(
      zip_with(slice(col(sigsA), lit(1), col(bandCol)),
        slice(col(sigsB), lit(1), col(bandCol)), (a, b) => a === b),
      x => x)

  /** Capped [[bandKeyed]] for the STATIC index side of a lookup join
    * (stream-static or batch): each (band, sig) bucket keeps its `cap`
    * lowest ids — one hot bucket otherwise amplifies EVERY probe row
    * that hashes to it by the bucket's full size — and every surviving
    * row carries `liveAs`, an array<boolean> over the NdBands bands,
    * true where this id survived its bucket. The mask exists because
    * capping breaks [[firstCollidingBand]]'s dedup invariant: an id can
    * be capped OUT of an earlier band's bucket yet live in a later one,
    * and a stateless filter on signature agreement alone would then
    * drop the pair entirely. [[firstLiveCollidingBand]] restores an
    * exact, stateless dedup key: first band where the signatures agree
    * AND the index row is live there.
    */
  def bandKeyedCappedIndex(v: DataFrame, idAs: String, vecAs: String,
      normAs: String, bandAs: String, sigAs: String, sigsAs: String,
      liveAs: String, sigBits: Int = NdMinBits,
      cap: Int = NdBucketCap): DataFrame = {
    val keyed = bandKeyed(v, idAs, vecAs, normAs, bandAs, sigAs, sigsAs, sigBits)
      .withColumn("nd_rn", row_number().over(
        Window.partitionBy(col(bandAs), col(sigAs)).orderBy(col(idAs))))
      .filter(col("nd_rn") <= cap).drop("nd_rn")
    val bands = keyed.groupBy(col(idAs))
      .agg(collect_set(col(bandAs)).as("_nd_live_bands"))
    keyed.join(bands, idAs)
      .withColumn(liveAs, transform(sequence(lit(0), lit(NdBands - 1)),
        j => array_contains(col("_nd_live_bands"), j.cast("integer"))))
      .drop("_nd_live_bands")
  }

  /** TRUE iff `bandCol` (0-based) is the first band in which the two
    * signature arrays agree AND the capped index row is live (`liveB`
    * from [[bandKeyedCappedIndex]]) — exactly one surviving row per
    * (probe, index) pair, still a stateless column filter (a
    * `.distinct()` on a stream would compile to unbounded
    * StreamingDeduplicate state).
    */
  def firstLiveCollidingBand(sigsA: String, sigsB: String, liveB: String,
      bandCol: String): Column =
    !exists(
      zip_with(
        zip_with(slice(col(sigsA), lit(1), col(bandCol)),
          slice(col(sigsB), lit(1), col(bandCol)), (a, b) => a === b),
        slice(col(liveB), lit(1), col(bandCol)),
        (eq, live) => eq && live),
      x => x)

  /** Fused-dot cosine between two (vector, norm) column pairs. */
  def cosineCol(aVec: String, aNorm: String, bVec: String, bNorm: String): Column =
    round(dotCol(aVec, bVec) / (col(aNorm) * col(bNorm)), 6)

  def neardupPairs(v: DataFrame, cap: Int = NdBucketCap,
      bcastMaxRows: Long = NdVerifyBroadcastMaxRows): DataFrame = {
    // one count to size the signature width from the corpus itself —
    // the price of holding bucket occupancy constant across decades
    // (the same count gates the verify-join strategy below)
    val nVecs = v.count()
    val bits = ndSigBits(nVecs)
    // SLIM candidate generation (r12, after the century probe measured
    // the payload-carrying form at 15.8×/decade): only (vec_id, band,
    // sig) plus two NdBands-element arrays (the full band-signature
    // vector and the cap-liveness mask) ride the bucket-cap window and
    // the banded self-join — the 64-float embedding and its norm
    // previously rode BOTH shuffles (~12× the bytes per row).
    val keyed = v
      .withColumn("sigs", array((0 until NdBands).map(l =>
        ndSigCol("embedding", l, bits)): _*))
      .select(col("vec_id"), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "sig")))
      .withColumn("nd_rn", row_number().over(
        Window.partitionBy(col("band"), col("sig")).orderBy(col("vec_id"))))
      .filter(col("nd_rn") <= cap)
      .drop("nd_rn")
    // a pair can collide in several bands (same simr each time — same
    // vectors), and under the cap "first band in which both collide"
    // is no longer a function of the two signature arrays alone (a row
    // can be capped OUT of an earlier band's bucket yet live in a
    // later one). r12 deduped with a distinct() over the candidate
    // set; at sf100 that aggregation (499M cap-bounded candidates —
    // embedding_band_stats.swept_pairs) spilled sorted runs past the
    // box's disk. The liveness mask restores an exact STATELESS dedup
    // (the firstLiveCollidingBand pattern, both sides capped): keep a
    // pair only in the first band where the signatures agree AND both
    // rows survived their bucket — one row per pair by construction,
    // no shuffle or aggregation of the pair stream.
    val liveBands = keyed.groupBy(col("vec_id"))
      .agg(collect_set(col("band")).as("_nd_lb"))
    val slim = keyed.join(liveBands, "vec_id")
      .withColumn("live", transform(sequence(lit(0), lit(NdBands - 1)),
        j => array_contains(col("_nd_lb"), j.cast("integer"))))
      .drop("_nd_lb")
    val cand = slim
      .select(col("vec_id").as("vec_a"), col("band"), col("sig"),
        col("sigs").as("sa"), col("live").as("la"))
      .join(slim.select(col("vec_id").as("vec_b"), col("band").as("band_b"),
          col("sig").as("sig_b"), col("sigs").as("sb"), col("live").as("lb")),
        col("band") === col("band_b") && col("sig") === col("sig_b") &&
          col("vec_a") < col("vec_b"))
      // "no earlier co-live colliding band" unrolled over the NdBands
      // compile-time constant as plain getItem comparisons: the
      // higher-order slice/zip_with/exists form computes the same
      // predicate but allocates several intermediate arrays per
      // candidate row outside whole-stage codegen — measured 88 µs/row
      // over ~50M sf10 candidates (4,428 CPU s, 6.8× the distinct()
      // it replaced); this form stays inside codegen
      .filter(!(0 until NdBands - 1).map { k =>
        lit(k) < col("band") &&
          col("sa").getItem(k) === col("sb").getItem(k) &&
          col("la").getItem(k) && col("lb").getItem(k)
      }.reduce(_ || _))
      .select(col("vec_a"), col("vec_b"))
    // verify dots via id→(embedding, norm) lookups. Within broadcast
    // range the map is broadcast and the pair stream (cap-bounded, but
    // ~500M rows at sf100) never shuffles — candidates flow join →
    // dedup filter → dot → top-k in one pipeline stage. The r12 form
    // attached the 64-float payload through two sort-merge joins, i.e.
    // sorted the pair stream WITH payload (~270 GB of sort spill at
    // sf100 — measured disk-dead). The broadcast side is the whole
    // (id, embedding, norm) map: ~0.7 GB at 2M vectors, ~350 B/row.
    // Past [[NdVerifyBroadcastMaxRows]] a forced broadcast() hint would
    // not degrade — Spark honors it up to a hard ~8 GB/512M-row limit
    // and then FAILS (ADVICE r13) — so the guard swaps both lookups to
    // SHUFFLE_HASH joins: the slim 16 B/row pair stream is hash-
    // exchanged (cap bound keeps that exchange finite) but never
    // sorted, and no side is collected to the driver.
    val fitsBroadcast = nVecs <= bcastMaxRows
    def lookupSide(df: DataFrame): DataFrame =
      if (fitsBroadcast) broadcast(df) else df.hint("shuffle_hash")
    val vn = v.select(col("vec_id"), col("embedding"))
      .withColumn("nn", sqrt(dotCol("embedding", "embedding")))
    cand
      .join(lookupSide(vn.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nn").as("na"))), "vec_a")
      .join(lookupSide(vn.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nn").as("nb"))), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(dotCol("ea", "eb") / (col("na") * col("nb")), 6).as("simr"))
  }

  private def embeddingNeardup(spark: SparkSession, dir: String): DataFrame =
    neardupPairs(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")))
      .orderBy(col("simr").desc, col("vec_a"), col("vec_b"))
      .limit(50)

  /** DuckDB twin of [[ndSigCol]]: computes the first `bitsRef` of band
    * `bandRef`'s NdBandPlanes-plane budget, exactly like the Spark
    * slice.
    */
  private def duckNdSig(vecCol: String, bandRef: String, bitsRef: String): String =
    s"""CAST(list_aggregate(list_transform(range(0, $bitsRef), j ->
       |  CASE WHEN list_aggregate(list_transform(range(1, len($vecCol) + 1), i ->
       |         (CAST(CAST('0x' || substr(md5(($NdBandPlanes * $bandRef + j) || '_' || i), 1, 8) AS UBIGINT) AS DOUBLE) / 2147483648.0 - 1.0)
       |         * $vecCol[i]::DOUBLE), 'sum') > 0
       |       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), 'sum') AS BIGINT)""".stripMargin

  private val embeddingNeardupOracle =
    s"""WITH v AS (
       |  SELECT vec_id, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn
       |  FROM embeddings),
       |nb AS (
       |  SELECT greatest($NdMinBits, least($NdBandPlanes,
       |           CAST(ceil(log2(greatest(2, count(*)))) AS INTEGER))) AS bits
       |  FROM embeddings),
       |k AS (
       |  SELECT vec_id, e, vn, g.band AS band,
       |         ${duckNdSig("e", "g.band", "nb.bits")} AS sig
       |  FROM v CROSS JOIN nb CROSS JOIN generate_series(0, ${NdBands - 1}) g(band)
       |  QUALIFY row_number() OVER (PARTITION BY band, sig ORDER BY vec_id) <= $NdBucketCap),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         round(${duckDot("a.e", "b.e")} / (a.vn * b.vn), 6) AS simr
       |  FROM k a JOIN k b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, simr FROM cand
       |ORDER BY simr DESC, vec_a, vec_b
       |LIMIT 50""".stripMargin

  /** Bucket-occupancy accounting for the banded near-dup join — the
    * `semdedup_cell_stats` pattern for the hyperplane-LSH space: bucket
    * count and mass, the largest bucket, the pair volume with and
    * without the [[NdBucketCap]] bound, and how much mass the cap
    * drops. A pipeline reads this BEFORE embedding_neardup: a
    * correlated mega-bucket shows up here as capped mass, not as a
    * melted-down scale budget.
    */
  private def embeddingBandStats(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val bits = ndSigBits(v.count())
    val occ = bandKeyed(v, "vec_a", "ea", "na", "band_a", "sig_a", "sigs_a", bits)
      .groupBy(col("band_a"), col("sig_a")).agg(count(lit(1)).as("m"))
    occ.agg(
      count(lit(1)).cast("long").as("n_buckets"),
      sum(col("m")).cast("long").as("n_entries"),
      max(col("m")).cast("long").as("max_bucket"),
      sum(expr("m * (m - 1) div 2")).cast("long").as("uncapped_pairs"),
      sum(expr(s"least(m, $NdBucketCap) * (least(m, $NdBucketCap) - 1) div 2"))
        .cast("long").as("swept_pairs"),
      sum(when(col("m") > NdBucketCap, 1L).otherwise(0L)).cast("long").as("capped_buckets"),
      sum(when(col("m") > NdBucketCap, col("m") - NdBucketCap).otherwise(0L))
        .cast("long").as("dropped_entries"))
  }

  private val embeddingBandStatsOracle =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |nb AS (
       |  SELECT greatest($NdMinBits, least($NdBandPlanes,
       |           CAST(ceil(log2(greatest(2, count(*)))) AS INTEGER))) AS bits
       |  FROM embeddings),
       |k AS (
       |  SELECT vec_id, g.band AS band,
       |         ${duckNdSig("e", "g.band", "nb.bits")} AS sig
       |  FROM v CROSS JOIN nb CROSS JOIN generate_series(0, ${NdBands - 1}) g(band)),
       |occ AS (SELECT band, sig, count(*) AS m FROM k GROUP BY 1, 2)
       |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       |       CAST(sum(m) AS BIGINT) AS n_entries,
       |       CAST(max(m) AS BIGINT) AS max_bucket,
       |       CAST(sum((m * (m - 1)) // 2) AS BIGINT) AS uncapped_pairs,
       |       CAST(sum((least(m, $NdBucketCap) * (least(m, $NdBucketCap) - 1)) // 2) AS BIGINT) AS swept_pairs,
       |       CAST(sum(CASE WHEN m > $NdBucketCap THEN 1 ELSE 0 END) AS BIGINT) AS capped_buckets,
       |       CAST(sum(CASE WHEN m > $NdBucketCap THEN m - $NdBucketCap ELSE 0 END) AS BIGINT) AS dropped_entries
       |FROM occ""".stripMargin

  // ------------------------------------------------------- LSH buckets
  private val LshPlanes = 6 // 2^6 = 64 buckets

  /** Random-hyperplane LSH sketch: bit p = sign of <plane_p, v>. The
    * hyperplanes are md5-derived pseudo-randoms — plane_p[i] =
    * hex32(md5("p_i"))/2^31 - 1 — computed once at PLAN BUILD time in
    * Scala and embedded as literals (an in-SQL md5 construction isn't
    * constant-folded inside higher-order lambdas and re-hashes per
    * row). DuckDB derives the same constants from the same formula, so
    * bucket assignment is exactly reproducible cross-engine. At corpus
    * scale the bucket join replaces the O(n²) pairwise scan; recall is
    * tunable by plane count and multi-probe.
    */
  private def mdPlanes(count: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until count).map { p =>
      (1 to 64).map { i =>
        val hex = md.digest(s"${p}_$i".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
      }
    }
  }

  private lazy val planes: Seq[Seq[Double]] = mdPlanes(LshPlanes)

  private def lshBucketCol(vecCol: String): Column =
    VectorExpressions.planeSig(col(vecCol), planes)

  private def duckLshBucket(vecCol: String): String =
    s"""CAST(list_aggregate(list_transform(range(0, $LshPlanes), p ->
       |  CASE WHEN list_aggregate(list_transform(range(1, len($vecCol) + 1), i ->
       |         (CAST(CAST('0x' || substr(md5(p || '_' || i), 1, 8) AS UBIGINT) AS DOUBLE) / 2147483648.0 - 1.0)
       |         * $vecCol[i]::DOUBLE), 'sum') > 0
       |       THEN (CAST(1 AS BIGINT) << p) ELSE 0 END), 'sum') AS BIGINT)""".stripMargin

  /** LSH-bucketed ANN: probes search only their own hyperplane bucket.
    * Same output shape as ann_bruteforce; fewer rows where a probe's
    * bucket holds fewer than k candidates.
    */
  private def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val vecs = vecsWithNorm(spark, dir, "vec_id", "e", "vn")
      .withColumn("bucket", lshBucketCol("e"))
    val probes = vecs
      .filter(probeFilter(col("vec_id")))
      .select(col("vec_id").as("probe_id"), col("e").as("pe"),
        col("vn").as("pn"), col("bucket").as("pbucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("simr").desc, col("vec_id"))
    vecs.join(broadcast(probes), col("bucket") === col("pbucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("simr", round(dotCol("pe", "e") / (col("pn") * col("vn")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), col("simr"), col("rn"))
  }

  private val annLshOracle =
    s"""WITH v AS (
       |  SELECT vec_id, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn,
       |         ${duckLshBucket("embedding")} AS bucket
       |  FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, e AS pe, vn AS pn, bucket AS pbucket
       |      FROM v WHERE vec_id % 100 = 0 AND vec_id < $ProbeIdBound),
       |s AS (
       |  SELECT probe_id, vec_id, round(${duckDot("pe", "e")} / (pn * vn), 6) AS simr
       |  FROM v JOIN p ON v.bucket = p.pbucket AND v.vec_id <> p.probe_id)
       |SELECT probe_id, vec_id, simr, rn FROM (
       |  SELECT s.*, row_number() OVER (PARTITION BY probe_id ORDER BY simr DESC, vec_id) AS rn
       |  FROM s) t
       |WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------------------- IVF
  /** IVF two-stage ANN. Centroids are per-label means (computed
    * distributedly via posexplode + per-dimension mean); each probe
    * searches only its 2 nearest cells. The per-dimension mean is a
    * DECIMAL sum divided once in double — order-independent, so the
    * centroid floats are bit-stable across engines and the whole
    * two-stage search has an exact DuckDB oracle (cell choice pinned by
    * round(csim, 6) + label tiebreak, fine ranking by round(sim, 6) +
    * vec_id, like the other ANN queries).
    */
  private def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"), col("embedding"))
    // per-label centroid in ONE aggregation pass: 64 decimal column
    // sums + a count over the unexploded rows (the posexplode form
    // multiplied shuffle volume 64x to group on (label, pos)). The
    // per-dimension mean stays a DECIMAL sum divided once in double —
    // order-independent, bit-stable floats in both engines.
    val dims = 1 to 64
    val dimSums = dims.map(i =>
      sum(element_at(col("embedding"), i).cast("double").cast(DecimalType(30, 12))).as(s"s$i")) :+
      count(lit(1)).as("cnt")
    val centroids = vecs
      .groupBy(col("label"))
      .agg(dimSums.head, dimSums.tail: _*)
      .select(col("label").as("c_label"),
        array(dims.map(i =>
          (col(s"s$i").cast("double") / col("cnt")).cast("float")): _*).as("cvec"))
    val probes = vecsWithNorm(spark, dir, "probe_id", "pe", "pn")
      .filter(probeFilter(col("probe_id")))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("csim").desc, col("c_label"))
    val cells = probes.crossJoin(broadcast(centroids))
      .withColumn("csim",
        round(dotCol("pe", "cvec") / (col("pn") * sqrt(dotCol("cvec", "cvec"))), 6))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= 2)
      .select(col("probe_id"), col("pe"), col("pn"), col("c_label"))
    val vecsN = vecsWithNorm(spark, dir, "vec_id", "e", "vn")
      .join(vecs.select(col("vec_id"), col("label")), "vec_id")
    val wFine = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("simr").desc, col("vec_id"))
    cells.join(vecsN, cells("c_label") === vecsN("label"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("simr", round(dotCol("pe", "e") / (col("pn") * col("vn")), 6))
      .withColumn("rn", row_number().over(wFine).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), col("simr"), col("rn"))
  }

  private val annIvfOracle =
    s"""WITH cent AS (
       |  SELECT label, g.i AS pos,
       |         CAST(SUM(CAST(embedding[g.i]::DOUBLE AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS v
       |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)
       |  GROUP BY 1, 2),
       |cvecs AS (
       |  SELECT label AS c_label, list_transform(list(v ORDER BY pos), x -> x::FLOAT) AS cvec
       |  FROM cent GROUP BY 1),
       |v AS (
       |  SELECT vec_id, label, embedding AS e,
       |         sqrt(${duckDot("embedding", "embedding")}) AS vn
       |  FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, e AS pe, vn AS pn FROM v WHERE vec_id % 100 = 0 AND vec_id < $ProbeIdBound),
       |cellsim AS (
       |  SELECT p.probe_id, p.pe, p.pn, c.c_label,
       |         round(${duckDot("pe", "cvec")} / (pn * sqrt(${duckDot("cvec", "cvec")})), 6) AS csim
       |  FROM p CROSS JOIN cvecs c),
       |cells AS (
       |  SELECT probe_id, pe, pn, c_label FROM (
       |    SELECT cellsim.*, row_number() OVER (PARTITION BY probe_id ORDER BY csim DESC, c_label) AS crn
       |    FROM cellsim) t
       |  WHERE crn <= 2),
       |s AS (
       |  SELECT cells.probe_id, v.vec_id,
       |         round(${duckDot("pe", "e")} / (pn * vn), 6) AS simr
       |  FROM cells JOIN v ON cells.c_label = v.label AND v.vec_id <> cells.probe_id)
       |SELECT probe_id, vec_id, simr, rn FROM (
       |  SELECT s.*, row_number() OVER (PARTITION BY probe_id ORDER BY simr DESC, vec_id) AS rn
       |  FROM s) t
       |WHERE rn <= 5""".stripMargin

  // ------------------------------------------------- int8 quantization
  /** Int8 embedding quantization round-trip: per-vector min/max affine
    * codes (floor(x + 0.5) — explicit, so both engines round ties
    * identically) and the reconstruction-error profile per vector.
    * This is the storage/bandwidth lever for ANN at 100 TB — a 4x
    * smaller index with error bounded by scale/2, and the max/mean
    * error columns are the acceptance check a pipeline would gate on.
    * Pure column expressions over one scan; codes stay distributed.
    */
  /** Quantization over any (vec_id, embedding) frame — public so the
    * constant-vector guard (mx == mn → all-zero codes, zero error) is
    * testable with planted inputs the corpus never produces.
    */
  def quantizeFrame(v: DataFrame): DataFrame = {
    v.select(col("vec_id"), col("embedding").as("e"))
      .withColumn("mn", array_min(col("e")).cast("double"))
      .withColumn("mx", array_max(col("e")).cast("double"))
      .withColumn("scale", (col("mx") - col("mn")) / 255)
      .withColumn("codes", when(col("mx") === col("mn"),
          transform(col("e"), _ => lit(0L)))
        .otherwise(transform(col("e"), v =>
          least(lit(255L), floor((v.cast("double") - col("mn")) / col("scale") + 0.5).cast("long")))))
      .withColumn("max_abs_err",
        round(aggregate(zip_with(col("codes"), col("e"),
            (c, v) => abs(col("mn") + c * col("scale") - v.cast("double"))),
          lit(0.0), (a, x) => greatest(a, x)), 9))
      .withColumn("mean_abs_err",
        round(aggregate(zip_with(col("codes"), col("e"),
            (c, v) => abs(col("mn") + c * col("scale") - v.cast("double"))),
          lit(0.0), (a, x) => a + x) / size(col("e")), 9))
      .select(col("vec_id"), round(col("mn"), 6).as("qmin"), round(col("mx"), 6).as("qmax"),
        col("max_abs_err"), col("mean_abs_err"))
  }

  private def embeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    quantizeFrame(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")))

  // --------------------------------- random projection (JL sketch)
  private val JlOutDims = 16
  private val JlInDims = 64

  /** The deterministic Rademacher projection matrix: entry (j,i) is
    * ±1/√m with the sign drawn from md5("jl{j}_{i}") — computed ONCE
    * at plan-build time in Scala (the identical constants are
    * interpolated into the oracle SQL), so no hashing ever runs per
    * row. 1/√16 = 0.25 is an exact binary fraction: every product
    * against a float32 input is exact in double, and the fixed-order
    * fold both engines apply makes the projected values bit-identical
    * cross-engine before the defensive round.
    */
  private lazy val jlMatrix: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until JlOutDims).map { j =>
      (0 until JlInDims).map { i =>
        val h = md.digest(s"jl${j}_$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 0.25 else -0.25
      }
    }
  }

  /** Johnson–Lindenstrauss dimensionality reduction (Achlioptas-style
    * ±1 projection): 64-dim float embeddings → 16 dims through a
    * literal sign matrix — pure per-row expression work, zero
    * shuffles, codegen end-to-end, and the Rademacher projection is
    * unbiased (E‖Rx‖² = ‖x‖²), so downstream ANN/dedup distance work
    * runs on ¼ the bytes with bounded distortion (spec-asserted on
    * real pairs). At 100 TB this is the standard pre-shrink before
    * sketch/index builds; the matrix rides the plan as literals so
    * the stage composes with any scan without a broadcast.
    */
  private def embeddingProject(spark: SparkSession, dir: String): DataFrame = {
    val proj = (0 until JlOutDims).map { j =>
      val row = array(jlMatrix(j).map(lit): _*)
      round(aggregate(zip_with(row, col("e"), (r, x) => r * x.cast("double")),
        lit(0.0), (a, v) => a + v), 9).as(f"y$j%02d")
    }
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding").as("e"))
      .select(col("vec_id") +: proj: _*)
  }

  private val embeddingProjectOracle = {
    val cols = (0 until JlOutDims).map { j =>
      val row = jlMatrix(j).mkString("[", ", ", "]")
      s"round(list_aggregate(list_transform(range(1, ${JlInDims + 1}), " +
        s"i -> ($row)[i] * embedding[i]::DOUBLE), 'sum'), 9) AS y${"%02d".format(j)}"
    }
    s"SELECT vec_id,\n${cols.mkString(",\n")}\nFROM embeddings"
  }

  private val embeddingQuantizeOracle =
    """WITH q AS (
      |  SELECT vec_id, embedding AS e,
      |    CAST(list_aggregate(e, 'min') AS DOUBLE) AS mn,
      |    CAST(list_aggregate(e, 'max') AS DOUBLE) AS mx
      |  FROM embeddings),
      |s AS (SELECT *, (mx - mn) / 255 AS scale FROM q),
      |c AS (
      |  SELECT *, CASE WHEN mx = mn
      |    THEN list_transform(e, x -> CAST(0 AS BIGINT))
      |    ELSE list_transform(e, x -> least(CAST(255 AS BIGINT), CAST(floor((x::DOUBLE - mn) / scale + 0.5) AS BIGINT)))
      |    END AS codes
      |  FROM s),
      |err AS (
      |  SELECT vec_id, mn, mx,
      |    list_aggregate(list_transform(range(1, len(e) + 1), i -> abs(mn + codes[i] * scale - e[i]::DOUBLE)), 'max') AS max_raw,
      |    list_aggregate(list_transform(range(1, len(e) + 1), i -> abs(mn + codes[i] * scale - e[i]::DOUBLE)), 'sum') / len(e) AS mean_raw
      |  FROM c)
      |SELECT vec_id, round(mn, 6) AS qmin, round(mx, 6) AS qmax,
      |       round(max_raw, 9) AS max_abs_err, round(mean_raw, 9) AS mean_abs_err
      |FROM err""".stripMargin

  // ------------------------------------------- product quantization ANN
  private val PqBlocks = 16
  private val PqBlockDims = 4 // 16 x 4 = 64 dims
  private val PqK = 16        // centroids per sub-space -> 64-bit codes
  private val PqShortlist = 50

  private def pqDist2(centCol: String, vecCol: String): Column =
    VectorExpressions.l2Dist2(col(centCol), col(vecCol))

  private def duckPqDist2(centCol: String, vecCol: String): String =
    s"""list_aggregate(list_transform(range(1, len($centCol) + 1),
       |  i -> ($centCol[i] - $vecCol[i]::DOUBLE) * ($centCol[i] - $vecCol[i]::DOUBLE)), 'sum')""".stripMargin

  /** Product-quantization ANN: m=16 sub-spaces of 4 dims, k=16
    * centroids each (64-bit codes), asymmetric-distance (ADC) shortlist
    * + exact re-rank — the memory-bound ANN design (Jégou et al., PAMI
    * 2011) that `ann_ivf`'s cell pruning composes with at 100 TB
    * (IVF-PQ-with-re-rank, the standard production stack).
    *
    * Training composes the `kmeans_embeddings` machinery per block: the
    * SAME md5-ordered seed vectors serve all 16 blocks (their block
    * slices), one Lloyd update with the decimal-sum-per-dimension
    * centroid mean (order-independent, bit-stable doubles both
    * engines), deterministic empty-cell re-seed via left-join +
    * coalesce. Codes = final per-block argmin (round(d,6) + cid pin).
    *
    * Search is the real PQ shape: a per-probe lookup table (probe-block
    * -> distance to each of the 16 block centroids; probes x 256 rows,
    * broadcast) joined to the code table on (block, cid), summed per
    * (probe, vec). Each block contribution quantizes to micro-unit
    * longs (round(d,6)·1e6 — exact integers, so the 16-way addition is
    * order-independent AND a primitive long sum in the hot agg). Per
    * vector that is 16 lookup-adds instead of 64 float multiplies — and
    * only the 50-vector ADC shortlist per probe ever touches full
    * floats again (exact L2 re-rank -> top-5). On isotropic Gaussian
    * embeddings — PQ's worst case, no cluster structure — the re-rank
    * lifts recall@5 from ~0.4 (pure ADC) to ~0.84 at sf0.01
    * (ScalePostureSpec pins >= 0.6). Shuffle stays proportional to
    * probes x codes; full vectors re-enter for probes x 50 rows only.
    */
  /** Trains the PQ model over (vec_id, e): returns (bv block slices,
    * c1 codebooks, codes) — shared by `ann_pq` and `ann_ivf_pq`.
    */
  /** (vec, block) slices — read by seeding, both assigns, and probes;
    * pure per-row column work (explode of 16 array slices).
    */
  private def blockSlices(v: DataFrame): DataFrame = {
    val blockCols = (0 until PqBlocks).map(b =>
      struct(lit(b.toLong).as("blk"),
        slice(col("e"), b * PqBlockDims + 1, PqBlockDims).as("be")))
    v.select(col("vec_id"), explode(array(blockCols: _*)).as("s"))
      .select(col("vec_id"), col("s.blk").as("blk"), col("s.be").as("be"))
  }

  private def pqTrain(v: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // checkpointed HERE (not inside blockSlices): training reads the
    // slices four times; the probe path slices only its 1% probe set
    // and memoizes that separately
    val bv = blockSlices(v).localCheckpoint()
    val seedIds = v.withColumn("skey", md5(col("vec_id").cast("string")))
      .orderBy(col("skey"), col("vec_id")).limit(PqK)
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("skey"), col("vec_id"))).cast("long") - 1)
      .select(col("vec_id"), col("cid"))
    val c0 = bv.join(broadcast(seedIds), "vec_id")
      .select(col("blk"), col("cid"),
        transform(col("be"), x => x.cast("double")).as("cv"))

    // QRound, not native round (r15 knife-edge audit): same iterative
    // Lloyd class as kmeansAssign — see the comment there.
    // (r17) the argmin over the block's 16 centroids is WITHIN-ROW once
    // the codebook rides along as one broadcast array per block: no ×k
    // fan-out and no (vec_id, blk) exchange + sort per Lloyd step
    // (§2.4 — at corpus scale each assign was a full shuffle of the
    // sliced vector table). array_min's struct comparison orders by
    // (d, cid) — exactly the old row_number(orderBy(d, cid)) = 1
    // winner over identical QRound'd distances.
    def assign(cents: DataFrame): DataFrame = {
      val byBlk = cents.groupBy(col("blk"))
        .agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbs"))
      bv.join(broadcast(byBlk), Seq("blk"))
        .withColumn("best", array_min(transform(col("cbs"), cb =>
          struct(
            QRound.col(graft.plans.VectorExpressions
              .l2Dist2(cb.getField("cv"), col("be")), 6).as("d"),
            cb.getField("cid").as("cid")))))
        .select(col("vec_id"), col("blk"), col("be"),
          col("best").getField("cid").as("cid"))
    }

    def update(assigned: DataFrame, prev: DataFrame): DataFrame = {
      val dims = 1 to PqBlockDims
      val dimSums = dims.map(i =>
        sum(element_at(col("be"), i).cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(30, 12))).as(s"s$i")) :+
        count(lit(1)).as("cnt")
      val means = assigned.groupBy(col("blk"), col("cid"))
        .agg(dimSums.head, dimSums.tail: _*)
        .select(col("blk"), col("cid"),
          array(dims.map(i => col(s"s$i").cast("double") / col("cnt")): _*).as("mv"))
      prev.join(means, Seq("blk", "cid"), "left")
        .select(col("blk"), col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
    }

    val c1 = update(assign(c0), c0).localCheckpoint()
    val codes = assign(c1).select(col("vec_id"), col("blk"), col("cid"))
    (bv, c1, codes)
  }

  /** ADC LUT + shortlist + exact re-rank over an optional candidate
    * restriction (None = whole corpus, the pure-PQ scan; Some(cand) =
    * only (probe_id, vec_id) pairs in cand, the IVF-pruned form).
    */
  private def pqSearch(v: DataFrame, bv: DataFrame, c1: DataFrame,
      codes: DataFrame, candidates: Option[DataFrame]): DataFrame = {
    val probeBlocks = bv.filter(probeFilter(col("vec_id")))
      .select(col("vec_id").as("probe_id"), col("blk"), col("be").as("pbe"))
    // block distances quantize to MICRO-UNIT LONGS, not DECIMAL(28,9):
    // round(d, 6) carries at most 6 decimals, so bd*1e6 is an exact
    // integer and the 16-way long sum is order-independent AND exact —
    // same cross-engine guarantee as the decimal, but precision 28
    // exceeds Spark's compact-long decimal range, so every one of the
    // probes × codes ADC rows was paying a boxed BigDecimal add
    val lut = probeBlocks.join(broadcast(c1), Seq("blk"))
      .select(col("probe_id"), col("blk"), col("cid"),
        round(round(pqDist2("cv", "pbe"), 6) * 1e6).cast("long").as("bd"))
    // LUT and codes each collapse to ONE ARRAY ROW per probe / per
    // vector (sorted by (blk, cid), so flat index = blk*cells + cid),
    // and the ADC sum fuses into a single codegen'd lookup loop per
    // (probe, vector) pair — versus the exploded form's (blk, cid)
    // equi-join emitting blocks× as many rows into a probes×vectors×
    // blocks hash-aggregate. Long addition over identical micro-unit
    // entries keeps the sum bit-identical to the grouped form the
    // DuckDB oracle still runs.
    val lutArr = lut
      .groupBy(col("probe_id"))
      .agg(array_sort(collect_list(struct(col("blk"), col("cid"), col("bd")))).as("ls"))
      .select(col("probe_id"), transform(col("ls"), s => s.getField("bd")).as("luts"))
    val codesArr = codes
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("blk"), col("cid")))).as("cs"))
      .select(col("vec_id"), transform(col("cs"), s => s.getField("cid")).as("cids"))
    val paired = candidates match {
      // the full-scan probes×vectors product IS ann_pq's semantics
      // (brute ADC baseline, like ann_bruteforce's exact scan); the
      // pruned paths below join on candidate pairs instead
      case None => codesArr.crossJoin(broadcast(lutArr))
      case Some(cand) => cand.join(codesArr, "vec_id")
        .join(broadcast(lutArr), "probe_id")
    }
    val wShort = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("adc_d2r"), col("vec_id"))
    val shortlist = paired
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sbd", graft.plans.VectorExpressions.adcSum(col("cids"), col("luts")))
      .withColumn("adc_d2r", round(col("sbd") / 1e6, 6))
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= PqShortlist)
      .select(col("probe_id"), col("vec_id"))
    // exact re-rank: full floats re-enter for probes x shortlist only
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("d2r"), col("vec_id"))
    shortlist
      .join(v, "vec_id")
      .join(v.select(col("vec_id").as("probe_id"), col("e").as("pe")), "probe_id")
      .withColumn("d2r", round(pqDist2FloatPair("pe", "e"), 6))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), col("d2r"), col("rn"))
  }

  /** Memoized PQ model per (session, dir) — the same persist-once
    * contract as the dedup tier's pair graph: ann_pq, ann_ivf_pq and
    * the index build all train the SAME codebooks, and a pipeline
    * trains once per corpus (the persisted-table form of the same idea
    * is `ann_index_build`). Returns (v, bv, c1, codes) with the
    * checkpoints the consumers re-read as leaf scans.
    */
  /** Checkpointed (vec_id, e) view of the corpus embeddings — the scan
    * every PQ path starts from; shared so `ann_index_probe` doesn't
    * leak a fresh per-call checkpoint of the same projection.
    */
  private def embView(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "emb_view")(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding").as("e")))

  private def pqTrained(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    Memo.cached(spark, dir, "pq_model") {
      val v = embView(spark, dir)
      val (bv, c1, codes) = pqTrain(v)
      val t = (v, bv, c1, codes.localCheckpoint())
      (t, Seq(t._2, t._3, t._4))
    }

  private def annPq(spark: SparkSession, dir: String): DataFrame = {
    val (v, bv, c1, codes) = pqTrained(spark, dir)
    pqSearch(v, bv, c1, codes, None)
  }

  /** IVF-PQ — the production ANN stack: the coarse per-label quantizer
    * of `ann_ivf` prunes the search to each probe's 2 nearest cells,
    * and `ann_pq`'s ADC + re-rank runs over those candidates only. At
    * 100 TB this is the composition that matters: cell pruning cuts the
    * ADC join's left side to nprobe/ncells of the corpus, codes stay
    * 64-bit, and full floats re-enter for probes x 50 rows. Cell choice
    * pins on round(L2, 6) + label, so the whole pipeline keeps an exact
    * DuckDB oracle.
    */
  /** Coarse quantizer: the per-label decimal-pinned centroid of ann_ivf. */
  private def coarseCentroids(vecs: DataFrame): DataFrame = {
    val dims = 1 to 64
    val dimSums = dims.map(i =>
      sum(element_at(col("embedding"), i).cast("double")
        .cast(org.apache.spark.sql.types.DecimalType(30, 12))).as(s"s$i")) :+
      count(lit(1)).as("cnt")
    vecs.groupBy(col("label"))
      .agg(dimSums.head, dimSums.tail: _*)
      .select(col("label").as("c_label"),
        array(dims.map(i =>
          (col(s"s$i").cast("double") / col("cnt")).cast("float")): _*).as("cvec"))
  }

  /** The IVF-pruned PQ search given an (already trained or loaded)
    * index: coarse cells via broadcast centroid crossJoin (≤2 per
    * probe), candidates from cell membership, then ADC + re-rank.
    */
  private def ivfPqSearch(vecs: DataFrame, v: DataFrame, bv: DataFrame,
      c1: DataFrame, codes: DataFrame, centroids: DataFrame): DataFrame = {
    val probes = v.filter(probeFilter(col("vec_id")))
      .select(col("vec_id").as("probe_id"), col("e").as("pe"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("cd"), col("c_label"))
    val cells = probes.crossJoin(broadcast(centroids))
      .withColumn("cd", round(pqDist2FloatPair("cvec", "pe"), 6))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= 2)
      .select(col("probe_id"), col("c_label"))
    val cand = cells
      .join(vecs.select(col("vec_id"), col("label")), cells("c_label") === col("label"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"))
    pqSearch(v, bv, c1, codes, Some(cand))
  }

  private def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val (v, bv, c1, codes) = pqTrained(spark, dir)
    ivfPqSearch(vecs, v, bv, c1, codes, coarseCentroids(vecs))
  }

  // -------------------------------------- persisted ANN index (build/probe)
  /** Table names are suffixed with the corpus dir's hash so an index
    * built at one scale factor is never probed against another.
    */
  private def annIndexTables(dir: String): (String, String, String) = {
    val tag = math.abs(dir.hashCode).toString
    (s"graft_ann_codes_$tag", s"graft_ann_codebooks_$tag", s"graft_ann_centroids_$tag")
  }

  /** Index BUILD, separated from probe: train the PQ codebooks + coarse
    * centroids once, persist them as managed tables — codes BUCKETED by
    * vec_id (the probe-side join key, so the big table never reshuffles
    * at query time), codebooks/centroids as tiny broadcast-scale model
    * tables. At 100 TB the build is the one expensive pass; every query
    * after it reads the index. Returns the codes read BACK from the
    * persisted table, so the oracle gates what was actually stored.
    */
  private def annIndexBuild(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val (_, _, c1, codes) = pqTrained(spark, dir)
    val (tCodes, tCb, tCent) = annIndexTables(dir)
    graft.operators.Storage.writeBucketed(codes, tCodes, 8, "vec_id")
    graft.operators.Storage.writeTable(c1, tCb)
    graft.operators.Storage.writeTable(coarseCentroids(vecs), tCent)
    spark.table(tCodes).select(col("vec_id"), col("blk"), col("cid"))
  }

  /** Probe-only query against the PERSISTED index: no training — block
    * slices are per-row column work on the probe set's own vectors, the
    * codebooks/centroids broadcast from their model tables, and the ADC
    * join hits the bucketed code table on its bucket key. Hash-exact vs
    * the fused `ann_ivf_pq` (same oracle), so persistence is proven
    * lossless. Builds the index first if this session hasn't.
    */
  private def annIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val (tCodes, tCb, tCent) = annIndexTables(dir)
    if (!spark.catalog.tableExists(tCodes)) annIndexBuild(spark, dir).count()
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val v = embView(spark, dir)
    // pqSearch reads the slice frame only for its PROBE rows — slice
    // just the probe set (corpus-side block work lives in the
    // persisted code table; re-slicing all n vectors per query was the
    // probe path's main per-call cost)
    val bv = Memo.frame(spark, dir, "probe_slices")(
      blockSlices(v.filter(probeFilter(col("vec_id")))))
    ivfPqSearch(vecs, v, bv,
      spark.table(tCb), spark.table(tCodes), spark.table(tCent))
  }

  /** Persisted coarse-centroid table (c_label, cvec) of the ANN index,
    * building the whole index on first use in a session — the entry
    * point `hybrid_search_rrf_indexed` prunes its dense list through.
    */
  def ivfCentroids(spark: SparkSession, dir: String): DataFrame = {
    val (tCodes, _, tCent) = annIndexTables(dir)
    if (!spark.catalog.tableExists(tCodes)) annIndexBuild(spark, dir).count()
    spark.table(tCent)
  }

  /** Exact squared L2 between two FLOAT vector columns (the same
    * per-element double-promoted fold the index's cell choice uses).
    */
  def l2Dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    VectorExpressions.l2Dist2(a, b)

  private val annIndexCodesOracle =
    s"""WITH $pqOracleCtes
       |SELECT vec_id, blk, cid FROM codes""".stripMargin

  /** Exact squared L2 between two FLOAT vectors (both promoted to
    * double per element — the same fold both engines run).
    */
  private def pqDist2FloatPair(a: String, b: String): Column =
    VectorExpressions.l2Dist2(col(a), col(b))

  /** Shared oracle CTE chain: PQ training (v .. codes) + probe LUT. */
  private def pqOracleCtes = {
    val d2cb = duckPqDist2("cv", "be")
    val d2cp = duckPqDist2("cv", "pbe")
    s"""v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |bv AS (
       |  SELECT vec_id, b.blk AS blk,
       |         list_slice(e, b.blk * $PqBlockDims + 1, (b.blk + 1) * $PqBlockDims) AS be
       |  FROM v CROSS JOIN (SELECT CAST(g.i AS BIGINT) AS blk
       |                     FROM generate_series(0, ${PqBlocks - 1}) g(i)) b),
       |seeds AS (
       |  SELECT vec_id, rn - 1 AS cid FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |    FROM v) s
       |  WHERE rn <= $PqK),
       |c0 AS (
       |  SELECT blk, cid, list_transform(be, x -> x::DOUBLE) AS cv
       |  FROM bv JOIN seeds USING (vec_id)),
       |a1 AS (
       |  SELECT vec_id, blk, be, cid FROM (
       |    SELECT bv.vec_id, bv.blk, bv.be, c0.cid,
       |           row_number() OVER (PARTITION BY bv.vec_id, bv.blk
       |             ORDER BY ${QRound.duck(d2cb, 6)}, c0.cid) AS rn
       |    FROM bv JOIN c0 ON bv.blk = c0.blk) s
       |  WHERE rn = 1),
       |s1 AS (
       |  SELECT blk, cid, g.i AS pos,
       |         CAST(SUM(CAST(be[g.i]::DOUBLE AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
       |  FROM a1 CROSS JOIN generate_series(1, $PqBlockDims) g(i)
       |  GROUP BY 1, 2, 3),
       |c1m AS (SELECT blk, cid, list(m ORDER BY pos) AS mv FROM s1 GROUP BY 1, 2),
       |c1 AS (SELECT c0.blk, c0.cid, coalesce(c1m.mv, c0.cv) AS cv
       |       FROM c0 LEFT JOIN c1m ON c0.blk = c1m.blk AND c0.cid = c1m.cid),
       |codes AS (
       |  SELECT vec_id, blk, cid FROM (
       |    SELECT bv.vec_id, bv.blk, c1.cid,
       |           row_number() OVER (PARTITION BY bv.vec_id, bv.blk
       |             ORDER BY ${QRound.duck(duckPqDist2("cv", "be"), 6)}, c1.cid) AS rn
       |    FROM bv JOIN c1 ON bv.blk = c1.blk) s
       |  WHERE rn = 1),
       |pb AS (SELECT vec_id AS probe_id, blk, be AS pbe FROM bv WHERE vec_id % 100 = 0 AND vec_id < $ProbeIdBound),
       |lut AS (
       |  SELECT pb.probe_id, pb.blk, c1.cid,
       |         CAST(round(round($d2cp, 6) * 1000000) AS BIGINT) AS bd
       |  FROM pb JOIN c1 ON pb.blk = c1.blk)""".stripMargin
  }

  /** Shortlist + exact-re-rank oracle tail (expects an `adc` CTE). */
  private def pqOracleTail =
    s"""short AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT adc.*, row_number() OVER (PARTITION BY probe_id ORDER BY adc_d2r, vec_id) AS srn
       |    FROM adc) t
       |  WHERE srn <= $PqShortlist),
       |rr AS (
       |  SELECT short.probe_id, short.vec_id,
       |         round(list_aggregate(list_transform(range(1, len(p.e) + 1),
       |           i -> (p.e[i]::DOUBLE - dv.e[i]::DOUBLE) * (p.e[i]::DOUBLE - dv.e[i]::DOUBLE)), 'sum'), 6) AS d2r
       |  FROM short JOIN v dv ON short.vec_id = dv.vec_id
       |  JOIN v p ON short.probe_id = p.vec_id)
       |SELECT probe_id, vec_id, d2r, rn FROM (
       |  SELECT rr.*, row_number() OVER (PARTITION BY probe_id ORDER BY d2r, vec_id) AS rn
       |  FROM rr) t
       |WHERE rn <= 5""".stripMargin

  private val annPqOracle =
    s"""WITH $pqOracleCtes,
       |adc AS (
       |  SELECT lut.probe_id, codes.vec_id,
       |         round(CAST(sum(bd) AS DOUBLE) / 1000000, 6) AS adc_d2r
       |  FROM codes JOIN lut ON codes.blk = lut.blk AND codes.cid = lut.cid
       |  WHERE codes.vec_id <> lut.probe_id
       |  GROUP BY 1, 2),
       |$pqOracleTail""".stripMargin

  private val annIvfPqOracle =
    s"""WITH $pqOracleCtes,
       |cent AS (
       |  SELECT label, g.i AS pos,
       |         CAST(SUM(CAST(embedding[g.i]::DOUBLE AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
       |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)
       |  GROUP BY 1, 2),
       |cvecs AS (
       |  SELECT label AS c_label, list_transform(list(m ORDER BY pos), x -> x::FLOAT) AS cvec
       |  FROM cent GROUP BY 1),
       |p AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id % 100 = 0 AND vec_id < $ProbeIdBound),
       |cells AS (
       |  SELECT probe_id, c_label FROM (
       |    SELECT p.probe_id, c.c_label,
       |           row_number() OVER (PARTITION BY p.probe_id
       |             ORDER BY round(${duckPqDist2("cvec", "pe")}, 6), c.c_label) AS crn
       |    FROM p CROSS JOIN cvecs c) t
       |  WHERE crn <= 2),
       |cand AS (
       |  SELECT cells.probe_id, vl.vec_id
       |  FROM cells JOIN embeddings vl ON cells.c_label = vl.label
       |  WHERE vl.vec_id <> cells.probe_id),
       |adc AS (
       |  SELECT cand.probe_id, cand.vec_id,
       |         round(CAST(sum(bd) AS DOUBLE) / 1000000, 6) AS adc_d2r
       |  FROM cand
       |  JOIN codes ON cand.vec_id = codes.vec_id
       |  JOIN lut ON lut.probe_id = cand.probe_id
       |         AND lut.blk = codes.blk AND lut.cid = codes.cid
       |  GROUP BY 1, 2),
       |$pqOracleTail""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    // index build FIRST: it trains (and memoizes) the shared PQ model,
    // so with the bench's per-pass memo reset the training cost lands
    // in this named entry and ann_pq/ann_ivf_pq pin steady-state search
    GraftQuery("ann_index_build", Some(annIndexCodesOracle), annIndexBuild),
    GraftQuery("ann_index_probe", Some(annIvfPqOracle), annIndexProbe),
    GraftQuery("ann_pq", Some(annPqOracle), annPq),
    GraftQuery("ann_ivf_pq", Some(annIvfPqOracle), annIvfPq),
    GraftQuery("ann_bruteforce", Some(annBruteforceOracle), annBruteforce),
    GraftQuery("hard_negatives", Some(hardNegativesOracle), hardNegatives),
    GraftQuery("embedding_neardup", Some(embeddingNeardupOracle), embeddingNeardup),
    GraftQuery("embedding_band_stats", Some(embeddingBandStatsOracle), embeddingBandStats),
    GraftQuery("ann_lsh", Some(annLshOracle), annLsh),
    GraftQuery("ann_ivf", Some(annIvfOracle), annIvf),
    GraftQuery("embedding_quantize", Some(embeddingQuantizeOracle), embeddingQuantize),
    GraftQuery("embedding_project", Some(embeddingProjectOracle), embeddingProject),
  )
}
