package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Deduplication tier over the `documents` corpus — the operators a
  * 100 TB training-data pipeline runs before anything else:
  *
  *  - exact dedup (content-hash group-by),
  *  - MinHash + LSH banding (near-dup candidate generation without the
  *    O(n²) pairwise scan),
  *  - SimHash (bit-vote fingerprints + Hamming-band pairing),
  *  - character-n-gram Jaccard (verification-grade set similarity).
  *
  * Everything hashes through md5 so each stage has an exact DuckDB
  * oracle; at production scale you'd swap md5 for xxhash64 (same
  * shapes, faster) — the plan structure is what matters: explode →
  * partial-agg → band-key equi-join keeps all work distributed and
  * shuffle volume proportional to candidates, not pairs.
  */
object DedupQueries {

  // ------------------------------------------------------- exact dedup
  private def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
  }

  private val dedupExactOracle =
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------- shared shingles
  /** Distinct word-3-shingles per doc: (doc_id, sh). */

  private val duckShingles =
    """sh AS (
      |  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
      |    THEN list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |    ELSE [] END) AS sh
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents))""".stripMargin

  /** Distinct word-5-shingles per doc (decontamination granularity). */
  private def shingles5(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("shs", array_distinct(TextFunctions.wordShingles("toks", 5)))
      .select(col("doc_id"), explode(col("shs")).as("sh"))
  }

  private val duckShingles5 =
    """sh AS (
      |  SELECT doc_id, unnest(CASE WHEN len(w) >= 5
      |    THEN list_distinct(list_transform(range(1, len(w) - 3),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
      |    ELSE [] END) AS sh
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents))""".stripMargin

  // ------------------------------------------------------ MinHash + LSH
  /** 16 bands × 4 rows (64 permutations). Round 11's decade probe
    * caught the original 4 bands × 2 rows superlinear (dedup_minhash_lsh
    * CPU grew 213× across the sf1→sf10 decade): with r = 2, two
    * UNRELATED docs of Jaccard J collide in a band with probability J²
    * — on a bounded-vocabulary corpus that keeps every bucket's
    * occupancy growing ∝ n UNDER the 400-row cap, so candidate volume
    * (Σ|bucket|²) grows ∝ n² until buckets saturate. r = 4 drops the
    * background collision rate to J⁴ (25× fewer false candidates at
    * J = 0.1) and makes the band key 4 signatures wide, so bucket
    * granularity grows exponentially with r and occupancy tracks TRUE
    * near-dup clusters (fixed size in any real corpus), not n. The
    * S-curve midpoint (1/b)^(1/r) = (1/16)^(1/4) = 0.5 still sits
    * exactly at the verify threshold; recall for a true pair at
    * J = 0.7 is 1−(1−0.7⁴)^16 ≈ 0.99. Permutations are universal
    * hashes (a·h+b mod P) with a, b derived from two fixed LCG seeds —
    * the oracle SQL interpolates the SAME Seq values, so both engines
    * agree exactly.
    */
  private val NumBands = 16
  private val RowsPerBand = 4
  private val NumPerms = NumBands * RowsPerBand
  private val P = 2147483647L // 2^31 - 1: a*h + b stays under 2^62
  private val PermA = (1 to NumPerms).map(i => (15485863L * i + 32452843L) % P)
  private val PermB = (1 to NumPerms).map(i => (86028121L * i + 104395301L) % P)

  // -------------------------------------------- band-bucket cap (scale)
  /** Per-(band, bucket) candidate caps. A bucket of n docs yields
    * n·(n−1)/2 candidate pairs, so ONE boilerplate-heavy bucket turns a
    * banded self-join quadratic (observed: the sf1 probe corpus grew
    * 725 → 6.77M SimHash pairs across a 100× doc scale-up). Standard
    * LSH practice caps the bucket: buckets above the cap are SKIPPED
    * entirely — a bucket that hot is a stop-signature carrying no
    * discriminative signal (near-identical docs still pair through
    * their other, rarer bands, and byte-identical docs are exact-dedup's
    * job, not LSH's). The skip is mirrored verbatim in every DuckDB
    * oracle, so correctness holds at ANY scale, whether or not the cap
    * engages; `dedup_band_stats` accounts the dropped mass. With the
    * cap, SimHash pair volume is bounded by 4·256·cap²/2 regardless of
    * corpus size, and MinHash candidates by buckets·cap²/2 — linear in
    * docs, never n². Measured on the driver corpus: at the sf0.01 gate
    * the largest buckets are 128 (SimHash) and 4 (MinHash), so the cap
    * stays dormant and gate outputs are unchanged; at sf0.1 eight
    * SimHash stop-signature buckets exceed 400 docs (max 1,338) and
    * carry 73% of the 2.8M-pair worst-case candidate volume — exactly
    * the mass the cap exists to shed.
    */
  // env-overridable (Caps.env) so a caps-engaged verification run can
  // force the dormant backstops at small scale; the value interpolates
  // into the DuckDB oracle SQL too, so such a run stays hash-exact
  private[queries] val SimhashBandCap = Caps.env("GRAFT_CAP_SIMHASH_BAND", 400)
  private[queries] val MinhashBandCap = Caps.env("GRAFT_CAP_MINHASH_BAND", 400)

  /** Drop every row of any (key) bucket holding more than `cap` rows.
    * The oversized-bucket list is a heavy-hitter rollup — tiny by
    * construction — so it broadcasts and the filter costs one
    * map-side-combined agg + a broadcast anti-join, never a shuffle of
    * the banded table.
    */
  private def capBuckets(banded: DataFrame, cap: Int, keys: Seq[String]): DataFrame = {
    val big = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > cap)
      .select(keys.map(col): _*)
    banded.join(broadcast(big), keys, "left_anti")
  }

  // --------------------------------- shared pair-graph (per-run reuse)
  /** The SimHash pair graph is consumed by SIX registered queries
    * (pairs, components, edit-distance, PageRank, LPA, triangles — and
    * cluster_representatives through components). Re-deriving the
    * banded self-join per query is pure waste: a pipeline materializes
    * the pair table once per corpus and every graph consumer reads it.
    * Memoized per (session, input dir) in [[Memo]] as an
    * eagerly-computed localCheckpoint — a leaf plan, so each consumer
    * re-plans against a scan; evictable, so a corpus-cycling session's
    * footprint stays bounded.
    */

  /** MinHash signatures via universal hashing — ONE md5 per distinct
    * shingle, then each of the 64 permutations is `(a_p*h + b_p) mod P`
    * (arithmetic only, exact in both engines). Hashing cost is 1/64 of
    * the naive seeded-md5-per-permutation form and the permutation math
    * stays inside whole-stage codegen. Banded into 16 LSH buckets of 4
    * rows; docs sharing any band bucket become candidate pairs, then
    * exact shingle-Jaccard >= 0.5 confirms. The band self-join is an
    * equi-join on (band, band_key) — candidate volume scales with true
    * collisions, never with n².
    */
  /** The MinHash index tables — (sh, sigs, bands) — shared by the
    * all-pairs `dedup_minhash_lsh` and the batch-vs-corpus
    * `dedup_incremental` probe.
    */
  /** Memoized per (session, dir) like the pair graph: SIX registered
    * queries (lsh, containment, incremental, ngram-jaccard, verdicts,
    * band-stats) consume this index, and a pipeline materializes it
    * once per corpus — at the sf1 probe each rebuild costs ~10 s. The
    * bench-visible build entry is `minhash_index_build`.
    */
  private def minhashIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    Memo.cached(spark, dir, "minhash_index") {
      val t @ (sets, sigs, _) = minhashIndexFresh(spark, dir)
      (t, Seq(sets, sigs))
    }

  /** Packed key of band `b` from the 64 signature columns s0..s63:
    * md5 over the band's `RowsPerBand` signatures joined with '_',
    * truncated to a BIGINT. Shared by the static index build and the
    * streaming-compatible [[minhashBandKeyed]] so their keys are
    * bit-identical.
    */
  private def bandKeyCol(b: Int): Column = {
    val sigs = (0 until RowsPerBand).map(r => col(s"s${RowsPerBand * b + r}"))
    conv(substring(md5(concat_ws("_", sigs: _*)), 1, 15), 16, 10).cast("long")
  }

  /** DuckDB twin of [[bandKeyCol]] for band index `b`. */
  private def duckBandKey(b: Int): String = {
    val cat = (0 until RowsPerBand).map(r => s"s${RowsPerBand * b + r}")
      .mkString(" || '_' || ")
    s"CAST(CAST('0x' || substr(md5($cat), 1, 15) AS UBIGINT) AS BIGINT)"
  }

  private def minhashIndexFresh(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    // eager checkpoints, not cache(): sets and sigs are each read by
    // multiple downstream joins, and a checkpoint is a LEAF plan — the
    // candidate/intersection joins re-plan against a scan instead of
    // re-analyzing the whole shingle pipeline (same lesson as the
    // SimHash signature table). The checkpointed form is the GROUPED
    // per-doc shingle-set array (what the verify stages intersect);
    // the exploded (doc_id, sh) stream the signature rollup needs is
    // derived from it with one cheap explode.
    val sets = Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        array_distinct(TextFunctions.wordShingles("toks", 3)).as("shs"))
      .localCheckpoint()
    val sh = sets.select(col("doc_id"), explode(col("shs")).as("sh"))
    val hashed = sh.withColumn("hv",
      expr(s"CAST(conv(substr(md5(sh), 1, 8), 16, 10) AS LONG) % $P"))
    // signatures AND shingle-set sizes in one aggregation pass
    val sigAggs = (0 until NumPerms).map(p =>
      min(expr(s"(${PermA(p)} * hv + ${PermB(p)}) % $P")).as(s"s$p")) :+
      count(lit(1)).as("c")
    val sigs = hashed.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*).localCheckpoint()
    // band key: md5 over the band's 4 row-signatures rendered in
    // decimal, truncated to 15 hex chars (< 2^60 — fits a BIGINT).
    // Both engines render non-negative BIGINTs identically and share
    // the md5, so the packed keys agree exactly; a cross-band hash
    // collision could only ADD a candidate pair, which the exact
    // Jaccard verify stage then scores like any other candidate.
    val bandCols = (0 until NumBands).map(b =>
      struct(lit(b).as("band"), bandKeyCol(b).as("bh")))
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bh").as("bh"))
    (sets, sigs, bands)
  }

  /** |A ∩ B| per candidate pair, computed as ONE `array_intersect`
    * over the grouped gram-set arrays instead of the exploded
    * gram-equi-join + count rollup: shuffle drops from ∝ (pairs ×
    * grams-per-doc) rows to ∝ (pairs + docs), and the set
    * intersection runs inside the join projection as codegen'd column
    * work. Pairs with an empty intersection now survive to the score
    * filter with i = 0 (the old inner gram join dropped them); every
    * consumer thresholds on a score that is 0 there, so outputs are
    * identical — and the DuckDB oracles keep the exploded-join form,
    * which the hash gate proves equivalent.
    */
  private def pairIntersections(cand: DataFrame, sets: DataFrame,
      aKey: String, bKey: String): DataFrame =
    cand
      .join(sets.as("gx"), col(aKey) === col("gx.doc_id"))
      .join(sets.as("gy"), col(bKey) === col("gy.doc_id"))
      .select(col(aKey), col(bKey),
        size(array_intersect(col("gx.shs"), col("gy.shs"))).cast("long").as("i"))

  /** Band-exploded MinHash frame from a (doc_id, text) frame — pure
    * COLUMN work (an array fold per row: min of each universal-hash
    * permutation over the distinct shingle set), no explode+groupBy.
    * That makes it work identically on static AND streaming frames,
    * which is what turns the incremental dedup probe into a stateless
    * stream-static equi-join. Values are identical to the
    * exploded/aggregated form [[minhashIndex]] builds: same
    * md5-derived hash, same permutations, same packed band keys.
    * Output: (idAs, shsAs distinct-shingle array, cAs set size,
    * bandAs 0-based band, bhAs packed key, bandsAs all 16 keys).
    */
  def minhashBandKeyed(docs: DataFrame, idAs: String, shsAs: String,
      cAs: String, bandAs: String, bhAs: String, bandsAs: String): DataFrame = {
    val shs = array_distinct(graft.plans.TextExpressions.wordShingles(
      TextFunctions.tokens(col("text")), 3))
    val sigCols = (0 until NumPerms).map { p =>
      array_min(transform(col("hvs"),
        h => (h * PermA(p) + PermB(p)) % P)).as(s"s$p")
    }
    val bandKeys = (0 until NumBands).map(bandKeyCol)
    docs
      .withColumn(shsAs, shs)
      // docs with <3 tokens have an empty shingle set: array_min over it
      // yields NULL signatures/band keys. The exploded minhashIndex form
      // simply omits such docs, so drop them here too — otherwise a
      // future null-safe ('<=>') band join would bucket every short doc
      // together.
      .filter(size(col(shsAs)) >= 1)
      .withColumn("hvs", transform(col(shsAs),
        x => conv(substring(md5(x), 1, 8), 16, 10).cast("long") % P))
      .select(Seq(col("doc_id").as(idAs), col(shsAs),
        size(col(shsAs)).cast("long").as(cAs)) ++ sigCols: _*)
      .withColumn(bandsAs, array(bandKeys: _*))
      .select(col(idAs), col(shsAs), col(cAs), col(bandsAs),
        posexplode(col(bandsAs)).as(Seq(bandAs, bhAs)))
  }

  /** Capped static-index form of [[minhashBandKeyed]] for stream-static
    * probes: oversized (band, bucket) buckets are SKIPPED (the
    * [[capBuckets]] policy the batch candidate path applies), and each
    * surviving row carries `liveAs` — array<boolean> over the NumBands
    * bands, true where this doc's bucket survived — so multi-band
    * collisions still dedup statelessly via
    * [[SimilarityQueries.firstLiveCollidingBand]] even when a doc was
    * capped out of an earlier band (a filter on band-key agreement
    * alone would drop such a pair entirely). Without the cap, one hot
    * stop-signature bucket amplifies EVERY probe row that hashes to it
    * by the bucket's full size; the batch twins cap their self-join the
    * same way, so stream/batch equality holds at any scale.
    */
  def minhashBandKeyedCappedIndex(docs: DataFrame, idAs: String,
      shsAs: String, cAs: String, bandAs: String, bhAs: String,
      bandsAs: String, liveAs: String,
      cap: Int = MinhashBandCap): DataFrame = {
    val keyed = minhashBandKeyed(docs, idAs, shsAs, cAs, bandAs, bhAs, bandsAs)
    val kept = capBuckets(keyed, cap, Seq(bandAs, bhAs))
    val live = kept.groupBy(col(idAs)).agg(collect_set(col(bandAs)).as("_mh_live"))
    kept.join(live, idAs)
      .withColumn(liveAs, transform(sequence(lit(0), lit(NumBands - 1)),
        j => array_contains(col("_mh_live"), j.cast("integer"))))
      .drop("_mh_live")
  }

  /** Candidate pairs from the LSH band equi-join — the scale-safe
    * candidate generator shared by `dedup_minhash_lsh` (which verifies
    * with shingle-Jaccard) and `dedup_ngram_jaccard` (which verifies
    * with char-3-gram Jaccard).
    */
  private def bandCandidates(bands: DataFrame): DataFrame = {
    val kept = capBuckets(bands, MinhashBandCap, Seq("band", "bh"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** [[bandCandidates]] over the shared MinHash index, memoized per
    * (session, dir) (r16): three registered verifiers (minhash-Jaccard,
    * containment, char-3-gram Jaccard) each re-ran the band self-join +
    * distinct over the SAME banded signature table — a pipeline
    * generates the candidate list once. Layered memo: the build calls
    * the minhash_index memo within the same (session, dir) stripe,
    * which is re-entrant by design (see [[Memo.cached]]).
    */
  private def bandCandidatesShared(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "band_candidates")(
      bandCandidates(minhashIndex(spark, dir)._3))

  /** Memoized per (session, dir) (r16, the pair-graph/quality-gate
    * precedent): the confirmed near-dup pair list is read by BOTH
    * `dedup_minhash_lsh` and `dedup_verdicts` — a pipeline confirms the
    * candidate pairs once per corpus. `dedup_verdicts` registers first,
    * so each bench pass pays the shingle-intersection confirm there.
    */
  private def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "minhash_lsh_pairs")(minhashLshFresh(spark, dir))

  private def minhashLshFresh(spark: SparkSession, dir: String): DataFrame = {
    val (sets, sigs, _) = minhashIndex(spark, dir)
    val cand = bandCandidatesShared(spark, dir)
    val cnt = sigs.select(col("doc_id"), col("c"))
    val inter = pairIntersections(cand, sets, "doc_a", "doc_b")
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jaccard", col("i").cast("double") / (col("ca.c") + col("cb.c") - col("i")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Shared oracle prefix: shingles → hashed → sig → bands. */
  private val duckMinhashIndex = {
    val sigCols = (0 until NumPerms).map(p =>
      s"min((${PermA(p)} * hv + ${PermB(p)}) % $P) AS s$p").mkString(", ")
    val bandCase = (0 until NumBands).map(b =>
      s"WHEN $b THEN ${duckBandKey(b)}").mkString(" ")
    s"""$duckShingles,
       |hashed AS (
       |  SELECT doc_id, CAST(CAST('0x' || substr(md5(sh), 1, 8) AS UBIGINT) AS BIGINT) % $P AS hv
       |  FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM hashed GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, g.b AS band, CASE g.b $bandCase END AS bh
       |  FROM sig CROSS JOIN generate_series(0, ${NumBands - 1}) g(b)),
       |bigmb AS (SELECT band, bh FROM bands GROUP BY 1, 2 HAVING count(*) > $MinhashBandCap),
       |keptmb AS (SELECT bands.* FROM bands ANTI JOIN bigmb USING (band, bh))""".stripMargin
  }

  private val minhashOracle = {
    s"""WITH $duckMinhashIndex,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keptmb a JOIN keptmb b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
       |xa AS MATERIALIZED (
       |  SELECT doc_a, doc_b, x.sh AS sh
       |  FROM cand JOIN sh x ON x.doc_id = doc_a),
       |inter AS (
       |  SELECT doc_a, doc_b, count(*) AS i
       |  FROM xa JOIN sh y ON y.doc_id = doc_b AND y.sh = xa.sh
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
       |FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.5""".stripMargin
  }

  // ------------------------------------------------- containment dedup
  private val ContainmentMin = 0.7

  /** Asymmetric-containment near-dup detection over the SAME banded
    * LSH candidates as `dedup_minhash_lsh`: C(a⊂b) = |A∩B| / |A|.
    * Jaccard misses the small-doc-embedded-in-large-doc case (a 50-word
    * quote inside a 5000-word page has J ≈ 0.01 but containment ≈ 1);
    * a training-corpus dedup pass needs both lenses. Reported when
    * either direction's containment ≥ 0.7 — greatest(i/ca, i/cb).
    *
    * Scale shape: identical to dedup_minhash_lsh — band equi-join
    * candidates (collisions, never n²), intersection via a shingle
    * equi-join on the candidate set only. The containment arithmetic
    * reuses the set sizes already carried on the signature table.
    */
  private def containmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val (sets, sigs, _) = minhashIndex(spark, dir)
    val cand = bandCandidatesShared(spark, dir)
    val cnt = sigs.select(col("doc_id"), col("c"))
    val inter = pairIntersections(cand, sets, "doc_a", "doc_b")
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      // QRound: integer ratios — exact-boundary class (ROUND_AUDIT U3)
      .withColumn("cont_a_in_b", QRound.col(col("i").cast("double") / col("ca.c"), 6))
      .withColumn("cont_b_in_a", QRound.col(col("i").cast("double") / col("cb.c"), 6))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= ContainmentMin)
      .select(col("doc_a"), col("doc_b"), col("cont_a_in_b"), col("cont_b_in_a"),
        QRound.col(col("i").cast("double") / (col("ca.c") + col("cb.c") - col("i")), 6)
          .as("jaccard"))
  }

  private val containmentOracle =
    s"""WITH $duckMinhashIndex,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keptmb a JOIN keptmb b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
       |xa AS MATERIALIZED (
       |  SELECT doc_a, doc_b, x.sh AS sh
       |  FROM cand JOIN sh x ON x.doc_id = doc_a),
       |inter AS (
       |  SELECT doc_a, doc_b, count(*) AS i
       |  FROM xa JOIN sh y ON y.doc_id = doc_b AND y.sh = xa.sh
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       ${QRound.duck("CAST(i AS DOUBLE) / ca.c", 6)} AS cont_a_in_b,
       |       ${QRound.duck("CAST(i AS DOUBLE) / cb.c", 6)} AS cont_b_in_a,
       |       ${QRound.duck("CAST(i AS DOUBLE) / (ca.c + cb.c - i)", 6)} AS jaccard
       |FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE greatest(${QRound.duck("CAST(i AS DOUBLE) / ca.c", 6)},
       |               ${QRound.duck("CAST(i AS DOUBLE) / cb.c", 6)}) >= $ContainmentMin""".stripMargin

  // ------------------------------------------------- winnowing
  private val WinK = 3 // word k-gram size
  private val WinW = 4 // winnow window (hashes); guarantee t = w+k-1 = 6 words
  private val WinPosPack = 16777216L // 2^24: hv*pack+pos < 2^56, pos < 16M grams
  private val WinDfFrac = 10 // stop-fingerprint cutoff: df <= ndocs/10
  /** Absolute per-fingerprint posting-list cap for the EXACT pair
    * report (MOSS's "ignore fingerprints appearing in more than K
    * documents"). Round 11's decade probe measured the uncapped form
    * at 174×/decade CPU growth (30,938 CPU-seconds at sf10): on a
    * bounded-vocabulary corpus every common phrase's df grows ∝ n, the
    * RELATIVE cutoff above grows right along with it (ndocs/10), and
    * the single-fingerprint equi-join enumerates Σ df² pairs — n² in
    * the mid-df mass. An absolute cap bounds candidates by
    * max_df × total_postings ∝ n. Dormant through sf1 (max df there is
    * 122), so every oracle-gate output is unchanged; mirrored verbatim
    * in the oracle, so correctness holds wherever it engages. The
    * bigram-blocked variant stays the preferred scale path (its
    * candidates need a shared ≥ 10-token run, 1.6×/decade measured).
    */
  private val WinFpCap = Caps.env("GRAFT_CAP_WIN_FP", 400)

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm) over word 3-grams: per doc, hash every gram in
    * position order, slide a window of 4 hashes, keep each window's
    * minimum — the fingerprint set is ~2/(w+1) of the grams yet
    * GUARANTEES any shared word run of ≥ w+k−1 = 6 tokens shares a
    * fingerprint (the local-selection property hash-sampling lacks).
    * Selection packs (hv, pos) into one BIGINT so the window min
    * needs no struct ordering and both engines agree on ties; pair
    * generation is a fingerprint equi-join behind a stop-fingerprint
    * cutoff so candidates scale with genuine sharing, never n².
    *
    * Two deliberate SCALE choices, both learned from a 10× probe:
    * the gram unit is the word (a bounded-vocabulary corpus makes
    * char-gram df grow linearly with corpus size — every fingerprint
    * eventually looks common), and the stop cutoff is RELATIVE
    * (df ≤ ndocs/10, a one-row broadcast): a fixed absolute cutoff
    * that reports fine at sf0.01 silently empties the report at
    * sf0.1 as boilerplate df crosses it. Output: pairs sharing ≥ 3
    * fingerprints at the containment knee shared/min(|fp|) ≥ 0.25 —
    * the plagiarism/boilerplate-overlap signal.
    */
  /** Per-doc winnowing state, memoized per corpus: the position-order
    * SELECTION sequence `sel` (one chosen fingerprint per window
    * start), its distinct set `fhvs`, and the set size `c`. Built as
    * PURE ARRAY work — gram keys, window minima, and the distinct set
    * are `transform`/`array_min(slice)`/`array_distinct` over each
    * row's own token array, all inside whole-stage codegen — where the
    * round-9 form exploded 4.5M gram rows (at sf1) through a per-doc
    * sort window plus a global DISTINCT shuffle just to rebuild
    * per-doc state the source row already held. Profiled at sf1: the
    * fingerprint build drops 7.0 → 4.5 s and two shuffles disappear;
    * outputs are bit-identical (same md5 keys, same truncated-window
    * minima, same tie order).
    */
  /** Probe access to the per-doc winnowing fingerprint sets (the
    * WinnowRecallProbe's miss diagnosis joins them to attribute each
    * lost pair to blocking vs the report floor).
    */
  private[graft] def winnowFingerprintSets(spark: SparkSession, dir: String): DataFrame =
    winnowFpSets(spark, dir)

  private def winnowFpSets(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "winnow_fp") {
      Tables.documents(spark, dir)
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .withColumn("grams", TextFunctions.wordShingles("toks", WinK))
        .withColumn("keys", expr(
          s"transform(grams, (g, i) -> CAST(conv(substr(md5(g), 1, 8), 16, 10) AS LONG) * $WinPosPack + i + 1)"))
        .withColumn("sel", expr(
          s"""CASE WHEN size(keys) = 0 THEN array()
             |ELSE transform(sequence(1, greatest(size(keys) - ${WinW - 1}, 1)),
             |               p -> array_min(slice(keys, p, $WinW)) div $WinPosPack)
             |END""".stripMargin))
        .withColumn("fhvs", array_distinct(col("sel")))
        .select(col("doc_id"), col("sel"), col("fhvs"),
          size(col("fhvs")).cast("long").as("c"),
          size(col("toks")).as("nt"))
    }

  /** (doc_id, fhv) winnowing postings after the RELATIVE stop filter —
    * the exact pair report's join table before its absolute cap, and
    * the population `dedup_band_stats` accounts the cap against.
    * The stop filter is a broadcast ANTI join: the OVERSIZED list
    * (df > ndocs/10) is a heavy-hitter rollup — tiny by construction —
    * where the round-9 form materialized a checkpoint of the KEPT side
    * (≈ the whole fingerprint table when no fingerprint is oversized,
    * 1.7 s of no-op join at sf1).
    */
  private def winnowPostingsKept(spark: SparkSession, dir: String): DataFrame = {
    val fps = winnowFpSets(spark, dir)
    val fp = fps.select(col("doc_id"), explode(col("fhvs")).as("fhv"))
    val nd = Tables.documents(spark, dir).agg(count(lit(1)).as("ndocs"))
    val stop = fp.groupBy(col("fhv")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      .filter(col("df") > expr(s"ndocs div $WinDfFrac"))
      .select(col("fhv"))
    fp.join(broadcast(stop), Seq("fhv"), "left_anti")
  }

  /** The exact MOSS all-pairs report — the FIDELITY TWIN of
    * `winnowing_pairs` since round 12 (the column_stats/
    * column_stats_exact precedent): the default name carries the
    * bigram-blocked scale path (1.6×/decade measured) and this form,
    * intrinsically Σ df² in the mid-df mass even behind its caps
    * (18.4×/decade, the r11 probe's heaviest entry), remains
    * registered as `winnowing_pairs_exact` for consumers that need
    * the single-fingerprint-run (≥ 6-token) sensitivity floor.
    */
  private def winnowingPairsExact(spark: SparkSession, dir: String): DataFrame = {
    val fps = winnowFpSets(spark, dir)
    // absolute posting-list cap on top of the relative cutoff: the
    // relative cutoff keeps REPORT semantics (drop corpus-wide
    // boilerplate), the absolute cap keeps the JOIN linear (see
    // WinFpCap)
    val fpr = capBuckets(winnowPostingsKept(spark, dir), WinFpCap, Seq("fhv"))
    fpr.as("a")
      .join(fpr.as("b"), col("a.fhv") === col("b.fhv") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      // n_shared >= 2 BEFORE the count joins: the single-shared-
      // fingerprint mass (31.5M of 32M candidate rows at sf1) never
      // qualifies under either the MOSS floor or the sized rescue, so
      // it must not ride the joins
      .filter(col("n_shared") >= 2)
      .join(fps.select(col("doc_id").as("doc_a"), col("c").as("ca")), "doc_a")
      .join(fps.select(col("doc_id").as("doc_b"), col("c").as("cb")), "doc_b")
      .withColumn("containment",
        QRound.col(col("n_shared").cast("double") / least(col("ca"), col("cb")), 6))
      // MOSS-style score cutoff: the report keeps the sharp knee
      // where genuine overlap starts (true near-dups score 1.0 here) —
      // plus the sized short-doc rescue ([[winReportKeep]])
      .filter(winReportKeep)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("containment"))
  }

  /** Block-key geometry for the blocked scale path. Every fixed block
    * width eventually saturates on a bounded-vocabulary corpus — block
    * df grows ∝ n once the distinct-key space fills, and the block
    * self-join's candidate mass Σ df(df−1)/2 goes quadratic — so the
    * width is chosen from MEASUREMENT (WinnowBlockProbe, sf1 → sf10 →
    * sf100 on the probe corpus, 31-word vocabulary):
    *
    *   width 2 (r11 design): 172k → 12.9M → 1.24G candidates — 75× and
    *     96×/decade; at sf100 the candidate sort spilled the disk dry
    *     and killed the query (the r12 century probe's finding).
    *   width 3: 46k → 518k → 10.4M — 11× then 20×/decade (the trigram
    *     space begins saturating exactly one decade after the bigram).
    *   width 4: 43k → 435k → 4.37M — 10.0×/decade, max block df 5 at
    *     5M docs: linear through sf100 with two decades of headroom.
    *
    * A width-4 block is only GUARANTEED by a shared run of ≥ 4w+k−1 =
    * 18 tokens, so docs short enough that a full-document overlap
    * cannot produce one (≤ [[WinShortToks]] tokens, ~10% of the
    * corpus) ALSO emit width-2 blocks in a disjoint key space ('s:'
    * prefix): their bigram mass is two orders of magnitude smaller and
    * block df stays tiny because both members of a short-block pair
    * must be short docs. [[WinBlockCap]] (drop-oversized, the
    * WinFpCap/HAVING discipline, mirrored in the oracle) is the
    * asymptotic backstop for both spaces — DORMANT through sf100
    * (max df 5), so every gated output is cap-free.
    */
  private val WinBlockK = 4
  private val WinShortToks = 18
  private val WinBlockCap = Caps.env("GRAFT_CAP_WIN_BLOCK", 400)

  /** Sized rescue rule for the report floor (VERDICT r13 item 3).
    * MOSS's n_shared ≥ 3 floor is a noise floor for LONG documents; on
    * tiny fingerprint sets it is unmeetable — a 2-fingerprint doc can
    * never share 3 — and the r13/r14 miss diagnosis shows every
    * MinHash-confirmed short-stratum miss at BOTH sf1 and sf10 sits at
    * exactly (n_shared=2, min_c=2, containment 1.0) or (n_shared=2,
    * min_c=3, containment 0.667). The rescue keeps a pair the main
    * floor drops iff the smaller fingerprint set is at most
    * [[WinRescueFpMax]] and at least [[WinRescueCont]] of it is shared
    * — with n_shared ≥ 2 so a single chance-shared fingerprint never
    * qualifies. (containment ≥ 0.65 with n_shared = 2 already implies
    * min_c ≤ 3; the explicit fp-max states the SIZED part of the rule
    * rather than leaving it implied by arithmetic.)
    */
  private val WinRescueFpMax = 3
  private val WinRescueCont = 0.65

  /** The shared report predicate: MOSS floor, or the sized rescue. */
  private def winReportKeep: Column =
    (col("n_shared") >= 3 && col("containment") >= 0.25) ||
      (col("n_shared") >= 2 && least(col("ca"), col("cb")) <= WinRescueFpMax &&
        col("containment") >= WinRescueCont)

  private def duckWinReportKeep(cont: String, minC: String): String =
    s"(n_shared >= 3 AND $cont >= 0.25) OR " +
      s"(n_shared >= 2 AND $minC <= $WinRescueFpMax AND $cont >= $WinRescueCont)"

  /** The SCALE path of [[winnowingPairsExact]] — run-blocked candidates
    * + exact verify; since round 12 this is what the default
    * `winnowing_pairs` name runs. The exact all-pairs form is intrinsically
    * ∝ Σ df²: at sf1 this corpus yields 32M candidate rows of which
    * 31.5M share exactly ONE fingerprint — pure waste the stop cutoff
    * cannot shed (max df 122 ≪ both the relative cutoff 5,000 and the
    * 400 bucket cap; measured: tightening the df cutoff to where it
    * bites — 60 — collapses the TRUE near-dup yield 2,379 → 5, so the
    * mid-df mass IS the signal and may not be dropped). Instead,
    * candidates come from shared consecutive fingerprint runs of the
    * per-doc selection sequence (see [[WinBlockK]] — width 4, with a
    * width-2 fallback space for short docs): two docs become a
    * candidate iff their (consecutive-deduped) selections contain the
    * same adjacent fingerprint run, which any shared run of ≥
    * WinBlockK·w+k−1 = 18 tokens guarantees (≥ 10 for the short-doc
    * fallback); verification is then EXACT — `array_intersect` over
    * the full distinct fingerprint sets, same n_shared ≥ 3 and
    * containment ≥ 0.25 knee as the exact form. True near-dup pairs
    * share runs the length of the document, so the planted-recall spec
    * (PipelineOpsSpec) holds ≥ 0.9 of MinHash-confirmed near-dups
    * across the width change.
    *
    * ==What the width-4 contract deliberately drops==
    * Relative to `winnowing_pairs_exact`'s FULL report (not to the
    * near-dup ground truth — every MinHash-confirmed near-dup is
    * recovered, recall 1.0 in the long stratum, blocking-attributable
    * misses 0 at sf1 AND sf10; WINNOW_RECALL_r14.json), two classes of
    * exact-report pairs never become candidates:
    *  1. pairs whose ONLY overlap is a 10–17-token run — below the
    *     width-4 run guarantee (WinBlockK·w+k−1 = 18 tokens) and
    *     eligible for the width-2 fallback only when the doc itself is
    *     short;
    *  2. mixed-length rescue pairs (a ≤3-fingerprint doc contained in
    *     a LONG doc): keeping them would require the long side to emit
    *     the quadratic width-2 key space the r12 century probe
    *     measured disk-dead.
    * Together these put blocked coverage of the exact report's long
    * stratum at 0.639 (sf1) / 0.905 (sf10). Consumers that need
    * sub-18-token sensitivity — plagiarism-style exhaustive span
    * matching rather than near-dup detection — should run
    * `winnowing_pairs_exact` (Σ df² cost; fine at audit scale,
    * intrinsically quadratic at corpus scale).
    */
  private def winnowingPairsBlocked(spark: SparkSession, dir: String): DataFrame = {
    val fps = winnowFpSets(spark, dir)
    // consecutive-dedup of the selection sequence, then its adjacent
    // width-K runs — all per-row array work. Memoized: array HOFs run
    // INTERPRETED, and without the checkpoint BOTH sides of the
    // candidate self-join re-derive the frame (2× the lambda cost).
    // Per-doc (doc_id, blk) dedup as a hash-distinct: without it a
    // phrase repeated k times in two docs emits k×k self-join rows
    // before the candidate distinct() — quadratic in repetition depth,
    // on exactly the boilerplate content a dedup tier exists to process.
    val bg = Memo.frame(spark, dir, "winnow_bg") {
      val seqd = fps.withColumn("seqd",
        expr("filter(sel, (x, i) -> i = 0 OR x != element_at(sel, i))"))
      def blocks(df: DataFrame, k: Int, prefix: String): DataFrame =
        df.withColumn("blks", expr(
            s"""CASE WHEN size(seqd) < $k THEN array()
               |ELSE transform(sequence(1, size(seqd) - ${k - 1}),
               |       j -> '$prefix' || array_join(transform(slice(seqd, j, $k),
               |                x -> CAST(x AS STRING)), ':'))
               |END""".stripMargin))
          .select(col("doc_id"), explode(col("blks")).as("blk"))
      blocks(seqd, WinBlockK, "")
        .unionAll(blocks(seqd.filter(col("nt") <= WinShortToks), 2, "s:"))
        .distinct()
    }
    val kept = capBuckets(bg, WinBlockCap, Seq("blk"))
    val cand = kept.as("a")
      .join(kept.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(fps.select(col("doc_id").as("doc_a"), col("fhvs").as("fa"), col("c").as("ca")), "doc_a")
      .join(fps.select(col("doc_id").as("doc_b"), col("fhvs").as("fb"), col("c").as("cb")), "doc_b")
      .withColumn("n_shared", size(array_intersect(col("fa"), col("fb"))).cast("long"))
      .withColumn("containment",
        QRound.col(col("n_shared").cast("double") / least(col("ca"), col("cb")), 6))
      .filter(winReportKeep)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("containment"))
  }

  /** Shared oracle prefix: the per-doc winnowing SELECTION (position,
    * fingerprint) rows — consumed by the exact pair oracle (distinct
    * per doc) and the blocked oracle (position order feeds the
    * consecutive-bigram candidates).
    */
  private val duckWinnowSel =
    s"""t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |g AS (
       |  SELECT doc_id, u.pos AS pos,
       |         CAST(CAST('0x' || substr(md5(u.g), 1, 8) AS UBIGINT) AS BIGINT)
       |           * $WinPosPack + u.pos AS key
       |  FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(w) >= $WinK
       |      THEN list_transform(range(1, len(w) - ${WinK - 2}),
       |        i -> struct_pack(pos := i, g := w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
       |      ELSE [] END) AS u FROM t) s),
       |win AS (
       |  SELECT doc_id, pos,
       |         min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |                        ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS minkey,
       |         count(*) OVER (PARTITION BY doc_id) AS n
       |  FROM g),
       |wsel AS (
       |  SELECT doc_id, pos, minkey // $WinPosPack AS fhv
       |  FROM win WHERE pos <= greatest(n - ${WinW - 1}, 1))""".stripMargin

  private val winnowingOracle =
    s"""WITH $duckWinnowSel,
       |fp AS (SELECT DISTINCT doc_id, fhv FROM wsel),
       |nd AS (SELECT count(*) AS ndocs FROM documents),
       |rare AS (SELECT fhv FROM fp GROUP BY 1
       |         HAVING count(*) <= least((SELECT ndocs FROM nd) // $WinDfFrac, $WinFpCap)),
       |fpr AS (SELECT fp.doc_id, fp.fhv FROM fp JOIN rare USING (fhv)),
       |cnt AS (SELECT doc_id, count(*) AS c FROM fp GROUP BY 1),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM fpr a JOIN fpr b ON a.fhv = b.fhv AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT doc_a, doc_b, n_shared,
       |       ${QRound.duck("CAST(n_shared AS DOUBLE) / least(ca.c, cb.c)", 6)} AS containment
       |FROM p JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE ${duckWinReportKeep(QRound.duck("CAST(n_shared AS DOUBLE) / least(ca.c, cb.c)", 6), "least(ca.c, cb.c)")}""".stripMargin

  private val winnowingBlockedOracle =
    s"""WITH $duckWinnowSel,
       |fpl AS (SELECT doc_id, list(DISTINCT fhv) AS fhvs,
       |               count(DISTINCT fhv) AS c FROM wsel GROUP BY 1),
       |ntk AS (SELECT doc_id, len(w) AS nt FROM t),
       |seq AS (
       |  SELECT doc_id, pos, fhv,
       |         lag(fhv) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM wsel),
       |seqd AS (SELECT doc_id, pos, fhv FROM seq WHERE prev IS NULL OR prev != fhv),
       |run4 AS (
       |  SELECT doc_id, fhv AS f1,
       |         lead(fhv, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS f2,
       |         lead(fhv, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS f3,
       |         lead(fhv, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS f4
       |  FROM seqd),
       |bg AS (
       |  SELECT DISTINCT doc_id,
       |         f1 || ':' || f2 || ':' || f3 || ':' || f4 AS blk
       |  FROM run4 WHERE f4 IS NOT NULL
       |  UNION
       |  SELECT DISTINCT r.doc_id, 's:' || f1 || ':' || f2 AS blk
       |  FROM (SELECT doc_id, fhv AS f1,
       |               lead(fhv) OVER (PARTITION BY doc_id ORDER BY pos) AS f2
       |        FROM seqd) r
       |  JOIN ntk ON r.doc_id = ntk.doc_id
       |  WHERE f2 IS NOT NULL AND ntk.nt <= $WinShortToks),
       |bigblk AS (SELECT blk FROM bg GROUP BY 1 HAVING count(*) > $WinBlockCap),
       |keptblk AS (SELECT bg.* FROM bg ANTI JOIN bigblk USING (blk)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keptblk a JOIN keptblk b
       |    ON a.blk = b.blk AND a.doc_id < b.doc_id),
       |v AS (
       |  SELECT doc_a, doc_b,
       |         CAST(len(list_intersect(x.fhvs, y.fhvs)) AS BIGINT) AS n_shared,
       |         least(x.c, y.c) AS mn
       |  FROM cand JOIN fpl x ON doc_a = x.doc_id JOIN fpl y ON doc_b = y.doc_id)
       |SELECT doc_a, doc_b, n_shared,
       |       ${QRound.duck("CAST(n_shared AS DOUBLE) / mn", 6)} AS containment
       |FROM v WHERE ${duckWinReportKeep(QRound.duck("CAST(n_shared AS DOUBLE) / mn", 6), "mn")}""".stripMargin
  /** Incremental dedup: an incoming batch (doc_id % 10 == 0) probed
    * against the standing corpus's MinHash index — the shape a
    * continuously-ingesting pipeline actually runs, where the corpus
    * signatures/bands are computed ONCE and persisted and each new
    * batch pays only its own signature cost plus a band equi-join
    * against the index. Candidates scale with true collisions
    * (batch × collision rate), never batch × corpus; the verify stage
    * re-walks shingles only for colliding pairs. Output: one verdict
    * row per duplicate batch doc — its best corpus match by exact
    * Jaccard (rank-1, jaccard desc + min corpus id).
    */
  private def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (sets, sigs, bands) = minhashIndex(spark, dir)
    // the probe join honors the same per-(band, bucket) cap as the
    // all-pairs form: an uncapped stop-signature band would make the
    // batch x corpus candidate join quadratic in the bucket's df at
    // scale (mirrored in the oracle — keptmb — so correctness holds
    // whether or not the cap engages)
    val kept = capBuckets(bands, MinhashBandCap, Seq("band", "bh"))
    val batchBands = kept.filter(col("doc_id") % 10 === 0)
    val corpusBands = kept.filter(col("doc_id") % 10 =!= 0)
    val cand = batchBands.as("a")
      .join(corpusBands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("batch_id"), col("b.doc_id").as("corpus_id"))
      .distinct()
    val cnt = sigs.select(col("doc_id"), col("c"))
    val inter = pairIntersections(cand, sets, "batch_id", "corpus_id")
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("batch_id")).orderBy(col("jaccard").desc, col("corpus_id"))
    inter
      .join(cnt.as("ca"), col("batch_id") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("corpus_id") === col("cb.doc_id"))
      .withColumn("jaccard",
        QRound.col(col("i").cast("double") / (col("ca.c") + col("cb.c") - col("i")), 6))
      .filter(col("jaccard") >= 0.5)
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("batch_id"), col("corpus_id").as("dup_of"), col("jaccard"))
  }

  /** Intersections go candidate-first through a MATERIALIZED CTE (the
    * minhashOracle shape): left free to reorder, DuckDB planned the
    * three-way `cand ⋈ sh ⋈ sh` as a shingle-equality `sh ⋈ sh`
    * self-join first — Σ df² over every shingle value in the corpus —
    * which spilled the 77 GB scratch disk dry at sf10
    * (SCALE_ORACLE_sf10_r12's one infeasible row). Pinning the
    * candidate × batch-shingle side first bounds the intermediate by
    * |cand| × shingles-per-doc, the same shape the Spark side plans.
    */
  private val dedupIncrementalOracle =
    s"""WITH $duckMinhashIndex,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
       |  FROM keptmb a JOIN keptmb b ON a.band = b.band AND a.bh = b.bh
       |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
       |xa AS MATERIALIZED (
       |  SELECT batch_id, corpus_id, x.sh AS sh
       |  FROM cand JOIN sh x ON x.doc_id = batch_id),
       |inter AS (
       |  SELECT batch_id, corpus_id, count(*) AS i
       |  FROM xa JOIN sh y ON y.doc_id = corpus_id AND y.sh = xa.sh
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT batch_id, corpus_id,
       |         ${QRound.duck("CAST(i AS DOUBLE) / (ca.c + cb.c - i)", 6)} AS jaccard
       |  FROM inter JOIN cnt ca ON batch_id = ca.doc_id JOIN cnt cb ON corpus_id = cb.doc_id
       |  WHERE ${QRound.duck("CAST(i AS DOUBLE) / (ca.c + cb.c - i)", 6)} >= 0.5)
       |SELECT batch_id, corpus_id AS dup_of, jaccard FROM (
       |  SELECT j.*, row_number() OVER (PARTITION BY batch_id ORDER BY jaccard DESC, corpus_id) AS rn
       |  FROM j) t
       |WHERE rn = 1""".stripMargin

  // ----------------------------------------------------------- SimHash
  /** 32-bit SimHash per doc: each token occurrence votes ±1 per bit of
    * its 32-bit md5 prefix; bit set where the vote is positive.
    * Computed as 32 conditional aggregates in ONE pass over the token
    * rows (no 32× bit-explode): per-doc row volume stays at the token
    * count, and the whole vote matrix lives in the aggregation buffer.
    */
  private def simhashDf(spark: SparkSession, dir: String): DataFrame = {
    val votes = (0 until 32).map(j =>
      sum(when(expr(s"(shiftright(h, $j) & 1)") === 1, 1).otherwise(-1)).as(s"v$j"))
    val assemble = (0 until 32).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .withColumn("h", expr(TextFunctions.tokenHashSql))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assemble.as("simhash"))
  }

  private val duckSimhash =
    """tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents),
      |hh AS (SELECT doc_id, CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT) AS h FROM tok),
      |v AS (
      |  SELECT doc_id, g.j, sum(CASE WHEN (h >> g.j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM hh CROSS JOIN generate_series(0, 31) g(j) GROUP BY 1, 2),
      |sim AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM v GROUP BY 1)""".stripMargin

  private def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashDf(spark, dir)

  private val simhashOracle =
    s"""WITH $duckSimhash
       |SELECT doc_id, simhash FROM sim""".stripMargin

  /** Near-dup pairs by SimHash: band on each of the 4 bytes. By
    * pigeonhole, two hashes within Hamming distance 3 MUST agree on at
    * least one of the 4 bytes, so banding generates every candidate the
    * <=3 confirm filter can accept — the candidate set is exact for
    * this radius (a <=6 radius would need 7 bands).
    */
  /** Memoized checkpointed signature table: the banded self-join
    * otherwise recomputes the whole 32-vote aggregation for BOTH sides
    * (the two subtrees do not canonicalize to a reused exchange), and
    * `dedup_band_stats` re-reads the same signatures.
    */
  /** Byte-banded SimHash table: (doc_id, simhash, b, bk). */
  private def simhashBanded(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "simhash_sigs")(simhashDf(spark, dir))
      .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bk", expr("shiftright(simhash, 8 * b) & 255"))

  private def simhashPairsFresh(spark: SparkSession, dir: String): DataFrame = {
    val kept = capBuckets(simhashBanded(spark, dir), SimhashBandCap, Seq("b", "bk"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.b") === col("b.b") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      // hamming + radius filter BEFORE the cross-band distinct (r16,
      // guide §2.3): hamming is a pure function of the pair, so the
      // dedup exchange now carries only confirmed <=3 pairs instead of
      // every banded candidate — same set, strictly fewer shuffled rows
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** Memoized, materialized pair graph — built (and bench-accounted)
    * by `neardup_graph_build`, read by every graph consumer.
    */
  private def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Memo.frame(spark, dir, "simhash_pairs")(simhashPairsFresh(spark, dir))

  /** Shared oracle snippet: banded SimHash table with the bucket cap
    * applied — the `keptb` CTE every pair-graph oracle joins.
    */
  private val duckSimhashBanded =
    s"""banded AS (
       |  SELECT doc_id, simhash, g.b, (simhash >> (8 * g.b)) & 255 AS bk
       |  FROM sim CROSS JOIN generate_series(0, 3) g(b)),
       |bigb AS (SELECT b, bk FROM banded GROUP BY 1, 2 HAVING count(*) > $SimhashBandCap),
       |keptb AS (SELECT banded.* FROM banded ANTI JOIN bigb USING (b, bk))""".stripMargin

  private val simhashPairsOracle =
    s"""WITH $duckSimhash,
       |$duckSimhashBanded,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS sim_a, b.simhash AS sim_b
       |  FROM keptb a JOIN keptb b
       |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
       |FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 3""".stripMargin

  // ------------------------------------------- dedup clusters (CC)
  /** Connected components over the SimHash near-dup graph: every doc
    * labeled with the smallest doc_id reachable through near-dup pairs
    * — the canonical-document assignment a dedup pipeline ends with
    * (keep `component`, drop the rest). Iterative min-label
    * propagation: each round joins labels across edges and keeps the
    * per-node minimum, `localCheckpoint` truncating the growing plan;
    * rounds are bounded by the component diameter, and every step is a
    * shuffle-partitioned join/agg — no driver-side graph. The oracle
    * computes the same fixpoint as a recursive transitive closure.
    */
  private def dedupComponents(spark: SparkSession, dir: String): DataFrame =
    // memoized like the pair graph itself: cluster_representatives and
    // any later canonical-selection pass re-read the SAME component
    // labels a pipeline would have materialized once
    Memo.cached(spark, dir, "components") {
      // both edge directions in ONE pass over the (already
      // checkpointed) shared pair graph
      // eager localCheckpoint, not cache(): the rounds below re-plan
      // their pipeline once per iteration, and a checkpoint is a LEAF
      // plan — with cache() every round's logical plan still carries the
      // whole SimHash candidate pipeline subtree through analysis and
      // canonicalization, and that fixed planning cost dominates a small
      // graph's wall-clock
      val edges = simhashPairs(spark, dir)
        .select(explode(array(
          struct(col("doc_a"), col("doc_b")),
          struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))).as("e"))
        .select(col("e.doc_a").as("doc_a"), col("e.doc_b").as("doc_b"))
        .localCheckpoint()
      val labels =
        componentsOverEdges(Tables.documents(spark, dir).select(col("doc_id")), edges)
      // the edge table served only the iteration — labels are leaf-
      // checkpointed, so its blocks can go now; the entry owns labels
      Memo.unpersistCheckpoint(edges)
      (labels, Seq(labels))
    }

  /** Min-label propagation over an ALREADY MATERIALIZED bidirectional
    * edge table — the persist-once/consume-many form: a pipeline at
    * scale writes the pair graph bucketed on the per-round join key
    * `doc_b` (`Storage.writeBucketed`) and every downstream consumer (this CC,
    * PageRank, triangles) iterates over the compact stored table
    * instead of re-deriving candidates. Proven equivalent to the
    * inline form in PipelineOpsSpec, where the bucketed read also
    * plans its per-round join without re-shuffling the edge side.
    */
  def componentsOverEdges(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // seed labels with round 0 already applied: component =
    // min(doc_id, min neighbor) — the first propagation step always
    // changes labels wherever edges exist, so folding it into the
    // init saves one full loop round (join + checkpoint + sum)
    val nbr0 = edges.groupBy(col("doc_a")).agg(min(col("doc_b")).as("n0"))
    // every round's checkpoint is re-leafed WITHOUT the child plan's
    // inherited size estimate (PlanBridge): localCheckpoint copies the
    // ESTIMATE into the new leaf, and since each round's plan squares
    // the previous round's leaf (the pointer-jump self-join), the
    // inherited estimate grows doubly-exponentially in the round count
    // — at sf100 (5M docs, deeper components, more rounds) it overflows
    // the BigInteger backing sizeInBytes and kills the query. The
    // checkpoint is materialized; a constant default leaf estimate is
    // strictly more honest than the compounded product.
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.PlanBridge
        .dropCheckpointStats(df.localCheckpoint())
    var labels = ckpt(nodes
      .select(col("doc_id"))
      .join(nbr0, col("doc_id") === nbr0("doc_a"), "left")
      .select(col("doc_id"),
        least(col("doc_id"), coalesce(col("n0"), col("doc_id"))).as("component")))
    // Convergence is detected by the label-sum: every update strictly
    // DECREASES some label (least/min semantics) and never increases
    // one, so sum(component) is strictly monotone until the fixpoint —
    // an aggregate over the fresh checkpoint replaces a whole
    // old-vs-new join per round. Decimal sum: overflow-proof at any
    // corpus size.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      val nbr = edges.join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(col("doc_a")).agg(min(col("component")).as("ncomp"))
      val stepped = labels.join(nbr, labels("doc_id") === nbr("doc_a"), "left")
        .select(labels("doc_id"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
      // pointer jump (path compression): component := component's
      // component. Plain propagation needs O(diameter) rounds — a
      // 1000-doc near-dup chain would mean 1000 shuffles; the jump
      // halves the remaining depth, so rounds are O(log d). The
      // fixpoint is unchanged (labels always point at a real doc whose
      // own label only ever shrinks). The step and the jump ride in
      // ONE checkpointed action per round — the two `stepped`
      // occurrences in the self-join share their shuffle subtrees via
      // ReusedExchange, so fusing them beats a second checkpoint:
      // round cost on a small graph is driver-action overhead, not
      // data volume. (Two fused jumps regress: the four-fold `stepped`
      // nesting defeats exchange reuse under AQE.)
      val par = stepped.select(col("doc_id").as("p_id"), col("component").as("p_comp"))
      val next = ckpt(stepped.join(par, stepped("component") === par("p_id"), "left")
        .select(stepped("doc_id"),
          coalesce(col("p_comp"), stepped("component")).as("component")))
      val newSum = labelSum(next)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      // `next` is eagerly materialized, so the PREVIOUS round's
      // checkpoint blocks can go now — without this every round leaks
      // one generation of labels for the session's lifetime (plain
      // df.unpersist is a cache-manager no-op for checkpoints)
      Memo.unpersistCheckpoint(labels)
      labels = next
      iter += 1
    }
    // with pointer jumping 50 rounds covers astronomically deep graphs
    // (2^50 diameter) — but never return silently-wrong labels
    require(converged,
      s"dedup_components did not converge after $iter rounds")
    labels
  }

  /** Min-label propagation rounds the CC oracle unrolls to. Sound for
    * ANY graph: a final convergence check errors the oracle loudly if
    * some neighbor still carries a smaller label after this many
    * rounds, so an insufficient bound can never silently mis-compare.
    * Env-sized because the needed depth is the component DIAMETER,
    * which grows with scale (measured by iterating the same min-label
    * step to convergence in DuckDB: 8 rounds at sf0.01, 24 at sf10 —
    * where the 20-round default fired its convergence error in the r14
    * slice); each extra round costs one linear edges+nodes pass, so
    * at-scale runs pass GRAFT_CC_ORACLE_ROUNDS=40 rather than paying
    * 40 rounds at the sf0.01 driver gate.
    */
  private val CcOracleRounds = Caps.env("GRAFT_CC_ORACLE_ROUNDS", 20)

  /** CC oracle as UNROLLED min-label propagation, not a recursive
    * transitive closure: `reach(a, b)` (the previous form) enumerates
    * every (node, reachable-node) pair — Σ component² rows, >30 min in
    * DuckDB at the sf1 probe scale — where K propagation rounds cost
    * K × (edges + nodes) and converge to the identical min-reachable-id
    * labels once K ≥ graph diameter (checked in-query, see
    * [[CcOracleRounds]]). Each step is AS MATERIALIZED: steps are
    * referenced twice (self + neighbor join), and DuckDB's default CTE
    * inlining would otherwise duplicate the whole prefix 2^K times.
    */
  private val componentsOracle = {
    val steps = (1 to CcOracleRounds).map { k =>
      s"""c$k AS MATERIALIZED (
         |  SELECT n, min(l) AS l FROM (
         |    SELECT n, l FROM c${k - 1}
         |    UNION ALL
         |    SELECT u.b AS n, c${k - 1}.l AS l
         |    FROM c${k - 1} JOIN und u ON c${k - 1}.n = u.a)
         |  GROUP BY n)""".stripMargin
    }.mkString(",\n")
    s"""WITH $duckSimhash,
       |$duckSimhashBanded,
       |p AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keptb a JOIN keptb b
       |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |und AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM p
       |  UNION SELECT doc_b, doc_a FROM p),
       |c0 AS MATERIALIZED (SELECT doc_id AS n, doc_id AS l FROM documents),
       |$steps,
       |unconv AS (
       |  SELECT count(*) AS k FROM c$CcOracleRounds x
       |  JOIN und u ON x.n = u.a
       |  JOIN c$CcOracleRounds y ON y.n = u.b AND y.l < x.l)
       |SELECT n AS doc_id,
       |       CASE WHEN (SELECT k FROM unconv) > 0
       |            THEN CAST(error('cc oracle not converged in $CcOracleRounds rounds') AS BIGINT)
       |            ELSE l END AS component
       |FROM c$CcOracleRounds""".stripMargin
  }

  // ---------------------------------------------- edit-distance verify
  /** Verification-grade edit distance over the SimHash candidate
    * pairs: Levenshtein on the 32-char document prefixes plus a
    * normalized similarity ratio — the "confirm stage" a dedup
    * pipeline runs on its candidates when set-similarity is too
    * coarse. Distances only for candidate pairs (never all pairs), so
    * the quadratic DP cost is bounded by candidates × prefix².
    */
  private def pairEditDistance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), substring(trim(col("text")), 1, 32).as("prefix"))
    val pairs = simhashPairs(spark, dir)
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("prefix").as("pa")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("prefix").as("pb")), "doc_b")
      // one DP evaluation per pair: the ratio references the computed
      // column, not a second levenshtein call
      .withColumn("edit_dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("edit_dist"),
        QRound.col(lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("pa")), length(col("pb"))), 6).as("sim_ratio"))
  }

  private val pairEditOracle =
    s"""WITH $duckSimhash,
       |$duckSimhashBanded,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS sim_a, b.simhash AS sim_b
       |  FROM keptb a JOIN keptb b
       |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |cand AS (
       |  SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
       |  FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 3),
       |p AS (SELECT doc_id, substr(trim(text), 1, 32) AS prefix FROM documents)
       |SELECT doc_a, doc_b, hamming,
       |       CAST(levenshtein(pa.prefix, pb.prefix) AS BIGINT) AS edit_dist,
       |       ${QRound.duck(
             "1.0 - CAST(levenshtein(pa.prefix, pb.prefix) AS DOUBLE) / " +
               "greatest(length(pa.prefix), length(pb.prefix))", 6)} AS sim_ratio
       |FROM cand JOIN p pa ON cand.doc_a = pa.doc_id JOIN p pb ON cand.doc_b = pb.doc_id""".stripMargin

  // -------------------------------------------- split decontamination
  /** Train/test contamination check — the decontamination pass every
    * LLM data pipeline runs before training: test-split documents that
    * share word-3-shingles with train-split documents (GPT-3-style
    * n-gram overlap, scaled down to this corpus's ~30-word docs). Uses
    * the SAME md5-threshold split as `dataset_split` (so the check
    * matches what the split actually ships) and the same stop-gram
    * cutoff as the Jaccard join (df <= 100) — hot shingles carry no
    * contamination signal and would quadratically blow up the join.
    * Shape: shingle explode → split tag → rare filter → shared-shingle
    * equi-join → per-pair count; candidate volume scales with true
    * overlap, never test×train.
    */
  private def splitContamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles5(spark, dir)
    val tagged = sh.withColumn("u",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0"))
      .withColumn("split",
        when(col("u") < 0.8, "train").when(col("u") < 0.9, "val").otherwise("test"))
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100).select(col("sh"))
    val test = tagged.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc"), col("sh"))
      .join(rare, "sh")
    val train = tagged.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("sh"))
    test.join(train, "sh")
      .groupBy(col("test_doc"), col("train_doc"))
      .agg(count(lit(1)).as("n_shared"))
  }

  private val contaminationOracle =
    s"""WITH $duckShingles5,
       |d AS (
       |  SELECT sh.*, CASE
       |    WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) / 4294967296.0 < 0.8 THEN 'train'
       |    WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) / 4294967296.0 < 0.9 THEN 'val'
       |    ELSE 'test' END AS split
       |  FROM sh),
       |rare AS (SELECT sh FROM sh GROUP BY 1 HAVING count(*) <= 100),
       |te AS (SELECT doc_id AS test_doc, d.sh FROM d JOIN rare USING (sh) WHERE split = 'test'),
       |tr AS (SELECT doc_id AS train_doc, sh FROM d WHERE split = 'train')
       |SELECT test_doc, train_doc, count(*) AS n_shared
       |FROM te JOIN tr USING (sh)
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- near-dup PageRank
  /** PageRank-style importance over the SimHash near-dup graph (3
    * fixed power iterations, damping 0.85): ranks which documents sit
    * at the center of duplicate clusters — the signal a dedup pipeline
    * uses to pick the canonical copy (keep the hub, drop satellites).
    * Per-node incoming contributions are summed by a SORTED fold
    * (collect → array_sort → aggregate), not a parallel double sum, so
    * the result is bit-deterministic and the DuckDB twin folds the
    * identical order — the same discipline as the vector dots and the
    * EWMA. Each iteration is one join + one grouped fold + one left
    * join, all partitioned on doc_id; iteration count is fixed, so the
    * whole query is a static 3-deep plan, no driver loop.
    */
  private val PrIters = 3
  private val PrDamping = 0.85
  /** The teleport base, DECLARED as the decimal literal rather than
    * computed as `1 - PrDamping`: Scala's `1 - 0.85` evaluates to
    * 0.15000000000000002 while the oracle's parsed literal `0.15` is
    * 0.1499999999999999944 — one ULP apart, which compounds through
    * the three iterations into the knife-edge ranks the r14 sf1 run
    * caught (Spark 1.3708125000…, DuckDB 1.3708124999…).
    */
  private val PrBase = 0.15

  private def neardupPagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = simhashPairs(spark, dir)
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg"))
    val nodes = Tables.documents(spark, dir).select(col("doc_id"))
    var ranks = nodes.withColumn("r", lit(1.0))
    for (_ <- 1 to PrIters) {
      val contribs = edges
        .join(ranks, edges("src") === ranks("doc_id"))
        .join(deg, "src")
        .select(col("dst"), col("src"), (col("r") / col("deg")).as("contrib"))
        .groupBy(col("dst"))
        .agg(aggregate(
          array_sort(collect_list(struct(col("src"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("csum"))
      ranks = nodes
        .join(contribs, nodes("doc_id") === contribs("dst"), "left")
        .select(nodes("doc_id"),
          (lit(PrBase) + lit(PrDamping) * coalesce(col("csum"), lit(0.0))).as("r"))
    }
    // QRound, not round: the r14 full-registry sf1 oracle run caught
    // three nodes whose rank landed on the shortest-repr knife edge
    // (e.g. exact binary 1.37081249999999998934, shortest repr
    // "1.3708125"), which rounds differently under Spark's
    // shortest-repr HALF_UP vs DuckDB's exact-value round
    ranks.select(col("doc_id"), QRound.col(col("r"), 6).as("rank"))
  }

  private val pagerankOracle = {
    // unrolled iterations, each folding contributions in src order —
    // identical association to the Spark sorted fold. r15 feasibility
    // rewrite (the sf10 oracle exhausted 110 GB): the per-dst ordered
    // LIST materialization became a WINDOWED running sum + arg_max of
    // the final value — a streaming cumulative whose addition order is
    // the same src-ordered left fold (0.0 + x1 == x1 exactly in IEEE,
    // so dropping the fold's zero seed changes nothing), verified
    // hash-exact at sf0.01/sf1 before trusting it at sf10 — and the
    // pair CTEs are AS MATERIALIZED so the banded self-join runs once,
    // not once per reference (the ngram-jaccard lesson).
    def iter(prev: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT n.doc_id, 0.15 + 0.85 * coalesce(s.csum, 0.0) AS r
         |  FROM documents n LEFT JOIN (
         |    SELECT dst, arg_max(rs, src) AS csum FROM (
         |      SELECT e.dst, e.src,
         |             sum(p.r / deg.deg) OVER (PARTITION BY e.dst ORDER BY e.src
         |                                      ROWS UNBOUNDED PRECEDING) AS rs
         |      FROM e JOIN $prev p ON e.src = p.doc_id JOIN deg ON e.src = deg.src) t
         |    GROUP BY dst) s
         |  ON n.doc_id = s.dst)""".stripMargin
    s"""WITH $duckSimhash,
       |$duckSimhashBanded,
       |p AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keptb a JOIN keptb b
       |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM p
       |      UNION ALL SELECT doc_b, doc_a FROM p),
       |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY 1),
       |r0 AS (SELECT doc_id, CAST(1.0 AS DOUBLE) AS r FROM documents),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT doc_id, ${QRound.duck("r", 6)} AS rank FROM r3""".stripMargin
  }

  // ------------------------------------------------- label propagation
  private val LpaIters = 3

  /** Synchronous label propagation (Raghavan et al. '07) over the
    * SimHash near-dup graph: each node adopts its neighborhood's most
    * frequent label, ties to the smallest — 3 fixed iterations. Where
    * connected components answers "which docs are transitively
    * linked?", LPA answers "which docs form DENSE duplicate
    * communities?" — a long chain of pairwise near-dups fragments into
    * local communities instead of one giant component, which is the
    * granularity a canonical-selection pass actually wants.
    *
    * Determinism: the frequency argmax orders by (count DESC, label
    * ASC) under row_number, so both engines pick identical labels;
    * isolated nodes keep their own id (they never receive a neighbor
    * vote). Scale shape: per iteration one equi-join (edges ⋈ labels,
    * partitioned on src) + one grouped count + a per-dst
    * WindowGroupLimit — fixed 3-deep static plan, no driver loop, and
    * the edge set is LSH-band collisions, never n².
    */
  private def labelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val edges = simhashPairs(spark, dir)
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    val nodes = Tables.documents(spark, dir).select(col("doc_id"))
    var labels = nodes.withColumn("lbl", col("doc_id"))
    for (_ <- 1 to LpaIters) {
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("n").desc, col("lbl").asc)
      val best = edges
        .join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("dst"), col("lbl").as("new_lbl"))
      labels = nodes
        .join(best, nodes("doc_id") === best("dst"), "left")
        .select(nodes("doc_id"),
          coalesce(col("new_lbl"), nodes("doc_id")).as("lbl"))
    }
    labels.select(col("doc_id"), col("lbl").as("community"),
      count(lit(1)).over(Window.partitionBy(col("lbl"))).as("community_size"))
  }

  private val labelPropagationOracle = {
    def iter(prev: String, out: String) =
      s"""$out AS (
         |  SELECT n.doc_id, coalesce(b.new_lbl, n.doc_id) AS lbl
         |  FROM documents n LEFT JOIN (
         |    SELECT dst, lbl AS new_lbl FROM (
         |      SELECT e.dst, p.lbl, count(*) AS n,
         |             row_number() OVER (PARTITION BY e.dst
         |               ORDER BY count(*) DESC, p.lbl) AS rk
         |      FROM e JOIN $prev p ON e.src = p.doc_id
         |      GROUP BY e.dst, p.lbl) t
         |    WHERE rk = 1) b ON n.doc_id = b.dst)""".stripMargin
    s"""WITH $duckSimhash,
       |$duckSimhashBanded,
       |p AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keptb a JOIN keptb b
       |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |      UNION ALL SELECT doc_b, doc_a FROM p),
       |l0 AS (SELECT doc_id, doc_id AS lbl FROM documents),
       |${iter("l0", "l1")},
       |${iter("l1", "l2")},
       |${iter("l2", "l3")}
       |SELECT doc_id, lbl AS community,
       |       CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
       |FROM l3""".stripMargin
  }

  // ------------------------------------------------- n-gram Jaccard
  /** Character-3-gram Jaccard as the VERIFICATION metric over LSH
    * candidate pairs — exact set similarity computed only where a
    * candidate generator says it might matter, which is the only form
    * of n-gram Jaccard that exists at corpus scale.
    *
    * Two earlier forms of this query died under graft.tools.ScaleProbe
    * at sf1, and both failure modes are worth recording:
    * (1) a shared-rare-gram join (pairs via grams with df below a
    *     cutoff) goes DARK on a bounded-vocabulary corpus — char-gram
    *     df grows linearly with corpus size, so every gram eventually
    *     exceeds any fixed cutoff, and a RELATIVE cutoff (df ≤ n/4)
    *     fares no better once every trigram appears in >25% of docs;
    * (2) a deterministic id-sample (doc_id % 10) structurally excludes
    *     near-duplicate pairs, whose ids are not correlated with the
    *     sampling key — the sampled query can never see both halves of
    *     a duplicate pair.
    * The scale-stable shape: candidates from the word-shingle MinHash
    * band equi-join (volume ∝ true signature collisions, never n² and
    * never gram-df²), then exact char-3-gram Jaccard restricted to
    * candidates — the verify joins are equi-joins on (doc_id, gram)
    * bounded by candidates × grams-per-doc. Near-dup recall is the LSH
    * curve 1-(1-s⁴)^16 on word-shingle similarity s (≥ 0.9999 at
    * s ≥ 0.85, 0.65 at the 0.5 midpoint); the reported score is the
    * exact char-gram Jaccard, and the report is candidate-limited BY
    * DESIGN — a char-similar pair with low word-shingle similarity
    * (common on a bounded vocabulary, where char trigrams overlap
    * between any same-language docs) is outside the near-dup
    * population this query verifies. The round-11 rebanding (r 2 → 4)
    * narrowed exactly that fringe: sf1 report 20,152 → 7,464 rows,
    * every planted near-dup retained.
    */
  private def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val cand = bandCandidatesShared(spark, dir)
    // grouped char-gram sets: never exploded — set sizes come from
    // size(), the per-pair intersection from array_intersect
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(TextFunctions.charNgrams("text", 3)).as("shs"))
      .localCheckpoint()
    val cnt = g.select(col("doc_id"), size(col("shs")).cast("long").as("c"))
    val inter = pairIntersections(cand, g, "doc_a", "doc_b")
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jaccard", col("i").cast("double") / (col("ca.c") + col("cb.c") - col("i")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private val ngramOracle =
    s"""WITH $duckMinhashIndex,
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM keptmb a JOIN keptmb b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
      |g AS (
      |  SELECT doc_id, unnest(CASE WHEN length(trim(text)) >= 3
      |    THEN list_distinct(list_transform(range(1, length(trim(text)) - 1), i -> substr(trim(text), i, 3)))
      |    ELSE [] END) AS g
      |  FROM documents),
      |cnt AS (SELECT doc_id, count(*) AS c FROM g GROUP BY 1),
      |xa AS MATERIALIZED (
      |  SELECT doc_a, doc_b, x.g AS g
      |  FROM cand JOIN g x ON x.doc_id = doc_a),
      |inter AS (
      |  SELECT doc_a, doc_b, count(*) AS i
      |  FROM xa JOIN g y ON y.doc_id = doc_b AND y.g = xa.g
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
      |FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
      |WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.5""".stripMargin

  // --------------------------------------- triangle counts (graph)
  /** Per-document triangle counts over the SimHash near-dup graph —
    * the local clustering signal that separates tight duplicate
    * cliques (many triangles) from chains of borderline pairs (none),
    * which is how a dedup pipeline decides between "collapse the
    * whole cluster" and "verify pairwise". Edges are oriented a<b, so
    * each triangle enumerates exactly once as a<b<c: two self-joins —
    * both partitioned by the join key, candidates ∝ wedges, never
    * all-pairs — then one explode + rollup for the per-node counts.
    */
  private def neardupTriangles(spark: SparkSession, dir: String): DataFrame = {
    val e = simhashPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .join(e.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
      .select(col("e1.doc_a").as("a"), col("e1.doc_b").as("b"),
        col("e2.doc_b").as("c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  private val trianglesOracle =
    s"""WITH $duckSimhash,
       |$duckSimhashBanded,
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS sim_a, b.simhash AS sim_b
       |  FROM keptb a JOIN keptb b
       |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |e AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sim_a, sim_b)) <= 3),
       |tri AS MATERIALIZED (
       |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
       |  FROM e e1
       |  JOIN e e2 ON e1.doc_b = e2.doc_a
       |  JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
       |nodes AS (
       |  SELECT a AS doc_id FROM tri
       |  UNION ALL SELECT b FROM tri
       |  UNION ALL SELECT c FROM tri)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM nodes GROUP BY 1""".stripMargin

  // -------------------------------------- exact-substring span dedup
  /** Exact-substring (repeated-span) dedup — the ExactSubstr method of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al. 2022): find every maximal token span of length >= k that also
    * occurs in ANOTHER document, per document. The reference pipeline
    * has no equivalent; this is the flagship cross-doc span dedup a
    * training corpus needs beyond whole/near-doc dedup.
    *
    * Distributed shape (no suffix array, no doc-pair product):
    *  1. positional k-grams — posexplode of the SAME fused
    *     [[graft.plans.TextExpressions.wordShingles]] codegen used by
    *     MinHash, md5'd to a fixed-width join key (xxhash64 at 100 TB);
    *  2. repeated grams = grams seen in >= 2 DISTINCT docs — one
    *     partial-agg'd group-by, never pairwise;
    *  3. covered positions = semi-join of positions against repeated
    *     grams — shuffle volume ∝ repeated positions, not n²;
    *  4. maximal spans = gaps-and-islands per doc (a position covers
    *     [pos, pos+k-1], so islands break when the gap exceeds k) —
    *     one doc-partitioned sort, the same pattern as scd2_user_state.
    *
    * A k-gram repeated only WITHIN one doc does not count (cross-doc
    * semantics, countDistinct >= 2), matching the paper's "occurs in
    * more than one example" criterion.
    */
  private val SpanK = 5

  /** Start positions (1-based) of cross-doc-repeated k-grams per doc —
    * the shared core of the span REPORT (`dedup_substring_spans`) and
    * the span REMOVAL (`substring_scrub`). Steps 1-3 of the ExactSubstr
    * shape: positional grams → repeated-gram rollup → semi-join.
    */
  /** Memoized per (session, dir) like the pair graph and the MinHash
    * index: the span REPORT and the span REMOVAL both consume the same
    * covered-position table, and a pipeline materializes it once per
    * corpus (at the sf1 probe each rebuild costs ~15 s of gram hashing).
    */
  private def coveredStarts(spark: SparkSession, dir: String): DataFrame =
    Memo.cached(spark, dir, "covered_starts") {
      val (covRaw, pg) = coveredStartsFresh(spark, dir)
      val cov = covRaw.localCheckpoint()
      // cov is a leaf now — the positional-gram working table served
      // only the build, so free its blocks instead of leaking them for
      // the session's lifetime
      Memo.unpersistCheckpoint(pg)
      (cov, Seq(cov))
    }

  private def coveredStartsFresh(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val k = SpanK
    // positional grams: NOT distinct (every occurrence covers tokens)
    val pg = Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"), posexplode(TextFunctions.wordShingles("toks", k)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        md5(col("col")).as("gh"))
      .localCheckpoint() // read twice: repeated-gram rollup + cover join
    // "appears in >= 2 distinct docs" == min(doc_id) != max(doc_id):
    // same cross-doc predicate as countDistinct >= 2 but partial-aggs
    // as two plain min/max columns instead of a distinct expansion
    val rep = pg.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1")).select(col("gh"))
    // (doc_id, pos) is already unique in pg — posexplode emits each
    // position once — and the semi-join only drops rows, so no distinct
    val cov = pg.join(rep, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    (cov, pg)
  }

  private def substringSpans(spark: SparkSession, dir: String): DataFrame = {
    val k = SpanK
    val cov = coveredStarts(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    cov
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        (max(col("pos")) + k - min(col("pos"))).as("span_tokens"))
      .select(col("doc_id").cast("long").as("doc_id"), col("span_start"),
        col("span_end"), col("span_tokens"))
  }

  /** Shared DuckDB twin of [[coveredStarts]] (steps 1-3 of ExactSubstr):
    * positional grams → cross-doc-repeated rollup → covered starts.
    * Consumed by the span report, the scrub, and the build entry.
    */
  private val duckCoveredStarts =
    s"""pg AS (
       |  SELECT doc_id, u.pos AS pos, md5(u.g) AS gh FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(w) >= $SpanK
       |      THEN list_transform(range(1, len(w) - ${SpanK - 2}),
       |        i -> struct_pack(pos := i, g := w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
       |      ELSE [] END) AS u
       |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)) t),
       |rep AS (SELECT gh FROM pg GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT doc_id, pos FROM pg JOIN rep USING (gh))""".stripMargin

  private val substringSpansOracle =
    s"""WITH $duckCoveredStarts,
       |isl AS (SELECT doc_id, pos,
       |  SUM(CASE WHEN prev IS NULL OR pos > prev + $SpanK THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM cov))
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) + ${SpanK - 1} AS BIGINT) AS span_end,
       |       CAST(max(pos) + $SpanK - min(pos) AS BIGINT) AS span_tokens
       |FROM isl GROUP BY doc_id, island""".stripMargin

  // ------------------------------------------- substring-span removal
  /** The APPLY stage of ExactSubstr dedup: emit the cleaned corpus with
    * every cross-doc-repeated span removed — what Lee et al.'s released
    * tooling actually ships (all occurrences cut; keep-one bookkeeping
    * would bolt on as a canonical-owner min-(doc_id,pos)-per-gram
    * exception join). Covered START positions expand to covered token
    * positions via one bounded sequence-explode (≤ k rows per start,
    * dup-collapsed), removal is a doc+position anti-join (shuffle ∝
    * covered positions), and reconstruction is a doc-keyed rollup —
    * the doc is the natural unit, so per-group memory is one document,
    * the same bound as reading it. Docs scrubbed to nothing still
    * report (left join back to the corpus), hash = md5(''). The
    * clean_hash proves byte-identical reconstruction cross-engine.
    */
  private def substringScrub(spark: SparkSession, dir: String): DataFrame = {
    val k = SpanK
    // no distinct: left_anti ignores duplicate probe-side rows, so the
    // overlapping-span duplication costs nothing beyond join input size
    // and dropping the dedup saves a full shuffle+agg of the 5x rows
    val covered = coveredStarts(spark, dir)
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(col("doc_id"), col("toks"))
    val tok = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("tok"))
    val rebuilt = tok.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_after"),
        sort_array(collect_list(struct(col("p"), col("tok")))).as("pt"))
      .select(col("doc_id"), col("n_after"),
        md5(array_join(expr("transform(pt, x -> x.tok)"), " ")).as("clean_hash"))
    docs.select(col("doc_id"), size(col("toks")).cast("long").as("n_before"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_before"),
        (col("n_before") - coalesce(col("n_after"), lit(0L))).as("n_removed"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("clean_hash"), md5(lit(""))).as("clean_hash"))
  }

  private val substringScrubOracle =
    s"""WITH $duckCoveredStarts,
       |covp AS (
       |  SELECT DISTINCT doc_id, pos + d AS p
       |  FROM cov CROSS JOIN generate_series(0, ${SpanK - 1}) g(d)),
       |tok AS (
       |  SELECT doc_id, u.p AS p, u.tok AS tok FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
       |      i -> struct_pack(p := i, tok := w[i]))) AS u
       |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)) t),
       |kept AS (
       |  SELECT doc_id, p, tok FROM tok
       |  WHERE NOT EXISTS (SELECT 1 FROM covp WHERE covp.doc_id = tok.doc_id AND covp.p = tok.p)),
       |reb AS (
       |  SELECT doc_id, count(*) AS n_after, string_agg(tok, ' ' ORDER BY p) AS txt
       |  FROM kept GROUP BY 1)
       |SELECT d.doc_id, d.n_before,
       |       d.n_before - coalesce(reb.n_after, 0) AS n_removed,
       |       coalesce(reb.n_after, 0) AS n_after,
       |       md5(coalesce(reb.txt, '')) AS clean_hash
       |FROM (SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_before
       |      FROM documents) d
       |LEFT JOIN reb USING (doc_id)""".stripMargin

  // ------------------------------------------------ per-doc verdicts
  /** The dedup tier's capstone manifest: ONE row per document with the
    * final keep/drop verdict and its reason, under the precedence a
    * production pipeline applies — exact duplicate (not the canonical
    * min-doc_id of its content-hash group) beats near-duplicate (has a
    * confirmed MinHash partner with a smaller id — the keep-smallest
    * rule, no connected components needed for a drop decision) beats
    * the quality gate (first failing Gopher/C4 rule). Composes three
    * already-proven stages — [[dedupExact]]'s hash groups (as one
    * window-min over the content-hash partition), [[minhashLsh]]'s
    * confirmed pairs, and [[TextAnalytics.qualityFilter]]'s reason
    * column (REUSED, not re-stated) — through two doc-keyed joins, so
    * the capstone adds no new shuffle shape of its own.
    */
  private def dedupVerdicts(spark: SparkSession, dir: String): DataFrame = {
    val wHash = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"), min(col("doc_id")).over(wHash).as("canon"))
    val nd = minhashLsh(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_near", lit(true))
    val q = TextAnalytics.qualityFilter(spark, dir)
      .select(col("doc_id"), col("fail_reason"))
    ex.join(nd, Seq("doc_id"), "left")
      .join(q, Seq("doc_id"))
      .withColumn("reason",
        when(col("doc_id") =!= col("canon"), "exact_dup")
          .when(col("is_near"), "near_dup")
          .otherwise(col("fail_reason")))
      .select(col("doc_id"),
        when(col("reason") === "ok", "keep").otherwise("drop").as("verdict"),
        col("reason"))
  }

  private val dedupVerdictsOracle =
    s"""WITH ex AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canon
       |  FROM documents),
       |mh AS ($minhashOracle),
       |nd AS (SELECT DISTINCT doc_b AS doc_id FROM mh),
       |q AS (${TextAnalytics.qualityFilterOracle}),
       |r AS (
       |  SELECT ex.doc_id, CASE
       |    WHEN ex.doc_id != ex.canon THEN 'exact_dup'
       |    WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
       |    ELSE q.fail_reason END AS reason
       |  FROM ex LEFT JOIN nd USING (doc_id) JOIN q USING (doc_id))
       |SELECT doc_id,
       |       CASE WHEN reason = 'ok' THEN 'keep' ELSE 'drop' END AS verdict,
       |       reason
       |FROM r""".stripMargin

  // ----------------------------------------- cluster representatives
  /** Quality-aware canonical selection per near-dup cluster: where
    * [[dedupVerdicts]] drops by the blind keep-smallest rule, a corpus
    * that wants to keep the BEST copy picks per-component — quality
    * pass first, then token count, then md5 tiebreak (all total
    * orders, so the pick is rerun-stable). Composes the SimHash
    * connected components with the quality gate through one doc-keyed
    * join and one component-partitioned window; only multi-member
    * clusters report (singletons have nothing to choose). The window's
    * rank-1 plans as WindowGroupLimit, so each cluster keeps one row
    * in flight regardless of cluster size.
    */
  private def clusterRepresentatives(spark: SparkSession, dir: String): DataFrame = {
    // the components frame tails a per-round checkpoint, so the two
    // readers below re-read a leaf, not the iterative loop
    val comp = dedupComponents(spark, dir)
    val q = TextAnalytics.qualityFilter(spark, dir)
      .select(col("doc_id"), col("passes"), col("n_words"))
    val wComp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("passes").desc, col("n_words").desc,
        md5(col("doc_id").cast("string")), col("doc_id"))
    // cluster sizes as a rollup JOINED AFTER the winner filter — keeping
    // the count out of the window frame is what lets the rank-1 filter
    // collapse to WindowGroupLimit (one row in flight per cluster)
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).cast("long").as("n_members"))
      .filter(col("n_members") >= 2)
    comp.join(q, "doc_id")
      .withColumn("rk", row_number().over(wComp))
      .filter(col("rk") === 1)
      .join(sizes, "component")
      .select(col("component"), col("doc_id").as("rep_doc_id"),
        col("passes").as("rep_passes"), col("n_words").as("rep_n_words"),
        col("n_members"))
  }

  private val clusterRepresentativesOracle =
    s"""WITH comp AS ($componentsOracle),
       |q AS (${TextAnalytics.qualityFilterOracle}),
       |m AS (
       |  SELECT comp.component, comp.doc_id, q.passes, q.n_words,
       |         row_number() OVER (PARTITION BY comp.component
       |           ORDER BY q.passes DESC, q.n_words DESC,
       |                    md5(CAST(comp.doc_id AS VARCHAR)), comp.doc_id) AS rk,
       |         count(*) OVER (PARTITION BY comp.component) AS n_members
       |  FROM comp JOIN q USING (doc_id))
       |SELECT component, doc_id AS rep_doc_id, passes AS rep_passes,
       |       n_words AS rep_n_words, CAST(n_members AS BIGINT) AS n_members
       |FROM m WHERE rk = 1 AND n_members >= 2""".stripMargin

  // --------------------------------------- band-bucket dropped mass
  /** The cap's accounting ledger: per band of each LSH space, how many
    * buckets/rows exist, the largest bucket, and the mass the cap
    * drops — capped bucket count, rows skipped, and the candidate
    * pairs those buckets would have generated (n·(n−1)/2 each). This
    * is the observability a production pipeline runs NEXT TO its dedup
    * pass: pairs_avoided is exactly the quadratic term the cap
    * removes, and a nonzero rows_dropped at one band is the signal to
    * go look at what boilerplate saturated that bucket (same shape as
    * skew_audit for join keys).
    */
  private def bandStatsOf(buckets: DataFrame, space: String, cap: Int): DataFrame =
    buckets.groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_bucket"),
        sum(when(col("n") > cap, 1L).otherwise(0L)).as("capped_buckets"),
        sum(when(col("n") > cap, col("n")).otherwise(0L)).as("rows_dropped"),
        sum(when(col("n") > cap, expr("n * (n - 1) div 2")).otherwise(0L)).as("pairs_avoided"))
      .select(lit(space).as("space"), col("band").cast("long").as("band"),
        col("n_buckets"), col("n_rows"), col("max_bucket"),
        col("capped_buckets"), col("rows_dropped"), col("pairs_avoided"))

  private def dedupBandStats(spark: SparkSession, dir: String): DataFrame = {
    val sbuck = simhashBanded(spark, dir)
      .groupBy(col("b").as("band"), col("bk")).agg(count(lit(1)).as("n"))
    val (_, _, bands) = minhashIndex(spark, dir)
    val mbuck = bands.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
    // winnowing has no bands — its "buckets" are the per-fingerprint
    // posting lists the exact pair report self-joins (band pinned 0)
    val wbuck = winnowPostingsKept(spark, dir)
      .groupBy(lit(0L).as("band"), col("fhv")).agg(count(lit(1)).as("n"))
    bandStatsOf(sbuck, "simhash", SimhashBandCap)
      .unionAll(bandStatsOf(mbuck, "minhash", MinhashBandCap))
      .unionAll(bandStatsOf(wbuck, "winnowing", WinFpCap))
  }

  private def duckBandStat(src: String, space: String, cap: Int): String =
    s"""SELECT '$space' AS space, CAST(band AS BIGINT) AS band,
       |       CAST(count(*) AS BIGINT) AS n_buckets,
       |       CAST(sum(n) AS BIGINT) AS n_rows,
       |       CAST(max(n) AS BIGINT) AS max_bucket,
       |       CAST(sum(CASE WHEN n > $cap THEN 1 ELSE 0 END) AS BIGINT) AS capped_buckets,
       |       CAST(sum(CASE WHEN n > $cap THEN n ELSE 0 END) AS BIGINT) AS rows_dropped,
       |       CAST(sum(CASE WHEN n > $cap THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT) AS pairs_avoided
       |FROM $src GROUP BY 2""".stripMargin

  private val dedupBandStatsOracle =
    s"""WITH $duckSimhash,
       |$duckSimhashBanded,
       |$duckMinhashIndex,
       |$duckWinnowSel,
       |sbuck AS (SELECT b AS band, bk, count(*) AS n FROM banded GROUP BY 1, 2),
       |mbuck AS (SELECT band, bh, count(*) AS n FROM bands GROUP BY 1, 2),
       |wfp AS (SELECT DISTINCT doc_id, fhv FROM wsel),
       |wkept AS (
       |  SELECT wfp.doc_id, wfp.fhv FROM wfp
       |  JOIN (SELECT fhv FROM wfp GROUP BY 1
       |        HAVING count(*) <= (SELECT count(*) FROM documents) // $WinDfFrac) r
       |  USING (fhv)),
       |wbuck AS (SELECT 0 AS band, fhv, count(*) AS n FROM wkept GROUP BY 1, 2)
       |${duckBandStat("sbuck", "simhash", SimhashBandCap)}
       |UNION ALL
       |${duckBandStat("mbuck", "minhash", MinhashBandCap)}
       |UNION ALL
       |${duckBandStat("wbuck", "winnowing", WinFpCap)}""".stripMargin

  // --------------------------------------- build-cost accounting entries
  /** Materializes the shared SimHash pair graph AND its connected
    * components — the two checkpoints seven registered consumers read —
    * and reports the graph's shape. This entry exists so the build cost
    * is a VISIBLE, oracle-gated bench line (VERDICT r9 finding 1): the
    * bench resets the memo registry between passes, every pass pays the
    * build exactly once HERE, and the per-query pins of the consumers
    * measure steady state. Output is the one-row summary a pipeline
    * logs after materializing its graph (edge count, total hamming
    * mass, component count, clustered-doc count, largest cluster).
    */
  private def neardupGraphBuild(spark: SparkSession, dir: String): DataFrame = {
    val pairs = simhashPairs(spark, dir)
    val comp = dedupComponents(spark, dir)
    val ps = pairs.agg(
      count(lit(1)).cast("long").as("n_edges"),
      coalesce(sum(col("hamming")), lit(0L)).cast("long").as("sum_hamming"))
    val cs = comp.groupBy(col("component")).agg(count(lit(1)).as("m"))
      .agg(count(lit(1)).cast("long").as("n_components"),
        coalesce(sum(when(col("m") >= 2, col("m")).otherwise(0L)), lit(0L))
          .cast("long").as("n_clustered_docs"),
        max(col("m")).cast("long").as("max_component"))
    // 1-row x 1-row: the broadcast-scalar product the plan audit allows
    ps.crossJoin(cs)
  }

  private val neardupGraphBuildOracle =
    // AS MATERIALIZED throughout (r15): pairs is referenced twice and cs
    // three times — without it DuckDB re-inlines the banded self-join /
    // the whole CC chain per reference, which is what exhausted the disk
    // at sf10 (the ngram-jaccard lesson, again)
    s"""WITH pairs AS MATERIALIZED ($simhashPairsOracle),
       |comp AS MATERIALIZED ($componentsOracle),
       |cs AS MATERIALIZED (SELECT component, count(*) AS m FROM comp GROUP BY 1)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
       |  (SELECT CAST(coalesce(sum(hamming), 0) AS BIGINT) FROM pairs) AS sum_hamming,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cs) AS n_components,
       |  (SELECT CAST(coalesce(sum(CASE WHEN m >= 2 THEN m ELSE 0 END), 0) AS BIGINT) FROM cs) AS n_clustered_docs,
       |  (SELECT CAST(max(m) AS BIGINT) FROM cs) AS max_component""".stripMargin

  /** Materializes the shared MinHash index (shingle sets, signatures,
    * band table) — same visible-build contract as
    * [[neardupGraphBuild]] for the six index consumers — and reports
    * the index shape a pipeline logs after a build: docs indexed,
    * distinct shingles hashed, bucket count/occupancy.
    */
  private def minhashIndexBuild(spark: SparkSession, dir: String): DataFrame = {
    val (_, sigs, bands) = minhashIndex(spark, dir)
    val s = sigs.agg(count(lit(1)).cast("long").as("n_docs_indexed"),
      coalesce(sum(col("c")), lit(0L)).cast("long").as("n_shingles"))
    val b = bands.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        coalesce(sum(col("n")), lit(0L)).cast("long").as("n_band_rows"),
        max(col("n")).cast("long").as("max_bucket"))
    s.crossJoin(b)
  }

  private val minhashIndexBuildOracle =
    s"""WITH $duckMinhashIndex,
       |scnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
       |bb AS (SELECT band, bh, count(*) AS n FROM bands GROUP BY 1, 2)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM sig) AS n_docs_indexed,
       |  (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM scnt) AS n_shingles,
       |  (SELECT CAST(count(*) AS BIGINT) FROM bb) AS n_buckets,
       |  (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM bb) AS n_band_rows,
       |  (SELECT CAST(max(n) AS BIGINT) FROM bb) AS max_bucket""".stripMargin

  /** Materializes the shared ExactSubstr covered-position table — the
    * memoized frame [[substringSpans]] and [[substringScrub]] both
    * consume — under the same visible-build contract as
    * [[neardupGraphBuild]]: the bench resets the memo registry between
    * passes, the ~gram-hashing build cost lands in THIS oracle-gated
    * entry, and the two consumers' pins measure steady state (VERDICT
    * r10 finding 2). Output is the summary a pipeline logs after the
    * build: docs with repeated spans, covered-start count, and a
    * position checksum that pins the exact table contents.
    */
  private def substringCoveredBuild(spark: SparkSession, dir: String): DataFrame = {
    coveredStarts(spark, dir).agg(
      countDistinct(col("doc_id")).cast("long").as("n_docs_covered"),
      count(lit(1)).cast("long").as("n_covered_starts"),
      coalesce(sum(col("pos")), lit(0L)).cast("long").as("sum_pos"))
  }

  private val substringCoveredBuildOracle =
    s"""WITH $duckCoveredStarts
       |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_covered,
       |       CAST(count(*) AS BIGINT) AS n_covered_starts,
       |       CAST(coalesce(sum(pos), 0) AS BIGINT) AS sum_pos
       |FROM cov""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    // builds FIRST: each bench pass (memo registry reset at pass
    // boundaries) pays the shared materializations in these named
    // entries, so every later consumer's pin is steady-state
    GraftQuery("minhash_index_build", Some(minhashIndexBuildOracle), minhashIndexBuild),
    GraftQuery("neardup_graph_build", Some(neardupGraphBuildOracle), neardupGraphBuild),
    GraftQuery("substring_covered_build", Some(substringCoveredBuildOracle), substringCoveredBuild),
    GraftQuery("dedup_band_stats", Some(dedupBandStatsOracle), dedupBandStats),
    GraftQuery("dedup_exact", Some(dedupExactOracle), dedupExact),
    GraftQuery("dedup_substring_spans", Some(substringSpansOracle), substringSpans),
    GraftQuery("substring_scrub", Some(substringScrubOracle), substringScrub),
    GraftQuery("dedup_verdicts", Some(dedupVerdictsOracle), dedupVerdicts),
    GraftQuery("cluster_representatives", Some(clusterRepresentativesOracle), clusterRepresentatives),
    GraftQuery("dedup_minhash_lsh", Some(minhashOracle), minhashLsh),
    GraftQuery("dedup_containment", Some(containmentOracle), containmentDedup),
    GraftQuery("dedup_incremental", Some(dedupIncrementalOracle), dedupIncremental),
    // r12 structural swap (VERDICT r11 finding 2): the default name is
    // the blocked scale path; the Σdf²-shaped exact MOSS report is the
    // fidelity twin, named for what it costs
    GraftQuery("winnowing_pairs", Some(winnowingBlockedOracle), winnowingPairsBlocked),
    GraftQuery("winnowing_pairs_exact", Some(winnowingOracle), winnowingPairsExact),
    GraftQuery("dedup_simhash", Some(simhashOracle), dedupSimhash),
    GraftQuery("dedup_simhash_pairs", Some(simhashPairsOracle), simhashPairs),
    GraftQuery("dedup_ngram_jaccard", Some(ngramOracle), ngramJaccard),
    GraftQuery("dedup_components", Some(componentsOracle), dedupComponents),
    GraftQuery("neardup_pagerank", Some(pagerankOracle), neardupPagerank),
    GraftQuery("label_propagation", Some(labelPropagationOracle), labelPropagation),
    GraftQuery("split_contamination", Some(contaminationOracle), splitContamination),
    GraftQuery("pair_edit_distance", Some(pairEditOracle), pairEditDistance),
    GraftQuery("neardup_triangles", Some(trianglesOracle), neardupTriangles),
  )
}
