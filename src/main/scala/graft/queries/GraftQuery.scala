package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability = one named query + (when SQL-expressible) a
  * DuckDB oracle that must hash-match the Spark result on the same
  * parquet tables.
  *
  * Conventions that make the cross-engine hash compare exact:
  *  - window bounds / timestamps surfaced as epoch-second BIGINTs
  *    (`CAST(ts AS LONG)` in Spark == `FLOOR(EPOCH(ts))` in DuckDB);
  *  - money aggregates computed in DECIMAL (exact, order-independent)
  *    and only cast to DOUBLE at the end;
  *  - every ranking has a deterministic total order (unique tiebreaker);
  *  - integer-ish outputs cast to BIGINT on both sides.
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** Bucket-cap knobs for the LSH/blocking tiers. Each cap defaults to
  * its designed value and is env-overridable (`GRAFT_CAP_*`) so a
  * verification run can FORCE the dormant caps to engage at small
  * scale and prove the engagement path end-to-end — the override flows
  * into both the Spark plan and the DuckDB oracle SQL (the cap value
  * interpolates into both at class-init), so a caps-engaged run stays
  * hash-exact against the oracle by construction. The driver never
  * sets these, so gated runs always measure the designed values.
  */
private[graft] object Caps {
  def env(name: String, dflt: Int): Int =
    sys.env.get(name).map(_.toInt).getOrElse(dflt)

  /** Long-range variant for row-count thresholds that may legitimately
    * exceed 2^31-1 (e.g. `GRAFT_ND_BCAST_MAX` near the ~512M-row
    * broadcast limit) — `env(...).toLong` would parse through Int and
    * throw at object init on such an override.
    */
  def envLong(name: String, dflt: Long): Long =
    sys.env.get(name).map(_.toLong).getOrElse(dflt)
}

/** Cross-engine-stable decimal quantization: `floor(x·10^s + 0.5)/10^s`
  * on BOTH engines, for surfaces where the two engines' native `round`
  * semantics diverge on knife-edge doubles. Spark's `round` feeds
  * `BigDecimal.valueOf(double)` — the SHORTEST decimal representation
  * — then rounds HALF_UP, while DuckDB rounds the exact binary value;
  * a double like 1.37081249999999998934 (shortest repr "1.3708125")
  * therefore rounds to 1.370813 in Spark and 1.370812 in DuckDB. The
  * floor form is pure IEEE arithmetic (multiply by an exactly-
  * representable power of ten, add 0.5, floor), so bit-identical
  * inputs — which the order-matched folds already guarantee — give
  * bit-identical outputs on both engines, always. Semantics: round
  * half toward +∞ (for the iterative-float queries that hit this, the
  * tie side is irrelevant; ENGINE/ORACLE AGREEMENT is the contract).
  * Valid while |x|·10^s < 2^53, and for FINITE inputs only: Spark's
  * `floor` returns LongType, so NaN becomes 0.0 and ±Inf saturates to
  * ±Long.MaxValue/10^s, while the DuckDB twin propagates NaN/Inf —
  * callers must pre-filter or pre-null non-finite values (every
  * current call site is structurally finite: sigmoids are in (0,1),
  * ranks/weights are sums of finite quantized terms, and the token-
  * count denominators are ≥1 because `split(trim(text), " ")` yields
  * at least one element — [""] — even on empty text, on both
  * engines). First hit by the full-registry sf1
  * oracle run (r14): neardup_pagerank and lr_quality_classifier each
  * landed on 1e-(s+1) knife edges that 50k docs finally sample. A
  * second divergence class QRound also fixes (FULL_ORACLE_sf10_r15,
  * dsir_selection): a tiny-negative input rounding to ZERO keeps IEEE
  * -0.0 under DuckDB's round but loses the sign through Spark's
  * BigDecimal (no signed zero) — QRound's floor form lands both
  * engines on +0.0.
  */
private[graft] object QRound {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{floor, lit}

  def col(c: Column, scale: Int): Column = {
    val p = math.pow(10.0, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  def duck(expr: String, scale: Int): String =
    s"floor(($expr) * 1e$scale + 0.5) / 1e$scale"
}
