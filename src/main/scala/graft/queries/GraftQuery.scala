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
}
