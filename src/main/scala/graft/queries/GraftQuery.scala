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
