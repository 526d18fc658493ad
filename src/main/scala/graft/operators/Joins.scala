package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skew at scale.
  *
  * At 100 TB a single hot key (one viral item, one null-ish default)
  * turns a shuffle join into one straggler task. AQE's skew-join
  * handles storage-level skew for sort-merge joins; explicit salting is
  * the engine-level tool when the skew is algorithmic (known hot keys,
  * or aggregation-free stream-side joins AQE can't split).
  */
object Joins {

  /** Salted equi-join: the (big, skewed) `fact` side gets a
    * deterministic salt in [0, saltFactor); the (smaller) `dim` side is
    * replicated saltFactor times via a codegen'd explode. Result equals
    * `fact.join(dim, factKey === dimKey)` row-for-row, but the shuffle
    * key is (key, salt) so a hot key spreads over saltFactor reducers.
    *
    * The salt must be deterministic for retry-safety (a failed task
    * re-derives the same salt): xxhash64 of the whole fact row, not
    * rand().
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column,
      saltFactor: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedFact.join(saltedDim,
        factKey === dimKey && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
