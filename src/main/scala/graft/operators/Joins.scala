package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Band join: all (left, right) pairs with `|leftVal - rightVal| <=
    * band`. A raw range-predicate join plans as a nested-loop cross
    * product; this form buckets both sides by `floor(val/band)` and
    * equi-joins each left bucket against its three possible right
    * buckets — shuffle volume is 3×rows and each pair is checked at
    * most once (the probe offsets are distinct), which is the
    * formulation that survives dense value ranges at scale.
    *
    * Result set is identical to the naive range join, including at
    * bucket boundaries: mathematically a qualifying pair's buckets
    * differ by at most 1, but `val / band` rounds in floating point,
    * and two values exactly `band` apart can land 2 buckets apart when
    * the divisions round in opposite directions. That can only happen
    * when the right quotient sits within a few ulp of an integer, so
    * the right side emits a ±2 probe CONDITIONALLY for quotients
    * within a relative epsilon of a boundary (a handful of rows —
    * typically exact multiples of the band — not a 5× blanket
    * explode). Asserted against the naive join on boundary-adjacent
    * values in PipelineOpsSpec.
    */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftVal: Column, rightVal: Column, band: Double): DataFrame = {
    val l = left.withColumn("__lb", floor(leftVal / band).cast("long"))
    val rq = rightVal / band
    val rb = floor(rq).cast("long")
    // eps ≫ the 2-3 ulp the two divisions can accumulate, at any
    // magnitude: absolute floor for small quotients, relative for large
    val eps = greatest(lit(1e-9), abs(rq) * 1e-12)
    val frac = rq - floor(rq)
    val r = right
      .withColumn("__probes", filter(array(
        (-1 to 1).map(d => rb + d) :+
          when(frac >= lit(1.0) - eps, rb + 2) :+
          when(frac <= eps, rb - 2): _*), c => c.isNotNull))
      .withColumn("__lb", explode(col("__probes")))
      .drop("__probes")
    l.join(r, "__lb")
      .filter(abs(leftVal - rightVal) <= band)
      .drop("__lb")
  }

  /** As-of join: for each left row, the single most recent right row
    * with `rightTime <= leftTime` on the same key (ties on time resolve
    * to the largest `rightTiebreak`; lefts with no prior right keep
    * nulls).
    *
    * Implemented as a union + one running `last_value(ignoreNulls)`
    * window — NOT as a range join. A range join on `rt <= lt` explodes
    * to O(lefts × rights-per-key) intermediate rows before picking the
    * max; the union form is one shuffle on the key, one sort, linear
    * scan — the only formulation that survives 100 TB with
    * thousands-deep key histories. Rights sort before lefts at equal
    * time (`__side` desc) so an exactly-simultaneous right is visible
    * to the left row.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightTiebreak: Column, rightPayload: Seq[Column]): DataFrame = {
    // payload carried as one nullable struct so a single last_value
    // resolves all right-side columns at once
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(1).as("__side"),
      rightTiebreak.as("__rtb"), struct(rightPayload: _*).as("__r"))
    val rSchema = r.schema
    val leftCols = left.columns.map(col).toIndexedSeq
    val l = left.select(
      Seq(leftKey.as("__k"), leftTime.as("__t"), lit(0).as("__side"),
        lit(null).cast(rSchema("__rtb").dataType).as("__rtb"),
        lit(null).cast(rSchema("__r").dataType).as("__r")) ++ leftCols: _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc, col("__rtb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols :+ col("__match"): _*)
  }
}
