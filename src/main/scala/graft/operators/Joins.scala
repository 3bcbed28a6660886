package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed workloads.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime and is the first line of defense. Salting is the explicit
  * fallback for the cases AQE can't fix: a broadcast-ineligible build
  * side with a handful of pathological hot keys (the classic "null key
  * / default tenant" skew), or engines/stages where AQE is off.
  */
object Joins {

  /** Salted inner equi-join on a shared key column.
    *
    * The left (large, skewed) side gets a per-row salt in [0, salts);
    * the right side is replicated `salts` times. The join key becomes
    * (key, salt), so one hot key spreads across `salts` partitions.
    * Result is exactly the plain inner join — salting is plan-shape
    * only. Cost: right side x `salts`, so keep the right side the
    * smaller input.
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Deterministic-enough spreading: hash the key with a row-unique
    // component. The salt value never affects the result, only the
    // partition a row lands in.
    val l = left.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // The whole point of salting is that every (key, salt) build
    // partition is small — so build a per-partition hash table instead
    // of sort-merge: no sort of either side, and the hint keeps AQE
    // from "fixing" the plan back.
    l.join(r.hint("SHUFFLE_HASH"), Seq(key, "__salt")).drop("__salt")
  }
}
