package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Canonical

/** Slowly-changing-dimension type-2 history: the temporal extension of
  * the reference's three-way diff (mydatasyncer `diffData`,
  * `dbsync.go:762-780`). Where the sync engine *applies* inserts/
  * updates/deletes, SCD2 *records* them — every key keeps one row per
  * version with a validity interval, so any past state can be
  * reconstructed with `valid_from <= b AND (valid_to IS NULL OR
  * valid_to > b)`.
  *
  * One full-outer join on the primary key, change detection on
  * [[Canonical.canonical]] strings (same cross-type equality and
  * null-safety as the diff engine), and a conditional two-element
  * array explode to emit closed + open versions — all codegen'd
  * built-ins, one shuffle per side, AQE picks the join strategy.
  */
object Scd2 {

  /** Build version history from two snapshots of the same table.
    *
    * Precondition: `pk` is unique within each snapshot (the usual
    * snapshot contract); a duplicated key would multiply through the
    * full-outer join and emit one version pair per combination. Run
    * [[graft.core.PrimaryKeyValidator]] first when the input is
    * untrusted.
    *
    * Output: `pk`, `compareCols`, `valid_from`, `valid_to` (NULL =
    * still open), `is_current`. Per key:
    *
    *   - unchanged: one open row stamped `oldBatch`;
    *   - changed: the old version closed at `newBatch` + a new open row;
    *   - deleted (only in old): closed at `newBatch`;
    *   - inserted (only in new): open row stamped `newBatch`.
    */
  def fromSnapshots(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      pk: String,
      compareCols: Seq[String],
      oldBatch: Long = 1L,
      newBatch: Long = 2L): DataFrame = {
    val cols = pk +: compareCols
    val o = oldSnap.select(cols.map(c => col(c).as("__o_" + c)): _*)
    val n = newSnap.select(cols.map(c => col(c).as("__n_" + c)): _*)
    val j = o.join(n, col("__o_" + pk) === col("__n_" + pk), "full_outer")
    val hasO = col("__o_" + pk).isNotNull
    val hasN = col("__n_" + pk).isNotNull
    val chg = hasO && hasN && compareCols
      .map { c =>
        Canonical.canonical(col("__o_" + c), oldSnap.schema(c).dataType) =!=
          Canonical.canonical(col("__n_" + c), newSnap.schema(c).dataType)
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    def version(prefix: String, from: Column, to: Column, current: Column): Column =
      struct(
        cols.map(c => col(prefix + c).as(c)) ++
          Seq(from.as("valid_from"), to.as("valid_to"), current.as("is_current")): _*)

    val oldRow = when(hasO, version("__o_",
      lit(oldBatch),
      when(!hasN || chg, lit(newBatch)),
      hasN && !chg))
    val newRow = when(hasN && (!hasO || chg), version("__n_",
      lit(newBatch), lit(null).cast("long"), lit(true)))
    j.select(explode(filter(array(oldRow, newRow), _.isNotNull)).as("__v"))
      .select("__v.*")
  }

  /** Point-in-time reconstruction: the rows visible as of `batch` —
    * versions opened at or before it and not yet closed by it. Applied
    * to [[fromSnapshots]] output, `asOf(h, oldBatch)` returns the old
    * snapshot's rows and `asOf(h, newBatch)` the new snapshot's: the
    * round-trip property the history build is FOR. A pure filter, so
    * partition pruning on `valid_from` applies when the history is
    * stored partitioned by batch.
    */
  def asOf(history: DataFrame, batch: Long): DataFrame =
    history
      .filter(col("valid_from") <= batch &&
        (col("valid_to").isNull || col("valid_to") > batch))
      .drop("valid_from", "valid_to", "is_current")
}
