package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** CDC (change-data-capture) log application: materialize a new
  * snapshot from a current snapshot plus a keyed change log — the
  * inverse of the reference's diff engine (dbsync.go's diffData
  * DERIVES a change set; this APPLIES one).
  *
  * Latest-wins semantics per primary key: the change with the highest
  * sequence number decides — delete drops the key, insert/update
  * replace the full row. Keys untouched by the log pass through.
  *
  * Shape: the latest-change reduction is [[graft.plans.TopKPerKey]]
  * with k=1 (per-key heaps map-side, so a hot key with millions of log
  * entries reduces before the exchange — the window row_number form
  * would sort the whole log), then ONE full-outer equi-join against
  * the snapshot on the key. Both sides shuffle on the pk once; at
  * scale, pre-bucketing snapshot and log by pk makes the join
  * exchange-free.
  */
object Cdc {

  /** Apply `log` to `snapshot`. `log` must carry every snapshot column
    * plus `seqCol` (unique per key — the version order) and `opCol`
    * ('I' | 'U' | 'D'). Returns the new snapshot with exactly the
    * snapshot's columns.
    */
  def applyLog(
      snapshot: DataFrame,
      log: DataFrame,
      pkCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    require(dataCols.contains(pkCol), s"snapshot lacks pk column $pkCol")
    require((dataCols :+ seqCol :+ opCol).forall(log.columns.contains),
      "log must carry snapshot columns + seq + op")
    val latest = TopKPerKey.topk(
      log.select((dataCols :+ seqCol :+ opCol).map(col): _*),
      Seq(pkCol), Seq(TopKPerKey.Desc(seqCol)), 1)
    val s = snapshot.as("s")
    val c = latest.as("c")
    s.join(c, col(s"s.$pkCol") === col(s"c.$pkCol"), "full_outer")
      .filter(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")
      // row presence, not per-column coalesce: an update that sets a
      // column to NULL must replace, not fall back to the stale value
      .select(dataCols.map(cn =>
        when(col(s"c.$opCol").isNotNull, col(s"c.$cn"))
          .otherwise(col(s"s.$cn")).as(cn)): _*)
  }
}
