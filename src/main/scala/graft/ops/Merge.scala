package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changeset application — the Delta/Iceberg `MERGE INTO` primitive and
  * the INVERSE of a snapshot diff: given a current snapshot and a
  * changeset of (id, op, payload) rows, produce the next snapshot.
  * `diff(A, B)` (the x12 operator) followed by `applyChangeset(A, ·)`
  * reproduces B exactly — the round-trip the `x26` query gates.
  *
  * Plan shape at scale: ONE full-outer shuffled join on the id (both
  * sides data-scale; small changesets broadcast automatically via AQE —
  * no hint forced), then a map-side projection choosing per column:
  * delete rows drop, upsert rows take the changeset payload, untouched
  * rows pass through. No window, no second pass.
  *
  * Contract: `changes` carries at most ONE row per id (a changeset with
  * duplicate ids has no well-defined result order — dedupe upstream
  * with a version column; the snapshot-diff construction is unique by
  * construction). `op` values: "upsert" | "delete".
  */
object Merge {

  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
                     idCol: String, opCol: String): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == idCol).toSeq
    val missing = (idCol +: opCol +: dataCols).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changeset is missing columns: ${missing.mkString(", ")}")
    val s = snapshot.as("s")
    val c = changes.select((idCol +: opCol +: dataCols).map(col): _*).as("c")
    s.join(c, col(s"s.$idCol") === col(s"c.$idCol"), "full_outer")
      .filter(!coalesce(col(s"c.$opCol") === "delete", lit(false)))
      .select(coalesce(col(s"c.$idCol"), col(s"s.$idCol")).as(idCol) +:
        dataCols.map(d =>
          when(col(s"c.$opCol") === "upsert", col(s"c.$d"))
            .otherwise(col(s"s.$d")).as(d)): _*)
  }
}
