package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins CDC apply — the MERGE INTO / upsert primitive every
  * warehouse engine ships and the reference's closest analogue is the
  * incremental rescan (it rewrites changed prefixes in place,
  * database.go batch writes). Here it is an explicit operator: apply a
  * change log of full-row images (upserts and deletes, each stamped
  * with a monotone sequence number) onto a base snapshot, highest
  * sequence per key winning.
  *
  * Contract: `changes` carries the base's full column set plus
  * (`seqCol`, `opCol`); (key, seq) pairs are unique within `changes`
  * and every change seq is greater than Long.MinValue (the stamp the
  * base rows enter with). Under that contract the per-key argmax is
  * total — the struct comparison below never reaches the payload
  * fields — so the result is deterministic.
  */
object Merge {

  /** General shape: one hash aggregate keyed on the merge key — the
    * single shuffle is unavoidable when the change set is comparable
    * to the base (a backfill). The winner per key is `max(struct(seq,
    * op, payload...))`: structs compare lexicographically by field, so
    * with unique seqs this is argmax-by-seq in ONE agg with map-side
    * partial combine — not a row_number window (which would sort) and
    * not a self-join against max(seq).
    */
  def latestWins(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val stamped = base
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
    val all = stamped.unionByName(changes.select(stamped.columns.map(col): _*))
    all.groupBy(keyCols.map(col): _*)
      .agg(max(struct((seqCol +: opCol +: payload).map(col): _*)).as("w"))
      .where(col(s"w.$opCol") =!= "D")
      .select(keyCols.map(col) ++ payload.map(p => col(s"w.$p").as(p)): _*)
  }

  /** Scale shape for the common case — a change log that is tiny next
    * to the base (a day of CDC against a 100 TB snapshot). The change
    * log is resolved per key first (shuffles ONLY the changes), its
    * key set broadcasts into a left-anti join that drops superseded
    * base rows WITHOUT shuffling the base, and the resolved upserts
    * union on top. The base table never moves: the plan's only
    * exchange carries the change log. Identical output to
    * [[latestWins]] under the same contract (MergeSpec asserts it).
    */
  def latestWinsSmallChanges(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val resolved = changes.groupBy(keyCols.map(col): _*)
      .agg(max(struct((seqCol +: opCol +: payload).map(col): _*)).as("w"))
    val touched = resolved.select(keyCols.map(col): _*)
    val kept = base.join(broadcast(touched), keyCols, "left_anti")
    val upserts = resolved.where(col(s"w.$opCol") =!= "D")
      .select(keyCols.map(col) ++ payload.map(p => col(s"w.$p").as(p)): _*)
    kept.unionByName(upserts)
  }
}
