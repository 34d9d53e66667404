package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge-apply: materialize the final state of a keyed table from a
  * change stream of upserts and delete tombstones — the MERGE INTO /
  * "apply the binlog" primitive every incremental pipeline needs before
  * analytics can run over "current state".
  *
  * Semantics (last-writer-wins): for each key, order its change rows by
  * (seq, tiebreak) and keep the last; if that last row is a delete
  * tombstone the key is absent from the result. Earlier deletes below a
  * later upsert are naturally overridden (the key "reappears").
  *
  * Plan shape: one hash shuffle on the key, per-key window row_number
  * (partitioned — never a global window), filter rank=1. Map-side there
  * is nothing to combine (the payload travels with the winner), so a
  * window beats a two-phase agg+self-join: one shuffle, no join. At
  * 100 TB the shuffle is keyed by the merge key — the same partitioning
  * the downstream state table wants, so a writer can bucket it for free.
  */
object MergeApply {

  /** @param changes  change rows
    * @param keyCols  merge key
    * @param seqCol   change order within key (e.g. a log sequence number)
    * @param tieCols  deterministic tiebreak for equal seq values
    * @param opCol    operation column
    * @param deleteOp value of `opCol` marking a delete tombstone
    * @return the surviving rows (original columns, tombstones dropped) */
  def applyCdc(changes: DataFrame, keyCols: Seq[String], seqCol: String,
               tieCols: Seq[String], opCol: String,
               deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(seqCol) +: tieCols.map(col)).map(_.desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }
}
