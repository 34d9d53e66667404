package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas._

/** Critical-path-style stall-chain extraction — "who was waiting on
  * whom, transitively": starting from the last late-sender stall in the
  * trace, walk to the most recent earlier stall at the SENDING process,
  * and so on back to the chain's origin. The result is the blame chain
  * a performance engineer walks by hand in a timeline viewer
  * (Vampir/Scalasca-style), as one DataFrame.
  *
  * Semantics (deterministic, acyclic by construction): a stall is a
  * matched message with send_ts > recv_ts ([[CommOps.matchMessages]]);
  * pred(m) = the stall at m's sender with the greatest recv_ts strictly
  * below m's recv_ts (ties → highest message id). Strict recv-order
  * descent guarantees termination — symmetric A↔B stalls cannot cycle —
  * and makes the chain unique.
  *
  * Scale shape: the predecessor pointer for EVERY stall is ONE backward
  * as-of join ([[AsOfJoin.asOfBackward]] — one keyed window shuffle, no
  * per-row search), and the chain from the root is extracted by POINTER
  * DOUBLING: round k joins the known prefix (length < 2^k) with the
  * 2^k-step pointer table and squares the pointers, so a chain of
  * length L needs ⌈log₂ L⌉ joins, never L sequential lookups — the same
  * O(log n) trick as the connected-components rounds, with
  * localCheckpoint bounding lineage per round. */
object CriticalPath {

  def stallChain(events: DataFrame, maxRounds: Int = 40): DataFrame = {
    // materialized once: the root collect, BOTH as-of sides, and the
    // final join all read this table — without the checkpoint each
    // action re-runs the two ranking windows + match join from the scan
    val late = CommOps.matchMessages(events)
      .filter(col("send_ts") > col("recv_ts"))
      .select(col("recv_event_id").as("mid"), col("src"), col("dst"),
        col("send_ts"), col("recv_ts"))
      .localCheckpoint()
    def shape(df: DataFrame) = df.select(
      col("hop"), col("src"), col("dst"), col("send_ts"), col("recv_ts"),
      (col("send_ts") - col("recv_ts")).as("wait_ns"))

    val rootRow = late.orderBy(col("recv_ts").desc, col("mid").desc)
      .limit(1).select(col("mid")).collect()
    if (rootRow.isEmpty) // no stalls: empty chain, correct schema
      return shape(late.withColumn("hop", lit(0L))).limit(0)
    val root = rootRow(0).getLong(0)

    // pred(m): latest stall at m's sender strictly before m's recv —
    // an inclusive backward as-of at recv_ts − 1 on the process key
    val leftSide = late.select(col("mid"), col("src").as("proc"),
      (col("recv_ts") - 1).as("lt"))
    val rightSide = late.select(col("mid").as("rmid"), col("dst").as("proc"),
      col("recv_ts").as("rt"))
    val pred1 = AsOfJoin.asOfBackward(leftSide, rightSide, Seq("proc"),
        "lt", "rt", "rmid", Seq("rmid" -> "pred_mid"))
      .filter(col("pred_mid").isNotNull)
      .select(col("mid"), col("pred_mid"), lit(1L).as("dist"))
      .localCheckpoint()
    var ptr = pred1

    // pointer doubling: after round k the chain holds all ancestors at
    // distance < 2^k and ptr maps exactly 2^k steps
    var chain = late.sparkSession.range(1)
      .select(lit(root).as("mid"), lit(0L).as("hop"))
    var rounds = 0
    var done = ptr.isEmpty
    while (!done && rounds < maxRounds) {
      val ext = chain.join(ptr, Seq("mid"))
        .select(col("pred_mid").as("mid"), (col("hop") + col("dist")).as("hop"))
        .localCheckpoint()
      if (ext.isEmpty) done = true
      else {
        chain = chain.unionByName(ext).localCheckpoint()
        // the chain can only continue past its deepest node; checking
        // that one row against the 1-step pointers is far cheaper than
        // the full ptr⋈ptr squaring it would otherwise trigger
        val tail = ext.orderBy(col("hop").desc).limit(1)
          .collect()(0).getLong(0)
        if (pred1.filter(col("mid") === tail).isEmpty) done = true
        else {
          ptr = ptr.as("a")
            .join(ptr.as("b"), col("a.pred_mid") === col("b.mid"))
            .select(col("a.mid").as("mid"), col("b.pred_mid").as("pred_mid"),
              (col("a.dist") + col("b.dist")).as("dist"))
            .localCheckpoint()
          if (ptr.isEmpty) done = true
        }
      }
      rounds += 1
    }
    shape(chain.join(late, Seq("mid"))).orderBy(col("hop"))
  }
}
