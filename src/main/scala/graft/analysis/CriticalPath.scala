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

  /** Below this predecessor-table size the chain is walked driver-side:
    * the map is two longs per stall (100k stalls ≈ 1.6 MB — the same
    * bounded-collect contract as Cct's path assembly), and a local walk
    * replaces ~log₂ L Spark rounds of joins+actions with one collect.
    * Above it, pointer doubling keeps everything distributed. */
  val LocalWalkThreshold = 100000L

  /** Chain extraction shared by [[stallChain]] and [[criticalPath]]:
    * given the 1-step predecessor table (mid, pred_mid, dist=1) and a
    * root mid, return every ancestor of the root as (mid, hop).
    * Scale-adaptive: small pred tables collect and walk driver-side
    * ([[LocalWalkThreshold]]); large ones use pointer DOUBLING — round k
    * extends the known prefix with the 2^k-step pointers then squares
    * them, so a chain of length L costs ⌈log₂ L⌉ joins, never L
    * sequential lookups; a tail-probe against the 1-step pointers skips
    * the final (wasted) squaring, and localCheckpoint bounds lineage. */
  private def chainFrom(pred1: DataFrame, root: Long, maxRounds: Int,
                        localThreshold: Long): DataFrame = {
    val spark = pred1.sparkSession
    import spark.implicits._
    val nPred = pred1.count()
    if (nPred <= localThreshold) {
      val next = pred1.select(col("mid"), col("pred_mid")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val chain = scala.collection.mutable.ArrayBuffer(root -> 0L)
      val seen = scala.collection.mutable.Set(root)
      var cur = root
      // `seen` guards termination even on (contract-violating) cyclic input
      while (next.contains(cur) && seen.add(next(cur)))
        { cur = next(cur); chain += cur -> chain.length.toLong }
      return chain.toSeq.toDF("mid", "hop")
    }
    var ptr = pred1
    var chain = pred1.sparkSession.range(1)
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
    chain
  }

  def stallChain(events: DataFrame, maxRounds: Int = 40,
                 localThreshold: Long = LocalWalkThreshold): DataFrame = {
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

    shape(chainFrom(pred1, root, maxRounds, localThreshold).join(late, Seq("mid")))
      .orderBy(col("hop"))
  }

  /** Full critical path — the stall chain interleaved with the COMPUTE
    * segments between message dependencies: walking backward from the
    * last-arriving late message, each hop contributes
    *   - a `wait` segment at the receiver: [recv_ts, send_ts] — the
    *     late-sender stall itself, and
    *   - a `compute` segment at the sender: from the arrival of the
    *     sender's own previous stalled message (or, at the chain origin,
    *     the sender's first trace event) up to this send.
    * This is the Vampir/Scalasca-style "critical path through waits and
    * local work" as one DataFrame of typed segments.
    *
    * pred(m) here descends on ARRIVAL time (send_ts): the latest stall
    * received at m's sender that completed strictly before m was sent —
    * strictly decreasing send_ts makes the walk acyclic AND every
    * compute duration positive (the sender's own send event bounds its
    * first-event time from below at the origin). Same scale shape as
    * [[stallChain]]: one backward as-of join for all predecessors, a
    * broadcast-size per-process min, ⌈log₂ L⌉ doubling joins. */
  def criticalPath(events: DataFrame, maxRounds: Int = 40,
                   localThreshold: Long = LocalWalkThreshold): DataFrame = {
    val late = CommOps.matchMessages(events)
      .filter(col("send_ts") > col("recv_ts"))
      .select(col("recv_event_id").as("mid"), col("src"), col("dst"),
        col("send_ts"), col("recv_ts"))
      .localCheckpoint()

    val empty = late.sparkSession.range(0).select(
      lit(0L).as("seq"), lit("").as("kind"),
      lit(0).cast("int").as("process"),
      lit(0L).as("t0_ns"), lit(0L).as("t1_ns"), lit(0L).as("dur_ns"))
    val rootRow = late.orderBy(col("send_ts").desc, col("mid").desc)
      .limit(1).select(col("mid")).collect()
    if (rootRow.isEmpty) return empty
    val root = rootRow(0).getLong(0)

    // pred(m): latest stall ARRIVING at m's sender strictly before
    // m's send — inclusive backward as-of at send_ts − 1 on the process
    val leftSide = late.select(col("mid"), col("src").as("proc"),
      (col("send_ts") - 1).as("lt"))
    val rightSide = late.select(col("mid").as("rmid"), col("dst").as("proc"),
      col("send_ts").as("rt"))
    val pred = AsOfJoin.asOfBackward(leftSide, rightSide, Seq("proc"),
        "lt", "rt", "rmid",
        Seq("rmid" -> "pred_mid", "rt" -> "pred_arrival"))
      .select(col("mid"), col("pred_mid"), col("pred_arrival"))
      .localCheckpoint()
    val pred1 = pred.filter(col("pred_mid").isNotNull)
      .select(col("mid"), col("pred_mid"), lit(1L).as("dist"))

    val chain = chainFrom(pred1, root, maxRounds, localThreshold)
      .join(late, Seq("mid"))
      .join(pred, Seq("mid"), "left")
      .localCheckpoint()

    // chain-origin compute segments start at the sender's first trace
    // event; per-process min is #ranks rows — broadcast, no shuffle on
    // the (already tiny) chain side
    val procMin = events.groupBy(col(Process).as("src"))
      .agg(min(col(TimestampNs)).as("proc_t0"))
    val waits = chain.select((col("hop") * 2).as("seq"), lit("wait").as("kind"),
      col("dst").as("process"), col("recv_ts").as("t0_ns"),
      col("send_ts").as("t1_ns"))
    val computes = chain.join(broadcast(procMin), Seq("src"))
      .select((col("hop") * 2 + 1).as("seq"), lit("compute").as("kind"),
        col("src").as("process"),
        coalesce(col("pred_arrival"), col("proc_t0")).as("t0_ns"),
        col("send_ts").as("t1_ns"))
    waits.unionByName(computes)
      .withColumn("dur_ns", col("t1_ns") - col("t0_ns"))
      .orderBy(col("seq"))
  }
}
