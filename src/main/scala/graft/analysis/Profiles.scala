package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Schemas._
import graft.enrich.Metrics

/** Profile-family operators (SURVEY §2.4 A5/A6/A7/A9).
  *
  * All outputs are long-form DataFrames (one row per group) — the dense /
  * pivoted presentation the reference returns is a driver-side concern and
  * available via `.groupBy(...).pivot(...)` at the collect boundary.
  */
object Profiles {

  private def ensureMetrics(events: DataFrame, metrics: Seq[String]): DataFrame = {
    // map requested metric column names back to their source columns, mirroring
    // pipit's on-demand calc (trace.py:529-535)
    var out = events
    val needInc = metrics.collect { case TimeInc => TimestampNs
                                    case m if m.endsWith("_inc") => m.stripSuffix("_inc") }
    val needExc = metrics.collect { case TimeExc => TimestampNs
                                    case m if m.endsWith("_exc") => m.stripSuffix("_exc") }
    if (needExc.nonEmpty) out = Metrics.calcExcMetrics(out, needExc)
    if (needInc.nonEmpty) out = Metrics.calcIncMetrics(out, needInc)
    out
  }

  /** flat_profile (pipit/trace.py:514-553): per-function aggregate.
    * Two-level: sum per (groupCol, process), then — unless perProcess —
    * mean over the processes *that have the function* (pandas groupby mean
    * over present rows). Catalyst plans partial+final aggregation; the
    * second level is a cheap re-agg of the first's output. */
  def flatProfile(events0: DataFrame, metrics: Seq[String] = Seq(TimeExc),
                  groupCol: String = Name, perProcess: Boolean = false): DataFrame = {
    val events = ensureMetrics(events0, metrics)
    val perProc = events
      .filter(col(EventType) === Enter)
      .groupBy(col(groupCol), col(Process))
      .agg(sum(col(metrics.head)).as(metrics.head),
        metrics.tail.map(m => sum(col(m)).as(m)): _*)
    if (perProcess) perProc
    else perProc.groupBy(col(groupCol))
      .agg(avg(col(metrics.head)).as(metrics.head),
        metrics.tail.map(m => avg(col(m)).as(m)): _*)
  }

  /** Bottom-up (caller-attribution) profile: each function's call count
    * and exclusive time split by the CALLING function — the view that
    * says which call site to fix, complementing [[flatProfile]] (who is
    * hot) and `Cct.subtreeRollup` (top-down). Root-level calls attribute
    * to `<root>`. One self-join of Enter rows on `parent_event_id`
    * (both sides shuffle on event ids — no windows, no corpus sort) over
    * an already-enriched trace. */
  def callersProfile(events0: DataFrame): DataFrame = {
    val events = ensureMetrics(events0, Seq(TimeExc))
    val e = events.filter(col(EventType) === Enter)
    val parents = e.select(col(EventId).as("__pid"), col(Name).as("__pname"))
    e.join(parents, col(ParentEventId) === col("__pid"), "left")
      .groupBy(col(Name), coalesce(col("__pname"), lit("<root>")).as("caller"))
      .agg(count(lit(1)).as("n_calls"),
        sum(col(TimeExc)).cast("long").as("exc_sum"))
  }

  /** load_imbalance (pipit/trace.py:555-598): per function,
    * imbalance = max(per-process metric) / mean(per-process metric), the
    * mean, and the top-k processes by metric (ties broken by DESCENDING
    * process id — sort_array(struct(metric, process), asc=false) orders
    * tied structs by the second field too; the reference's tie order is
    * pandas-internal and unspecified, ours is deterministic). Sorted by
    * mean desc. */
  def loadImbalance(events0: DataFrame, metric: String = TimeExc,
                    numProcesses: Int = 1): DataFrame = {
    val perProc = flatProfile(events0, Seq(metric), Name, perProcess = true)
    perProc.groupBy(col(Name))
      .agg(
        (max(col(metric)) / avg(col(metric))).as(metric + "_imbalance"),
        avg(col(metric)).as(metric + "_mean"),
        expr(s"transform(slice(sort_array(collect_list(struct(`$metric` as m, " +
          s"`$Process` as p)), false), 1, $numProcesses), x -> x.p)")
          .as("top_processes"))
      .orderBy(col(metric + "_mean").desc)
  }
  // note on top-k ties: sort_array on struct(m desc) orders by (m, p) lexi-
  // cographically descending, so equal metrics give *descending* p; queries
  // needing ascending tie-break should rank explicitly (see SparkEntry).

  /** Per-time-bin load imbalance — load_imbalance resolved over time:
    * "which PHASE of the run is imbalanced", not just which function.
    * Per bin, each process's busy time is the overlap of its TOP-LEVEL
    * call spans with the bin (top-level spans are disjoint within a
    * process, so the sum IS utilization), and
    * imbalance = max_p busy / mean-over-ALL-processes busy (idle ranks
    * count in the mean — a bin where one rank works alone is maximally
    * imbalanced, which is exactly the signal).
    *
    * Unlike time_profile's double-edged reference-parity bins, this is a
    * NEW operator, so bins are INTEGER ns (width = ⌈extent/numBins⌉, last
    * bin clipped): overlaps and busy sums stay integral — order-free,
    * bit-identical on any engine — and the single double division per
    * bin happens on exact integers. Same explode-by-`sequence` shape as
    * time_profile (span/bin_width row amplification, no crossJoin); one
    * (bin, process) aggregation then a tiny per-bin rollup. */
  /** Shared core of [[timeImbalance]] / [[binnedBusy]]: the sparse
    * per-(bin, process) busy-ns table of top-level spans, plus the
    * (lo, binWidth, nproc) scalars. None on an empty trace. */
  private def binnedBusyCore(events0: DataFrame, numBins: Int)
      : Option[(DataFrame, Long, Long, Long)] = {
    val events =
      if (events0.columns.contains(MatchingTs)) events0
      else graft.enrich.EventMatcher.enrich(events0)
    val extRow = events.agg(min(col(TimestampNs)), max(col(TimestampNs)),
      countDistinct(when(col(EventType) === Enter, col(Process)))).head
    if (extRow.isNullAt(0)) return None
    val (lo, hi, nproc) =
      (extRow.getLong(0), extRow.getLong(1), extRow.getLong(2))
    val w = math.max((hi - lo + numBins - 1) / numBins, 1L)
    val spans = events
      .filter(col(EventType) === Enter && col(MatchingTs).isNotNull &&
        col(ParentEventId).isNull)
      .select(col(Process), col(TimestampNs).as("t0"), col(MatchingTs).as("t1"))
      .filter(col("t1") > col("t0"))
    val busy = spans
      .withColumn("bin", explode(sequence(
        expr(s"(t0 - $lo) div $w"),
        least(expr(s"(t1 - 1 - $lo) div $w"), lit(numBins - 1L)))))
      .select(col("bin"), col(Process),
        (least(col("t1"), lit(lo) + (col("bin") + 1) * w) -
          greatest(col("t0"), lit(lo) + col("bin") * w)).as("o"))
      .filter(col("o") > 0)
      .groupBy(col("bin"), col(Process)).agg(sum(col("o")).as("busy"))
    Some((busy, lo, w, nproc))
  }

  /** The timeline heatmap feed (Vampir-style (process × time-bin) busy
    * matrix), sparse — only cells with busy time. Same binning contract
    * as [[timeImbalance]], which aggregates exactly this table. */
  def binnedBusy(events0: DataFrame, numBins: Int = 50): DataFrame =
    binnedBusyCore(events0, numBins) match {
      case None =>
        events0.sparkSession.range(0).select(col("id").as("bin"),
          lit(0L).as("bin_start"), lit(0).as(Process), lit(0L).as("busy"))
      case Some((busy, lo, w, _)) =>
        busy.select(col("bin"), (lit(lo) + col("bin") * w).as("bin_start"),
          col(Process), col("busy"))
    }

  def timeImbalance(events0: DataFrame, numBins: Int = 50): DataFrame = {
    val core = binnedBusyCore(events0, numBins)
    if (core.isEmpty) // empty trace: no profile, correct schema
      return events0.sparkSession.range(0).select(
        col("id").as("bin"), lit(0L).as("bin_start"), lit(0L).as("max_busy"),
        lit(0L).as("total_busy"), lit(0.0).as("imbalance"))
    val (busy, lo, w, nproc) = core.get
    val events = events0 // (only the session is needed below)
    val perBin = busy.groupBy(col("bin"))
      .agg(max(col("busy")).as("max_busy"), sum(col("busy")).as("total_busy"))
    events.sparkSession.range(numBins).select(col("id").as("bin"))
      .join(perBin, Seq("bin"), "left")
      .select(col("bin"), (lit(lo) + col("bin") * w).as("bin_start"),
        coalesce(col("max_busy"), lit(0L)).as("max_busy"),
        coalesce(col("total_busy"), lit(0L)).as("total_busy"),
        when(coalesce(col("total_busy"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("max_busy") * lit(nproc.toDouble) /
            col("total_busy"), 6)).as("imbalance"))
  }

  /** idle_time (pipit/trace.py:600-631): Σ time_inc of Enter rows whose name
    * is in idleFunctions, per process. Processes with no such rows get 0
    * (the reference sums an empty series → 0.0), hence the join against the
    * full process list. */
  def idleTime(events0: DataFrame, idleFunctions: Seq[String] = Seq("Idle"),
               mpiEvents: Boolean = false): DataFrame = {
    val fns = if (mpiEvents) idleFunctions ++ Seq("MPI_Wait", "MPI_Waitall", "MPI_Recv")
              else idleFunctions
    val events = ensureMetrics(events0, Seq(TimeInc))
    val perProc = events
      .filter(col(EventType) === Enter && col(Name).isin(fns: _*))
      .groupBy(col(Process)).agg(sum(TimeInc).as("idle_time"))
    val allProcs = events.select(col(Process)).distinct()
    allProcs.join(perProc, Seq(Process), "left")
      .select(col(Process), coalesce(col("idle_time"), lit(0L)).as("idle_time"))
  }

  /** multirun_analysis (pipit/trace.py:766-804): union of per-trace flat
    * profiles tagged by process count, long-form (the reference pivots to
    * functions-as-columns ordered by total; that ordering is recoverable
    * from the `total` window column here). */
  def multirunAnalysis(traces: Seq[DataFrame], metric: String = TimeExc,
                       groupCol: String = Name): DataFrame = {
    val profiles = traces.map { t =>
      val nProc = t.select(col(Process)).distinct().count()
      flatProfile(t, Seq(metric), groupCol)
        .withColumn("num_processes", lit(nProc))
    }
    val unioned = profiles.reduce(_ unionByName _)
    unioned.withColumn("total", sum(col(metric)).over(Window.partitionBy(col(groupCol))))
      .select(col("num_processes"), col(groupCol), col(metric), col("total"))
  }

  /** Per-process idle GAPS — the complement of [[idleTime]]: instead of
    * summing explicitly-instrumented idle functions, finds the holes
    * between consecutive top-level spans on each process timeline (the
    * time no instrumented work ran at all). Needs the matcher's
    * `matching_ts`/`depth` enrichment; one keyed window per process —
    * partitioned, ordered by span start, O(1) state per row.
    *
    * @param minGapNs gaps at or below this are counted as jitter, not idle
    * @return (process, n_gaps, idle_gap_total, max_gap) — processes with
    *         no qualifying gap kept with zeros, like idle_time's shape */
  def idleGaps(events0: DataFrame, minGapNs: Long = 0L): DataFrame = {
    val events = ensureMetrics(events0, Seq(TimeInc))
    val top = events.filter(col(EventType) === Enter && col(Depth) === 0)
    val w = Window.partitionBy(col(Process)).orderBy(col(TimestampNs))
    val gaps = top
      .withColumn("__next", lead(col(TimestampNs), 1).over(w))
      .withColumn("__gap", col("__next") - col(MatchingTs))
      .filter(col("__gap") > minGapNs)
      .groupBy(col(Process))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__gap")).as("idle_gap_total"),
        max(col("__gap")).as("max_gap"))
    events.select(col(Process)).distinct()
      .join(gaps, Seq(Process), "left")
      .select(col(Process),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        coalesce(col("idle_gap_total"), lit(0L)).as("idle_gap_total"),
        coalesce(col("max_gap"), lit(0L)).as("max_gap"))
  }
}
