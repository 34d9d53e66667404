package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas._
import graft.enrich.{EventMatcher, Metrics}

/** time_profile (SURVEY §2.4 A8; pipit/trace.py:633-764) — per-function
  * exclusive time contributed within each of `numBins` equal time intervals
  * spanning the whole trace extent.
  *
  * Reference semantics reproduced:
  *  - edges = `numBins` equal intervals over [min ts, max ts] of *all*
  *    events (double arithmetic).
  *  - an event belongs to bin i iff matching_ts > bin_start && ts < bin_end
  *    (strict, trace.py:692-695); its in-bin inclusive time is the interval
  *    overlap — the reference's 4 cases (starts-in / ends-in / spans /
  *    contained, trace.py:711-738) collapse to
  *    `least(mts, end) − greatest(ts, start)`.
  *  - in-bin exclusive time = in-bin inclusive − Σ of *direct* children's
  *    in-bin inclusive, children restricted to the same bin
  *    (trace.py:666-698; the reference iterates parents in timestamp order,
  *    so each parent subtracts its children's unmodified inclusive values).
  *  - per-bin idle_time = bin_size × #processes − Σ per-function exclusive
  *    (trace.py:751).
  *  - values < 0.01 are zeroed (trace.py:754), applied before normalization.
  *  - normalized=true divides by bin_size × #processes.
  *
  * Spark shape: explode each matched Enter over the bin ids it overlaps
  * (`sequence` — no 50-way crossJoin), one (parent,bin) aggregation + join
  * for the child subtraction, then a (bin,name) aggregation. Long-form
  * output (bin, bin_start, bin_end, name, time) with idle as name
  * "idle_time"; empty bins are kept (pure idle). Row amplification is
  * bounded by span/bin_size; call spans are normally ≪ trace extent (the
  * reference has the same blowup implicitly, SURVEY §4.3).
  */
object TimeProfile {

  def timeProfile(events0: DataFrame, numBins: Int = 50,
                  normalized: Boolean = false): DataFrame = {
    val events = Metrics.calcIncMetrics(EventMatcher.enrich(events0), Seq(TimestampNs))

    // bin edges span ALL events, but the process count is taken over Enter
    // rows only (trace.py:651-661: `events` is pre-filtered to Enter before
    // `Process.unique()`) — a rank with only Instant events must not
    // inflate idle time or the normalization denominator
    // the extent is ONE row consumed by three stages below — collect it
    // once (instead of re-running the aggregation over the enriched
    // lineage per consumer) and inline the scalars as literals
    val extRow = events.agg(
      min(col(TimestampNs)).cast("double"),
      max(col(TimestampNs)).cast("double"),
      countDistinct(when(col(EventType) === Enter, col(Process)))
        .cast("double")).head
    require(!extRow.isNullAt(0), "time_profile: empty trace")
    val (loV, hiV, nprocV) =
      (extRow.getDouble(0), extRow.getDouble(1), extRow.getDouble(2))
    val ext = events.sparkSession.range(1).select(
      lit(loV).as("lo"), lit(hiV).as("hi"), lit(nprocV).as("nproc"))

    val w = (col("hi") - col("lo")) / numBins
    val enters = events
      .filter(col(EventType) === Enter && col(MatchingTs).isNotNull)
      .select(col(EventId), col(ParentEventId), col(Name),
        col(TimestampNs).cast("double").as("t0"),
        col(MatchingTs).cast("double").as("t1"))
      .crossJoin(broadcast(ext))
      .withColumn("first_bin", greatest(floor((col("t0") - col("lo")) / w), lit(0.0)).cast("long"))
      .withColumn("last_bin", least(ceil((col("t1") - col("lo")) / w) - 1, lit(numBins - 1.0)).cast("long"))
      .filter(col("first_bin") <= col("last_bin"))
      .select(col("*"), explode(sequence(col("first_bin"), col("last_bin"))).as("bin"))
      .withColumn("bin_start", col("lo") + col("bin") * w)
      .withColumn("bin_end", col("lo") + (col("bin") + 1) * w)
      // strict in-bin membership (guards edge-exact floor/ceil results)
      .filter(col("t1") > col("bin_start") && col("t0") < col("bin_end"))
      .withColumn("inc_in_bin",
        least(col("t1"), col("bin_end")) - greatest(col("t0"), col("bin_start")))

    val childSums = enters.filter(col(ParentEventId).isNotNull)
      .groupBy(col(ParentEventId).as("__p"), col("bin").as("__b"))
      .agg(sum(col("inc_in_bin")).as("__child_inc"))

    val withExc = enters
      .join(childSums,
        enters(EventId) === childSums("__p") && enters("bin") === childSums("__b"), "left")
      .withColumn("exc_in_bin", col("inc_in_bin") - coalesce(col("__child_inc"), lit(0.0)))

    val perBinName = withExc.groupBy(col("bin"), col(Name))
      .agg(sum(col("exc_in_bin")).as("time"))

    // all bins (pure-idle bins included) + idle rows
    val allBins = ext.select(
      explode(sequence(lit(0L), lit(numBins - 1L))).as("bin"),
      col("lo"), col("hi"), col("nproc"))
    val binTotals = perBinName.groupBy(col("bin")).agg(sum(col("time")).as("__busy"))
    val idleRows = allBins.join(binTotals, Seq("bin"), "left")
      .select(col("bin"), lit("idle_time").as(Name),
        ((col("hi") - col("lo")) / numBins * col("nproc")
          - coalesce(col("__busy"), lit(0.0))).as("time"))

    val longForm = perBinName.unionByName(idleRows)
      .withColumn("time", when(col("time") < 0.01, 0.0).otherwise(col("time")))

    val withEdges = longForm
      .join(broadcast(ext.select(col("lo"), col("hi"), col("nproc"))))
      .withColumn("bin_start", col("lo") + col("bin") * w)
      .withColumn("bin_end", col("lo") + (col("bin") + 1) * w)

    val result =
      if (normalized)
        withEdges.withColumn("time",
          col("time") / ((col("hi") - col("lo")) / numBins * col("nproc")))
      else withEdges

    result.select(col("bin"), col("bin_start"), col("bin_end"), col(Name), col("time"))
  }
}
