package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

import graft.model.Schemas._

/** Inclusive / exclusive metric computation (SURVEY §2.3 M3/M4).
  *
  * Reference semantics:
  *  - inclusive (pipit/trace.py:294-327): for matched Enter rows,
  *    `metric.inc` = value at the matching Leave − value at the Enter.
  *    For the timestamp column that is simply `matching_ts − timestamp_ns`
  *    (a pure column expression, no join). Other metric columns need the
  *    Leave row's value → one equi self-join on the matching id.
  *  - exclusive (pipit/trace.py:329-365): `metric.exc` = inc − Σ (direct
  *    children's inc). The reference loops over `_children` lists; only
  *    *direct* children are subtracted, so relationally this is one
  *    aggregation over `parent_event_id` + one left join — no recursion.
  *
  * Both are idempotent by column presence, mirroring the reference's
  * memoization protocol (trace.py:300-301,314,352).
  */
object Metrics {

  /** Numeric metric columns eligible for inc/exc (pipit trace.py:24-26
    * discovers them via select_dtypes; we mirror that, excluding ids and
    * enrichment columns). */
  def numericMetricCols(events: DataFrame): Seq[String] = {
    val excluded = Set(EventId, Process, Thread, MatchingEventId, MatchingTs,
      Depth, ParentEventId, PathHash, ParentPathHash)
    events.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !excluded.contains(f.name) &&
        !f.name.startsWith("attr_") && // promoted attribute/id columns
        !f.name.endsWith("_inc") && !f.name.endsWith("_exc") => f.name
    }.toSeq
  }

  def calcIncMetrics(events0: DataFrame, columns: Seq[String] = null): DataFrame = {
    val events = EventMatcher.enrich(events0)
    val cols = Option(columns).getOrElse(numericMetricCols(events))
    val todo = cols.filterNot(c => events.columns.contains(incCol(c)))
    if (todo.isEmpty) return events

    val isMatchedEnter = col(EventType) === Enter && col(MatchingEventId).isNotNull

    // timestamp inc is a pure expression
    var out = events
    if (todo.contains(TimestampNs)) {
      out = out.withColumn(TimeInc,
        when(isMatchedEnter, col(MatchingTs) - col(TimestampNs)).cast(LongType))
    }
    // other metrics: value at Leave − value at Enter → self-join on match id
    val joinCols = todo.filterNot(_ == TimestampNs)
    if (joinCols.nonEmpty) {
      val leaves = out
        .filter(col(EventType) === Leave && col(MatchingEventId).isNotNull)
        .select(col(EventId).as("__leave_id") +:
          joinCols.map(c => col(c).as(s"__leave_$c")): _*)
      out = out.join(leaves, out(MatchingEventId) === leaves("__leave_id"), "left")
        .drop("__leave_id")
      for (c <- joinCols) {
        out = out.withColumn(incCol(c),
          when(isMatchedEnter, col(s"__leave_$c").cast(DoubleType) - col(c).cast(DoubleType)))
          .drop(s"__leave_$c")
      }
    }
    out
  }

  def calcExcMetrics(events0: DataFrame, columns: Seq[String] = null): DataFrame = {
    val events = EventMatcher.enrich(events0)
    val cols = Option(columns).getOrElse(numericMetricCols(events))
    val todo = cols.filterNot(c => events.columns.contains(excCol(c)))
    if (todo.isEmpty) return events

    val withInc = calcIncMetrics(events, todo)
    // Σ direct children's inc, keyed by parent enter id
    val childIncSums = todo.map(c => sum(incCol(c)).as(s"__csum_${incCol(c)}"))
    val childSums = withInc
      .filter(col(EventType) === Enter && col(ParentEventId).isNotNull)
      .groupBy(col(ParentEventId).as("__p"))
      .agg(childIncSums.head, childIncSums.tail: _*)

    var out = withInc.join(childSums, withInc(EventId) === childSums("__p"), "left")
      .drop("__p")
    for (c <- todo) {
      val inc = incCol(c)
      out = out.withColumn(excCol(c),
        when(col(inc).isNotNull, col(inc) - coalesce(col(s"__csum_$inc"), lit(0L))))
        .drop(s"__csum_$inc")
    }
    out
  }
}
