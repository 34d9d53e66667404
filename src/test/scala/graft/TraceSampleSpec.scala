package graft

import org.apache.spark.sql.functions._

import graft.analysis.TraceSample
import graft.enrich.EventMatcher
import graft.model.Schemas._

/** Call-tree sampling: whole trees survive or vanish atomically, the
  * sample stays matchable, and the keep decision is deterministic. */
class TraceSampleSpec extends SparkSpec {
  import spark.implicits._

  // 2 processes × 20 top-level calls of 3 nested frames each
  private def trace = {
    val rows = for {
      p <- 0 to 1
      c <- 0 until 20
      base = c * 1000L
      e <- Seq(
        (base, Enter, s"top_$c"), (base + 10, Enter, "mid"),
        (base + 20, Enter, "leaf"), (base + 30, Leave, "leaf"),
        (base + 40, Leave, "mid"), (base + 900, Leave, s"top_$c"))
    } yield (e._1 + p, e._2, e._3, p) // +p: distinct ts per process
    rows.toDF(TimestampNs, EventType, Name, Process)
      .withColumn(EventId, col(TimestampNs) * 2 + col(Process))
  }

  test("trees are atomic: each top-level call keeps 0 or 6 events") {
    val sampled = TraceSample.sampleCalls(trace, 2, 5)
    val perTree = sampled
      .withColumn("tree", expr(s"$TimestampNs div 1000"))
      .groupBy(col(Process), col("tree")).agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(perTree.nonEmpty && perTree.forall(_ == 6L))
    val total = sampled.count()
    assert(total > 0 && total < trace.count()) // a real subsample
  }

  test("the sample is still matchable: every Enter finds its Leave") {
    val enriched = EventMatcher.enrich(TraceSample.sampleCalls(trace, 3, 5))
    val unmatched = enriched
      .filter(col(EventType).isin(Enter, Leave) &&
        col(MatchingEventId).isNull).count()
    assert(unmatched == 0L)
  }

  test("deterministic across runs and disjoint from the complement") {
    val a = TraceSample.sampleCalls(trace, 2, 5)
      .select(EventId).as[Long].collect().toSet
    val b = TraceSample.sampleCalls(trace, 2, 5)
      .select(EventId).as[Long].collect().toSet
    assert(a == b)
    // num=den keeps everything; num=0 keeps nothing
    assert(TraceSample.sampleCalls(trace, 5, 5).count() == trace.count())
    assert(TraceSample.sampleCalls(trace, 0, 5).count() == 0L)
  }

  test("clock alignment recovers the reference timeline exactly") {
    import graft.analysis.TraceAlign
    val a = trace
    val skewed = a.withColumn(TimestampNs,
      col(TimestampNs) + (col(Process) + 7).cast("long") * 12345L)
    val off = TraceAlign.offsets(a, skewed)
      .as[(Int, Long)].collect().toMap
    assert(off(0) == -7L * 12345L && off(1) == -8L * 12345L)
    val back = TraceAlign.align(a, skewed)
    assert(back.filter(!col("aligned")).count() == 0L)
    val got = back.select(col(Process), col(TimestampNs))
      .as[(Int, Long)].collect().sorted.toSeq
    val want = a.select(col(Process), col(TimestampNs))
      .as[(Int, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("processes unseen in the reference pass through unaligned") {
    import graft.analysis.TraceAlign
    val a = trace.filter(col(Process) === 0)
    val b = trace.withColumn(TimestampNs, col(TimestampNs) + 500L)
    val back = TraceAlign.align(a, b)
    assert(back.filter(col(Process) === 1 && col("aligned")).count() == 0L)
    // the unaligned process keeps its own (shifted) clock untouched
    val p1 = back.filter(col(Process) === 1).agg(min(col(TimestampNs)))
      .head.getLong(0)
    assert(p1 == trace.filter(col(Process) === 1)
      .agg(min(col(TimestampNs))).head.getLong(0) + 500L)
  }
}
