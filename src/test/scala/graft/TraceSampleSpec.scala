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

}
