package graft

/** Plan-shape regression guard over the ENTIRE query registry: the
  * scale-killers the round-1 review flagged must never reappear.
  *
  *  - No CartesianProduct anywhere (non-equi joins must be broadcast
  *    or decomposed — e.g. RangeJoin's binning; an accidental cartesian
  *    on two corpus-sized sides is the classic silent scale-killer).
  *  - No single-partition window Exchange in any reader output
  *    (event_id assignment must stay distributed — Ingest.assignDenseIds).
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("reader event-id assignment stays distributed (no global window)") {
    import spark.implicits._
    val csv = graft.ingest.CsvReader.read(spark, resourcePath("foo-bar.csv"))
    val nsight = graft.ingest.NsightReader.fromIntervals(
      Seq(("kern", 0L, 10L, 100L, 1L), ("kern", 5L, 9L, 100L, 2L))
        .toDF("name", "start_ns", "end_ns", "pid", "tid"))
    Seq(csv, nsight).foreach { ev =>
      val plan = ev.queryExecution.executedPlan.toString
      assert(!(plan.contains("Window") && plan.contains("SinglePartition")),
        s"single-partition window in reader plan:\n${plan.take(2000)}")
    }
  }
}
