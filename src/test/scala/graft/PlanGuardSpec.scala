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

  test("filters and column pruning reach the parquet scans") {
    // q1_pricing: the lineitem scan must read ONLY the columns the
    // aggregate touches — a scan of the full schema for a 5-column
    // aggregate is reading ~2× the bytes at 100 TB.
    val q1 = SparkEntry.queries("q1_pricing")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(q1).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"scan reads untouched columns: $readSchema")

    // q3_topk: the customer mktsegment predicate must reach the scan
    // as a pushed parquet filter, not a post-scan Filter over all rows
    val q3 = SparkEntry.queries("q3_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q3.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment not pushed to the customer scan:\n${q3.take(1500)}")

    // comm_matrix derives its comm attributes from (user_id, event_type,
    // value, props) — the scan must prune the UNUSED events columns
    // (event_id, ts), proving pruning pierces the commTrace projection
    val cm = SparkEntry.queries("comm_matrix")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val cmSchema = "ReadSchema: [^\n]*".r.findFirstIn(cm).getOrElse("")
    assert(!cmSchema.contains("event_id") && !cmSchema.contains("ts:"),
      s"comm_matrix scan reads unused columns: $cmSchema")
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
