package graft

import org.apache.spark.sql.functions._

import graft.analysis.{RangeJoin, Scd}

/** Point-in-time-correct feature join: SCD2 versions probed as-of an
  * observation time — the feature-store rule that a probe must see the
  * version valid AT ITS TIME, never a later one (leakage). */
class PitJoinSpec extends SparkSpec {
  import spark.implicits._

  test("probes read the version valid at their day, never the future") {
    // key 1: status A from day 10, B from day 20
    val changes = Seq((1L, 10L, "A", 1L), (1L, 20L, "B", 2L))
      .toDF("k", "day", "status", "id")
    val versions = Scd.type2(changes, "k", "day", "status", "id")
      .select(col("k"), col("version").cast("long").as("version"),
        col("attr").as("status"), col("valid_from"),
        (coalesce(col("valid_to"), lit(100L)) - 1).as("end_day"))
    val probes = Seq((1L, 9L, 100L), (1L, 10L, 101L), (1L, 19L, 102L),
      (1L, 20L, 103L), (1L, 50L, 104L)).toDF("k", "obs", "event_id")
    val out = RangeJoin.pointInInterval(probes, versions,
        Seq("k"), "obs", "valid_from", "end_day", binWidth = 8)
      .select(col("event_id"), col("status"))
      .as[(Long, String)].collect().toMap
    assert(!out.contains(100L), "probe before the first version must drop")
    assert(out(101L) === "A" && out(102L) === "A")
    assert(out(103L) === "B" && out(104L) === "B")
  }
}
