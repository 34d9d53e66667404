package graft

import graft.scale.DataQuality

/** columnProfile: exact NDV, null accounting, and min/max per column
  * from one melt + one keyed aggregation. */
class ColumnProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiles nulls, exact distinct, and bounds per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (2.0, null), (null, 30.5))
      .toDF("a", "b")
    val out = DataQuality.columnProfile(df, Seq("a", "b"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out === Array(
      ("a", 4L, 1L, 2L, 1.0, 2.0),
      ("b", 4L, 1L, 2L, 10.0, 30.5)))
  }
}
