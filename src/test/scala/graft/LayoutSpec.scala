package graft

import org.apache.spark.sql.functions._
import graft.scale.Layout

/** Morton interleave bit-exactness and the clustering guarantee of
  * clusterByZ (disjoint per-partition z ranges). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (x even positions, y odd)") {
    // x=5 (101), y=3 (011), 3 bits:
    // pos0=x0=1, pos1=y0=1, pos2=x1=0, pos3=y1=1, pos4=x2=1, pos5=y2=0 → 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(got == 27L)
  }

  test("zValue is monotone in each dimension holding the other at zero") {
    val df = (0L until 16L).map(x => (x, 0L)).toDF("x", "y")
      .select(col("x"), Layout.zValue(col("x"), col("y"), 4).as("z"))
      .orderBy("x").collect()
    val zs = df.map(_.getLong(1))
    assert(zs.sorted.sameElements(zs))
    // y bits land strictly higher for the same magnitude
    val zy = Seq((0L, 1L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4)).head().getLong(0)
    assert(zy == 2L)
  }

  test("clusterByZ yields disjoint, sorted z ranges per partition") {
    val pts = (0 until 1024).map { i =>
      val h = (i * 40503L) & 0x3ff
      (h & 0x1f, (h >> 5) & 0x1f)
    }.toDF("x", "y")
    val parts = Layout.clusterByZ(pts, "x", "y", 5, 8, keepZ = true)
      .select(spark_partition_id().as("pid"), col("__z"))
      .groupBy("pid").agg(min("__z").as("lo"), max("__z").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(parts.length > 1)
    parts.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
