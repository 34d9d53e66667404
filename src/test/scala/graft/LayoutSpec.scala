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

  test("balancedShards deals the sorted stream serpentine") {
    // weights sorted desc: 90,80,70,60,50,40,30,20 over 3 shards
    // ranks 0..7 -> shards 0,1,2, 2,1,0, 0,1 (snake)
    val df = Seq((1L, 90L), (2L, 80L), (3L, 70L), (4L, 60L), (5L, 50L),
      (6L, 40L), (7L, 30L), (8L, 20L)).toDF("doc_id", "w")
    val got = Layout.balancedShards(df, "w", "doc_id", 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1,
      6L -> 0, 7L -> 0, 8L -> 1))
  }

  test("balancedShards: per-shard sums stay within one max item") {
    val df = (1L to 200L).map(i => (i, (i * 7919) % 1000)).toDF("doc_id", "w")
    val sums = Layout.balancedShards(df, "w", "doc_id", 8)
      .groupBy("shard").agg(org.apache.spark.sql.functions.sum("w").as("s"))
      .collect().map(_.getAs[Long]("s"))
    assert(sums.length == 8)
    assert(sums.max - sums.min <= 999L)
  }
}
