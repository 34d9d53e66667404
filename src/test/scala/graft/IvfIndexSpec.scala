package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.scale.Similarity

/** Disk-layout IVF: the index write partitions by cluster, the search
  * prunes to the probed lists, and results match the in-memory IVF. */
class IvfIndexSpec extends SparkSpec {

  test("disk search prunes to probed partitions and matches in-memory IVF") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansFit(emb)
    val dir = Files.createTempDirectory("ivfidx").toFile.getAbsolutePath
    Similarity.writeIvfIndex(emb, s"$dir/idx", cents)

    val q = emb.filter(col("vec_id") < 3)
    val disk = Similarity.searchIvfIndex(spark, s"$dir/idx", q, cents,
      k = 5, nprobe = 2)
    // the probe set must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan data filter
    val scanLine = disk.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(scanLine.contains("cluster"), s"no partition pruning in: $scanLine")

    val mem = Similarity.ivfTopK(emb, q, 5, nprobe = 2,
      centroids = Some(cents))
    val a = disk.orderBy("query_id", "rank").collect().toSeq
    val b = mem.orderBy("query_id", "rank").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("appendIvfIndex: day-2 batch is searchable without a rebuild, pruning intact") {
    import spark.implicits._
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansFit(emb)
    val dir = Files.createTempDirectory("ivfapp").toFile.getAbsolutePath
    Similarity.writeIvfIndex(emb, s"$dir/idx", cents)

    val q = emb.filter(col("vec_id") === 0L)
    val before = Similarity.searchIvfIndex(spark, s"$dir/idx", q, cents,
      k = 1, nprobe = 1).collect()

    // plant a near-clone of query 0 in a new batch and append it
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val batch = Seq((900000L, qvec.map(v => v * 1.001f), 0))
      .toDF("vec_id", "embedding", "label")
    Similarity.appendIvfIndex(batch, s"$dir/idx", cents)

    val after = Similarity.searchIvfIndex(spark, s"$dir/idx", q, cents,
      k = 1, nprobe = 1)
    // pruning survives the append
    val scanLine = after.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(scanLine.contains("cluster"), s"no partition pruning in: $scanLine")
    // the appended near-clone displaces the old top-1
    val top = after.collect()(0)
    assert(top.getAs[Long]("neighbor_id") == 900000L)
    assert(before(0).getAs[Long]("neighbor_id") != 900000L)
  }
}
