package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for graph_kcore (not part of the API): times each
  * stage of the query — edge build, symmetrization snapshot, and every
  * peeling round — so bench-level noise can be attributed. */
object ProfKcore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") =!= col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      t("edge self-join count")(println("  edges=" + edges.count()))
      val und = edges
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      var sym = und.select(col("u").as("s"), col("v").as("d"))
        .unionByName(und.select(col("v").as("s"), col("u").as("d")))
        .localCheckpoint(eager = false,
          storageLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY)
      var prev = t("sym snapshot+count")(sym.count())
      println("  sym=" + prev)
      var round = 0
      val k = 65; val maxRounds = 8
      while (round < maxRounds && prev > 0) {
        val keep = sym.groupBy(col("s")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("s").as("n"))
        val next = sym
          .join(keep.select(col("n").as("s")), Seq("s"), "leftsemi")
          .join(keep.select(col("n").as("d")), Seq("d"), "leftsemi")
          .localCheckpoint(eager = false,
            storageLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val c = t(s"round $round")(next.count())
        println(s"  rows=$c")
        sym = next
        round = if (c == prev) maxRounds else round + 1
        prev = c
      }
    }
    spark.stop()
  }
}
