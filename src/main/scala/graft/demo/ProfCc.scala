package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the lsh_components artifact build (not part of
  * the API): minhash signatures -> LSH band pairs -> connected
  * components, each stage timed separately. */
object ProfCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.scale.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = Dedup.minhashSignatures(docs)
    t("signatures (count)")(sigs.count())
    val sigsC = sigs.persist()
    t("signatures persist")(sigsC.count())
    val pairs = Dedup.minhashLshPairs(sigsC)
    t("lsh pairs cold")(pairs.count())
    val pairsC = pairs.persist()
    t("lsh pairs persist")(pairsC.count())
    t("connected components over persisted pairs")(
      Dedup.connectedComponents(pairsC).count())
    t("full chain (as the artifact builds it)")(
      Dedup.connectedComponents(Dedup.minhashLshPairs(sigs)).count())
    // hand-unrolled CC loop with per-round timing (mirrors the impl)
    locally {
      val edges = pairsC.select(col("a").as("x"), col("b").as("y"))
        .union(pairsC.select(col("b").as("x"), col("a").as("y")))
        .distinct().localCheckpoint(false)
      var labels = edges.select(col("x").as("node")).distinct()
        .select(col("node"), col("node").as("component"))
        .localCheckpoint(false)
      var iter = 0; var done = false; var prevSum: Option[Long] = None
      while (!done && iter < 30) {
        val t0 = System.nanoTime()
        val nbr = edges
          .join(labels.select(col("node").as("y"), col("component")), Seq("y"))
          .select(col("x").as("node"), col("component"))
        val m = labels.unionByName(nbr)
          .groupBy(col("node")).agg(min(col("component")).as("component"))
        def jump(l: org.apache.spark.sql.DataFrame) =
          l.select(col("node"), col("component").as("mid"))
            .join(l.select(col("node").as("mid"), col("component")), Seq("mid"))
            .select(col("node"), col("component"))
        val next = jump(jump(jump(m))).localCheckpoint(false)
        val s = next.agg(coalesce(sum(col("component")), lit(0L)))
          .head.getLong(0)
        done = prevSum.contains(s)
        prevSum = Some(s); labels = next; iter += 1
        println(f"[prof] round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s (sum $s)")
      }
    }
    // large-star / small-star contraction experiment (Kiveris et al.)
    locally {
      val t0all = System.nanoTime()
      // canonical big->small directed edges
      var e = pairsC.select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v")).distinct().localCheckpoint(false)
      var iter = 0; var done = false
      while (!done && iter < 30) {
        val t0 = System.nanoTime()
        // large-star over the SYMMETRIC adjacency: every strictly-larger
        // neighbor re-points at m(u) = min(N(u) ∪ {u})
        val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        val mL = sym.groupBy(col("u"))
          .agg(least(min(col("v")), col("u")).as("m"))
        val e1 = sym.join(mL, Seq("u")).filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v")).distinct()
        // small-star over big->small edges: all small neighbors (and u)
        // re-point at the minimum small neighbor
        val mS = e1.groupBy(col("u")).agg(min(col("v")).as("m"))
        val e2raw = e1.join(mS, Seq("u"))
          .select(col("v").as("a"), col("m").as("b"))
          .union(mS.select(col("u").as("a"), col("m").as("b")))
        val next = e2raw
          .select(greatest(col("a"), col("b")).as("u"),
            least(col("a"), col("b")).as("v"))
          .filter(col("u") =!= col("v")).distinct().localCheckpoint(false)
        // exact fixpoint: the canonical edge SET unchanged
        val changed = next.unionByName(e).distinct().count() != e.count() ||
          next.count() != e.count()
        done = !changed
        e = next; iter += 1
        println(f"[prof] star round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s (edges ${e.count()})")
      }
      println(f"[prof] star total: ${(System.nanoTime() - t0all) / 1e9}%.2f s, rounds $iter")
      // validate: star fixpoint labels == min-prop labels
      val starLabels = e.select(col("u").as("node"), col("v").as("component"))
        .union(e.select(col("v").as("node"), col("v").as("component")))
        .distinct()
      val nPerNode = starLabels.groupBy("node").count()
        .filter(col("count") > 1).count()
      println(s"[prof] star: nodes with >1 label: $nPerNode")
      val ref = Dedup.connectedComponents(pairsC)
      val diff = starLabels.withColumnRenamed("component", "star")
        .join(ref, Seq("node"), "full")
        .filter(col("star").isNull || col("component").isNull ||
          col("star") =!= col("component")).count()
      println(s"[prof] star vs min-prop label mismatches: $diff")
    }
    spark.stop()
  }
}
