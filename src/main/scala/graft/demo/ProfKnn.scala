package graft.demo

import org.apache.spark.sql.SparkSession

/** Scratch: the nClusters dial on the cluster-restricted kNN graph —
  * Σ|c|² work at fixed k=8 clusters grows quadratically with corpus
  * size; scaling nClusters with n keeps per-cluster size (and thus the
  * join) bounded. One measurement at the sf1 tiling grounds the claim
  * in the NOTES scale table. */
object ProfKnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profknn] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (k <- Seq(8, 80)) {
      t(s"knnGraph nClusters=$k cold")(
        graft.scale.Similarity.knnGraph(emb, 3, nClusters = k).count())
      t(s"knnGraph nClusters=$k warm")(
        graft.scale.Similarity.knnGraph(emb, 3, nClusters = k).count())
    }
    spark.stop()
  }
}
