package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the shingle-pair family (ngram_jaccard /
  * dedup_containment / distinct_ngrams): stage-by-stage timings. */
object ProfNgram {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warm the JVM/codegen on an unrelated pass
    t("warmup tokens count")(docs.select(explode(graft.scale.TextOps.tokens(col("text")))).count())
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val sh = graft.scale.Shingles.wordShingles(docs, 3, "text", "doc_id")
      t("shingles raw")(println("  " + sh.count()))
      val dis = sh.distinct()
      t("shingles distinct")(println("  " + dis.count()))
      val kept = dis.join(
        dis.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 1000).select(col("shingle")),
        Seq("shingle"), "leftsemi")
      t("df-cap semijoin")(println("  " + kept.count()))
      val withSz = kept.withColumn("sz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))))
      t("window sz")(println("  " + withSz.count()))
      val joined = withSz.as("x").join(withSz.as("y"),
          col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.sz").as("sza"), col("y.sz").as("szb"))
      val agg = joined.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("inter"),
          first(col("sza")).as("sza"), first(col("szb")).as("szb"))
      t("self-join + pair agg")(println("  " + agg.count()))
      t("full ngram_jaccard")(println("  " +
        graft.scale.Dedup.ngramJaccardPairs(docs, 3, 0.1, maxShingleDf = 1000).count()))
    }
    spark.stop()
  }
}
