package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the slowest bench query (not part of the API). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.scale.TextOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val train = docs.filter(col("doc_id") % 5 === 0)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // stage 1: bigram rows alone (tokenize+explode+hash, no joins)
    val rows = TextOps.bigramRows(docs, Some("doc_id"), "text")
      .select(col("doc_id"),
        TextOps.md5Hash60(concat_ws("\u0001", col("w1"), col("w2")), 0).as("bh"),
        TextOps.md5Hash60(col("w1"), 0).as("h1"))
    t("bigram rows + hash (count)")(rows.count())
    t("bigram rows NO hash (count)")(
      TextOps.bigramRows(docs, Some("doc_id"), "text").count())
    val pre = rows.groupBy(col("doc_id"), col("bh"), col("h1"))
      .agg(count(lit(1)).as("cnt"))
    t("pre-agg (count)")(pre.count())
    val (uni, bi) = TextOps.bigramModel(train)
    t("model build (uni+bi counts)")(uni.count() + bi.count())
    val full = TextOps.bigramLogProbFrom(docs, uni, bi)
    t("full cold")(full.count())
    t("full warm")(TextOps.bigramLogProbFrom(docs, uni, bi).count())
    t("full warm2")(TextOps.bigramLogProbFrom(docs, uni, bi).count())
    spark.stop()
  }
}
