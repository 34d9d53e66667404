package graft.demo

import org.apache.spark.sql.SparkSession

/** Dev tool (r12, VERDICT item 1): replay `stream_topk_endstate` N times
  * in ONE JVM/session and print the md5 of each run's canonical
  * (row-sorted) result — the repeated-run determinism proof the verdict
  * asked for. Usage:
  *
  *   sbt "runMain graft.demo.TopkProof <sfDir> <n>"
  */
object TopkProof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("stream_topk_endstate")
    for (i <- 1 to n) {
      val rows = fn(spark, sfDir).collect()
        .map(r => (0 until r.length).map(r.get).mkString(","))
        .sorted.mkString("\n")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(rows.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      println(s"[topkproof] run$i rows=${rows.count(_ == '\n') + 1} md5=$md5")
    }
    spark.stop()
  }
}
