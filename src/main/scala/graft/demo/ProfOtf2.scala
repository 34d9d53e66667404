package graft.demo

import org.apache.spark.sql.SparkSession

/** Scratch profiler: where do trace_otf2_roundtrip's CPU-seconds go —
  * raw .evt parse, Row→InternalRow conversion, dense-id window, or the
  * final projection? */
object ProfOtf2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime): Unit
      })
    def t[A](name: String)(f: => A): A = {
      val c0 = cpuNs.get; val t0 = System.nanoTime(); val r = f
      Thread.sleep(200)
      println(f"[prof] $name: wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"cpu=${(cpuNs.get - c0) / 1e9}%.2f s")
      r
    }
    // build the archive once via the registry's own export path
    val q = graft.SparkEntry.queries("trace_otf2_roundtrip")
    t("full roundtrip (archive build + read + count) run1")(q(spark, dir).count())
    t("full roundtrip run2")(q(spark, dir).count())
    // locate the exported archive under scratch
    val scratch = Seq("/dev/shm", System.getProperty("java.io.tmpdir", "/tmp"))
      .map(new java.io.File(_)).filter(_.isDirectory)
    val arch = scratch.flatMap(d => Option(d.listFiles).getOrElse(Array.empty).toSeq)
      .filter(f => f.getName.contains("otf2") && f.isDirectory)
      .maxBy(_.lastModified)
    println(s"[prof] archive: $arch")
    println(s"[prof] evt files: ${new java.io.File(arch, "traces").listFiles.length}, " +
      s"bytes=${Option(new java.io.File(arch, "traces").listFiles).get.map(_.length).sum}")
    t("read() to DataFrame, count only") {
      println(graft.ingest.Otf2Reader.read(spark, arch.getPath).count())
    }
    spark.stop()
  }
}
