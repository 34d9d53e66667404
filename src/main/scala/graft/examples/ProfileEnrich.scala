package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.demo.TraceGen
import graft.enrich.{EventMatcher, Metrics}
import graft.model.Schemas._

/** Stage-by-stage timing of the trace-enrichment pipeline (dev tool). */
object ProfileEnrich {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val trace = time("callTrace count") {
      val t = TraceGen.callTrace(spark, sfDir); t.count(); t
    }
    println(s"[profile] callTrace partitions: ${trace.rdd.getNumPartitions}")
    val tracePersisted = time("callTrace persist+count") {
      val t = TraceGen.callTrace(spark, sfDir).persist(StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    println(s"[profile] tracePersisted partitions: ${tracePersisted.rdd.getNumPartitions}")
    val matched = time("match persist+count") {
      val m = EventMatcher.enrich(tracePersisted).persist(StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    println(s"[profile] matched partitions: ${matched.rdd.getNumPartitions}")
    val exc = time("calcExc persist+count") {
      val e = Metrics.calcExcMetrics(matched, Seq(TimestampNs))
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    time("flat profile on enriched") {
      graft.analysis.Profiles.flatProfile(exc).count()
    }
    time("orderBy+count (trace_match shape)") {
      exc.filter(org.apache.spark.sql.functions.col(EventType) === Enter)
        .orderBy(EventId).count()
    }
    spark.stop()
  }
}
