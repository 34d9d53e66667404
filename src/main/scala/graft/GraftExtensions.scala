package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark extension entry point — the standard way to ship graft onto a
  * cluster: `--conf spark.sql.extensions=graft.GraftExtensions` makes
  * every session (including Thrift/Connect ones that never touch Scala)
  * see the native functions in SQL. The function table lives in
  * [[graft.functions.GraftSql]]; existing sessions can call
  * `GraftSql.register(spark)` instead. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftSql.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.functions.VecRewrite)
  }
}
