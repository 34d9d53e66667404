package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.{GraftSql, VecMath}

/** The SQL surface: native vec functions registered on the session (and
  * injectable via spark.sql.extensions=graft.GraftExtensions). */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("vec_cosine/vec_dot in spark.sql match the Column API") {
    GraftSql.register(spark)
    Seq((1L, Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val sql = spark.sql(
      "SELECT vec_cosine(a, b) AS c, vec_dot(a, b) AS d FROM vecs").head()
    val api = Seq((1L, Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)))
      .toDF("id", "a", "b")
      .select(VecMath.cosine(col("a"), col("b")), VecMath.dot(col("a"), col("b")))
      .head()
    assert(sql.getDouble(0) == api.getDouble(0))
    assert(sql.getDouble(1) == api.getDouble(1))
    assert(sql.getDouble(1) == 2.0) // 1*2 + 0*1 + 2*0
  }

  test("registration is idempotent") {
    GraftSql.register(spark)
    GraftSql.register(spark)
    Seq((Array(1.0f), Array(1.0f))).toDF("a", "b").createOrReplaceTempView("v1")
    assert(spark.sql("SELECT vec_dot(a, b) FROM v1").head().getDouble(0) == 1.0)
  }

  test("GraftExtensions injects the same function table") {
    // applying to a fresh extensions object must not throw and must
    // consume every entry (session-build path: spark.sql.extensions)
    new GraftExtensions().apply(new SparkSessionExtensions)
    assert(GraftSql.functions.map(_._1.funcName).toSet ==
      Set("vec_cosine", "vec_dot"))
  }

  test("wrong arity is rejected at resolution") {
    GraftSql.register(spark)
    Seq((Array(1.0f), Array(1.0f))).toDF("a", "b").createOrReplaceTempView("v2")
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(a) FROM v2").head()
    }
    assert(e.getMessage.contains("2 arguments"))
  }
}
