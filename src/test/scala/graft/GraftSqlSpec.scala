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
      Set("vec_cosine", "vec_dot", "vec_sign_pack", "vec_hamming", "top_k"))
  }

  test("top_k aggregate works from spark.sql") {
    GraftSql.register(spark)
    Seq((1L, 5L, 10L), (1L, 9L, 11L), (1L, 7L, 12L), (2L, 1L, 13L))
      .toDF("k", "ord", "id").createOrReplaceTempView("tk")
    val rows = spark.sql(
      "SELECT k, top_k(ord, id, 2) AS t FROM tk GROUP BY k ORDER BY k")
      .collect()
    val t1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(t1 == Seq((9L, 11L), (7L, 12L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(1L))
  }

  test("vec_sign_pack/vec_hamming in spark.sql match the Column API") {
    GraftSql.register(spark)
    Seq((Array(1.0f, -1.0f, 0.5f), Array(1.0f, 1.0f, -0.5f)))
      .toDF("a", "b").createOrReplaceTempView("hv")
    val sql = spark.sql(
      "SELECT vec_hamming(vec_sign_pack(a), vec_sign_pack(b)) AS h FROM hv")
      .head().getInt(0)
    val api = Seq((Array(1.0f, -1.0f, 0.5f), Array(1.0f, 1.0f, -0.5f)))
      .toDF("a", "b")
      .select(graft.functions.VecBits.hamming(
        graft.functions.VecBits.signPack(col("a")),
        graft.functions.VecBits.signPack(col("b"))))
      .head().getInt(0)
    assert(sql == api && sql == 2) // dims 2 and 3 differ in sign
  }

  test("VecRewrite turns aggregate(zip_with) into the codegen'd VecDot") {
    GraftSql.enableRewrite(spark)
    // non-foldable inputs (derived from the row id) so constant folding
    // can't collapse the expression before the plan assertion
    val df = spark.range(1).select(
      transform(sequence(lit(1), lit(3)),
        i => (i + col("id")).cast("float")).as("a"),
      transform(sequence(lit(4), lit(6)),
        i => (i + col("id")).cast("float")).as("b"))
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(composed.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(composed.head().getDouble(0) == 32.0) // 4 + 10 + 18
    // a non-dot-product aggregate must NOT be rewritten
    val notDot = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!notDot.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(notDot.head().getDouble(0) == 21.0)
  }

  test("VecRewrite is a true equivalence: null elements and unequal lengths stay null") {
    GraftSql.enableRewrite(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    // nullable elements: row id=0 has a null in `a`, row id=1 is clean
    val nullable = spark.range(2).select(col("id"),
      transform(sequence(lit(1), lit(3)), i =>
        when(i === 2 && col("id") === 0, lit(null))
          .otherwise((i + col("id")).cast("double"))).as("a"),
      transform(sequence(lit(1), lit(3)),
        i => (i + col("id")).cast("double")).as("b"))
    val q = nullable.select(col("id"), dot(col("a"), col("b")).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vec_dot_safe"))
    val rows = q.orderBy("id").collect()
    assert(rows(0).isNullAt(1)) // null element poisons the composition → null
    assert(rows(1).getDouble(1) == 29.0) // [2,3,4]·[2,3,4]
    // unequal lengths: zip_with null-pads → composition yields null
    val uneq = spark.range(1).select(
      transform(sequence(lit(1), lit(3)), i => (i + col("id")).cast("double")).as("a"),
      transform(sequence(lit(1), lit(2)), i => (i + col("id")).cast("double")).as("b"))
      .select(dot(col("a"), col("b")).as("d"))
    assert(uneq.queryExecution.optimizedPlan.toString.contains("vec_dot_safe"))
    assert(uneq.head().isNullAt(0))
  }

  test("Trace SQL views expose the trace tables to spark.sql") {
    val t = graft.model.Trace.fromCsv(spark, resourcePath("foo-bar.csv"))
      .createCct()
    t.createOrReplaceViews("fb")
    assert(spark.sql(
      "SELECT count(*) FROM fb_events WHERE event_type = 'Enter'")
      .head().getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM fb_cct").head().getLong(0) > 0)
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
