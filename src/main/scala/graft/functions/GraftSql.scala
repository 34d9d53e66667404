package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native expressions, so `spark.sql` users
  * get the same codegen'd kernels as the Column API:
  *
  * {{{
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * Two deployment paths share one function table:
  *  - cluster-wide: `spark.sql.extensions=graft.GraftExtensions`
  *    (applied at session build — the standard Spark extension point);
  *  - an existing session: `GraftSql.register(spark)` (idempotent).
  */
object GraftSql {

  /** (identifier, info, builder) triples — the shape both
    * `SparkSessionExtensions.injectFunction` and the session registry take. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      { case Seq(a, b) => VecCosine(a, b)
        case args => throw new IllegalArgumentException(
          s"vec_cosine takes 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      { case Seq(a, b) => VecDot(a, b)
        case args => throw new IllegalArgumentException(
          s"vec_dot takes 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("vec_sign_pack"),
      new ExpressionInfo(classOf[VecSignPack].getName, "vec_sign_pack"),
      { case Seq(a) => VecSignPack(a)
        case args => throw new IllegalArgumentException(
          s"vec_sign_pack takes 1 argument, got ${args.length}") }),
    (FunctionIdentifier("vec_hamming"),
      new ExpressionInfo(classOf[VecHamming].getName, "vec_hamming"),
      { case Seq(a, b) => VecHamming(a, b)
        case args => throw new IllegalArgumentException(
          s"vec_hamming takes 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKLongs].getName, "top_k"),
      { case Seq(o, p,
          org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
            org.apache.spark.sql.types.IntegerType)) =>
          TopKLongs(o, p, k)
        case args => throw new IllegalArgumentException(
          "top_k takes (ord, payload, k literal int), got " +
            args.mkString(", ")) }))

  /** Register on an already-built session (overwrites are no-ops). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.FunctionBridge
        .registerFunction(spark, name, info, builder)
    }

  /** Install [[VecRewrite]] (aggregate(zip_with) → VecDot) on a live
    * session; new sessions get it from `graft.GraftExtensions`. */
  def enableRewrite(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(VecRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecRewrite
}
