package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Scalar (int8) quantization — the third quantization family next to
  * [[VecSignPack]] (1 bit/dim) and product quantization: each dimension
  * maps to a 0..255 code against per-dimension [min, max] trained on the
  * corpus, a 4× compression over float32 that keeps per-dimension
  * resolution (what vector stores call SQ8). Codes are INTEGERS, so the
  * symmetric code-space distance Σ(q−c)² is order-free exact integer
  * arithmetic — rankings cannot flake on float summation order, in the
  * engine or in a SQL oracle.
  *
  * The code formula is evaluated in double precision in ONE fixed
  * shape, `floor((x − min) · 255 / (max − min))` clamped to 255, so any
  * engine computing the same IEEE expression produces identical codes
  * (the clamp absorbs the x = max case, where the quotient may land an
  * ulp above or below 255). A constant dimension (max = min) codes 0.
  */
case class VecSq8(child: Expression, mins: Array[Double], maxs: Array[Double])
    extends UnaryExpression {
  require(mins.length == maxs.length,
    s"mins/maxs length mismatch: ${mins.length} vs ${maxs.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sq8 needs array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_sq8"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), mins.length)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val lo = mins(i); val hi = maxs(i)
      out(i) =
        if (hi == lo) 0
        else math.min(math.floor((x - lo) * 255.0 / (hi - lo)), 255.0).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val mnRef = ctx.addReferenceObj("sq8mins", mins, "double[]")
    val mxRef = ctx.addReferenceObj("sq8maxs", maxs, "double[]")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val out = ctx.freshName("out")
    val x = ctx.freshName("x")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $mnRef.length);
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$get($i);
         |  double $lo = $mnRef[$i]; double $hi = $mxRef[$i];
         |  $out[$i] = $hi == $lo ? 0
         |    : (int) java.lang.Math.min(
         |        java.lang.Math.floor(($x - $lo) * 255.0 / ($hi - $lo)), 255.0);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecSq8 =
    copy(child = newChild)
}

object VecQuant {
  /** Column helper: `array<float|double>` → `array<int>` SQ8 codes. */
  def sq8(vec: Column, mins: Array[Double], maxs: Array[Double]): Column =
    column(VecSq8(expression(vec), mins, maxs))
}
