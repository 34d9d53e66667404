package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Binary (sign-bit) vector quantization: 1 bit per dimension packed
  * into 32-bit words, compressing a float32 embedding 32× and turning
  * similarity's first pass into XOR + popcount — the cheapest possible
  * candidate scan for billion-vector corpora (the idea behind
  * binary/RaBitQ-style quantization in modern vector stores). Both
  * expressions are codegen'd fused loops, same rationale as [[VecDot]].
  *
  * Words hold 32 bits (not 64) so the packed value survives engines
  * whose BIGINT is the widest integer: bit 63 of a 64-bit word would be
  * the sign bit, and 2^63 overflows signed arithmetic in SQL oracles.
  */

/** `array<float|double>` → `array<long>`: word w bit j set iff
  * element 32w+j > 0. Null elements count as non-positive (bit clear) —
  * the embedding-column contract has none. */
case class VecSignPack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sign_pack needs array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sign_pack"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 31) >> 5)
    var i = 0
    while (i < n) {
      if (!(elemNullable && a.isNullAt(i))) {
        val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        if (x > 0) words(i >> 5) |= 1L << (i & 31)
      }
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val words = ctx.freshName("words")
    nullSafeCodeGen(ctx, ev, a => {
      val nullGuard = if (elemNullable) s"!$a.isNullAt($i) && " else ""
      s"""
         |int $n = $a.numElements();
         |long[] $words = new long[($n + 31) >> 5];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullGuard(double) $a.$get($i) > 0) {
         |    $words[$i >> 5] |= 1L << ($i & 31);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecSignPack =
    copy(child = newChild)
}

/** Hamming distance between two packed sign-bit vectors
  * (`array<long>` from [[VecSignPack]]): Σ popcount(a XOR b) over the
  * first min(|a|,|b|) words. Pure integer — bit-identical in any engine. */
case class VecHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_hamming needs array<long> args, got $l / $r")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_hamming"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecHamming = copy(left = newLeft, right = newRight)
}

object VecBits {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def signPack(v: Column): Column = column(VecSignPack(expression(v)))
  def hamming(a: Column, b: Column): Column = column(VecHamming(expression(a), expression(b)))
}
