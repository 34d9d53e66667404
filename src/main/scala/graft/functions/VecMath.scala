package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector math over `array<float>` / `array<double>`
  * embedding columns.
  *
  * The built-in route (`aggregate(zip_with(...))`) evaluates interpreted
  * lambda expressions per element (`ArrayAggregate` is CodegenFallback),
  * which is ~100× slower than a fused loop and falls off the whole-stage
  * codegen path. This expression generates a single tight Java loop —
  * the preferred extension point per the engine's design rules (custom
  * `Expression` with `doGenCode` over UDFs).
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = VecMath.checkVecTypes(left, right)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    // every local MUST be freshName'd: two instances of this expression
    // fused into one whole-stage function otherwise redeclare the same
    // variable and janino rejects the stage (silent interpreted fallback)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$aGet($i);
         |  double $y = (double) $b.$bGet($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecCosine = copy(left = newLeft, right = newRight)
}

/** Codegen'd dot product — same rationale as [[VecCosine]]. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = VecMath.checkVecTypes(left, right)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += (if (af) a.getFloat(i).toDouble else a.getDouble(i)) *
        (if (bf) b.getFloat(i).toDouble else b.getDouble(i))
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    // freshName'd locals — see VecCosine.doGenCode
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$aGet($i) * (double) $b.$bGet($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

/** Null-exact dot product: the semantics-preserving target of
  * [[VecRewrite]]. The built-in composition
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0d, (acc,v)=>acc+v)` returns NULL
  * whenever the arrays differ in length (zip_with null-pads the shorter
  * side) or any element is NULL (the multiply poisons the accumulator);
  * [[VecDot]] instead assumes the embedding-column contract and iterates
  * min(|a|,|b|) primitively. This variant reproduces the composition's
  * results exactly — unequal lengths → NULL, any NULL element → NULL,
  * both empty → 0.0 — so rewriting to it never changes query results,
  * while still generating one fused loop. The per-element null checks are
  * only emitted when the schema says elements are nullable, so
  * containsNull=false columns pay nothing over [[VecDot]]. */
case class VecDotSafe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = VecMath.checkVecTypes(left, right)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_safe"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += (if (af) a.getFloat(i).toDouble else a.getDouble(i)) *
        (if (bf) b.getFloat(i).toDouble else b.getDouble(i))
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $dot += (double) $a.$aGet($i) * (double) $b.$bGet($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotSafe = copy(left = newLeft, right = newRight)
}

/** Engine-exact integer dot product: each component is quantized to
  * micro-units — `(long) floor((double) x · 10⁶)` — and the products are
  * summed as longs. Integer addition is associative, so the result is
  * independent of summation order and bit-identical in ANY engine that
  * quantizes the same way (DuckDB: `CAST(FLOOR(CAST(x AS DOUBLE) *
  * 1000000) AS BIGINT)`), unlike a float dot whose last ulp depends on
  * loop order. This is the similarity kernel for operators whose oracle
  * comparison is hash-exact (bitext mining): the float → floor boundary
  * flip that plagued `floor(cosine·10⁶)` cannot occur because no float
  * accumulation happens at all.
  *
  * Range: 64-dim unit-scale embeddings give |q| ≤ ~10⁶, per-term ≤ 10¹²,
  * sum ≤ ~10¹⁴ — five orders below Long overflow. */
case class VecDotMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = VecMath.checkVecTypes(left, right)

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_micro"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var dot = 0L
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += math.floor(x * 1000000d).toLong * math.floor(y * 1000000d).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    // freshName'd locals — see VecCosine.doGenCode
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) java.lang.Math.floor((double) $a.$aGet($i) * 1000000.0)
         |        * (long) java.lang.Math.floor((double) $b.$bGet($i) * 1000000.0);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotMicro = copy(left = newLeft, right = newRight)
}

/** Engine-exact squared norm of the micro-quantized vector — the other
  * sufficient statistic [[VecDotMicro]]-based cosine needs. Same
  * quantization contract; computed ONCE per vector (not per pair). */
case class VecNorm2Micro(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm2_micro needs array<float|double>, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_norm2_micro"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val af = elemIsFloat
    var s = 0L
    var i = 0
    while (i < n) {
      val q = math.floor(
        (if (af) a.getFloat(i).toDouble else a.getDouble(i)) * 1000000d).toLong
      s += q * q
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val q = ctx.freshName("q")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = (long) java.lang.Math.floor((double) $a.$get($i) * 1000000.0);
         |  $s += $q * $q;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm2Micro =
    copy(child = newChild)
}

/** Intersection size of two SORTED long arrays — one allocation-free
  * merge pass. The built-in `size(array_intersect(a, b))` builds a hash
  * set per call (per ROW in a verification join — the allocation cost
  * dominates candidate-pair verification at corpus scale); this is the
  * set-similarity verification kernel for hashed shingle sets. Inputs
  * MUST be ascending-sorted (sort_array at set-build time, once per doc,
  * not per pair); duplicate elements count once per matching pair of
  * runs' minimum — callers pass DISTINCT sets, where this is exact. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs array<bigint> args, got $l / $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $na = $a.numElements(), $nb = $b.numElements();
         |int $i = 0, $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) $i++; else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VecMath {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  private[functions] def checkVecTypes(left: Expression, right: Expression): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec ops need array<float|double> args, got ${left.dataType} / ${right.dataType}")
  }
  def cosine(a: Column, b: Column): Column = column(VecCosine(expression(a), expression(b)))
  def dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def dotMicro(a: Column, b: Column): Column = column(VecDotMicro(expression(a), expression(b)))
  def norm2Micro(a: Column): Column = column(VecNorm2Micro(expression(a)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
}
