package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sum of a numeric array, accumulated in double.
  *
  * Why custom: the dialect's flat/dotted array reductions (SURVEY §2.3
  * P2/P3/P7) previously planned as `aggregate(arr, 0D, (acc, x) -> acc +
  * x)` — a higher-order function, which is `CodegenFallback`: interpreted
  * lambda dispatch per element, per row. Array reductions run inside the
  * scan projection, so at the 100 TB regime they *are* the scan hot path.
  * This expression is one fused primitive loop inside whole-stage codegen.
  *
  * Semantics are bit-identical to the HOF fold the DuckDB oracles mirror:
  * sequential left-to-right double accumulation starting at 0.0, null if
  * the array is null or any element is null, 0.0 for an empty array.
  */
case class ArraySum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  // nullable even over a non-null child: a null *element* poisons the fold
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_sum requires an array of a numeric type, got ${other.simpleString}")
  }

  // per-element read as double — every numeric type the schema layer
  // admits as Number (the dialect sees one Number type, so the physical
  // element type must never surface as an analysis error)
  private def elemAsDoubleJava(a: String, i: String): String =
    child.dataType match {
      case ArrayType(ByteType, _)    => s"(double) $a.getByte($i)"
      case ArrayType(ShortType, _)   => s"(double) $a.getShort($i)"
      case ArrayType(IntegerType, _) => s"(double) $a.getInt($i)"
      case ArrayType(LongType, _)    => s"(double) $a.getLong($i)"
      case ArrayType(FloatType, _)   => s"(double) $a.getFloat($i)"
      case ArrayType(d: DecimalType, _) =>
        s"$a.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case _                         => s"$a.getDouble($i)"
    }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      s += (child.dataType match {
        case ArrayType(ByteType, _)    => xs.getByte(i).toDouble
        case ArrayType(ShortType, _)   => xs.getShort(i).toDouble
        case ArrayType(IntegerType, _) => xs.getInt(i).toDouble
        case ArrayType(LongType, _)    => xs.getLong(i).toDouble
        case ArrayType(FloatType, _)   => xs.getFloat(i).toDouble
        case ArrayType(d: DecimalType, _) =>
          xs.getDecimal(i, d.precision, d.scale).toDouble
        case _                         => xs.getDouble(i)
      })
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += ${elemAsDoubleJava(a, i)};
         |}
         |if (!${ev.isNull}) ${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArraySum =
    copy(child = newChild)

  override def prettyName: String = "array_sum"
}

/** Native L2 normalization of a numeric array: `x / sqrt(Σ x²)`, both
  * passes in double.
  *
  * Why custom: the HOF form `transform(vec, x -> x / sqrt(aggregate(vec,
  * …)))` embeds the norm fold inside the lambda, and higher-order
  * functions re-evaluate the captured tree per element — O(dims²) per row
  * on what should be the scan hot path. This is the fused two-pass loop
  * (norm, then divide) inside whole-stage codegen.
  *
  * Semantics: null for a null input, a zero norm (includes the empty
  * array), or a null element — downstream cosine math treats all of these
  * as "no embedding". Accumulation is sequential left-to-right from 0.0,
  * matching the `list_sum` fold the DuckDB oracle mirrors.
  */
case class VecL2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_l2normalize requires array<float> or array<double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val x = if (isFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      s += x * x
      i += 1
    }
    if (s == 0.0) return null
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = (if (isFloat) xs.getFloat(i).toDouble else xs.getDouble(i)) / norm
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double ${s}_x = (double) $a.$get($i);
         |  $s += ${s}_x * ${s}_x;
         |}
         |if (!${ev.isNull} && $s == 0.0) ${ev.isNull} = true;
         |if (!${ev.isNull}) {
         |  double $norm = Math.sqrt($s);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = ((double) $a.$get($i)) / $norm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecL2Normalize =
    copy(child = newChild)

  override def prettyName: String = "vec_l2normalize"
}
