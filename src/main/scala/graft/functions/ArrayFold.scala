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
