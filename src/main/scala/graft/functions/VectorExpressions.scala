package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen-friendly float-vector dot product.
  *
  * The portable HOF form (`aggregate(zip_with(a, b, ...))`) materializes a
  * products array per row pair — at 12.5M candidate pairs (sf0.1 near-dup)
  * that is 25M short-lived arrays. This native Catalyst expression runs
  * the same left-to-right double accumulation as a tight loop inside
  * whole-stage codegen: bit-identical results (same IEEE op order — the
  * DuckDB oracle still matches), no allocation.
  *
  * Preference order per the build rules: compose built-ins first (the HOF
  * form stays as documentation/reference), custom Expression where the
  * built-in shape is the bottleneck — this is that case.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Register `float_vec_dot` in the session's function registry (idempotent)
    * and return a Column-building helper usable from the DataFrame API. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)),
      "built-in"
    )

  /** Dot product column over two array<float> columns (by name/expr text,
    * resolved through the registry — keeps us off Spark-internal Column
    * constructors). */
  def vecDot(a: String, b: String): Column = expr(s"float_vec_dot($a, $b)")
}
