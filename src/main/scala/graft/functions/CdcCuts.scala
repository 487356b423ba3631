package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking cut positions as one native pass —
  * `cdc_cuts(words, k, divisor)` → array<bigint>.
  *
  * The law is EXACTLY the HOF/oracle form the x194 scaladoc documents
  * (per-word [[PolyHashUtil]] hashes, then for each 0-based word index
  * m in [k−1, n−2] the window fold `(acc·31 + wh) mod 1e9+7` seeded 7
  * over wh[m−k+1..m], cut iff ≡ 0 mod divisor) — this expression only
  * moves it from interpreted lambda evaluation (Spark higher-order
  * functions are CodegenFallback, so the O(n·k) inner fold paid per-row
  * interpreter dispatch) into one codegen-called JVM loop: measured
  * 4.6 s → sub-second on the sf0.1 x194 report. The DuckDB oracle keeps
  * the list_filter/list_reduce formulation; bit-identical by
  * construction. */
object CdcUtil {
  def cuts(words: ArrayData, k: Int, divisor: Int): GenericArrayData = {
    val n = words.numElements()
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh(i) = PolyHashUtil.hash(words.getUTF8String(i))
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var m = k - 1
    val last = n - 2 // cuts suppressed at the final word: no empty tail
    while (m <= last) {
      var acc = 7L
      var j = m - k + 1
      while (j <= m) {
        acc = (acc * 31 + wh(j)) % PolyHashUtil.P
        j += 1
      }
      if (acc % divisor == 0) out += m.toLong
      m += 1
    }
    new GenericArrayData(out.result())
  }
}

case class CdcCuts(child: Expression, k: Int, divisor: Int)
    extends UnaryExpression {
  require(k >= 1 && divisor >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_cuts"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_cuts needs array<string>, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    CdcUtil.cuts(v.asInstanceOf[ArrayData], k, divisor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcUtil.cuts($c, $k, $divisor)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcFunctions {
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_cuts",
      exprs => {
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => sys.error(s"cdc_cuts $name must be an int literal, got $other")
        }
        CdcCuts(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "divisor"))
      },
      "built-in"
    )
}
