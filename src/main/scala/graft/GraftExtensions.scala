package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, LongVecDot, LongVecSqDist, PolyHash}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to ANY session — including plain `spark-submit` /
  * Thrift-server SQL users — via
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * (Programmatic users can also call the ensureRegistered helpers.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "dot product of two array<float>"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("long_vec_sqdist"),
      info("long_vec_sqdist", "exact int64 squared L2 distance of two array<bigint>"),
      (exprs: Seq[Expression]) => LongVecSqDist(exprs(0), exprs(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("long_vec_dot"),
      info("long_vec_dot", "exact int64 dot product of two array<bigint>"),
      (exprs: Seq[Expression]) => LongVecDot(exprs(0), exprs(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      info("poly_hash", "portable polynomial string hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)
    ))
    // SUM(CAST(x AS DECIMAL(18,4))) → primitive-long limb sums; see
    // graft.plans.LimbSumRewrite (spark.graft.limbSumRewrite=false to opt out)
    ext.injectOptimizerRule(_ => graft.plans.LimbSumRewrite)
  }
}
