package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{QuantizeInt8, VectorDotExact, VectorDotLong}

/** Production registration point for graft's custom Catalyst expressions:
  *
  * {{{ spark-submit --conf spark.sql.extensions=graft.GraftExtensions ... }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions) `.
  * Interactive/library callers can instead use the idempotent
  * per-expression `register` seams (same builders).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_vector_dot_exact"),
      new ExpressionInfo(classOf[VectorDotExact].getName, "graft_vector_dot_exact"),
      exprs => VectorDotExact(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quantize_int8"),
      exprs => QuantizeInt8(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_vector_dot_long"),
      new ExpressionInfo(classOf[VectorDotLong].getName, "graft_vector_dot_long"),
      exprs => VectorDotLong(exprs.head, exprs(1))))
  }
}
