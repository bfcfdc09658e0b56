package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VectorDotExact

/** Production registration point for graft's custom Catalyst expressions:
  *
  * {{{ spark-submit --conf spark.sql.extensions=graft.GraftExtensions ... }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions) `.
  * Interactive/library callers can instead use the idempotent
  * [[graft.functions.VectorDotExact.register]] seam (same builder).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_vector_dot_exact"),
      new ExpressionInfo(classOf[VectorDotExact].getName, "graft_vector_dot_exact"),
      exprs => VectorDotExact(exprs.head, exprs(1))))
}
