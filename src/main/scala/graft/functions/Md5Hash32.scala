package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit md5-derived hash of a string: the first 4 digest bytes as an
  * unsigned 32-bit value in a LONG — bit-identical to "the first 8 hex
  * digits of md5(key) parsed as an integer", the cross-engine formula
  * the DuckDB oracles recompute ([[graft.operators.Sketch.hash32SqlExpr]]).
  *
  * Why this expression exists (round-6 perf fix): the Column formulation
  * `(1 to 8).map(pos => instr(hex, substring(md5(...), pos, 1)) ...)`
  * references the md5 subtree EIGHT times in one projection, and Spark's
  * subexpression elimination does not reliably collapse them — measured
  * ~20 µs/row (md5 evaluated per reference) vs ~1 µs here. One digest
  * per row, no hex-string round trip, no per-digit string searches.
  */
case class Md5Hash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_hash32 expects a string key, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    Md5Hash32.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Hash32.hash($s);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5Hash32 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the UTF-8 string, big-endian unsigned. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private val FnName = "graft_md5_hash32"

  /** Register in the session's function registry (idempotent) — same
    * injection seam as [[VectorDotExact.register]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => Md5Hash32(exprs.head), "built-in")

  /** Column-level entry point; caller must have [[register]]ed. */
  def apply(key: Column): Column = call_function(FnName, key)
}
