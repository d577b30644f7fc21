package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.FunctionBridge

import graft.expr.{FloatVecDot, IntVecDot, NfcNormalize}

/** The library's native SQL functions — the codegen'd Catalyst
  * expressions (FloatVecDot / IntVecDot / NfcNormalize) exposed to
  * the SQL FRONT-END, not just the Column API: `SELECT
  * graft_dot(a.embedding, b.embedding) ...` plans the same tight
  * primitive loop inside whole-stage codegen as `VectorOps.dot`
  * does. One descriptor list feeds both install paths so they can
  * never diverge. */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
        (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
      (FunctionIdentifier("graft_doti"),
        new ExpressionInfo(classOf[IntVecDot].getName, "graft_doti"),
        (args: Seq[Expression]) => IntVecDot(args(0), args(1))),
      (FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
        (args: Seq[Expression]) => NfcNormalize(args.head)))

  /** Post-hoc install into an already-built session (idempotent —
    * registerFunction replaces). */
  def install(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) => FunctionBridge.register(spark, id, info, b) }
}

/** Config-time install: `spark.sql.extensions=graft.GraftExtensions`
  * — the standard way a USER of this library turns the functions on
  * for every session of their app (SparkSessionExtensions is Spark's
  * sanctioned extension-injection point; same mechanism Delta/Iceberg
  * use). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
