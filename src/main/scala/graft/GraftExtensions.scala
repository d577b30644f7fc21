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
  def install(spark: SparkSession): Unit = {
    all.foreach { case (id, info, b) => FunctionBridge.register(spark, id, info, b) }
    GraftTableFunctions.all.foreach { case (id, info, b) =>
      FunctionBridge.registerTable(spark, id, info, b) }
  }
}

/** Table-valued SQL functions — relations computed from arguments,
  * the Delta `table_changes(...)` shape: where the `#history` /
  * `#partitions` metadata tables expose parameterless inventories,
  * a TVF carries the (from, to) version window into FROM-clause
  * position. Injected via `SparkSessionExtensions.injectTableFunction`
  * (the public hook, same as scalar functions). */
object GraftTableFunctions {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def literal(e: Expression, what: String): Any = {
    require(e.foldable, s"graft_table_changes: $what must be a literal")
    e.eval()
  }
  private def asLong(v: Any, what: String): Long = v match {
    case l: java.lang.Long    => l
    case i: java.lang.Integer => i.toLong
    case o => throw new IllegalArgumentException(
      s"graft_table_changes: $what must be an integer literal, got $o")
  }

  /** `SELECT * FROM graft_table_changes('<path>', <from_v>, <to_v>)`
    * — the change-exact row diff between two committed versions
    * ([[graft.tablelog.TableLog.diffVersions]], q336's machinery) in
    * FROM-clause position: (action, key, old_*, new_*) rows computed
    * from only the files the window's rewrites touched, never a full
    * double scan. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      (FunctionIdentifier("graft_table_changes"),
        new ExpressionInfo(graft.tablelog.TableLog.getClass.getName,
          "graft_table_changes"),
        (args: Seq[Expression]) => {
          require(args.length == 3,
            "usage: graft_table_changes(path, from_version, to_version)")
          val path = literal(args(0), "path").toString
          val from = asLong(literal(args(1), "from_version"), "from_version")
          val to = asLong(literal(args(2), "to_version"), "to_version")
          graft.tablelog.TableLog
            .diffVersions(SparkSession.active, path, from, to)
            .queryExecution.logical
        }),
      /* `graft_table_changes_between('<path>', fromMillis, toMillis)`
       * — the TIMESTAMP-bounded change feed: the diff of the table's
       * snapshots AS OF the two instants (each bound resolves through
       * [[graft.tablelog.TableLog.versionAtTimestamp]]'s O(log
       * history) search over the monotone commit stamps; the diff
       * itself reads only files active in exactly one snapshot). The
       * operational shape: "what changed between yesterday's load and
       * now" without the consumer bookkeeping version numbers. */
      (FunctionIdentifier("graft_table_changes_between"),
        new ExpressionInfo(graft.tablelog.TableLog.getClass.getName,
          "graft_table_changes_between"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "usage: graft_table_changes_between(" +
            "path, from_epoch_millis, to_epoch_millis)")
          val path = literal(args(0), "path").toString
          val fromTs = asLong(literal(args(1), "from_epoch_millis"),
            "from_epoch_millis")
          val toTs = asLong(literal(args(2), "to_epoch_millis"),
            "to_epoch_millis")
          require(fromTs <= toTs,
            s"graft_table_changes_between: from $fromTs > to $toTs")
          val from = graft.tablelog.TableLog.versionAtTimestamp(path, fromTs)
          val to = graft.tablelog.TableLog.versionAtTimestamp(path, toTs)
          graft.tablelog.TableLog
            .diffVersions(SparkSession.active, path, from, to)
            .queryExecution.logical
        }))
}

/** Config-time install: `spark.sql.extensions=graft.GraftExtensions`
  * — the standard way a USER of this library turns the functions on
  * for every session of their app (SparkSessionExtensions is Spark's
  * sanctioned extension-injection point; same mechanism Delta/Iceberg
  * use). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    GraftTableFunctions.all.foreach(ext.injectTableFunction)
    // persistent-view DDL + resolution ([[graft.sources.GraftViewRule]]);
    // the HINTS batch runs before Resolution, so CREATE/DROP/SHOW VIEW
    // statements are claimed before ResolveSessionCatalog refuses them
    // for a non-session catalog, and view references expand before
    // relation resolution reports them missing
    ext.injectHintResolutionRule(s => new graft.sources.GraftViewRule(s))
    // SQL INSERT INTO on identity / generated-column tables routes
    // through the TableLog allocator/generator instead of the staged
    // DSv2 append (which can only refuse identity tables)
    ext.injectHintResolutionRule(s =>
      new graft.sources.GraftGeneratedInsertRule(s))
  }
}
