package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.util.control.NonFatal

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** PERSISTENT SQL VIEWS over the graftlog catalog — the queryable-
  * surface parity item the reference's warehouse gives its users:
  * the loaded table is exported as a queryable id
  * (`terraform/outputs.tf:13-15`) and the pipeline's IAM includes
  * view DDL (`roles/bigquery.admin`, `terraform/main.tf:127-133`),
  * so a reference user can `CREATE VIEW dataset.v AS SELECT …` over
  * it. The engine's image: a view is ONE small SQL file under the
  * dataset's `_views/` sidecar directory
  * ([[GraftLogCatalog.viewFile]]) — no data, no manifest, O(1) to
  * create/replace/drop at any table scale, exactly BigQuery's
  * logical-view posture (the stored text re-analyzes per query, so
  * the view tracks the base table's schema and current snapshot;
  * `VERSION AS OF` inside the text pins an era).
  *
  * Spark 4.1 ships the DSv2 `ViewCatalog` interface but does not
  * wire it into SQL execution (no CreateViewExec / view-resolution
  * path), so the engine routes the standard statements itself via
  * an analyzer rule in the HINTS batch (runs before Resolution —
  * intercepting `CreateView`/`DropView`/`ShowViews` before
  * ResolveSessionCatalog refuses them for a non-session catalog):
  *
  *  - `CREATE [OR REPLACE] VIEW graftlog.ds.v AS SELECT …` —
  *    validates the text analyzes NOW (the BigQuery posture: a view
  *    referencing a missing table fails at create, not first read),
  *    refuses to shadow an existing TABLE, writes atomically.
  *  - `SELECT … FROM graftlog.ds.v` — the stored text expands
  *    in-place (SubqueryAlias over the parsed plan), then resolves
  *    with the whole query: filters/pruning push THROUGH the view
  *    into the base scan, so a view costs nothing at plan time and
  *    nothing at 100 TB that the underlying query didn't.
  *  - Views of views expand to fixed point; a definition cycle
  *    fails analysis (max-iterations), never hangs.
  *  - DML through a view (INSERT/DELETE/UPDATE/MERGE) refuses
  *    loudly. `DROP VIEW [IF EXISTS]`, `SHOW VIEWS IN graftlog[.ds]`,
  *    `ALTER VIEW … AS <query>` (validate-now, atomic swap) and
  *    `SHOW CREATE TABLE <view>` (runnable DDL replay — Spark's
  *    statement for views too) complete the lifecycle.
  */
class GraftViewRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftCatalog(name: String): Option[GraftLogCatalog] =
    try session.sessionState.catalogManager.catalog(name) match {
      case g: GraftLogCatalog => Some(g)
      case _ => None
    } catch { case NonFatal(_) => None }

  /** The view file an identifier addresses, when its head names a
    * graftlog catalog — existence not checked. */
  private def viewFileOf(parts: Seq[String])
      : Option[(GraftLogCatalog, Path)] =
    if (parts.length < 2) None
    else graftCatalog(parts.head)
      .flatMap(g => g.viewFile(parts.tail).map(g -> _))

  private def existingView(parts: Seq[String]): Option[Path] =
    viewFileOf(parts).map(_._2).filter(Files.isRegularFile(_))

  private def refuseDml(verb: String, parts: Seq[String]): Nothing =
    throw new UnsupportedOperationException(
      s"graftlog: cannot $verb view ${parts.mkString(".")} — a view is " +
        "a stored query; write to its base table instead")

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, _, _, _,
        originalText, _, allowExisting, replace, _)
        if viewFileOf(parts).isDefined =>
      require(cols.isEmpty,
        "graftlog views take their column names from the query — alias " +
          "in the SELECT instead of a column list")
      val text = originalText.getOrElse(throw new IllegalArgumentException(
        "graftlog: CREATE VIEW requires the AS <query> text"))
      val (g, file) = viewFileOf(parts).get
      GraftCreateViewCommand(g, parts, file, text, replace, allowExisting)
    case DropView(UnresolvedIdentifier(parts, _), ifExists)
        if viewFileOf(parts).isDefined =>
      GraftDropViewCommand(parts, viewFileOf(parts).get._2, ifExists)
    // ALTER VIEW … AS <query>: same validate-now + atomic-sidecar
    // discipline as CREATE OR REPLACE (a table name here correctly
    // errors "view does not exist")
    case AlterViewAs(target, originalText, _)
        if partsOfTarget(target).exists(p => viewFileOf(p).isDefined) =>
      val parts = partsOfTarget(target).get
      val (g, file) = viewFileOf(parts).get
      if (!Files.isRegularFile(file)) throw new IllegalArgumentException(
        s"graftlog: view ${parts.mkString(".")} does not exist")
      GraftCreateViewCommand(g, parts, file, originalText,
        replace = true, allowExisting = false)
    // SHOW CREATE TABLE on a view name (Spark's statement for views
    // too — there is no separate SHOW CREATE VIEW grammar): replay
    // the stored definition as runnable DDL
    case ShowCreateTable(target, _, output)
        if partsOfTarget(target).exists(p => existingView(p).isDefined) =>
      val parts = partsOfTarget(target).get
      GraftShowCreateViewCommand(parts, existingView(parts).get, output)
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output)
        if parts.nonEmpty && graftCatalog(parts.head).isDefined =>
      val dir = graftCatalog(parts.head).flatMap(_.viewsDir(parts.tail))
        .getOrElse(throw new IllegalArgumentException(
          s"graftlog: cannot enumerate views in ${parts.mkString(".")}"))
      GraftShowViewsCommand(parts.tail, dir, pattern, output)
    case _ => expand(plan, Set.empty)
  }

  /** Expand view references, carrying the set of view files already
    * OPEN on this expansion path: expansion recurses inside ONE rule
    * application (the parsed definition's own view references expand
    * in the same pass), so the analyzer's max-iterations bound never
    * sees a definition cycle — without the set it would end in
    * StackOverflowError. A cycle is reachable despite create-time
    * validation because CREATE OR REPLACE analyzes the NEW text
    * against the OLD on-disk definitions (v1 → v2 → old-v1 analyzes
    * fine; the atomic write then closes the loop), so the read side
    * must cut it with a clear error. */
  private def expand(plan: LogicalPlan, open: Set[Path]): LogicalPlan =
    plan.transformDown {
      case i: InsertIntoStatement
          if existingView(nameOf(i.table)).isDefined =>
        refuseDml("INSERT into", nameOf(i.table))
      case d: DeleteFromTable
          if existingView(nameOf(d.table)).isDefined =>
        refuseDml("DELETE from", nameOf(d.table))
      case u: UpdateTable
          if existingView(nameOf(u.table)).isDefined =>
        refuseDml("UPDATE", nameOf(u.table))
      case m: MergeIntoTable
          if existingView(nameOf(m.targetTable)).isDefined =>
        refuseDml("MERGE into", nameOf(m.targetTable))
      case r: UnresolvedRelation if !r.isStreaming =>
        // single lookup: a DROP VIEW racing the double-check pattern
        // would turn the second .get into a bare NoSuchElementException
        existingView(r.multipartIdentifier) match {
          case Some(f) =>
            val key = f.toAbsolutePath.normalize
            if (open.contains(key)) throw new IllegalArgumentException(
              s"graftlog: view definition cycle — " +
                s"${r.multipartIdentifier.mkString(".")} is already " +
                "being expanded on this path; redefine one of the " +
                "views in the loop")
            SubqueryAlias(r.multipartIdentifier.last,
              expand(session.sessionState.sqlParser
                .parsePlan(Files.readString(f)), open + key))
          case None => r
        }
    }

  private def nameOf(p: LogicalPlan): Seq[String] = p match {
    case r: UnresolvedRelation => r.multipartIdentifier
    case _                     => Nil
  }

  /** The name parts of a DDL statement's unresolved target node. */
  private def partsOfTarget(p: LogicalPlan): Option[Seq[String]] = p match {
    case v: org.apache.spark.sql.catalyst.analysis.UnresolvedView =>
      Some(v.multipartIdentifier)
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      Some(t.multipartIdentifier)
    case UnresolvedIdentifier(parts, _) => Some(parts)
    case _ => None
  }
}

/** `CREATE [OR REPLACE] VIEW` execution: validate-now, refuse table
  * shadowing, write the SQL text atomically (temp + ATOMIC_MOVE —
  * readers see the old or the new definition, never a torn one). */
case class GraftCreateViewCommand(catalog: GraftLogCatalog,
    parts: Seq[String], file: Path, text: String,
    replace: Boolean, allowExisting: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (Files.isRegularFile(file) && !replace) {
      if (allowExisting) return Nil
      throw new IllegalArgumentException(
        s"graftlog: view ${parts.mkString(".")} already exists " +
          "(use OR REPLACE)")
    }
    catalog.tablePathOf(parts.tail).foreach { tp =>
      if (graft.tablelog.TableLog.latestVersion(tp) > 0L)
        throw new IllegalArgumentException(
          s"graftlog: a TABLE already exists at ${parts.mkString(".")} — " +
            "a view must not shadow it")
    }
    // fail at CREATE, not first read: analyze the stored text now
    session.sql(text).queryExecution.analyzed
    Files.createDirectories(file.getParent)
    val tmp = Files.createTempFile(file.getParent, ".v-", ".inprogress")
    try {
      Files.writeString(tmp, text)
      Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
    Nil
  }
}

/** `SHOW CREATE TABLE` on a view: one row of runnable DDL replaying
  * the stored definition — a sidecar read, no table state opened. */
case class GraftShowCreateViewCommand(parts: Seq[String], file: Path,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val name = parts.map(p => s"`$p`").mkString(".")
    Seq(Row(s"CREATE VIEW $name AS\n${Files.readString(file)}"))
  }
}

/** `DROP VIEW [IF EXISTS]` execution. */
case class GraftDropViewCommand(parts: Seq[String], file: Path,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!Files.deleteIfExists(file) && !ifExists)
      throw new IllegalArgumentException(
        s"graftlog: view ${parts.mkString(".")} does not exist")
    Nil
  }
}

/** `SHOW VIEWS IN graftlog[.ns]`: one row per `.sql` entry under the
  * namespace's `_views` dir, name-sorted — a directory listing, zero
  * data files open. */
case class GraftShowViewsCommand(ns: Seq[String], dir: Path,
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    val names = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".sql")).map(_.stripSuffix(".sql")).toSeq
    } finally s.close()
    // SHOW VIEWS pattern: Spark's SHOW TABLES convention — literal
    // text, `*` wildcards, and `|`-separated alternatives; everything
    // else is quoted
    val re = pattern.map(p =>
      java.util.regex.Pattern.compile(
        p.split("\\|", -1).map(alt =>
          alt.split("\\*", -1).map(java.util.regex.Pattern.quote)
            .mkString(".*")).mkString("|"),
        java.util.regex.Pattern.CASE_INSENSITIVE))
    names.sorted
      .filter(n => re.forall(_.matcher(n).matches()))
      .map(n => Row(ns.mkString("."), n, false))
  }
}
