package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.graftbridge.Bridge

/** Row-level SQL over versioned tables (round 10, second half):
  * UPDATE, DELETE with arbitrary conditions, and the canonical-upsert
  * MERGE, each converted AT RESOLUTION TIME into a [[org.apache.spark
  * .sql.execution.command.RunnableCommand]] that calls the SAME
  * transactional entry point the Scala API exposes — one statement =
  * one CAS'd commit, zone-map COW splits included. This is the
  * conversion [[GraftSqlRule]] applies; the DSv2 [[org.apache.spark
  * .sql.connector.catalog.SupportsDelete]] path on [[GraftSqlTable]]
  * remains as the rule-less fallback for translatable deletes.
  *
  * Resolved expressions from the statement are handed to the API as
  * name-based Columns (attribute references de-resolved back to
  * names): the command re-reads the LIVE head inside its commit
  * closure, so binding by exprId against the reader's pinned snapshot
  * would be both wrong (stale) and unsound (fresh plan, fresh ids).
  * Conditions carrying subqueries refuse — a subquery's value at
  * commit-retry time is not the one the reader resolved, and the
  * transactional API's contract is a self-contained predicate.
  *
  * Scale: UPDATE/DELETE inherit the zone-map COW split (touched files
  * rewritten, rest carried by reference); MERGE rewrites the snapshot
  * through one full-outer shuffle join on the ON keys — the same
  * cost shape as the Scala upsert, O(table) per statement by design.
  */
private[sql] object GraftDml {

  /** A resolved expression over the target relation, as a name-based
    * Column the transactional API can re-resolve against the head it
    * commits on. Nested-field accesses sit ABOVE the attribute nodes,
    * so they survive the rewrite unchanged.
    */
  def unresolve(e: Expression): Column = Bridge.column(e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  })

  private def noSubquery(e: Expression, stmt: String): Unit =
    require(e.find(_.isInstanceOf[SubqueryExpression]).isEmpty,
      s"graft SQL $stmt does not take subqueries in conditions — " +
        "materialize the subquery and use the VersionedTable API")

  def graftTable(plan: LogicalPlan): Option[GraftSqlTable] = plan match {
    // `DELETE FROM t` / `MERGE INTO t [AS a]` wrap the relation in
    // SubqueryAlias layers — unwrap; attributes are shared, so
    // expressions de-resolve identically
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      graftTable(s.child)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
      Some(r.table.asInstanceOf[GraftSqlTable])
    case _ => None
  }

  /** UPDATE t SET c = e, … [WHERE p] → [[graft.sources
    * .VersionedTableOps.update]]: every SET value evaluates against
    * the OLD row (the API's select-with-replacements rewrite —
    * simultaneous-assignment SQL semantics), zone-map COW split on
    * the condition.
    */
  def convertUpdate(u: UpdateTable): Option[LogicalPlan] =
    graftTable(u.table).map { t =>
      u.condition.foreach(noSubquery(_, "UPDATE"))
      val set = u.assignments.map {
        case Assignment(k: AttributeReference, v) =>
          noSubquery(v, "UPDATE"); k.name -> unresolve(v)
        case Assignment(other, _) => throw new UnsupportedOperationException(
          s"graft SQL UPDATE sets top-level columns only, not ${other.sql}")
      }
      GraftUpdateCommand(t, set, u.condition.map(unresolve).getOrElse(lit(true)))
    }

  /** DELETE FROM t [WHERE p] → [[graft.sources.VersionedTableOps
    * .delete]] — ARBITRARY conditions (the API's zone-map translation
    * is conservative: untranslatable shapes touch every file, never
    * wrong rows), so SQL DELETE is strictly more general through the
    * rule than through the DSv2 filter path.
    */
  def convertDelete(d: DeleteFromTable): Option[LogicalPlan] =
    graftTable(d.table).map { t =>
      noSubquery(d.condition, "DELETE")
      GraftDeleteCommand(t, unresolve(d.condition))
    }

  /** ALTER TABLE … ADD CONSTRAINT c CHECK (p) → [[graft.sources
    * .VersionedTableOps.addCheckConstraint]]. Spark's own path wraps
    * the statement in a VALIDATION SCAN of the table (the
    * AddCheckConstraint command's child) that neither survives the
    * relation swap (ResolveSessionCatalog wants the relation) nor
    * executes without it (shape-only scan) — and is redundant anyway:
    * the transactional entry point validates the existing data INSIDE
    * its commit closure, where it is race-free against concurrent
    * writes rather than best-effort. So the statement converts whole.
    */
  def convertAddCheck(
      a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint): Option[LogicalPlan] =
    a.child.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
        r.table.asInstanceOf[GraftSqlTable]
    }.map { t =>
      GraftAddCheckCommand(t, a.checkConstraint.name, a.checkConstraint.condition)
    }

  /** MERGE INTO t USING s ON t.k = s.k [AND …]
    * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * —
    * the canonical upsert — → [[graft.sources.VersionedTableOps
    * .merge]] with EXACT SQL semantics (matched rows take the source
    * values INCLUDING nulls — not the API's coalesce upsert rule).
    * Conditional clauses, DELETE actions, partial-column actions and
    * NOT MATCHED BY SOURCE refuse: each would silently change which
    * rows survive, and the transactional API expresses them directly.
    */
  def convertMerge(m: MergeIntoTable,
      sourceRewrite: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    graftTable(m.targetTable).map { t =>
      require(!m.schemaEvolutionEnabled,
        "graft SQL MERGE does not evolve schemas — append evolves on write")
      require(m.notMatchedBySourceActions.isEmpty,
        "graft SQL MERGE supports the canonical upsert only (no NOT MATCHED BY SOURCE)")
      val target = m.targetTable
      val upd = m.matchedActions match {
        case Seq(ua: UpdateAction) if ua.condition.isEmpty => ua.assignments
        case _ => throw new UnsupportedOperationException(
          "graft SQL MERGE supports exactly WHEN MATCHED THEN UPDATE SET * " +
            "(unconditional) — use VersionedTable.merge for custom shapes")
      }
      val ins = m.notMatchedActions match {
        case Seq(ia: InsertAction) if ia.condition.isEmpty => ia.assignments
        case _ => throw new UnsupportedOperationException(
          "graft SQL MERGE supports exactly WHEN NOT MATCHED THEN INSERT * " +
            "(unconditional) — use VersionedTable.merge for custom shapes")
      }
      val targetCols = target.output.map(_.name)
      def assignMap(as: Seq[Assignment], act: String): Map[String, Expression] = {
        val m0 = as.map {
          case Assignment(k: AttributeReference, v) =>
            noSubquery(v, "MERGE"); k.name -> v
          case Assignment(other, _) => throw new UnsupportedOperationException(
            s"graft SQL MERGE assigns top-level columns only, not ${other.sql}")
        }.toMap
        require(m0.keySet == targetCols.toSet,
          s"graft SQL MERGE $act must assign every target column " +
            s"(missing ${(targetCols.toSet -- m0.keySet).mkString(", ")})")
        m0
      }
      val updMap = assignMap(upd, "UPDATE")
      val insMap = assignMap(ins, "INSERT")
      targetCols.foreach { c =>
        require(updMap(c).semanticEquals(insMap(c)),
          s"graft SQL MERGE needs UPDATE and INSERT to assign column $c " +
            "from the same source expression (the canonical upsert)")
      }
      // ON condition: a conjunction of target-column = source-expr
      // equalities, each key's source side being EXACTLY what the
      // actions assign to that column (otherwise the upsert would
      // join on different values than it writes — wrong rows).
      def keys(e: Expression): Seq[String] = e match {
        case And(l, r) => keys(l) ++ keys(r)
        case EqualTo(l: AttributeReference, r) if target.outputSet.contains(l) &&
            r.references.subsetOf(m.sourceTable.outputSet) => Seq(checkKey(l.name, r))
        case EqualTo(l, r: AttributeReference) if target.outputSet.contains(r) &&
            l.references.subsetOf(m.sourceTable.outputSet) => Seq(checkKey(r.name, l))
        case other => throw new UnsupportedOperationException(
          s"graft SQL MERGE ON must be target-key = source-expr equalities, not ${other.sql}")
      }
      def checkKey(name: String, srcSide: Expression): String = {
        require(updMap(name).semanticEquals(srcSide),
          s"graft SQL MERGE ON equates $name with a different source " +
            "expression than the actions assign to it")
        name
      }
      val mergeKeys = keys(m.mergeCondition).distinct
      // the updates frame: one row per source row, target column names
      val updatesCols = targetCols.map(c => unresolve(updMap(c)).as(c))
      GraftMergeCommand(t, sourceRewrite(m.sourceTable), updatesCols, mergeKeys)
    }
}

/** One UPDATE statement = one update commit (zone-map COW split). */
case class GraftUpdateCommand(table: GraftSqlTable,
    set: Seq[(String, Column)], cond: Column)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.ops.update(spark, table.path, cond, set)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftUpdate ${table.path}"
}

/** One DELETE statement = one delete commit (zone-map COW split). */
case class GraftDeleteCommand(table: GraftSqlTable, cond: Column)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.ops.delete(spark, table.path, cond)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftDelete ${table.path}"
}

/** One ADD CONSTRAINT … CHECK = one set_constraint commit; existing
  * data validates inside the commit closure (a violating table cannot
  * gain the rule).
  */
case class GraftAddCheckCommand(table: GraftSqlTable, name: String, sqlExpr: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.ops.addCheckConstraint(spark, table.path, name, sqlExpr)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftAddCheck ${table.path} $name CHECK ($sqlExpr)"
}

/** One canonical-upsert MERGE = one merge commit. The source plan is
  * carried as a FIELD (not a child — the command is a leaf, like
  * V2WriteCommand's table) and materialized at run time; the join is
  * a full outer on the ON keys with a presence marker, so matched
  * rows take the source values INCLUDING nulls (exact SQL MERGE
  * semantics, deliberately not the API's coalesce rule).
  *
  * Cost shape: routed through [[graft.sources.VersionedTableOps
  * .mergeKeyed]], so when an ON key is a partition column of the
  * target, only the partitions whose key values appear in the source
  * are read, joined, and rewritten — untouched partitions carry by
  * file reference. Unpartitionable layouts pay the documented
  * whole-snapshot rewrite, same semantics.
  */
case class GraftMergeCommand(table: GraftSqlTable, source: LogicalPlan,
    updatesCols: Seq[Column], keys: Seq[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val updates = Bridge.ofRows(spark, source).select(updatesCols: _*)
    val marker = "__graft_merge_present"
    table.ops.mergeKeyed(spark, table.path, updates, keys, (cur, upd) => {
      val u = upd.withColumn(marker, lit(true))
      cur.as("t").join(u.as("u"), keys.toSeq, "full_outer")
        .select(cur.columns.toSeq.map(c =>
          if (keys.contains(c)) col(c)
          else when(coalesce(col(marker), lit(false)), col(s"u.$c"))
            .otherwise(col(s"t.$c")).as(c)): _*)
    })
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftMerge ${table.path} on ${keys.mkString(",")}"
}
