package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
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
    * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    * [WHEN NOT MATCHED BY SOURCE THEN DELETE / UPDATE SET …] —
    * the canonical upsert, optionally extended with BY SOURCE clauses
    * (round 13) — → [[graft.sources.VersionedTableOps.merge]] /
    * [[graft.sources.VersionedTableOps.mergeKeyed]] with EXACT SQL
    * semantics (matched rows take the source values INCLUDING nulls —
    * not the API's coalesce upsert rule).
    *
    * BY SOURCE clauses (the "sync a dimension" MERGE: delete or
    * re-flag target rows the source no longer carries) take optional
    * conditions and evaluate FIRST-MATCH-WINS over target-only rows,
    * per the SQL standard; conditions and UPDATE values reference
    * TARGET columns only, and a BY SOURCE UPDATE may not assign a
    * merge key (the row's identity). Their presence FORCES the
    * whole-snapshot merge path: a by-source mutation touches rows
    * whose files the source-key probe never selects, so the scoped
    * rewrite (zone-map / partition-routed) would silently skip them —
    * the statement honestly costs O(table), exactly like the same
    * MERGE on any snapshot store.
    *
    * Conditional MATCHED/NOT MATCHED clauses, MATCHED DELETE and
    * partial-column upsert actions still refuse: each would silently
    * change which rows survive, and the transactional API expresses
    * them directly.
    */
  def convertMerge(m: MergeIntoTable,
      sourceRewrite: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    graftTable(m.targetTable).map { t =>
      require(!m.schemaEvolutionEnabled,
        "graft SQL MERGE does not evolve schemas — append evolves on write")
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
      // BY SOURCE clauses: conditions and values see the TARGET row
      // only. After the command's full-outer using-join the merge-key
      // columns exist once (coalesced — equal to the target key on
      // every target-only row) while non-key target columns resolve
      // under the `t` alias, so the de-resolution splits on that.
      def unresolveTarget(e: Expression): Column = Bridge.column(e.transform {
        case a: AttributeReference if mergeKeys.contains(a.name) =>
          UnresolvedAttribute.quoted(a.name)
        case a: AttributeReference => UnresolvedAttribute(Seq("t", a.name))
      })
      def targetOnly(e: Expression, what: String): Unit = {
        noSubquery(e, "MERGE")
        require(e.references.subsetOf(target.outputSet),
          s"graft SQL MERGE BY SOURCE $what may reference target columns only" +
            s" — there is no source row, got ${e.sql}")
      }
      val bySource: Seq[BySourceClause] = m.notMatchedBySourceActions.map {
        case da: DeleteAction =>
          da.condition.foreach(targetOnly(_, "conditions"))
          BySourceDelete(da.condition.map(unresolveTarget))
        case ua: UpdateAction =>
          ua.condition.foreach(targetOnly(_, "conditions"))
          val set = ua.assignments.map {
            case Assignment(k: AttributeReference, v) =>
              targetOnly(v, "assignments")
              require(!mergeKeys.contains(k.name),
                s"graft SQL MERGE BY SOURCE UPDATE may not assign merge key ${k.name}")
              k.name -> unresolveTarget(v)
            case Assignment(other, _) => throw new UnsupportedOperationException(
              s"graft SQL MERGE assigns top-level columns only, not ${other.sql}")
          }.toMap
          BySourceUpdate(ua.condition.map(unresolveTarget), set)
        case other => throw new UnsupportedOperationException(
          s"graft SQL MERGE BY SOURCE supports DELETE and UPDATE SET, not $other")
      }
      // the updates frame: one row per source row, target column names
      val updatesCols = targetCols.map(c => unresolve(updMap(c)).as(c))
      GraftMergeCommand(t, sourceRewrite(m.sourceTable), updatesCols, mergeKeys,
        bySource)
    }
}

/** A `WHEN NOT MATCHED BY SOURCE` clause, de-resolved for the merge
  * command: conditions/values are name-based Columns over the target
  * row (non-key columns under the `t` join alias). First-match-wins
  * across the sequence, per the SQL standard.
  */
private[sql] sealed trait BySourceClause {
  def cond: Option[Column]
}
private[sql] case class BySourceDelete(cond: Option[Column]) extends BySourceClause
private[sql] case class BySourceUpdate(cond: Option[Column],
    set: Map[String, Column]) extends BySourceClause

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
  *
  * BY SOURCE clauses BYPASS every scoped path ([[graft.sources
  * .VersionedTableOps.merge]] directly): the key probe selects files
  * by the SOURCE batch's key values, and a by-source DELETE/UPDATE
  * mutates precisely the rows those values never name — a scoped
  * rewrite would carry them untouched by file reference, silently
  * dropping the clause. Whole-snapshot is the honest O(table) cost of
  * this statement on any snapshot store. Target-only rows evaluate
  * the clause chain first-match-wins; rows no clause hits carry
  * unchanged.
  */
case class GraftMergeCommand(table: GraftSqlTable, source: LogicalPlan,
    updatesCols: Seq[Column], keys: Seq[String],
    bySource: Seq[BySourceClause] = Nil)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val updates = Bridge.ofRows(spark, source).select(updatesCols: _*)
    val marker = "__graft_merge_present"
    def mergeFn(cur: org.apache.spark.sql.DataFrame,
        upd: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val u = upd.withColumn(marker, lit(true))
      val joined = cur.as("t").join(u.as("u"), keys.toSeq, "full_outer")
      val uPresent = coalesce(col(marker), lit(false))
      // a target-only row's value for column c: walk the BY SOURCE
      // chain; the first clause whose condition holds wins (an UPDATE
      // takes its assignment or carries, a DELETE's value is dead —
      // the keep filter below drops the row); no clause → carry.
      def bySourceValue(c: String): Column =
        bySource.foldRight(col(s"t.$c")) { (cl, els) =>
          cl match {
            case BySourceUpdate(cond, set) =>
              when(cond.getOrElse(lit(true)), set.getOrElse(c, col(s"t.$c")))
                .otherwise(els)
            case BySourceDelete(cond) =>
              when(cond.getOrElse(lit(true)), col(s"t.$c")).otherwise(els)
          }
        }
      // does a target-only row survive? first matching clause decides
      val bySourceKeep: Column =
        bySource.foldRight(lit(true)) { (cl, els) =>
          val keep = cl match {
            case _: BySourceDelete => lit(false)
            case _: BySourceUpdate => lit(true)
          }
          when(cl.cond.getOrElse(lit(true)), keep).otherwise(els)
        }
      joined
        .where(uPresent || bySourceKeep)
        .select(cur.columns.toSeq.map(c =>
          if (keys.contains(c)) col(c)
          else when(uPresent, col(s"u.$c"))
            .otherwise(bySourceValue(c)).as(c)): _*)
    }
    if (bySource.isEmpty)
      table.ops.mergeKeyed(spark, table.path, updates, keys, mergeFn)
    else
      table.ops.merge(spark, table.path, updates, mergeFn)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftMerge ${table.path} on ${keys.mkString(",")}" +
      (if (bySource.isEmpty) "" else s" bySource=${bySource.size}")
}
