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

  /** MERGE INTO t USING s ON t.k = s.k [AND …] — the FULL clause
    * grammar (round 13, generalized from the round-10 canonical
    * upsert): any number of `WHEN MATCHED [AND c] THEN UPDATE SET … |
    * DELETE`, `WHEN NOT MATCHED [AND c] THEN INSERT …` and
    * `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE`
    * clauses, each family evaluated FIRST-MATCH-WINS per the SQL
    * standard; matched rows a no-condition-matches walk leaves carry
    * unchanged, unmatched source rows no INSERT clause takes are
    * dropped, partial UPDATEs keep the unassigned columns and partial
    * INSERTs fill them with typed NULLs. Matched values and conditions
    * may reference BOTH sides (`t.v + s.delta`); insert and by-source
    * clauses see their one existing side only.
    *
    * The invariants that keep the SCOPED paths sound are enforced
    * rather than assumed: the ON condition must be a conjunction of
    * target-key = source-expr equalities; every INSERT must assign
    * each merge key exactly its ON source expression (so inserted rows
    * land in the partitions/zones the key probe selected); and no
    * UPDATE may move a key (a matched row's identity is its join key).
    * Under those rules conditional matched/insert clauses stay
    * scoped-safe — they only touch rows whose keys the probe named —
    * so the partition-routed / zone-map COW paths still apply.
    * BY SOURCE clauses alone force the whole-snapshot path: they
    * mutate precisely the rows the probe never selects (see
    * [[GraftMergeCommand]]).
    *
    * Refusals left standing, each named: schema evolution, subqueries
    * in conditions/values, non-equi ON shapes, nested-field
    * assignment. One source row matching several target rows
    * multiplies through the join (as it must); several SOURCE rows
    * hitting one target key produce one output row per source row —
    * the standard says error, this engine documents the permissive
    * join semantics instead (the API contract since round 10).
    */
  def convertMerge(m: MergeIntoTable,
      sourceRewrite: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    graftTable(m.targetTable).map { t =>
      require(!m.schemaEvolutionEnabled,
        "graft SQL MERGE does not evolve schemas — append evolves on write")
      val target = m.targetTable
      val targetCols = target.output.map(_.name)
      // ---- ON: a conjunction of target-key = source-expr equalities
      def onKeys(e: Expression): Seq[(String, Expression)] = e match {
        case And(l, r) => onKeys(l) ++ onKeys(r)
        case EqualTo(l: AttributeReference, r) if target.outputSet.contains(l) &&
            r.references.subsetOf(m.sourceTable.outputSet) => Seq(l.name -> r)
        case EqualTo(l, r: AttributeReference) if target.outputSet.contains(r) &&
            l.references.subsetOf(m.sourceTable.outputSet) => Seq(r.name -> l)
        case other => throw new UnsupportedOperationException(
          s"graft SQL MERGE ON must be target-key = source-expr equalities, not ${other.sql}")
      }
      val keyExprs: Map[String, Expression] = onKeys(m.mergeCondition).toMap
      val mergeKeys = onKeys(m.mergeCondition).map(_._1).distinct
      // ---- side-aware de-resolution: after the command's full-outer
      // using-join, merge keys exist ONCE (coalesced — the target key
      // on matched/target-only rows, the computed source key on
      // insert rows), other target columns resolve under `t`, other
      // source columns under `u`.
      def sideResolve(e: Expression): Column = Bridge.column(e.transform {
        case a: AttributeReference if mergeKeys.contains(a.name) =>
          UnresolvedAttribute.quoted(a.name)
        case a: AttributeReference if target.outputSet.contains(a) =>
          UnresolvedAttribute(Seq("t", a.name))
        case a: AttributeReference => UnresolvedAttribute(Seq("u", a.name))
      })
      def checked(e: Expression, what: String, allowed: Expression => Boolean,
          rule: String): Column = {
        noSubquery(e, "MERGE")
        require(e.references.forall(allowed),
          s"graft SQL MERGE $what may reference $rule only, got ${e.sql}")
        sideResolve(e)
      }
      val isTargetRef = (a: Expression) => target.outputSet.exists(_.semanticEquals(a))
      val isSourceRef = (a: Expression) => m.sourceTable.outputSet.exists(_.semanticEquals(a))
      def assigns(as: Seq[Assignment]): Seq[(String, Expression)] = as.map {
        case Assignment(k: AttributeReference, v) => noSubquery(v, "MERGE"); k.name -> v
        case Assignment(other, _) => throw new UnsupportedOperationException(
          s"graft SQL MERGE assigns top-level columns only, not ${other.sql}")
      }
      // ---- WHEN MATCHED: UPDATE (both sides visible) / DELETE,
      // first-match-wins; a key assignment must be a no-op (the join
      // key IS the row's identity and the probe's scope)
      val matched: Seq[MatchedClause] = m.matchedActions.map {
        case ua: UpdateAction =>
          val set = assigns(ua.assignments).flatMap { case (k, v) =>
            if (mergeKeys.contains(k)) {
              require(v.semanticEquals(keyExprs(k)) ||
                  target.output.exists(a => a.name == k && v.semanticEquals(a)),
                s"graft SQL MERGE WHEN MATCHED may not move merge key $k — " +
                  "assign it t.$k or the ON source expression (a no-op)")
              None // matched rows already carry the key
            } else Some(k -> checked(v, "WHEN MATCHED values",
              a => isTargetRef(a) || isSourceRef(a), "target or source columns"))
          }.toMap
          MatchedUpdate(ua.condition.map(checked(_, "WHEN MATCHED conditions",
            a => isTargetRef(a) || isSourceRef(a), "target or source columns")), set)
        case da: DeleteAction =>
          MatchedDelete(da.condition.map(checked(_, "WHEN MATCHED conditions",
            a => isTargetRef(a) || isSourceRef(a), "target or source columns")))
        case other => throw new UnsupportedOperationException(
          s"graft SQL MERGE WHEN MATCHED supports UPDATE SET and DELETE, not $other")
      }
      // ---- WHEN NOT MATCHED: INSERT, source side only; every merge
      // key must take exactly its ON expression (inserted rows must
      // land where the key probe looked), unassigned columns are
      // typed NULLs (SQL semantics)
      val notMatched: Seq[InsertClause] = m.notMatchedActions.map {
        case ia: InsertAction =>
          val given = assigns(ia.assignments).toMap
          mergeKeys.foreach { k =>
            require(given.contains(k) && given(k).semanticEquals(keyExprs(k)),
              s"graft SQL MERGE INSERT must assign merge key $k its ON source " +
                "expression — the scoped paths route inserted rows by it")
          }
          require(given.keySet.subsetOf(targetCols.toSet),
            s"graft SQL MERGE INSERT names unknown column(s) " +
              s"${(given.keySet -- targetCols).mkString(", ")}")
          val vals = targetCols.filterNot(mergeKeys.contains).map { c =>
            c -> given.get(c).map(checked(_, "INSERT values",
                isSourceRef, "source columns"))
              .getOrElse(lit(null).cast(
                target.output.find(_.name == c).get.dataType))
          }.toMap
          InsertClause(ia.condition.map(checked(_, "WHEN NOT MATCHED conditions",
            isSourceRef, "source columns")), vals)
        case other => throw new UnsupportedOperationException(
          s"graft SQL MERGE WHEN NOT MATCHED supports INSERT, not $other")
      }
      // ---- WHEN NOT MATCHED BY SOURCE: target side only (round 13)
      val bySource: Seq[BySourceClause] = m.notMatchedBySourceActions.map {
        case da: DeleteAction =>
          BySourceDelete(da.condition.map(checked(_, "BY SOURCE conditions",
            isTargetRef, "target columns")))
        case ua: UpdateAction =>
          val set = assigns(ua.assignments).map { case (k, v) =>
            require(!mergeKeys.contains(k),
              s"graft SQL MERGE BY SOURCE UPDATE may not assign merge key $k")
            k -> checked(v, "BY SOURCE assignments", isTargetRef, "target columns")
          }.toMap
          BySourceUpdate(ua.condition.map(checked(_, "BY SOURCE conditions",
            isTargetRef, "target columns")), set)
        case other => throw new UnsupportedOperationException(
          s"graft SQL MERGE BY SOURCE supports DELETE and UPDATE SET, not $other")
      }
      // ---- the updates frame: every source column (so matched/insert
      // clauses can reference them under `u`) plus each merge key
      // computed from its ON expression under the key's name. A
      // key-named source column must BE that key's expression —
      // otherwise `s.k` and the join key would silently diverge.
      val srcCols = m.sourceTable.output
      mergeKeys.foreach { k =>
        srcCols.find(_.name == k).foreach { a =>
          require(keyExprs(k).semanticEquals(a),
            s"graft SQL MERGE: source column $k shadows merge key $k but the " +
              s"ON clause equates the key with ${keyExprs(k).sql} — rename one")
        }
      }
      val updatesCols =
        srcCols.filterNot(a => mergeKeys.contains(a.name))
          .map(a => unresolve(a).as(a.name)) ++
        mergeKeys.map(k => unresolve(keyExprs(k)).as(k))
      GraftMergeCommand(t, sourceRewrite(m.sourceTable), updatesCols, mergeKeys,
        matched, notMatched, bySource)
    }
}

/** A `WHEN MATCHED` clause, de-resolved for the merge command:
  * conditions/values are name-based Columns over the joined row
  * (target under `t`, source under `u`, merge keys bare).
  * First-match-wins; a matched row no clause takes carries unchanged.
  */
private[sql] sealed trait MatchedClause {
  def cond: Option[Column]
}
private[sql] case class MatchedUpdate(cond: Option[Column],
    set: Map[String, Column]) extends MatchedClause
private[sql] case class MatchedDelete(cond: Option[Column]) extends MatchedClause

/** A `WHEN NOT MATCHED` INSERT clause: `vals` carries EVERY non-key
  * target column (unassigned ones as typed NULLs). First-match-wins;
  * a source row no clause takes is dropped.
  */
private[sql] case class InsertClause(cond: Option[Column],
    vals: Map[String, Column])

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

/** One MERGE statement = one merge commit. The source plan is carried
  * as a FIELD (not a child — the command is a leaf, like
  * V2WriteCommand's table) and materialized at run time into the
  * `updates` frame: every source column (clauses reference them under
  * `u`) plus the merge keys computed from their ON expressions. The
  * join is one full outer on the keys with presence markers on both
  * sides; each row class walks its clause family FIRST-MATCH-WINS:
  *
  *  - matched (both present): the first MATCHED clause whose
  *    condition holds — UPDATE takes its assignments (unassigned
  *    columns carry, values see both sides, SQL semantics INCLUDING
  *    source nulls), DELETE drops the row; none → carry unchanged.
  *  - source-only: the first INSERT clause whose condition holds
  *    supplies the row; none → dropped.
  *  - target-only: the BY SOURCE chain (round 13) — or carry.
  *
  * Cost shape: routed through [[graft.sources.VersionedTableOps
  * .mergeKeyed]], so when an ON key is a partition column of the
  * target, only the partitions whose key values appear in the source
  * are read, joined, and rewritten — untouched partitions carry by
  * file reference; conditional matched/insert clauses keep that
  * soundness because they only touch rows whose keys the probe named
  * (conversion-time invariants: inserts assign keys their ON
  * expressions, updates never move a key). Unpartitionable layouts
  * pay the documented whole-snapshot rewrite, same semantics.
  *
  * BY SOURCE clauses BYPASS every scoped path ([[graft.sources
  * .VersionedTableOps.merge]] directly): the key probe selects files
  * by the SOURCE batch's key values, and a by-source DELETE/UPDATE
  * mutates precisely the rows those values never name — a scoped
  * rewrite would carry them untouched by file reference, silently
  * dropping the clause. Whole-snapshot is the honest O(table) cost of
  * this statement on any snapshot store.
  */
case class GraftMergeCommand(table: GraftSqlTable, source: LogicalPlan,
    updatesCols: Seq[Column], keys: Seq[String],
    matched: Seq[MatchedClause], notMatched: Seq[InsertClause],
    bySource: Seq[BySourceClause] = Nil)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val updates = Bridge.ofRows(spark, source).select(updatesCols: _*)
    val uMark = "__graft_merge_u"
    val tMark = "__graft_merge_t"
    def mergeFn(cur: org.apache.spark.sql.DataFrame,
        upd: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val joined = cur.withColumn(tMark, lit(true)).as("t")
        .join(upd.withColumn(uMark, lit(true)).as("u"), keys.toSeq, "full_outer")
      val uP = coalesce(col(s"u.$uMark"), lit(false))
      val tP = coalesce(col(s"t.$tMark"), lit(false))
      def chainValue[C](clauses: Seq[C], base: Column)(
          value: C => Column, cond: C => Option[Column]): Column =
        clauses.foldRight(base) { (cl, els) =>
          when(cond(cl).getOrElse(lit(true)), value(cl)).otherwise(els)
        }
      def matchedValue(c: String): Column =
        chainValue(matched, col(s"t.$c"))({
          case MatchedUpdate(_, set) => set.getOrElse(c, col(s"t.$c"))
          case MatchedDelete(_) => col(s"t.$c") // dead — the keep filter drops it
        }, _.cond)
      val matchedKeep: Column =
        chainValue(matched, lit(true))(
          cl => lit(cl.isInstanceOf[MatchedUpdate]), _.cond)
      def insertValue(c: String): Column =
        chainValue[InsertClause](notMatched, lit(null))(_.vals(c), _.cond)
      val insertKeep: Column =
        chainValue[InsertClause](notMatched, lit(false))(_ => lit(true), _.cond)
      def bySourceValue(c: String): Column =
        chainValue(bySource, col(s"t.$c"))({
          case BySourceUpdate(_, set) => set.getOrElse(c, col(s"t.$c"))
          case BySourceDelete(_) => col(s"t.$c") // dead — dropped below
        }, _.cond)
      val bySourceKeep: Column =
        chainValue(bySource, lit(true))(
          cl => lit(cl.isInstanceOf[BySourceUpdate]), _.cond)
      joined
        .where((uP && tP && matchedKeep) || (uP && !tP && insertKeep) ||
          (!uP && bySourceKeep))
        .select(cur.columns.toSeq.filterNot(_ == tMark).map(c =>
          if (keys.contains(c)) col(c)
          else when(uP && tP, matchedValue(c))
            .when(uP && !tP, insertValue(c))
            .otherwise(bySourceValue(c)).as(c)): _*)
    }
    if (bySource.isEmpty)
      table.ops.mergeKeyed(spark, table.path, updates, keys, mergeFn)
    else
      table.ops.merge(spark, table.path, updates, mergeFn)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftMerge ${table.path} on ${keys.mkString(",")} " +
      s"matched=${matched.size} insert=${notMatched.size} bySource=${bySource.size}"
}
