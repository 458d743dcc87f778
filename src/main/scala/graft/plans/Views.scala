package graft.plans

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

import graft.catalog.GraftCatalog

/** Shared helpers for the persistent-view surface: which relations a
  * view definition refers to, and how short names are pinned to the
  * CAPTURED creation context when the definition is expanded.
  *
  * Spark's own view resolution expands identifiers against the
  * catalog/namespace captured at CREATE time (Analyzer
  * `expandIdentifier` under `AnalysisContext`); re-parsing the SQL in
  * the READER's context instead would silently bind `FROM t` to
  * whatever the reader's current namespace holds (ADVICE r13). These
  * helpers mirror Spark's expansion rule exactly:
  *   - 1-part name  -> capturedCatalog ++ capturedNamespace :+ name
  *   - n-part name  -> as-is when the head is a registered catalog,
  *                     else capturedCatalog +: parts
  * CTE names defined inside the view body are NOT relations and are
  * left untouched (case-insensitive, like Spark's CTE resolution). */
object GraftViewSql {

  private def lc(s: String): String = s.toLowerCase(Locale.ROOT)

  /** Names bound by WITH clauses anywhere in the definition —
    * conservative over-approximation (a nested CTE's name shadows
    * nothing we'd want to qualify). */
  def cteNames(plan: LogicalPlan): Set[String] =
    plan.collectWithSubqueries {
      case w: UnresolvedWith => w.cteRelations.map(r => lc(r._1))
    }.flatten.toSet

  /** Every relation the definition refers to, minus CTE self-refs. */
  def referredRelations(plan: LogicalPlan): Seq[Seq[String]] = {
    val ctes = cteNames(plan)
    plan.collectWithSubqueries {
      case u: UnresolvedRelation
          if !(u.multipartIdentifier.length == 1 &&
            ctes.contains(lc(u.multipartIdentifier.head))) =>
        u.multipartIdentifier
    }
  }

  /** Pin short relation names to the captured creation context. */
  def qualify(plan: LogicalPlan, curCat: String, curNs: Seq[String],
      isCatalog: String => Boolean): LogicalPlan = {
    val ctes = cteNames(plan)
    plan.transformUpWithSubqueries {
      case u: UnresolvedRelation =>
        val parts = u.multipartIdentifier
        if (parts.length == 1 && ctes.contains(lc(parts.head))) u
        else if (parts.length == 1)
          u.copy(multipartIdentifier = (curCat +: curNs) :+ parts.head)
        else if (isCatalog(parts.head)) u
        else u.copy(multipartIdentifier = curCat +: parts)
    }
  }
}

/** Read-side resolution for the catalog's persistent SQL views.
  *
  * Spark 4.1 ships the DSv2 `ViewCatalog` API but does NOT route the
  * SQL view commands to non-session catalogs (the analyzer raises
  * UNSUPPORTED_FEATURE.CATALOG_OPERATION) — the same gap Iceberg
  * bridges with injected rules. [[GraftCatalog]] implements the full
  * ViewCatalog API (create/replace/alter/drop/rename/list, persisted
  * in the warehouse's `_views.json`); DDL rides the CALL surface
  * (`system.create_view` / `drop_view` / `show_views`), and THIS rule
  * closes the read side: an unresolved `cat.ns.name` relation whose
  * catalog is a GraftCatalog holding a view of that name substitutes
  * the view's parsed definition (re-analyzed per query, so base-table
  * evolution is visible — SQL view semantics, not a snapshot).
  *
  * Short names inside the definition are pinned to the CAPTURED
  * currentCatalog/currentNamespace persisted with the view
  * ([[GraftViewSql.qualify]]) — never the reader's context, and never
  * a reader's temp view (a qualified >=3-part name cannot be one);
  * create-time validation additionally refuses definitions over temp
  * views outright (they die with the creating session). A definition
  * referencing a name that no longer exists fails LOUDLY with
  * TABLE_OR_VIEW_NOT_FOUND.
  *
  * Expansion happens inside the analyzer's fixed point, so views over
  * views resolve level per iteration; a cyclic definition exhausts the
  * analyzer's iteration cap and fails LOUDLY (never silently wrong).
  * create-time validation in the procedure (the definition must
  * analyze) makes that an ALTER-era corner, not a common path. */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def storedView(parts: Seq[String])
      : Option[org.apache.spark.sql.connector.catalog.View] = {
    if (parts.length < 3) return None
    val cat =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case _: Exception => return None }
    cat match {
      case g: GraftCatalog =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        try {
          if (g.viewExists(ident)) Some(g.loadView(ident))
          else None
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        storedView(u.multipartIdentifier) match {
          case Some(v) =>
            val parsed =
              spark.sessionState.sqlParser.parsePlan(v.query())
            val pinned = GraftViewSql.qualify(parsed,
              v.currentCatalog(), v.currentNamespace().toIndexedSeq,
              name => spark.sessionState.catalogManager
                .isCatalogRegistered(name))
            // the analyzer's Substitution batch already ran, so a WITH
            // clause inside the definition would never be substituted —
            // run CTESubstitution on the expanded subtree ourselves
            // (CTE refs get fresh ids, so nesting inside the outer
            // plan is safe, same as subquery expansion)
            val substituted = org.apache.spark.sql.catalyst.analysis
              .CTESubstitution.apply(pinned)
            SubqueryAlias(u.multipartIdentifier.last, substituted)
          case None => u
        }
    }
}
