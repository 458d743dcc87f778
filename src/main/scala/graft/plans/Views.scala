package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

import graft.catalog.GraftCatalog

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
  * Expansion happens inside the analyzer's fixed point, so views over
  * views resolve level per iteration; a cyclic definition exhausts the
  * analyzer's iteration cap and fails LOUDLY (never silently wrong).
  * create-time validation in the procedure (the definition must
  * analyze) makes that an ALTER-era corner, not a common path. */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def viewSql(parts: Seq[String]): Option[String] = {
    if (parts.length < 3) return None
    val cat =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case _: Exception => return None }
    cat match {
      case g: GraftCatalog =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        try {
          if (g.viewExists(ident)) Some(g.loadView(ident).query())
          else None
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        viewSql(u.multipartIdentifier) match {
          case Some(sql) =>
            SubqueryAlias(u.multipartIdentifier.last,
              spark.sessionState.sqlParser.parsePlan(sql))
          case None => u
        }
    }
}
