package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Divide, EqualTo, Expression, If, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftTable

/** MATERIALIZED-VIEW AUTO-REWRITE — the transparent half of the q229
  * incremental-MV machinery: a matching aggregate over the BASE table
  * is redirected by this optimizer rule to scan the (tiny) MV table
  * instead, with NO query change. At 100 TB this is the difference
  * between a dashboard group-by scanning the corpus and it reading a
  * few thousand pre-aggregated rows — the same query-rewrite contract
  * Oracle/BigQuery/Databricks MVs ship, re-expressed as a
  * `Rule[LogicalPlan]` over the DSv2 relation.
  *
  * Registration is table metadata (persisted `graft.mv.*` properties):
  *   base table:  'graft.mv.tables'       = 'mv1[,mv2...]'
  *   MV table:    'graft.mv.of'           = <base name, e.g. default/t>
  *                'graft.mv.group'        = 'k1[,k2...]'   (may be '')
  *                'graft.mv.agg'          = 'sum:v:sum_v,count:*:n,...'
  *                'graft.mv.base_version' = <base commit version at
  *                                           refresh>
  *
  * SOUNDNESS GATES — the rewrite fires only when ALL hold, and every
  * refusal silently keeps the original plan (correctness never depends
  * on this rule):
  *   - conf `spark.graft.mvRewrite` is on (default on);
  *   - the MV is FRESH: its recorded base_version equals the base
  *     table's CURRENT on-disk commit version (re-read from the log,
  *     so a foreign process's commit disables the rewrite instantly);
  *   - the aggregate's grouping is exactly the MV's group columns
  *     (bare attributes, any order); a WHERE between the aggregate and
  *     the base relation is admitted ONLY when it is deterministic and
  *     references grouping columns alone (then filter-then-aggregate
  *     equals aggregate-then-filter, and it re-applies on the MV);
  *   - every aggregate is an undistinct, unfiltered SUM / COUNT(*) /
  *     COUNT(col) / MIN / MAX covered by the MV's agg spec, re-expressed
  *     decomposably over the MV (sum->SUM, count->SUM, min->MIN,
  *     max->MAX — correct even if the MV held several partials per
  *     group) with the REWRITTEN expression's dataType identical to
  *     the original's (a decimal re-sum would widen — refused).
  *
  * Output attribute ids and names are preserved exactly, so parent
  * operators are untouched. The MV relation has no `graft.mv.tables`
  * property, so the rewritten plan can never re-match (no fixpoint
  * churn). */
object MvRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    try conf.getConfString("spark.graft.mvRewrite", "true") == "true"
    catch { case _: Exception => true }

  /** Peel bare-attribute Projects and at most ONE Filter (in any
    * interleaving — column pruning places Projects above AND below the
    * filter across optimizer iterations) down to the relation. A
    * second filter, a computing projection, or anything else refuses. */
  private object Underlying {
    def unapply(plan: LogicalPlan)
        : Option[(DataSourceV2Relation, Option[Expression])] = plan match {
      case rel: DataSourceV2Relation => Some((rel, None))
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unapply(child)
      case Filter(cond, child) => unapply(child) match {
        case Some((rel, None)) => Some((rel, Some(cond)))
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      // a WHERE between the aggregate and the relation is carried
      // through and re-applied on the MV when it references only
      // grouping columns (checked in tryOne — filter-then-aggregate
      // commutes with aggregate-then-filter on the group axis)
      case agg @ Aggregate(_, _, Underlying(rel, cond), _)
          if rel.table.isInstanceOf[GraftTable] =>
        rewrite(agg, rel, cond).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate, rel: DataSourceV2Relation,
      filter: Option[Expression]): Option[LogicalPlan] = {
    val base = rel.table.asInstanceOf[GraftTable]
    val mvNames = Option(base.properties().get("graft.mv.tables"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    if (mvNames.isEmpty || rel.catalog.isEmpty || rel.identifier.isEmpty)
      return None
    // freshness is judged against the base's CURRENT on-disk version —
    // a foreign commit after the MV's refresh must disable the rewrite
    base.refreshFromDisk()
    val baseVersion = base.stateNow.current.map(_.version).getOrElse(-1)
    mvNames.view.flatMap { mvName =>
      try tryOne(agg, rel, filter, base, baseVersion, mvName)
      catch { case _: Exception => None } // any surprise: keep original
    }.headOption
  }

  private def tryOne(agg: Aggregate, rel: DataSourceV2Relation,
      filter: Option[Expression], base: GraftTable, baseVersion: Int,
      mvName: String): Option[LogicalPlan] = {
    val cat = rel.catalog.get.asInstanceOf[TableCatalog]
    val mvIdent = Identifier.of(rel.identifier.get.namespace(), mvName)
    if (!cat.tableExists(mvIdent)) return None
    val mv = cat.loadTable(mvIdent)
    val p = mv.properties()
    if (p.get("graft.mv.of") != base.name()) return None
    if (p.get("graft.mv.base_version") != baseVersion.toString) return None
    val groupCols = Option(p.get("graft.mv.group"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(return None)
    // agg spec: fn:src:mvCol — src '*' is COUNT(*)
    val aggSpecs: Map[(String, String), String] =
      Option(p.get("graft.mv.agg")).map(_.split(',').map(_.trim)
        .filter(_.nonEmpty).map { s =>
          s.split(':') match {
            case Array(fn, src, dst) =>
              (fn.toLowerCase(java.util.Locale.ROOT),
                src.toLowerCase(java.util.Locale.ROOT)) -> dst
            case _ => return None
          }
        }.toMap).getOrElse(return None)

    // grouping must be bare attributes matching the MV group set
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.map(_.name.toLowerCase(java.util.Locale.ROOT)).toSet !=
        groupCols.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
      return None

    val mvRel = DataSourceV2Relation.create(mv, rel.catalog, Some(mvIdent))
    def mvAttr(name: String): Option[AttributeReference] =
      mvRel.output.collectFirst {
        case a: AttributeReference if a.name.equalsIgnoreCase(name) => a
      }

    // a pre-aggregation WHERE is admissible iff every referenced
    // attribute is a grouping column (filter-then-aggregate then
    // equals aggregate-then-filter, re-applied on the MV's group
    // columns); deterministic expressions only
    val groupNameSet = groupCols.map(_.toLowerCase(
      java.util.Locale.ROOT)).toSet
    val mvChild: LogicalPlan = filter match {
      case None => mvRel
      case Some(cond) =>
        if (!cond.deterministic) return None
        if (!cond.references.forall(a =>
          groupNameSet.contains(a.name.toLowerCase(
            java.util.Locale.ROOT)))) return None
        val remapped = cond.transformUp {
          case a: AttributeReference =>
            mvAttr(a.name).getOrElse(return None)
        }
        Filter(remapped, mvRel)
    }

    // re-express one aggregate call decomposably over the MV
    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def spec(fn: String, src: String): Option[AttributeReference] =
        aggSpecs.get((fn, src.toLowerCase(java.util.Locale.ROOT)))
          .flatMap(mvAttr)
      val inner: Option[Expression] = ae.aggregateFunction match {
        case Sum(a: AttributeReference, ansi) =>
          spec("sum", a.name).map(c => AggregateExpression(
            Sum(c, ansi), ae.mode, isDistinct = false))
        case Count(Seq(Literal(1, _))) =>
          spec("count", "*").map(c => Coalesce(Seq(AggregateExpression(
            Sum(c), ae.mode, isDistinct = false), Literal(0L))))
        case Count(Seq(a: AttributeReference)) =>
          spec("count", a.name).map(c => Coalesce(Seq(AggregateExpression(
            Sum(c), ae.mode, isDistinct = false), Literal(0L))))
        case Min(a: AttributeReference) =>
          spec("min", a.name).map(c => AggregateExpression(
            Min(c), ae.mode, isDistinct = false))
        case Max(a: AttributeReference) =>
          spec("max", a.name).map(c => AggregateExpression(
            Max(c), ae.mode, isDistinct = false))
        // AVG decomposes as SUM(sum)/SUM(count) when BOTH are
        // materialized for the column (count of the COLUMN, not *, so
        // nulls drop exactly like Average's own buffer). DoubleType
        // only: re-summing a long/decimal partial then dividing can
        // round differently from Average's double accumulation — the
        // dataType guard below would pass, so the gate lives here.
        case Average(a: AttributeReference, _)
            if a.dataType == org.apache.spark.sql.types.DoubleType =>
          for {
            sc <- spec("sum", a.name)
              .filter(_.dataType == org.apache.spark.sql.types.DoubleType)
            cc <- spec("count", a.name)
              .filter(_.dataType == org.apache.spark.sql.types.LongType)
          } yield {
            val s = AggregateExpression(Sum(sc), ae.mode,
              isDistinct = false)
            val n = AggregateExpression(Sum(cc), ae.mode,
              isDistinct = false)
            // Average's exact final arithmetic: null when no non-null
            // input, else sum/count
            If(EqualTo(Coalesce(Seq(n, Literal(0L))), Literal(0L)),
              Literal(null, org.apache.spark.sql.types.DoubleType),
              Divide(s, Cast(n, org.apache.spark.sql.types.DoubleType)))
          }
        case _ => None
      }
      // type identity is the universal guard (decimal re-sum widens,
      // long sum of an int count differs, ...): refuse on any drift
      inner.filter(_.dataType == ae.dataType)
    }

    val newResults: Seq[NamedExpression] =
      agg.aggregateExpressions.map {
        case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
          val m = mvAttr(a.name).getOrElse(return None)
          Alias(m, a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name) =>
          val ne = rewriteAgg(ae).getOrElse(return None)
          Alias(ne, name)(exprId = al.exprId)
        case al @ Alias(a: AttributeReference, name)
            if groupAttrs.exists(_.exprId == a.exprId) =>
          val m = mvAttr(a.name).getOrElse(return None)
          Alias(m, name)(exprId = al.exprId)
        case _ => return None
      }
    val newGroups: Seq[Expression] =
      groupAttrs.map(a => mvAttr(a.name).getOrElse(return None))

    logInfo(s"MvRewrite: serving aggregate over ${base.name()} " +
      s"from materialized view $mvName (base version $baseVersion)")
    Some(Aggregate(newGroups, newResults, mvChild))
  }
}
