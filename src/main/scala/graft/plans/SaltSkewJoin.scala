package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, CreateArray, EqualTo, Explode, Expression, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Distinct, Filter, Generate, GlobalLimit, Join, LocalLimit, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{IntegerType, MapType}

import graft.catalog.GraftTable

/** HISTOGRAM/MCV-DRIVEN SKEW SALTING (VERDICT r15 item 9) — q47's
  * hand-written salted-join shape, emitted AUTOMATICALLY when the
  * engine's own statistics prove a join key is hot. `CALL
  * system.analyze(t, cols, approx, buckets, mcv)` persists top-K
  * most-common-value lists for string columns (numeric histograms
  * can't describe the skewed STRING dimension keys real schemas hash
  * on); when an INNER equi-join's key column on a graft table carries
  * a fresh MCV whose hottest value holds ≥ `spark.graft.salt
  * .hot_threshold` (default 0.5) of the rows, the join is rewritten:
  *
  *   skewed side  -> + `__graft_salt_s` = pmod(hash(<row>), n)
  *   other side   -> × n (explode over the salt range)
  *   condition    -> original ∧ (salt_s = salt_r)
  *
  * so the single hot reducer becomes n evenly-loaded ones. The rewrite
  * is PHYSICAL-ONLY: a fact row meets exactly the dim rows it met
  * before (the dim copy with its salt), and a restoring Project pins
  * the original output — results are bit-identical (q277's oracle runs
  * the unsalted formulation).
  *
  * Soundness gates (each refusal keeps the original plan):
  *   - `spark.graft.salt.enabled` (default true);
  *   - INNER join with a conjunctive condition; the key attr traces
  *     by exprId to a [[GraftTable]] DSv2 relation column (projections
  *     that alias it refuse — the stat provenance is gone);
  *   - the MCV is FRESH: [[GraftTable.analyzedMcv]] is version-gated,
  *     so any commit after the analysis disables the rewrite until the
  *     next `system.analyze` (stale-stats discipline, like MvRewrite);
  *   - the skewed side has at least one non-map column to hash (the
  *     salt must spread the hot key's rows, and map types don't hash);
  *   - not already salted (the salt conjunct's `__graft_salt` names
  *     guard the fixed point).
  *
  * PROFIT gates (VERDICT r16 item 2 + ADVICE: a sound rewrite can
  * still be a scale REGRESSION — each refusal keeps the plan a better
  * strategy already owns):
  *   - BROADCAST-SMALL other side: when the to-be-exploded side's
  *     recorded size (its graft table's compressed bytes, traced
  *     through row-nonincreasing operators) is at or under
  *     `spark.sql.autoBroadcastJoinThreshold`, Spark plans a
  *     BroadcastHashJoin — there is NO skewed Exchange to fix, and the
  *     rewrite would replicate the broadcast side ×n for zero benefit.
  *     Disabling broadcast (threshold -1) re-admits salting: the user
  *     forced a shuffle join, so the hot reducer is real again.
  *   - CO-PARTITIONED SPJ sides: when v2 bucketing is on and BOTH join
  *     keys sit directly on graft scans whose layouts are SPJ-
  *     compatible (same-column `bucket(n, c)` with equal n, or
  *     matching single-column identity partitioning), the join already
  *     plans with ZERO Exchange (q212/q218) — the salt projection +
  *     Generate would destroy the KeyGroupedPartitioning report and
  *     re-introduce the shuffle this engine's layout exists to remove.
  *     A hot key inside one co-bucketed task is AQE's province, not a
  *     reason to resurrect the Exchange.
  *   - HOT OTHER SIDE (self-join shape): when the other side's join
  *     column carries its own ≥threshold MCV/histogram share, the
  *     "dim" is a second fact with the same hot key — exploding it ×n
  *     multiplies shuffle volume instead of balancing it.
  *   - UNPROVEN DIMENSION: the rewrite only fires when the other
  *     side's row count is KNOWN (traces to a graft table through
  *     row-nonincreasing operators) and the replication is bounded by
  *     the skew it removes (`other_rows × (n-1) ≤ skew_rows`) —
  *     optimizer-automatic plans must prove their benefit; "probably a
  *     dim" is not a statistic.
  *
  * At 100 TB this is the difference between one straggler task holding
  * 90% of a shuffle and n balanced tasks — without anyone hand-writing
  * q47's shape into every affected query. AQE's skew-join handles
  * sort-merge spills at runtime; this rule prevents the skewed
  * EXCHANGE itself, and composes with AQE for residual imbalance. */
object SaltSkewJoin extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    try conf.getConfString("spark.graft.salt.enabled", "true") == "true"
    catch { case _: Exception => true }
  private def threshold: Double =
    try conf.getConfString("spark.graft.salt.hot_threshold", "0.5").toDouble
    catch { case _: Exception => 0.5 }
  private def saltN: Int =
    try conf.getConfString("spark.graft.salt.n", "16").toInt
    catch { case _: Exception => 16 }

  private def alreadySalted(cond: Expression): Boolean =
    cond.find {
      case a: AttributeReference => a.name.startsWith("__graft_salt")
      case _ => false
    }.isDefined

  /** Trace `attr` to the graft relation COLUMN it reads — descending
    * ONLY through operators that preserve the key's per-row
    * multiplicity (Project pass-through, Filter, aliasing wrappers).
    * An Aggregate/Distinct/Window between the join and the scan keeps
    * the attr's exprId but destroys the skew the MCV describes (one
    * row per key after a group-by) — salting there would explode the
    * other side for zero benefit (review find), so anything that can
    * change multiplicity stops the walk. An alias also stops it: the
    * stat's provenance is gone. */
  private def relationColumn(plan: LogicalPlan,
      attr: Attribute): Option[(GraftTable, String)] = plan match {
    case r: DataSourceV2Relation
        if r.output.exists(_.exprId == attr.exprId) =>
      r.table match {
        case g: GraftTable =>
          Some((g, r.output.find(_.exprId == attr.exprId).get.name))
        case _ => None
      }
    case p: Project
        if p.projectList.exists(e =>
          e.isInstanceOf[Attribute] && e.exprId == attr.exprId) =>
      relationColumn(p.child, attr)
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      relationColumn(f.child, attr)
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      relationColumn(s.child, attr)
    case _ => None
  }

  /** Hot-key mass share from the engine's own statistics: MCV lists
    * for string columns; for numeric columns, the q271 equi-height
    * histograms — a DEGENERATE bin (lo == hi) holds exactly one value
    * at the bin height, so the hottest value's share is the summed
    * height of its degenerate bins over the total mass. */
  private def hotShare(t: GraftTable, c: String): Option[Double] = {
    val mcv = t.analyzedMcv.get(c).collect {
      case (total, vs) if total > 0 && vs.nonEmpty =>
        vs.map(_._2).max.toDouble / total
    }
    mcv.orElse(t.analyzedHist.get(c).collect {
      case (height, bins) if height > 0 && bins.nonEmpty =>
        val total = height * bins.length
        val byValue = bins.filter(b => b._1 == b._2)
          .groupBy(_._1).values.map(_.length * height)
        if (byValue.isEmpty) 0.0 else byValue.max / total
    })
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Row/byte upper bound for a sub-plan, traced to a graft relation
    * through operators that never INCREASE row count (projection,
    * filter, aliasing, aggregation, distinct, limits). The full-table
    * figure over-estimates a filtered side — conservative in the right
    * direction for both consumers: the broadcast gate refuses more
    * (an over-estimated side that still fits under the threshold
    * certainly broadcasts) and the explosion bound refuses more (an
    * over-estimated other side looks more expensive to replicate). */
  private def sizeUpperBound(plan: LogicalPlan): Option[(Long, Long)] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftTable => Some((g.currentDataRows, g.currentDataBytes))
        case _ => None
      }
      case p: Project => sizeUpperBound(p.child)
      case f: Filter => sizeUpperBound(f.child)
      case s: SubqueryAlias => sizeUpperBound(s.child)
      case a: Aggregate => sizeUpperBound(a.child)
      case d: Distinct => sizeUpperBound(d.child)
      case d: Deduplicate => sizeUpperBound(d.child)
      case l: GlobalLimit => sizeUpperBound(l.child)
      case l: LocalLimit => sizeUpperBound(l.child)
      case _ => None
    }

  /** Would the UNSALTED join already plan with zero Exchange through
    * storage-partitioned join? True when v2 bucketing is enabled and
    * both keys sit on graft scans whose layouts report compatible
    * KeyGroupedPartitioning: the same `bucket(n, col)` transform
    * (equal n — Spark requires clustering-expression equality), or
    * both tables identity-partitioned by exactly the join column. */
  private def spjCompatible(lt: GraftTable, lc: String,
      rt: GraftTable, rc: String): Boolean = {
    val v2b =
      try conf.getConfString(
        "spark.sql.sources.v2.bucketing.enabled", "false") == "true"
      catch { case _: Exception => false }
    if (!v2b) false
    else {
      val bucketed = (lt.bucketSpec, rt.bucketSpec) match {
        case (Some((bc1, n1)), Some((bc2, n2))) =>
          bc1.equalsIgnoreCase(lc) && bc2.equalsIgnoreCase(rc) && n1 == n2
        case _ => false
      }
      def identityOn(t: GraftTable, c: String): Boolean =
        t.identityPartitionCols.map(_.toLowerCase) == Seq(c.toLowerCase)
      bucketed || (identityOn(lt, lc) && identityOn(rt, rc))
    }
  }

  /** All profit gates for one candidate orientation: `skewCol` on
    * `skewTbl` proved hot, `other` is the side the rewrite would
    * explode ×n. Refusals keep the original plan. */
  private def profitable(skewTbl: GraftTable, skewCol: String,
      other: LogicalPlan, otherCol: Option[(GraftTable, String)]): Boolean = {
    // hot other side: a self-join shape — exploding the second fact
    // multiplies shuffle volume instead of balancing it
    val otherHot = otherCol
      .flatMap { case (t, c) => hotShare(t, c) }.exists(_ >= threshold)
    if (otherHot) return false
    // co-partitioned SPJ sides: the unsalted join is already
    // Exchange-free; salting would resurrect the shuffle
    if (otherCol.exists { case (t, c) =>
        spjCompatible(skewTbl, skewCol, t, c) }) return false
    val otherSize = sizeUpperBound(other)
    // broadcast-small other side: BHJ has no skewed Exchange to fix
    val bhjThreshold =
      try conf.autoBroadcastJoinThreshold
      catch { case _: Exception => 10485760L }
    if (bhjThreshold > 0 &&
        otherSize.exists { case (_, bytes) => bytes <= bhjThreshold })
      return false
    // unproven dimension / unbounded replication: only fire when the
    // explosion is provably cheaper than the skew it removes
    val n = math.max(2, saltN)
    otherSize.exists { case (rows, _) =>
      rows * (n - 1L) <= skewTbl.currentDataRows
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !alreadySalted(cond) =>
        val eq = conjuncts(cond).collectFirst(Function.unlift {
          case EqualTo(a: Attribute, b: Attribute) =>
            val (la, ra) =
              if (left.outputSet.contains(a)) (a, b) else (b, a)
            val lcol = relationColumn(left, la)
            val rcol = relationColumn(right, ra)
            val hotLeft = lcol.flatMap { case (t, c) => hotShare(t, c) }
              .exists(_ >= threshold)
            lazy val hotRight = rcol.flatMap { case (t, c) => hotShare(t, c) }
              .exists(_ >= threshold)
            if (hotLeft && profitable(lcol.get._1, lcol.get._2, right, rcol))
              Some(true)         // salt the left side
            else if (hotRight &&
                profitable(rcol.get._1, rcol.get._2, left, lcol))
              Some(false)        // salt the right side
            else None
          case _ => None
        })
        eq.map(skewLeft => salted(j, skewLeft)).getOrElse(j)
    }

  private def salted(j: Join, skewLeft: Boolean): LogicalPlan = {
    val n = math.max(2, saltN)
    val (skew, other) = if (skewLeft) (j.left, j.right) else (j.right, j.left)
    // the salt hashes the WHOLE row (minus unhashable maps): any salt
    // routing is correct — the other side carries every salt value —
    // and full-row hashing is deterministic under task retry, unlike
    // rand(); identical duplicate rows share a salt (they'd co-locate
    // under any content-deterministic scheme)
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = skew.output.filterNot(a => hasMap(a.dataType))
    if (hashable.isEmpty) return j
    val saltAlias = Alias(
      Pmod(new Murmur3Hash(hashable), Literal(n)), "__graft_salt_s")()
    val skewP = Project(skew.output :+ saltAlias, skew)
    val genOut = AttributeReference("__graft_salt_r", IntegerType,
      nullable = false)()
    val gen = Generate(
      Explode(CreateArray((0 until n).map(Literal(_)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(genOut), child = other)
    val newCond = And(j.condition.get,
      EqualTo(saltAlias.toAttribute, genOut))
    val newJoin =
      if (skewLeft) j.copy(left = skewP, right = gen,
        condition = Some(newCond))
      else j.copy(left = gen, right = skewP, condition = Some(newCond))
    // restore the original output (names, ids, order): parents untouched
    Project(j.output, newJoin)
  }
}
