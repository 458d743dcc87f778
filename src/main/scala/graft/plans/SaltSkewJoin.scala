package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, CreateArray, EqualTo, Explode, Expression, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
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

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !alreadySalted(cond) =>
        val eq = conjuncts(cond).collectFirst(Function.unlift {
          case EqualTo(a: Attribute, b: Attribute) =>
            val (la, ra) =
              if (left.outputSet.contains(a)) (Some(a), Some(b))
              else (Some(b), Some(a))
            val hotLeft = la.flatMap(x => relationColumn(left, x))
              .flatMap { case (t, c) => hotShare(t, c) }
              .exists(_ >= threshold)
            lazy val hotRight = ra.flatMap(x => relationColumn(right, x))
              .flatMap { case (t, c) => hotShare(t, c) }
              .exists(_ >= threshold)
            if (hotLeft) Some(true)        // salt the left side
            else if (hotRight) Some(false) // salt the right side
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
