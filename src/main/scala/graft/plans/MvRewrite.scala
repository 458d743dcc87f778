package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Divide, EqualTo, Expression, If, IsNotNull, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftTable

/** MATERIALIZED-VIEW AUTO-REWRITE — the transparent half of the q229
  * incremental-MV machinery: a matching aggregate over the BASE table
  * (or over a recorded dim⨝fact STAR JOIN) is redirected by this
  * optimizer rule to scan the (tiny) MV table instead, with NO query
  * change. At 100 TB this is the difference between a dashboard
  * group-by scanning the corpus and it reading a few thousand
  * pre-aggregated rows — the same query-rewrite contract
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
  *   join MVs additionally (the MV definition was
  *   `SELECT ... FROM base JOIN dim ON base.fk = dim.dk GROUP BY ...`):
  *                'graft.mv.join_dim'     = <dim table name>
  *                'graft.mv.join_on'      = 'fk=dk'
  *                'graft.mv.dim_version'  = <dim commit version at
  *                                           refresh>
  *
  * SOUNDNESS GATES — the rewrite fires only when ALL hold, and every
  * refusal silently keeps the original plan (correctness never depends
  * on this rule):
  *   - conf `spark.graft.mvRewrite` is on (default on);
  *   - the MV is FRESH: its recorded base_version (and for join MVs
  *     dim_version) equals the table's CURRENT on-disk commit version
  *     (re-read from the log, so a foreign process's commit disables
  *     the rewrite instantly; TTL-amortizable — see [[ensureFresh]]);
  *   - the aggregate's grouping is a SUBSET of the MV's group columns
  *     (bare attributes, any order): equal = direct serve, strict
  *     subset = ROLL-UP (every rewrite below is a re-aggregation over
  *     the MV's partials, so collapsing (day, k) partials down to day
  *     is the same arithmetic); group-column substitution requires
  *     name AND dataType identity. A WHERE between the aggregate and
  *     the relation(s) is admitted ONLY when it is deterministic and
  *     references MV group columns alone (then filter-then-aggregate
  *     equals aggregate-then-filter, and it re-applies on the MV);
  *     on join sides, an IsNotNull(<join key>) conjunct (the
  *     optimizer's inferred constraint) is dropped — an INNER
  *     equi-join never emits null-keyed rows, so the MV's rows
  *     already exclude them;
  *   - for join MVs: the join is INNER with a single equi-condition
  *     on exactly the recorded key pair (either orientation), both
  *     relations are the recorded tables, and no referenced column
  *     name is ambiguous (present on both sides);
  *   - every aggregate is an undistinct, unfiltered SUM / COUNT(*) /
  *     COUNT(col) / MIN / MAX covered by the MV's agg spec, re-expressed
  *     decomposably over the MV (sum->SUM, count->SUM, min->MIN,
  *     max->MAX — correct even if the MV held several partials per
  *     group) with the REWRITTEN expression's dataType identical to
  *     the original's (a decimal re-sum would widen — refused); the
  *     one admitted DISTINCT is COUNT(DISTINCT <MV group column>),
  *     exact from the MV's own group values — every other DISTINCT
  *     refuses.
  *
  * Output attribute ids and names are preserved exactly, so parent
  * operators are untouched. The MV relation has no `graft.mv.tables`
  * property, so the rewritten plan can never re-match (no fixpoint
  * churn). */
object MvRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    try conf.getConfString("spark.graft.mvRewrite", "true") == "true"
    catch { case _: Exception => true }

  /** Freshness-check amortization (VERDICT r13 watch item). The rule
    * judges freshness against the ON-DISK log so a foreign PROCESS's
    * commit disables the rewrite — but that is a log-directory listing
    * per optimizer pass per matching aggregate. With
    * `spark.graft.mvRewrite.freshnessTtlMs` > 0 the disk check is
    * skipped while the last one is younger than the TTL: a foreign
    * commit is then observed within at most TTL ms (bounded staleness,
    * chosen by the operator), while SAME-process commits mutate the
    * shared [[GraftTable]] handle directly and always kill the rewrite
    * instantly, TTL or not. Default 0 = check every pass (exact). */
  private val lastDiskCheck =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  /** Test-visible count of actual on-disk freshness checks. */
  private[graft] val freshnessDiskChecks =
    new java.util.concurrent.atomic.AtomicLong()

  private def ensureFresh(base: GraftTable): Unit = {
    val ttl =
      try conf.getConfString(
        "spark.graft.mvRewrite.freshnessTtlMs", "0").toLong
      catch { case _: Exception => 0L }
    def check(): Unit = {
      freshnessDiskChecks.incrementAndGet()
      base.refreshFromDisk()
    }
    if (ttl <= 0) check()
    else {
      val key = base.name()
      val now = System.currentTimeMillis()
      val last = lastDiskCheck.get(key)
      if (last == null || now - last >= ttl) {
        check()
        lastDiskCheck.put(key, now)
      }
    }
  }

  private def lc(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

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

  /** A TREE of INNER equi-joins over peelable relations, possibly
    * under bare-attribute Projects — flattened to its leaf relations
    * (each with its pushed-down side filter) and the multiset of join
    * conjuncts. Covers any association/orientation the optimizer
    * picked for an N-dim star: ((f⨝d1)⨝d2), (d2⨝(d1⨝f)), ... WHERE
    * conjuncts have already been pushed to the sides by
    * PushDownPredicates (same fixed-point batch), so a filter ABOVE a
    * join is either transient (matched next iteration) or references
    * both sides (never commutes — refuse). */
  private object UnderlyingStar {
    def unapply(plan: LogicalPlan): Option[
        (Seq[(DataSourceV2Relation, Option[Expression])],
          Seq[Expression])] = plan match {
      case Join(l, r, Inner, Some(jc), _) =>
        for {
          (ll, lj) <- unapply(l)
          (rl, rj) <- unapply(r)
        } yield (ll ++ rl, lj ++ rj ++ splitConjunctivePredicates(jc))
      case Underlying(rel, cond) => Some((Seq((rel, cond)), Nil))
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unapply(child)
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
      // star-schema MV: aggregate over a recorded fact ⨝ dim1 [⨝ dim2
      // ...] join tree (any association/orientation), single or
      // compound equi-keys per dim
      case agg @ Aggregate(_, _, UnderlyingStar(leaves, jcs), _)
          if leaves.size >= 2 &&
            leaves.forall(_._1.table.isInstanceOf[GraftTable]) =>
        rewriteStar(agg, leaves, jcs).getOrElse(agg)
    }

  private def mvNamesOf(base: GraftTable): Seq[String] =
    Option(base.properties().get("graft.mv.tables"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  /** Effective freshness stamp for `key`, pending-publish aware
    * (VERDICT r16 item 7): a consistent-cut publish writes
    * `<key>.pending` + `graft.mv.pending_txn` BETWEEN its phase-1 CAS
    * and its marker create, so the stamp becomes authoritative at
    * exactly the content's visibility instant. Resolution takes the
    * NUMERIC MAX of the plain stamp and a committed pending stamp — a
    * later ordinary refresh (plain stamp advances) supersedes an older
    * committed pending without any cleanup, and an aborted/in-flight
    * pending (marker absent) is simply invisible. `witness` is any
    * table of the same warehouse (the marker directory is shared). */
  private def freshStamp(p: java.util.Map[String, String], key: String,
      witness: GraftTable): Option[Int] = {
    val plain = Option(p.get(key)).flatMap(_.toIntOption)
    val pending = for {
      txn <- Option(p.get("graft.mv.pending_txn"))
      v <- Option(p.get(s"$key.pending")).flatMap(_.toIntOption)
      if witness.publishTxnCommitted(txn)
    } yield v
    (plain.toSeq ++ pending.toSeq).reduceOption(_ max _)
  }

  private def rewrite(agg: Aggregate, rel: DataSourceV2Relation,
      filter: Option[Expression]): Option[LogicalPlan] = {
    val base = rel.table.asInstanceOf[GraftTable]
    val mvNames = mvNamesOf(base)
    if (mvNames.isEmpty || rel.catalog.isEmpty || rel.identifier.isEmpty)
      return None
    // freshness is judged against the base's CURRENT on-disk version —
    // a foreign commit after the MV's refresh must disable the rewrite
    // (TTL-amortized when the operator opts in; see ensureFresh)
    ensureFresh(base)
    val baseVersion = base.stateNow.current.map(_.version).getOrElse(-1)
    mvNames.view.flatMap { mvName =>
      try tryOne(agg, rel, filter, base, baseVersion, mvName)
      catch { case _: Exception => None } // any surprise: keep original
    }.headOption
  }

  private def rewriteStar(agg: Aggregate,
      leaves: Seq[(DataSourceV2Relation, Option[Expression])],
      joinConjuncts: Seq[Expression]): Option[LogicalPlan] =
    // any leaf may be the fact: the optimizer reorders joins freely
    leaves.view.flatMap { case (factRel, factCond) =>
      if (factRel.catalog.isEmpty || factRel.identifier.isEmpty)
        Seq.empty
      else mvNamesOf(factRel.table.asInstanceOf[GraftTable]).view
        .flatMap { mvName =>
          try tryStarOne(agg, factRel, factCond,
            leaves.filterNot(_._1 eq factRel), joinConjuncts, mvName)
          catch { case _: Exception => None }
        }
    }.headOption

  private def loadMvMeta(rel: DataSourceV2Relation, mvName: String)
      : Option[(Table, DataSourceV2Relation, Seq[String],
        Map[(String, String), String])] = {
    val cat = rel.catalog.get.asInstanceOf[TableCatalog]
    val mvIdent = Identifier.of(rel.identifier.get.namespace(), mvName)
    if (!cat.tableExists(mvIdent)) return None
    val mv = cat.loadTable(mvIdent)
    val p = mv.properties()
    val groupCols = Option(p.get("graft.mv.group"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(return None)
    // agg spec: fn:src:mvCol — src '*' is COUNT(*)
    val aggSpecs: Map[(String, String), String] =
      Option(p.get("graft.mv.agg")).map(_.split(',').map(_.trim)
        .filter(_.nonEmpty).map { s =>
          s.split(':') match {
            case Array(fn, src, dst) => (lc(fn), lc(src)) -> dst
            case _ => return None
          }
        }.toMap).getOrElse(return None)
    val mvRel = DataSourceV2Relation.create(mv, rel.catalog, Some(mvIdent))
    Some((mv, mvRel, groupCols, aggSpecs))
  }

  private def mvAttr(mvRel: DataSourceV2Relation, name: String)
      : Option[AttributeReference] =
    mvRel.output.collectFirst {
      case a: AttributeReference if a.name.equalsIgnoreCase(name) => a
    }

  /** Substitution must preserve the TYPE, not just the name —
    * graft.mv.* props are free-form user metadata, so an MV whose
    * like-named column drifted (STRING vs INT) would otherwise install
    * a wrong-typed Alias under the original exprId and downstream
    * operators would read garbage (ADVICE r13). */
  private def mvAttrTyped(mvRel: DataSourceV2Relation,
      a: AttributeReference): Option[AttributeReference] =
    mvAttr(mvRel, a.name).filter(_.dataType == a.dataType)

  /** Re-bind every attribute in `cond` to its (type-identical) MV
    * column, or refuse. */
  private def remapToMv(mvRel: DataSourceV2Relation,
      cond: Expression): Option[Expression] = {
    var ok = true
    val out = cond.transformUp {
      case a: AttributeReference => mvAttrTyped(mvRel, a) match {
        case Some(m) => m
        case None => ok = false; a
      }
    }
    if (ok) Some(out) else None
  }

  private def tryOne(agg: Aggregate, rel: DataSourceV2Relation,
      filter: Option[Expression], base: GraftTable, baseVersion: Int,
      mvName: String): Option[LogicalPlan] = {
    val (mv, mvRel, groupCols, aggSpecs) =
      loadMvMeta(rel, mvName).getOrElse(return None)
    val p = mv.properties()
    if (p.get("graft.mv.of") != base.name()) return None
    if (p.get("graft.mv.join_dim") != null) return None // join arm's MV
    if (!freshStamp(p, "graft.mv.base_version", base)
        .contains(baseVersion)) return None

    // a pre-aggregation WHERE is admissible iff every referenced
    // attribute is an MV grouping column (filter-then-aggregate then
    // equals aggregate-then-filter, re-applied on the MV's group
    // columns); deterministic expressions only
    val groupNameSet = groupCols.map(lc).toSet
    val mvChild: LogicalPlan = filter match {
      case None => mvRel
      case Some(cond) =>
        if (!cond.deterministic) return None
        if (!cond.references.forall(a => groupNameSet.contains(lc(a.name))))
          return None
        Filter(remapToMv(mvRel, cond).getOrElse(return None), mvRel)
    }
    buildRewrite(agg, mvRel, groupCols, aggSpecs, mvChild)
  }

  /** N-dim star with compound keys (VERDICT r14 item 2). Recorded
    * metadata generalizes backwards-compatibly:
    *   'graft.mv.join_dim'    = 'dim1[,dim2...]'
    *   'graft.mv.join_on'     = per-dim key spec, dims separated by
    *                            ';', equi-key conjuncts by '&':
    *                            'fk=dk' | 'fk1=dk1&fk2=dk2;fk3=dk3'
    *   'graft.mv.dim_version' = 'v1[,v2...]'    (aligned with dims)
    * The plan's leaf set must be the fact plus EXACTLY the recorded
    * dims (matched by table identity, no duplicates), its join
    * conjuncts must biject onto the recorded (fk = dk) pairs (each
    * pair matched once, no extra conjunct — a dim⨝dim snowflake edge
    * has no recorded pair and refuses), and freshness is checked on
    * EVERY constituent: a commit on the fact or any dim
    * staleness-kills the rewrite. */
  private def tryStarOne(agg: Aggregate, factRel: DataSourceV2Relation,
      factCond: Option[Expression],
      dims: Seq[(DataSourceV2Relation, Option[Expression])],
      joinConjuncts: Seq[Expression],
      mvName: String): Option[LogicalPlan] = {
    val factT = factRel.table.asInstanceOf[GraftTable]
    val (mv, mvRel, groupCols, aggSpecs) =
      loadMvMeta(factRel, mvName).getOrElse(return None)
    val p = mv.properties()
    if (p.get("graft.mv.of") != factT.name()) return None
    val dimNames = Option(p.get("graft.mv.join_dim"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty).getOrElse(return None)
    val joinOn = Option(p.get("graft.mv.join_on")).getOrElse(return None)
    // per-dim compound-key specs
    val dimKeys: Seq[Seq[(String, String)]] =
      joinOn.split(';').map(_.trim).filter(_.nonEmpty).toSeq.map { d =>
        d.split('&').map(_.trim).filter(_.nonEmpty).toSeq.map { pair =>
          pair.split('=') match {
            case Array(f, k) => (f.trim, k.trim)
            case _ => return None
          }
        }
      }
    val dimVers = Option(p.get("graft.mv.dim_version"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(return None)
    if (dimKeys.size != dimNames.size || dimVers.size != dimNames.size)
      return None
    if (dimKeys.exists(_.isEmpty)) return None

    // the plan's dims must be exactly the recorded dims, matched by
    // table identity; duplicates (self-joined dims) refuse — the
    // name-keyed column mapping below could not disambiguate them
    if (dims.size != dimNames.size) return None
    if (dimNames.distinct.size != dimNames.size) return None
    val dimByName: Map[String, (DataSourceV2Relation, Option[Expression])] =
      dims.map(d =>
        d._1.table.asInstanceOf[GraftTable].name() -> d).toMap
    if (dimByName.size != dims.size) return None
    val resolved: Seq[(DataSourceV2Relation, Option[Expression],
        Seq[(String, String)], String)] =
      dimNames.zip(dimKeys).zip(dimVers).map { case ((n, keys), ver) =>
        val (rel, cond) = dimByName.getOrElse(n, return None)
        (rel, cond, keys, ver)
      }

    // freshness of EVERY constituent
    ensureFresh(factT)
    resolved.foreach(d =>
      ensureFresh(d._1.table.asInstanceOf[GraftTable]))
    val fv = factT.stateNow.current.map(_.version).getOrElse(-1)
    if (!freshStamp(p, "graft.mv.base_version", factT)
        .contains(fv)) return None
    resolved.foreach { case (rel, _, _, ver) =>
      val dv = rel.table.asInstanceOf[GraftTable]
        .stateNow.current.map(_.version).getOrElse(-1)
      if (ver != dv.toString) return None
    }

    // the join conjuncts must biject onto the recorded pairs: each
    // (fact.fk = dim_i.dk) matched exactly once, nothing left over on
    // either side (extra conjuncts, expression keys, or snowflake
    // dim⨝dim edges all refuse)
    val expected = scala.collection.mutable.Set.empty[(Int, Int)]
    resolved.zipWithIndex.foreach { case ((_, _, keys, _), di) =>
      keys.indices.foreach(ki => expected += ((di, ki)): Unit)
    }
    joinConjuncts.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        def is(x: AttributeReference, rel: DataSourceV2Relation,
            name: String): Boolean =
          rel.outputSet.contains(x) && x.name.equalsIgnoreCase(name)
        val hit = expected.find { case (di, ki) =>
          val (dRel, _, keys, _) = resolved(di)
          val (fk, dk) = keys(ki)
          (is(a, factRel, fk) && is(b, dRel, dk)) ||
            (is(b, factRel, fk) && is(a, dRel, dk))
        }.getOrElse(return None)
        expected -= hit: Unit
      case _ => return None
    }
    if (expected.nonEmpty) return None

    // ambiguity guard: every referenced column name must identify ONE
    // relation — the MV's column mapping is by name, so a name present
    // on two sides could bind to the wrong source
    val allRels = factRel +: resolved.map(_._1)
    val referenced = (agg.references ++
      factCond.map(_.references).getOrElse(Nil) ++
      resolved.flatMap(_._2).flatMap(_.references))
      .map(a => lc(a.name)).toSet
    if (referenced.exists(n =>
        allRels.count(_.output.exists(o => lc(o.name) == n)) > 1))
      return None

    // side filters: IsNotNull(<that side's join key>) conjuncts are
    // the optimizer's inferred constraints — an INNER equi-join never
    // emits null-keyed rows, so the MV's content already excludes
    // them: drop. Every other conjunct must be deterministic over MV
    // group columns and re-applies on the MV.
    val groupNameSet = groupCols.map(lc).toSet
    def admit(cond: Option[Expression], rel: DataSourceV2Relation,
        keyNames: Seq[String]): Option[Seq[Expression]] = cond match {
      case None => Some(Nil)
      case Some(c) =>
        val parts = splitConjunctivePredicates(c).map {
          case IsNotNull(a: AttributeReference)
              if rel.outputSet.contains(a) &&
                keyNames.exists(a.name.equalsIgnoreCase) => Some(Nil)
          case other if other.deterministic &&
              other.references.forall(x =>
                groupNameSet.contains(lc(x.name))) =>
            remapToMv(mvRel, other).map(Seq(_))
          case _ => None
        }
        if (parts.exists(_.isEmpty)) None
        else Some(parts.flatMap(_.get))
    }
    val factKeyNames = resolved.flatMap(_._3.map(_._1))
    val conjuncts =
      admit(factCond, factRel, factKeyNames).getOrElse(return None) ++
        resolved.flatMap { case (rel, cond, keys, _) =>
          admit(cond, rel, keys.map(_._2)).getOrElse(return None)
        }
    val mvChild: LogicalPlan =
      if (conjuncts.isEmpty) mvRel
      else Filter(conjuncts.reduce(
        org.apache.spark.sql.catalyst.expressions.And(_, _)), mvRel)
    buildRewrite(agg, mvRel, groupCols, aggSpecs, mvChild)
  }

  /** The shared re-aggregation core: grouping-subset gate, decomposable
    * aggregate re-expression, and exprId/name-preserving output. */
  private def buildRewrite(agg: Aggregate, mvRel: DataSourceV2Relation,
      groupCols: Seq[String], aggSpecs: Map[(String, String), String],
      mvChild: LogicalPlan): Option[LogicalPlan] = {
    // grouping must be bare attributes forming a SUBSET of the MV group
    // set: an exact match serves the MV rows one-to-one; a strict
    // subset is a ROLL-UP (the dashboard case: MV grouped by (day, k)
    // answering GROUP BY day) — sound because every rewritten aggregate
    // below is a re-aggregation over the MV's partials (SUM of sums,
    // MIN of mins, SUM(count) partials), which collapses any number of
    // MV rows per output group
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (!groupAttrs.map(a => lc(a.name)).toSet
        .subsetOf(groupCols.map(lc).toSet))
      return None

    // re-express one aggregate call decomposably over the MV
    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      // COUNT(DISTINCT <MV group column>) is EXACT from the MV no
      // matter how many partial rows per group the MV holds: the MV
      // carries every base group's value (NULL groups included, and
      // COUNT(DISTINCT) drops NULL identically on both sides), so
      // distinctness over a GROUP column is the same computed over MV
      // rows as over base rows (VERDICT r15 item 8). Every other
      // DISTINCT — and any FILTER clause — still refuses below: a
      // distinct over a non-group VALUE column is not reconstructible
      // from partials.
      ae.aggregateFunction match {
        case Count(Seq(a: AttributeReference))
            if ae.isDistinct && ae.filter.isEmpty &&
              groupCols.map(lc).contains(lc(a.name)) =>
          return mvAttr(mvRel, a.name)
            .map(c => AggregateExpression(Count(Seq(c)), ae.mode,
              isDistinct = true): Expression)
            .filter(_.dataType == ae.dataType)
        case _ => ()
      }
      if (ae.isDistinct || ae.filter.isDefined) return None
      def spec(fn: String, src: String): Option[AttributeReference] =
        aggSpecs.get((fn, lc(src))).flatMap(mvAttr(mvRel, _))
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
          val m = mvAttrTyped(mvRel, a).getOrElse(return None)
          Alias(m, a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name) =>
          val ne = rewriteAgg(ae).getOrElse(return None)
          Alias(ne, name)(exprId = al.exprId)
        case al @ Alias(a: AttributeReference, name)
            if groupAttrs.exists(_.exprId == a.exprId) =>
          val m = mvAttrTyped(mvRel, a).getOrElse(return None)
          Alias(m, name)(exprId = al.exprId)
        case _ => return None
      }
    val newGroups: Seq[Expression] =
      groupAttrs.map(a => mvAttrTyped(mvRel, a).getOrElse(return None))

    logInfo(s"MvRewrite: serving aggregate from materialized view " +
      s"${mvRel.table.name()}")
    Some(Aggregate(newGroups, newResults, mvChild))
  }
}
