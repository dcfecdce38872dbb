package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-aggregate navigation: a Catalyst optimizer rule that
  * rewrites an `Aggregate` written against a RAW fact table onto a
  * registered, pre-aggregated summary table whenever the query is
  * derivable from it — grouping keys a (function of a) subset of the
  * summary's keys, filters touching only key-derived expressions, and
  * every aggregate a re-aggregable partial (SUM→SUM, COUNT→SUM of the
  * partial count, MIN→MIN, MAX→MAX).
  *
  * This is the reference's DWS/ADS split made automatic: the Flink jobs
  * write day-grain pre-aggregates to Doris and the publisher's SQL reads
  * the summary table BY NAME (`dws_trade_province_order_window` etc.,
  * reference TradeStatsMapper.java:16-22). Here the serving query keeps
  * the raw-table semantics — the optimizer proves derivability and swaps
  * the scan. At 100 TB that turns a full fact-table pass into a
  * metadata-sized summary read; the rewrite is sound because it fires
  * only on exact canonical-expression matches, and every non-derivable
  * shape (DISTINCT aggregates, FILTER clauses, non-key predicates,
  * unknown scan) falls through to the raw plan untouched.
  *
  * Two deployment routes, same rule object:
  *  - cluster-wide: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (injected via `injectOptimizerRule`, see [[GraftExtensions]]);
  *  - embedded: [[AggRewrite.enable]] adds the rule to
  *    `spark.experimental.extraOptimizations` for one session.
  * Summaries are registered per-session ([[AggRewrite.register]] /
  * [[AggRewrite.materialize]]); sessions with no registrations pay one
  * map lookup and are otherwise untouched.
  */
object AggRewrite {

  /** One registered summary: canonical key/measure definitions over the
    * base relation, the analyzed scan of the materialized table, and the
    * base's file-listing signature at registration time (freshness). */
  final case class SummaryDef(
      name: String,
      basePaths: Set[String],
      keyDefs: Map[String, Expression], // summary col -> canon(def over base)
      measureDefs: Seq[(String, String, Expression)], // (col, op, canon child)
      summaryRelation: LogicalPlan,
      baseSig: String,
      rowCount: Long, // summary cardinality — the cost-based tiebreak
      // original column specs + layout, kept for partition-level refresh
      keyCols: Seq[(String, Column)] = Nil,
      measureCols: Seq[(String, String, Column)] = Nil,
      path: Option[String] = None,
      partitionKey: Option[String] = None)

  private val registry = TrieMap.empty[SparkSession, Vector[SummaryDef]]

  /** Canonical form of an expression over a single base relation:
    * attributes become NAME-carrying literal markers (names are unique
    * within one parquet schema; Catalyst's canonicalizer would erase the
    * name and make every attribute compare equal), aliases are stripped,
    * then the canonicalizer normalizes commutative shapes. */
  private def canon(e: Expression): Expression =
    e.transformUp {
      case al: Alias => al.child
      case a: AttributeReference =>
        Literal(org.apache.spark.unsafe.types.UTF8String
          .fromString("__graft_attr:" + a.name),
          org.apache.spark.sql.types.StringType)
    }.canonicalized

  /** Digest of the base's current data files (path, length, mtime) —
    * the staleness fence: a summary registered before the base changed
    * must NOT serve a query written against the changed base, so the
    * rewrite re-lists and falls through (to the always-correct raw
    * plan) on any mismatch. The listing is driver-side and O(files),
    * the same work Catalyst's own FileIndex does for every scan of the
    * base — and the fall-through path would pay a full fact-table READ,
    * so the listing is never the expensive side. The reference's Doris
    * DWS tables are continuously refreshed by the stream (staleness =
    * one micro-batch); this model re-materializes per refresh and the
    * fence makes the in-between window serve raw truth, never stale
    * aggregates. */
  private def digest(entries: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def statusEntry(st: org.apache.hadoop.fs.FileStatus): String =
    // scheme-less path so snapshot and live forms compare equal
    s"${st.getPath.toUri.getPath}:${st.getLen}:${st.getModificationTime}"

  /** LIVE listing of the base's current data files — the match-time side
    * of the fence. */
  private def baseSignature(session: SparkSession,
      paths: Set[String]): String = {
    val conf = session.sessionState.newHadoopConf()
    def ls(fs: org.apache.hadoop.fs.FileSystem,
        st: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.flatMap(ls(fs, _))
      else if (st.getPath.getName.startsWith("_") ||
        st.getPath.getName.startsWith(".")) Nil
      else Seq(statusEntry(st))
    digest(paths.toSeq.sorted.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) ls(fs, fs.getFileStatus(path))
      else Seq(s"$p:absent")
    })
  }

  /** SNAPSHOT signature of the files a base DataFrame actually reads —
    * the registration-time side of the fence. A DataFrame's FileIndex
    * lists once at construction; signing THAT listing (not the live
    * filesystem) closes the TOCTOU window where files land between the
    * snapshot the summary was built from and the registration call —
    * the live form would bless a summary missing those rows. */
  private def snapshotSignature(session: SparkSession,
      base: DataFrame): String = {
    val idx = base.queryExecution.analyzed.collectLeaves().collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location
      }
    }
    idx match {
      case Some(p: org.apache.spark.sql.execution.datasources
          .PartitioningAwareFileIndex) =>
        digest(p.allFiles().map(statusEntry))
      case Some(other) =>
        // no snapshot listing exposed: fall back to live (window stays)
        baseSignature(session, other.rootPaths.map(_.toString).toSet)
      case None => throw new IllegalArgumentException(
        "base must be a file-source relation")
    }
  }

  private def leafPaths(p: LogicalPlan): Option[Set[String]] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).toSet)
      case _ => None
    }
    case s: SubqueryAlias => leafPaths(s.child)
    case _ => None
  }

  /** Peel Project/Filter/SubqueryAlias down to a single file-source leaf:
    * (alias substitution to base terms, filter conditions as written,
    * leaf paths). None when any other operator intervenes — the sound
    * bail-out. Shared by registration and matching so both phrase every
    * expression over the SAME base attributes (e.g. through the events
    * ts-normalization projection in [[graft.Tables]]). */
  private def peel(plan: LogicalPlan)
      : Option[(Map[ExprId, Expression], Vector[Expression], Set[String])] = {
    var cur = plan
    var sub = Map.empty[ExprId, Expression]
    val filters = Vector.newBuilder[Expression]
    while (true) cur match {
      case s: SubqueryAlias => cur = s.child
      case v: View => cur = v.child // temp views in SQL-text queries
      case f: Filter => filters += f.condition; cur = f.child
      case p: Project =>
        sub ++= p.projectList.collect { case al @ Alias(c, _) =>
          al.exprId -> c
        }
        cur = p.child
      case lr: LogicalRelation =>
        return leafPaths(lr).map(paths => (sub, filters.result(), paths))
      case _ => return None
    }
    None // unreachable
  }

  /** Substitute project aliases until the expression is phrased over the
    * leaf's own attributes (bounded; alias chains are shallow). */
  private def resolveVia(sub: Map[ExprId, Expression])(e: Expression)
      : Expression = {
    var x = e
    var i = 0
    while (i < 10 && x.exists {
        case a: AttributeReference => sub.contains(a.exprId)
        case _ => false
      }) {
      x = x.transformUp {
        case a: AttributeReference => sub.getOrElse(a.exprId, a)
      }
      i += 1
    }
    x
  }

  /** Register a summary for `session`. `keys` / `measures` define each
    * summary column as an expression over `base`'s columns; `summary` is
    * the scan of the materialized table whose rows are
    * `base.groupBy(keys).agg(partials)`. Ops: sum | min | max | count
    * (non-null count of the child) | count_star. The caller owns the
    * contract that the summary data matches the definitions —
    * [[materialize]] builds both from one spec so they cannot drift. */
  def register(session: SparkSession, name: String, base: DataFrame,
      keys: Seq[(String, Column)], measures: Seq[(String, String, Column)],
      summary: DataFrame, path: Option[String] = None,
      partitionKey: Option[String] = None): Unit = {
    // analyze the defining expressions in the base's own context, then
    // resolve them down to the leaf relation's attributes so canonical
    // forms match what matching computes for candidate plans
    val probe = base.select(
      (keys.map { case (n, c) => c.as(n) } ++
        measures.map { case (n, _, c) => c.as(n) }): _*)
    val analyzed = probe.queryExecution.analyzed
    val (sub, probeFilters, paths) = peel(analyzed match {
      case Project(_, child) => child
      case other => other
    }).getOrElse(throw new IllegalArgumentException(
      "base must be Project/Filter chains over one file-source relation"))
    require(probeFilters.isEmpty,
      "base must not carry filters — register the full-table summary")
    val defs: Map[String, Expression] = analyzed match {
      case Project(list, _) =>
        list.collect { case al @ Alias(child, _) =>
          al.name -> canon(resolveVia(sub)(child))
        }.toMap
      case other => throw new IllegalStateException(
        s"unexpected probe plan shape: ${other.nodeName}")
    }
    val d = SummaryDef(name, paths,
      keys.map { case (n, _) => n -> defs(n) }.toMap,
      // count_star's placeholder column is irrelevant to matching —
      // normalize its def so count(*)/count(1) queries always find it
      // whatever literal the caller registered with
      measures.map { case (n, op, _) =>
        (n, op, if (op == "count_star") canon(Literal(1)) else defs(n))
      },
      summary.queryExecution.analyzed,
      snapshotSignature(session, base),
      summary.count(), // one metadata-sized count; the selection cost
      keys, measures, path, partitionKey)
    // registrations pin their session (the summary plan references it);
    // evict sessions whose context has stopped so a long-lived service
    // registering per-session summaries doesn't accumulate dead ones —
    // live sessions still need an explicit clear() on retirement
    registry.keys.filter(_.sparkContext.isStopped)
      .foreach(registry.remove)
    registry.updateWith(session) {
      case Some(v) => Some(v.filterNot(_.name == name) :+ d)
      case None => Some(Vector(d))
    }
  }

  /** Build the summary `base.groupBy(keys).agg(partials)` from the same
    * spec used for matching, write it to `path` (overwrite), read it
    * back, and register it — definition and data from one source. */
  def materialize(session: SparkSession, name: String, base: DataFrame,
      keys: Seq[(String, Column)], measures: Seq[(String, String, Column)],
      path: String, partitionBy: Option[String] = None): DataFrame = {
    val rows = summaryRows(base, keys, measures)
    val w = rows.write.mode("overwrite")
    partitionBy.fold(w)(w.partitionBy(_)).parquet(path)
    // read back with the WRITTEN schema: partition-column type inference
    // would otherwise re-type a date-like partitioned key (e.g. a
    // 'yyyy-MM-dd' day string comes back DATE) and the rewritten plan's
    // schema would silently drift from the raw plan's
    val summary = session.read.schema(rows.schema).parquet(path)
    register(session, name, base, keys, measures, summary,
      Some(path), partitionBy)
    summary
  }

  private def summaryRows(base: DataFrame, keys: Seq[(String, Column)],
      measures: Seq[(String, String, Column)]): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, max, min, sum}
    val partials = measures.map {
      case (n, "sum", c) => sum(c).as(n)
      case (n, "min", c) => min(c).as(n)
      case (n, "max", c) => max(c).as(n)
      case (n, "count", c) => count(c).as(n)
      case (n, "count_star", _) => count(lit(1)).as(n)
      case (n, op, _) => throw new IllegalArgumentException(
        s"unsupported partial op '$op' for measure '$n'")
    }
    base.groupBy(keys.map { case (n, c) => c.as(n) }: _*)
      .agg(partials.head, partials.tail: _*)
  }

  /** Partition-level refresh — the production loop at 100 TB, where a
    * CDC batch touches a handful of days and full re-materialization
    * would re-aggregate the whole fact table. Recomputes summary rows
    * ONLY for the partition-key values in `values` (one predicate-pruned
    * base scan), lands them with dynamic partition overwrite, then
    * re-registers with a fresh base signature so navigation resumes.
    *
    * The residual risk of any partial refresh is the caller missing a
    * changed partition — the re-registration would bless a wrong
    * summary. Guard: before re-registering, the refreshed store's total
    * partial count must equal the base's current row count (metadata-
    * cheap on parquet). A missed partition whose row count changed is
    * caught and the refresh REFUSES to re-register — the old
    * registration stays stale, so navigation keeps falling through to
    * raw truth (sound). Blind spot, documented: an in-place mutation
    * that preserves a missed partition's row count passes the guard;
    * callers whose base mutates (rather than appends) should re-
    * materialize fully. Requires a `count_star` measure. */
  def refreshPartitions(session: SparkSession, name: String,
      base: DataFrame, values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum}
    val d = registry.get(session).flatMap(_.find(_.name == name))
      .getOrElse(throw new IllegalArgumentException(
        s"no summary '$name' registered for this session"))
    val pk = d.partitionKey.getOrElse(throw new IllegalArgumentException(
      s"summary '$name' was not materialized with a partition key"))
    val path = d.path.getOrElse(throw new IllegalStateException(
      s"summary '$name' has no recorded path"))
    val cntCol = d.measureCols.collectFirst {
      case (n, "count_star", _) => n
    }.getOrElse(throw new IllegalArgumentException(
      "partition refresh needs a count_star measure for reconciliation"))
    val pkExpr = d.keyCols.collectFirst { case (n, c) if n == pk => c }
      .getOrElse(throw new IllegalStateException(
        s"partition key '$pk' not among summary keys"))
    val fresh = summaryRows(
      base.filter(pkExpr.isin(values: _*)),
      d.keyCols, d.measureCols)
    // a named partition with NO remaining base rows cannot be landed by
    // dynamic overwrite (nothing overwrites the old files) — catch it
    // BEFORE writing, with the right advice
    val freshVals = fresh.select(col(pk)).distinct()
      .collect().map(_.get(0)).toSet
    val deleted = values.filterNot(freshVals.contains)
    if (deleted.nonEmpty) throw new IllegalStateException(
      s"partition(s) ${deleted.mkString(", ")} of '$name' have no " +
        "remaining base rows — dynamic overwrite cannot drop a " +
        "partition; re-materialize fully")
    fresh.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(pk).parquet(path)
    // explicit schema: see materialize — no partition-type re-inference
    val summary = session.read.schema(fresh.schema).parquet(path)
    val total = summary.agg(sum(col(cntCol))).head
    val stored = if (total.isNullAt(0)) 0L else total.getLong(0)
    val actual = base.count()
    if (stored != actual) {
      // leave the OLD (stale-signed) registration in place: navigation
      // keeps falling through, which is correct; the store is already
      // overwritten but never blessed
      throw new IllegalStateException(
        s"refresh reconciliation failed for '$name': summary counts " +
          s"$stored rows, base has $actual — a changed partition was " +
          "not refreshed; re-materialize fully")
    }
    register(session, name, base, d.keyCols, d.measureCols, summary,
      Some(path), Some(pk))
    summary
  }

  /** Explicit-rewrite route: apply the registered summaries to ONE
    * DataFrame's plan and return the (possibly) rewritten frame. This is
    * how an embedded caller opts a single query into navigation without
    * changing how every other query in the session plans — the suite's
    * x14/x15 run through here so the rest of the 214-query suite keeps
    * its recorded plans byte-stable. Session-wide deployments use
    * [[enable]] / [[GraftExtensions]] instead and never call this. */
  def navigate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    val rewritten = Rewrite(s)(analyzed)
    if (rewritten fastEquals analyzed) df
    else org.apache.spark.sql.graft.PlanDF.ofRows(s, rewritten)
  }

  /** Add the rule to one session's `experimental.extraOptimizations`
    * (idempotent). The extensions route does this cluster-wide instead. */
  def enable(session: SparkSession): Unit = {
    val cur = session.experimental.extraOptimizations
    // dedup by SESSION, not class: a cloned session inherits the
    // parent's Rewrite(parent) instance, which consults the parent's
    // registry — the clone still needs its own
    val mine = cur.exists {
      case r: Rewrite => r.session eq session
      case _ => false
    }
    if (!mine)
      session.experimental.extraOptimizations = cur :+ Rewrite(session)
  }

  def clear(session: SparkSession): Unit = registry.remove(session)

  /** Drop ONE registration by name (tests and rotating summaries). */
  def unregister(session: SparkSession, name: String): Unit =
    registry.updateWith(session) {
      case Some(v) =>
        val rest = v.filterNot(_.name == name)
        if (rest.isEmpty) None else Some(rest)
      case None => None
    }

  /** The rule proper. Fires only on sessions with registrations. */
  final case class Rewrite(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      registry.get(session) match {
        case None | Some(Vector()) => plan
        case Some(defs) =>
          plan.transformUp {
            case agg: Aggregate =>
              // cost-based selection: of every summary the query is
              // derivable from, read the SMALLEST (a priority-only
              // rollup beats the (day, priority) grain for a
              // priority-only query — fewer rows, same answer)
              val candidates = defs.sortBy(_.rowCount)
              candidates.view.flatMap(d => tryRewrite(session, agg, d))
                .headOption.getOrElse(agg)
          }
      }
  }
  /** Attempt one Aggregate → summary rewrite; None = leave untouched.
    * Dispatches on the Aggregate's child: a plain Project/Filter chain
    * (simple GROUP BY) or an Expand (ROLLUP/CUBE/GROUPING SETS). */
  private def tryRewrite(session: SparkSession, agg: Aggregate,
      d: SummaryDef): Option[Aggregate] = {
    var under = agg.child
    while (under.isInstanceOf[SubqueryAlias] || under.isInstanceOf[View])
      under = under.children.head
    under match {
      case e: Expand => Ctx.build(session, e.children.head, d)
        .flatMap(_.rewriteExpand(agg, e))
      case _ => Ctx.build(session, agg.child, d)
        .flatMap(_.rewriteSimple(agg))
    }
  }

  /** Shared per-(candidate, summary) matching context: the peeled
    * substitution, the fresh summary instance, canonical key/measure
    * lookup, and the aggregate/key expression mappers. */
  private final class Ctx(
      session: SparkSession,
      d: SummaryDef,
      val sub: Map[ExprId, Expression],
      val filters: Vector[Expression],
      val freshSummary: LogicalPlan,
      keyAttrByDef: Map[Expression, Attribute],
      measureAttr: Map[(String, Expression), Attribute]) {

    val resolve: Expression => Expression = resolveVia(sub) _
    private val summaryIds = freshSummary.output.map(_.exprId).toSet

    /** The staleness fence, checked LAST — only a query that would
      * otherwise rewrite pays the live file listing (a DISTINCT or
      * non-key query over a many-filed base costs nothing extra). Fall
      * through when the base's files changed since materialization: the
      * raw plan is always correct, a stale summary never is. */
    def fenceFresh: Boolean =
      baseSignature(session, d.basePaths) == d.baseSig

    // AVG is deliberately NOT derived: re-aggregating a double partial
    // sum reorders floating-point addition, so the navigated result
    // could differ in the last bits from the raw plan — the rewrite
    // must be bit-invisible. A caller who wants a navigable mean
    // phrases it as sum(x)/count(*), which derives exactly.
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      def reagg(f: AggregateFunction, a: Attribute) =
        AggregateExpression(
          f.withNewChildren(Seq(a)).asInstanceOf[AggregateFunction],
          ae.mode, isDistinct = false, None, NamedExpression.newExprId)
      def sumCounts(a: Attribute) =
        // coalesce keeps count's zero-on-empty + non-null contract
        Coalesce(Seq(
          AggregateExpression(Sum(a), ae.mode, isDistinct = false,
            None, NamedExpression.newExprId),
          Literal(0L)))
      val rebuilt: Option[Expression] = ae.aggregateFunction match {
        case f: Sum =>
          measureAttr.get(("sum", canon(resolve(f.child)))).map(reagg(f, _))
        case f: Min =>
          measureAttr.get(("min", canon(resolve(f.child)))).map(reagg(f, _))
        case f: Max =>
          measureAttr.get(("max", canon(resolve(f.child)))).map(reagg(f, _))
        // foldable AND non-null: count(lit(null)) is a constant ZERO
        // per group, not a row count — it must not map to count_star
        case f: Count if f.children.forall(c => c.foldable && !c.nullable) =>
          measureAttr.get(("count_star", canon(Literal(1)))).map(sumCounts)
        case f: Count if f.children.size == 1 =>
          measureAttr.get(("count", canon(resolve(f.children.head))))
            .map(sumCounts)
        case _ => None
      }
      // re-aggregation can widen the type (sum of a decimal sum); pin the
      // original type so the rewritten plan is schema-identical
      rebuilt.map(r =>
        if (r.dataType == ae.dataType) r else Cast(r, ae.dataType))
    }

    /** Generic mapper: aggregates first, then key-def subtrees; no base
      * attribute may survive unmapped. `passIds`: attributes allowed
      * through untouched (Expand group outputs in the rollup path). */
    def rw(e: Expression, passIds: Set[ExprId] = Set.empty)
        : Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference
          if passIds(a.exprId) || summaryIds(a.exprId) => Some(a)
      case _ =>
        keyAttrByDef.get(canon(resolve(e))) match {
          case Some(attr) => Some(attr)
          case None => e match {
            case a: AttributeReference =>
              sub.get(a.exprId) match {
                case Some(u) => rw(u, passIds)
                case None => None // raw base attr with no key mapping
              }
            case _ =>
              val kids = e.children.map(rw(_, passIds))
              if (kids.exists(_.isEmpty)) None
              else Some(e.withNewChildren(kids.map(_.get)))
          }
        }
    }

    def rewrittenFilterChild: Option[LogicalPlan] = {
      val mapped = filters.map(rw(_))
      if (mapped.exists(_.isEmpty)) None
      else Some(
        if (mapped.isEmpty) freshSummary
        else Filter(mapped.map(_.get).reduce(And), freshSummary))
    }

    /** Preserve each output NamedExpression's name and exprId so the
      * plan above the Aggregate keeps resolving. */
    def keepIdentity(orig: NamedExpression, rewritten: Expression)
        : Option[NamedExpression] = orig match {
      case al: Alias =>
        Some(Alias(rewritten, al.name)(al.exprId, al.qualifier,
          al.explicitMetadata))
      case ar: AttributeReference => rewritten match {
        case same: AttributeReference if same.exprId == ar.exprId =>
          Some(same)
        case _ => Some(Alias(rewritten, ar.name)(ar.exprId, ar.qualifier))
      }
      case _ => rewritten match {
        case ne: NamedExpression => Some(ne)
        case _ => None
      }
    }

    /** Plain GROUP BY over the base scan. */
    def rewriteSimple(agg: Aggregate): Option[Aggregate] = {
      if (agg.groupingExpressions.exists(!_.deterministic) ||
        agg.aggregateExpressions.exists(!_.deterministic)) return None
      val newGroup = agg.groupingExpressions.map(rw(_))
      if (newGroup.exists(_.isEmpty)) return None
      val newNamed = agg.aggregateExpressions.map { ne =>
        rw(ne).flatMap(keepIdentity(ne, _))
      }
      if (newNamed.exists(_.isEmpty)) return None
      if (!fenceFresh) return None
      rewrittenFilterChild.map { child0 =>
        agg.copy(groupingExpressions = newGroup.map(_.get),
          aggregateExpressions = newNamed.map(_.get), child = child0)
      }
    }

    /** ROLLUP / CUBE / GROUPING SETS: the analyzer plants an Expand
      * whose projections replicate each base row once per grouping set
      * (group expressions or typed nulls, plus the grouping-id
      * literal), with the base columns passed through for the
      * aggregates. The navigation keeps the Expand STRUCTURE — same
      * group output attributes, same null/grouping-id slots, so the
      * Aggregate's grouping expressions and grouping()/grouping_id()
      * calls are untouched — and re-roots it: group slots are rewritten
      * onto summary keys, the base pass-through columns are dropped,
      * and the summary measure columns the re-aggregated functions
      * need are passed through instead. Each summary row replicates
      * per grouping set exactly as each base row did, so every grain
      * re-aggregates from partials just like the simple path. */
    def rewriteExpand(agg: Aggregate, expand: Expand)
        : Option[Aggregate] = {
      if (agg.groupingExpressions.exists(!_.deterministic) ||
        agg.aggregateExpressions.exists(!_.deterministic)) return None
      // output slots the Aggregate actually groups on (incl. the
      // grouping-id column) keep their attributes; everything else is
      // base pass-through and gets dropped
      val groupIds = agg.groupingExpressions
        .flatMap(_.references.toSeq).map(_.exprId).toSet
      val keepIdx = expand.output.zipWithIndex.collect {
        case (a, i) if groupIds(a.exprId) => i
      }
      // rewrite the aggregate list first, collecting which summary
      // measure columns the re-aggregated functions reference
      val newNamed = agg.aggregateExpressions.map { ne =>
        rw(ne, passIds = groupIds).flatMap(keepIdentity(ne, _))
      }
      if (newNamed.exists(_.isEmpty)) return None
      val named = newNamed.map(_.get)
      val usedSummary: Seq[Attribute] = {
        val ids = scala.collection.mutable.LinkedHashMap
          .empty[ExprId, Attribute]
        named.foreach(_.foreach {
          case a: AttributeReference if summaryIds(a.exprId) =>
            ids.getOrElseUpdate(a.exprId, a); ()
          case _ => ()
        })
        ids.values.toSeq
      }
      // group slots: each projection carries the group expression, a
      // typed null, or the grouping-id literal — literals stay, group
      // expressions map onto summary keys
      val newProjections = expand.projections.map { proj =>
        val slots = keepIdx.map { i =>
          proj(i) match {
            case l: Literal => Some(l)
            case e => rw(e)
          }
        }
        if (slots.exists(_.isEmpty)) return None
        slots.map(_.get) ++ usedSummary
      }
      val newOutput = keepIdx.map(expand.output) ++ usedSummary
      if (!fenceFresh) return None
      rewrittenFilterChild.map { child0 =>
        agg.copy(aggregateExpressions = named,
          child = Expand(newProjections, newOutput, child0))
      }
    }
  }

  private object Ctx {
    /** Peel `child` to the summary's base scan and build the matching
      * context; None = not this summary's base (or freshness/shape
      * bail). */
    def build(session: SparkSession, child: LogicalPlan, d: SummaryDef)
        : Option[Ctx] = {
      val (sub, filters) = peel(child) match {
        case Some((s0, f0, paths)) if paths == d.basePaths => (s0, f0)
        case _ => return None
      }
      // a non-deterministic filter (rand() sampling) selects base ROWS,
      // not whole groups — never derivable from a per-group summary
      if (filters.exists(!_.deterministic)) return None
      val freshSummary = d.summaryRelation match {
        case m: MultiInstanceRelation => m.newInstance()
        case p => p
      }
      val sOut = freshSummary.output.map(a => a.name -> a).toMap
      val keyAttrByDef: Map[Expression, Attribute] =
        d.keyDefs.flatMap { case (n, defExpr) =>
          sOut.get(n).map(defExpr -> _)
        }
      val measureAttr: Map[(String, Expression), Attribute] =
        d.measureDefs.flatMap { case (n, op, c) =>
          sOut.get(n).map(a => (op, c) -> a)
        }.toMap
      if (keyAttrByDef.size != d.keyDefs.size ||
        measureAttr.size != d.measureDefs.size) None
      else Some(new Ctx(session, d, sub, filters, freshSummary,
        keyAttrByDef, measureAttr))
    }
  }
}
