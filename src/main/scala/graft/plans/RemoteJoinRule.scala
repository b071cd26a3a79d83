package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V2ScanRelationPushDown}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.remote.{RemoteJoinSpec, RemoteScan, RemoteTable}

/** Same-peer JOIN pushdown over the ATTACH wire: an equi-join of two
  * tables mounted from ONE remote peer runs ON the peer instead of
  * pulling both tables across the network and joining client-side —
  * the reference's "largest sub-plan pushed to the remote" for its
  * dominant case (docs/docs/2.0.0-rc2/sql/remote-tables.md:41-42,
  * beacon-datafusion-ext/src/remote/executor.rs).
  *
  * Seat: `spark.experimental.extraOptimizations` runs AFTER
  * V2ScanRelationPushDown, so each side arrives as an already-built
  * [[DataSourceV2ScanRelation]] holding a [[RemoteScan]] (per-side
  * pushed filters/columns consumed). The rewrite merges both sides
  * into ONE [[RemoteTable]] carrying a [[RemoteJoinSpec]] plus both
  * sides' wire filters, then re-invokes V2ScanRelationPushDown on the
  * result so everything ABOVE the join (remaining filters, column
  * pruning, aggregates, TopN) pushes into the joined relation too —
  * only the final output streams back.
  *
  * Fires only when provably equivalent:
  *  - both sides are remote scans (optionally under attribute-only
  *    Projects / residual Filters) on the SAME target with the SAME
  *    credential; the LEFT side may itself be an already-merged join
  *    chain (N-way joins fold left-to-right — the spec list grows by
  *    one per merge), and the RIGHT side may be a plain table or —
  *    for a bushy (A⋈B)⋈(C⋈D) shape — an already-merged chain, when
  *    the top join is INNER and its condition lands on the right
  *    chain's BASE table (the fold re-sequences the chain after the
  *    top spec, which only an inner-on-base top commutes with);
  *    neither side with a pushed limit/TopN/aggregate of its own (a
  *    limit under a join is order-sensitive — bail);
  *  - the condition is a conjunction of left-attr = right-attr
  *    equalities (the wire's closed join vocabulary);
  *  - column names across both sides are distinct (the wire addresses
  *    columns by name);
  *  - side predicates commute with the join: both sides hoist above an
  *    INNER join; for LEFT OUTER a right-side RESIDUAL predicate
  *    changes null-extension — bail (right-side WIRE filters ride the
  *    spec and re-apply pre-join, placement preserved).
  * Everything else is left to the normal two-scan client-side join —
  * narrower, never wrong.
  */
class RemoteJoinRule extends Rule[LogicalPlan] {

  /** one join side: its scan relation, the remote seat, residual
    * (client-side) filters to hoist, and the subtree's visible output */
  private case class Side(scan: RemoteScan, table: RemoteTable,
      filters: Seq[Expression], output: Seq[AttributeReference])

  /** a remote scan usable as a join side. `allowJoined` = the LEFT
    * side of a merge may itself be an already-merged join chain (the
    * fold accumulates left-to-right; the right side must be a plain
    * table — that is what the wire's closed spec names). */
  private def remoteLeaf(p: LogicalPlan, allowJoined: Boolean)
      : Option[(DataSourceV2ScanRelation, RemoteScan, RemoteTable)] =
    p match {
      case sr: DataSourceV2ScanRelation =>
        val t = sr.relation.table match {
          // attached mounts wrap tables read-only; unwrap to the seat
          case ro: graft.catalog.Attachments.ReadOnlyTable => ro.underlying
          case other => other
        }
        (sr.scan, t) match {
          case (rs: RemoteScan, rt: RemoteTable)
              if (allowJoined || rt.joins.isEmpty) &&
                rs.limit.isEmpty && rs.topNJson.isEmpty && rs.aggJson.isEmpty =>
            Some((sr, rs, rt))
          case _ => None
        }
      case _ => None
    }

  private def attrsOnly(exprs: Seq[NamedExpression]): Option[Seq[AttributeReference]] = {
    val as = exprs.map { case a: AttributeReference => Some(a); case _ => None }
    if (as.forall(_.isDefined)) Some(as.flatten) else None
  }

  /** unwrap attribute-only Project / Filter layers over a remote scan */
  private def extract(p: LogicalPlan, allowJoined: Boolean): Option[Side] = p match {
    case Project(projList, child) =>
      for {
        attrs <- attrsOnly(projList)
        s <- extract(child, allowJoined)
      } yield s.copy(output = attrs)
    case Filter(cond, child) =>
      extract(child, allowJoined).map(s =>
        s.copy(filters = splitConjuncts(cond) ++ s.filters))
    case _ => remoteLeaf(p, allowJoined).map { case (sr, rs, rt) =>
      Side(rs, rt, Nil, sr.output)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** a side's residual filters may reference columns the Project above
    * them pruned away (canonical post-pushdown shape: Project over
    * Filter over scan) — the merged relation must OUTPUT those
    * columns, or the hoisted filter becomes unbindable; the final
    * Project(j.output, …) trims them back after filtering */
  private def widen(s: Side): Side = {
    val have = s.output.map(_.exprId).toSet
    val missing = s.filters.flatMap(_.references)
      .collect { case a: AttributeReference if !have.contains(a.exprId) => a }
      .groupBy(_.exprId).values.map(_.head).toSeq
    if (missing.isEmpty) s else s.copy(output = s.output ++ missing)
  }

  /** condition → (leftCol, rightCol) name pairs, or None if any
    * conjunct is not a plain cross-side attribute equality */
  private def equiPairs(cond: Expression, leftOut: Seq[AttributeReference],
      rightOut: Seq[AttributeReference]): Option[Seq[(String, String)]] = {
    val leftIds = leftOut.map(_.exprId).toSet
    val rightIds = rightOut.map(_.exprId).toSet
    val pairs = splitConjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftIds.contains(a.exprId) && rightIds.contains(b.exprId) =>
        Some((a.name, b.name))
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if rightIds.contains(a.exprId) && leftIds.contains(b.exprId) =>
        Some((b.name, a.name))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    var fired = false
    val joined = plan.transformUp {
      case j @ Join(left, right, joinType @ (Inner | LeftOuter), Some(cond), hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        val rewritten = for {
          // left may itself be a merged chain (N-way joins fold
          // left-to-right); right may be a plain table OR — for a
          // bushy (A⋈B)⋈(C⋈D) shape — an already-merged chain,
          // guarded below
          ls0 <- extract(left, allowJoined = true)
          rs0 <- extract(right, allowJoined = true)
          // residual-filter references must survive into the merged
          // relation's output or hoisting them is unbindable
          ls = widen(ls0)
          rs = widen(rs0)
          // same peer, same identity: the server authorizes both tables
          // under ONE credential, so differing credentials must not
          // merge. The check keys on (target, credential) — NOT the
          // attachment instance's session token (r12): two ATTACHes of
          // one physical peer under one identity are the same source
          // (the reference's federation rule keys on the source), and
          // the merged scan's token-expiry path already re-auths with
          // the shared credential if the chosen session token died
          if ls.table.target == rs.table.target &&
            ls.table.credential == rs.table.credential
          on <- equiPairs(cond, ls.output, rs.output)
          if on.nonEmpty
          // bushy merge (right side is itself a chain): the fold
          // inserts the top spec BEFORE the right chain's own specs,
          // so (1) the top condition must land entirely on the right
          // chain's BASE table (the wire addresses a spec's right
          // columns on table2 alone), and (2) the top join must be
          // INNER — a left-outer over a chained right does not
          // commute with re-sequencing the chain's null-extension
          if rs.table.joins.isEmpty ||
            (joinType == Inner &&
              on.forall { case (_, r) => rs.table.baseColumns.contains(r) })
          // the wire addresses columns by name and the SERVER joins the
          // FULL tables — so unambiguity must hold over every
          // participating table's whole schema (this also rejects
          // same-peer self-joins, whose names all collide), not just
          // the pruned client outputs; Spark resolves names
          // case-insensitively by default, so `ID` vs `id` is a
          // collision too — compare case-folded
          names = (ls.table.participantColumns ++
            rs.table.participantColumns).map(_.toLowerCase(java.util.Locale.ROOT))
          if names.distinct.length == names.length
          // LEFT OUTER: a right-side RESIDUAL predicate can neither
          // hoist (changes null-extension) nor cross the wire
          // (inexpressible) — bail; right-side WIRE filters ride the
          // join spec and re-apply pre-join, placement preserved
          if joinType == Inner || rs.filters.isEmpty
        } yield {
          val joinTypeName = if (joinType == Inner) "inner" else "left"
          // join output nullability: left outer null-extends the right
          val outAttrs = ls.output ++ (if (joinType == LeftOuter)
            rs.output.map(_.withNullability(true)) else rs.output)
          val schema = StructType(outAttrs.map(a =>
            StructField(a.name, a.dataType, a.nullable, a.metadata)))
          // a bushy right chain's accumulated filters reference ANY of
          // its tables, so they can't ride the base-table spec — they
          // re-apply to the final joined frame instead (exact: the
          // top join is INNER in the bushy case, and an inner join
          // commutes with right-operand selection)
          val bushy = rs.table.joins.nonEmpty
          val joinedTable = new RemoteTable(ls.table.target, ls.table.credential,
            ls.table.sessionToken, ls.table.table, schema,
            ls.table.parallelism,
            // right-side wire filters ride the join spec (pre-join
            // placement — exact for LEFT OUTER, equivalent for INNER);
            // left-side ones re-apply to the joined frame, where the
            // server's own Catalyst pushes them back below the join.
            // ls.scan.pushedJson already folds a merged left side's
            // accumulated baseFilters, so chains lose nothing. A
            // bushy right contributes its base spec (carrying the
            // TOP join's condition) followed by its own spec list —
            // the wire contract already folds left-to-right.
            ls.table.joins ++ (RemoteJoinSpec(rs.table.table, on, joinTypeName,
              if (bushy) Nil else rs.scan.pushedJson) :: rs.table.joins),
            ls.scan.pushedJson ++ (if (bushy) rs.scan.pushedJson else Nil),
            Some(ls.table.participantColumns ++ rs.table.participantColumns),
            Some(ls.table.baseColumns))
          val rel = new DataSourceV2Relation(joinedTable, outAttrs, None, None,
            CaseInsensitiveStringMap.empty(), None)
          // residual side filters hoist above the joined relation;
          // the re-run pushdown re-attempts them across the wire
          val hoisted = ls.filters ++ (if (joinType == Inner) rs.filters else Nil)
          val base: LogicalPlan =
            if (hoisted.isEmpty) rel
            else Filter(hoisted.reduce(And), rel)
          fired = true
          // preserve the Join node's exact output order
          if (base.output == j.output) base else Project(j.output, base)
        }
        rewritten.getOrElse(j)
    }
    // the merged relation is a fresh DataSourceV2Relation created after
    // the optimizer's own pushdown batch already ran — re-invoke it so
    // filters/pruning/aggregates/TopN above the join push into the
    // joined scan (idempotent: already-built ScanRelations don't match)
    if (fired) V2ScanRelationPushDown(joined) else joined
  }
}
