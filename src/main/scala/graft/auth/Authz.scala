package graft.auth

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.catalog.GraftCatalog

/** Query-time read authorization — the reference's
  * `authorize_logical_plan` walk (statement_plan/authz.rs): every scan
  * in the ANALYZED plan (including expression subqueries) resolves to a
  * target — the catalog table's name when the scan sits under its
  * registration alias, else the scanned paths — and the caller needs
  * SELECT on each. Runs before execution; super-user skips. */
object Authz {

  import Auth._

  final class PermissionDenied(msg: String) extends SecurityException(msg)

  def authorizeRead(catalog: GraftCatalog, store: AuthStore,
      identity: AuthIdentity, df: DataFrame): Unit =
    authorizeReadPlan(catalog, store, identity, df.queryExecution.analyzed)

  /** same check over an already-analyzed plan — for paths that must
    * authorize WITHOUT constructing a Dataset (schema-at-prepare) */
  def authorizeReadPlan(catalog: GraftCatalog, store: AuthStore,
      identity: AuthIdentity,
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    if (identity.isSuperUser) return
    val targets = scanTargets(catalog, analyzed)
    targets.foreach {
      case t @ Target.Table(n) =>
        if (!store.isAllowed(identity.roles, "SELECT", t))
          throw new PermissionDenied(s"permission denied: SELECT on TABLE $n")
      case t @ Target.Path(p) =>
        if (!store.isAllowed(identity.roles, "SELECT", t))
          throw new PermissionDenied(s"permission denied: SELECT on PATH '$p'")
    }
  }

  /** one target per scan: catalog-table name (subtree skipped — its
    * internals are covered by the table grant) or raw scan paths;
    * an unrecognizable relation denies by construction.
    *
    * An alias is only a table BOUNDARY when the plan beneath it is the
    * table's registered plan — aliases are user-controlled, so
    * `FROM denied_t AS granted_t` must NOT authorize as granted_t
    * (ADVICE r7 high). On mismatch the walk continues into the child
    * and the real scans are authorized. */
  private[auth] def scanTargets(catalog: GraftCatalog, plan: LogicalPlan): Seq[Target] = {
    val tableNames = catalog.tables().map(_.name).toSet
    // registered definition per candidate table (canonicalized, memoized);
    // unresolvable → None → never a boundary (deny-safe)
    val defs = scala.collection.mutable.Map.empty[String, Option[LogicalPlan]]
    def defPlan(n: String): Option[LogicalPlan] = defs.getOrElseUpdate(n,
      try catalog.spark.table(n).queryExecution.analyzed match {
        case SubqueryAlias(_, child) => Some(child.canonicalized)
        case p => Some(p.canonicalized)
      } catch { case scala.util.control.NonFatal(_) => None })
    val out = scala.collection.mutable.ListBuffer.empty[Target]
    def walk(p: LogicalPlan): Unit = p match {
      case s: SubqueryAlias if tableNames(s.alias) &&
          defPlan(s.alias).contains(s.child.canonicalized) =>
        out += Target.Table(s.alias)
      case lr: LogicalRelation =>
        lr.catalogTable match {
          case Some(ct) => out += Target.Table(ct.identifier.table)
          case None => lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.foreach(rp =>
                out += Target.Path(norm(rp.toString)))
            case other =>
              // default-deny: no rule can match this sentinel
              out += Target.Table(s"<unresolvable relation ${other.getClass.getSimpleName}>")
          }
        }
      case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        // ATTACH mounts (and any other V2 scan): file-backed tables are
        // authorized by their paths, everything else is default-deny
        val unwrapped = v2.table match {
          case ro: graft.catalog.Attachments.ReadOnlyTable => ro.underlying
          case t => t
        }
        unwrapped match {
          case ft: org.apache.spark.sql.execution.datasources.v2.FileTable =>
            ft.fileIndex.rootPaths.foreach(rp =>
              out += Target.Path(norm(rp.toString)))
          case t =>
            out += Target.Table(s"<v2 relation ${t.name}>")
        }
      case other =>
        other.children.foreach(walk)
        other.expressions.foreach(_.foreach {
          case sq: SubqueryExpression => walk(sq.plan)
          case _ => ()
        })
    }
    walk(plan)
    out.toList.distinct
  }

  private def norm(p: String): String = {
    val s = p.stripPrefix("file:")
    if (s.startsWith("//")) s.replaceFirst("^/+", "/") else s
  }
}
