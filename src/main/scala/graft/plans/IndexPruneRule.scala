package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._

import graft.catalog.{GraftCatalog, Indexes}

/** Marker FileIndex: a scan whose file list was already shrunk by
  * [[IndexPruneRule]] (the rule batch runs to fixed point — the marker
  * makes the rewrite idempotent). */
class IndexPrunedFileIndex(spark: SparkSession,
    keptFiles: Seq[org.apache.hadoop.fs.Path],
    parameters: Map[String, String],
    schema: Option[StructType])
  extends InMemoryFileIndex(spark, keptFiles, parameters, schema)

/** Plan-time file pruning through the table's secondary indexes
  * ([[Indexes]]; reference managed-tables.md §CREATE INDEX): a
  * `Filter` directly over a file scan of an indexed table consults the
  * btree/bitmap/inverted structures and re-plans the scan over only
  * the files that can match — tasks for pruned files never exist.
  * Registered per engine via `spark.experimental.extraOptimizations`
  * (the user-rule seat of SparkSessionExtensions.injectOptimizerRule,
  * available without a session restart).
  *
  * Conservative everywhere: only conjuncts on indexed columns
  * contribute, unknown files are kept, the Filter itself stays in the
  * plan (pruning is a file-list refinement, never a semantic rewrite).
  * Bucketed/partitioned relations are left alone — they have their own
  * pruning paths.
  */
class IndexPruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation] && {
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          fs.partitionSchema.isEmpty && fs.bucketSpec.isEmpty &&
            !fs.location.isInstanceOf[IndexPrunedFileIndex]
        } =>
      val fs = lr.relation.asInstanceOf[HadoopFsRelation]
      indexedTableFor(fs) match {
        case None => f
        case Some((catalog, table)) =>
          val dropped = droppedByIndexes(catalog, table, cond, lr)
          if (dropped.isEmpty) f
          else {
            val all = fs.location.inputFiles.toSeq
            val kept = all.filterNot(p => dropped(Indexes.norm(p)))
            if (kept.size == all.size) f
            else {
              val pruned = new IndexPrunedFileIndex(catalog.spark,
                kept.map(new org.apache.hadoop.fs.Path(_)),
                fs.options, Some(fs.dataSchema))
              f.copy(child = lr.copy(relation =
                fs.copy(location = pruned)(catalog.spark)))
            }
          }
      }
  }

  /** the indexed table owning this scan: single root = a managed data
    * directory (or one external path); multiple roots = a glob-defined
    * external table, matched only when EVERY root belongs to the same
    * table (a scan mixing sources is never index-pruned) */
  private def indexedTableFor(fs: HadoopFsRelation)
      : Option[(GraftCatalog, String)] = {
    val roots = fs.location.rootPaths.map(p => Indexes.norm(p.toString))
    roots.headOption.flatMap(IndexPruneRule.lookup).filter { case (c, t) =>
      roots.forall(r => c.indexedTableAt(r).contains(t))
    }
  }

  private def droppedByIndexes(catalog: GraftCatalog, table: String,
      cond: Expression, lr: LogicalRelation): Set[String] = {
    val byColumn = catalog.indexes(table).groupBy(_.column)
    lazy val metas = lrFileMeta(lr)
    // the verdict is a pure function of (index structure, candidate
    // files+identities, condition) — key all three so a dashboard
    // refiring the same predicate, or a plan with N eligible Filter
    // nodes, pays the distributed postings/stats job once per session
    // instead of once per optimization (VERDICT r7 hardening #1)
    lazy val metaDigest = java.util.Arrays.hashCode(
      metas.sortBy(_.path).map(m => (m.path, m.size, m.mtime).hashCode)
        .toArray[Int])
    conjuncts(cond).flatMap(extractCond(_, lr)).flatMap { c =>
      byColumn.getOrElse(c.column, Seq.empty).flatMap { idx =>
        val applies = (idx.kind, c) match {
          case ("btree", _: Indexes.RangeCond)  => true
          case ("bitmap", _: Indexes.EqCond)    => true
          case ("inverted", _: Indexes.TokenCond) => true
          case ("inverted", _: Indexes.TokenEqCond) => true
          case _ => false
        }
        if (!applies) Set.empty[String]
        else {
          val dir = catalog.indexDataDir(table, idx.name)
          val key = (catalog.warehouse, table, idx.name, idx.kind,
            IndexPruneRule.indexVersion(dir), c, metaDigest)
          IndexPruneRule.cachedVerdict(key) {
            Indexes.droppedFiles(catalog.spark, dir, idx.kind, metas, c)
          }
        }
      }
    }.toSet
  }

  /** live (path, size, mtime) from the scan's own cached listing — the
    * identity check that vetoes pruning files overwritten since build */
  private def lrFileMeta(lr: LogicalRelation): Seq[Indexes.FileMeta] =
    lr.relation.asInstanceOf[HadoopFsRelation].location.listFiles(Nil, Nil)
      .flatMap(_.files.map(f => Indexes.FileMeta(
        f.getPath.toString, f.getLen, f.getModificationTime)))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** a conjunct this rule understands: <attr> <op> <literal> shapes on
    * a single column, plus contains/LIKE-'%term%' for inverted */
  private def extractCond(e: Expression, lr: LogicalRelation): Seq[Indexes.IndexCond] = {
    def name(a: Expression): Option[String] = a match {
      case ar: AttributeReference => Some(ar.name)
      case _ => None
    }
    def range(a: Expression, op: String, lit: Literal): Seq[Indexes.IndexCond] =
      name(a).toSeq.flatMap { n =>
        lit.dataType match {
          case _: NumericType =>
            Seq(Indexes.RangeCond(n, op,
              Some(lit.value.toString.toDouble), None))
          case StringType =>
            Seq(Indexes.RangeCond(n, op, None, Some(lit.value.toString)))
          case _ => Seq.empty
        }
      }
    def eq(a: Expression, lit: Literal): Seq[Indexes.IndexCond] =
      name(a).toSeq.flatMap { n =>
        // equality serves btree (range) AND bitmap (exact value, keyed
        // by the same Spark cast-to-string the build used)
        val asStr = Cast(lit, StringType).eval()
        val bitmap =
          if (asStr == null) Seq.empty
          else Seq(Indexes.EqCond(n, asStr.toString))
        range(a, "eq", lit) ++ bitmap
      }
    val flip = Map("lt" -> "gt", "lte" -> "gte", "gt" -> "lt", "gte" -> "lte")
    e match {
      case EqualTo(a, l: Literal) => eq(a, l)
      case EqualTo(l: Literal, a) => eq(a, l)
      case LessThan(a, l: Literal) => range(a, "lt", l)
      case LessThan(l: Literal, a) => range(a, flip("lt"), l)
      case LessThanOrEqual(a, l: Literal) => range(a, "lte", l)
      case LessThanOrEqual(l: Literal, a) => range(a, flip("lte"), l)
      case GreaterThan(a, l: Literal) => range(a, "gt", l)
      case GreaterThan(l: Literal, a) => range(a, flip("gt"), l)
      case GreaterThanOrEqual(a, l: Literal) => range(a, "gte", l)
      case GreaterThanOrEqual(l: Literal, a) => range(a, flip("gte"), l)
      case Contains(a, Literal(t, StringType)) if t != null =>
        tokenCond(name(a), t.toString)
      case graft.functions.TextExprs.TokenMatch(a, Literal(t, StringType))
          if t != null && t.toString.nonEmpty =>
        // whole-token predicate: exact postings lookup, range-bounded
        name(a).toSeq.map(Indexes.TokenEqCond(_, t.toString))
      case Like(a, Literal(p, StringType), _) if p != null =>
        val s = p.toString
        if (s.length > 2 && s.head == '%' && s.last == '%')
          tokenCond(name(a), s.substring(1, s.length - 1))
        else Seq.empty
      case _ => Seq.empty
    }
  }

  /** inverted pruning is only sound for terms that cannot span a token
    * boundary — i.e. purely alphanumeric */
  private def tokenCond(n: Option[String], term: String): Seq[Indexes.IndexCond] =
    if (term.nonEmpty && term.forall(_.isLetterOrDigit) && term.forall(_ < 128))
      n.toSeq.map(Indexes.TokenCond(_, term))
    else Seq.empty
}

object IndexPruneRule {

  /** warehouse → live catalog; the engine (re-)registers on
    * construction so the rule always consults fresh index metadata,
    * and a scan of an un-indexed location costs one hash miss */
  private val catalogs =
    new java.util.concurrent.ConcurrentHashMap[String, GraftCatalog]()

  def register(c: GraftCatalog): Unit = catalogs.put(c.warehouse, c)

  private[plans] def lookup(root: String): Option[(GraftCatalog, String)] = {
    val it = catalogs.values.iterator()
    while (it.hasNext) {
      val c = it.next()
      c.indexedTableAt(root) match {
        case Some(t) => return Some((c, t))
        case None => ()
      }
    }
    None
  }

  // --------------------------------------------- verdict memoization

  /** times a verdict was actually computed (spec observability) */
  private[graft] val verdictComputations = new java.util.concurrent.atomic.AtomicLong

  private val verdictCache: java.util.Map[Any, Set[String]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[Any, Set[String]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Any, Set[String]]): Boolean = size > 256
      })

  /** bounded LRU eviction (access-order LinkedHashMap): verdicts are
    * name sets, and a stale entry can never be served (the key carries
    * the index build version and a digest of the candidate files'
    * identities) — eviction only re-computes, never corrupts */
  private[plans] def cachedVerdict(key: Any)(compute: => Set[String]): Set[String] = {
    val hit = verdictCache.get(key)
    if (hit != null) return hit
    val v = { verdictComputations.incrementAndGet(); compute }
    verdictCache.put(key, v)
    v
  }

  /** build identity of an index directory: rebuilds rewrite the
    * structure subdirectories, bumping their mtimes */
  private[plans] def indexVersion(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return 0L
    var v = java.nio.file.Files.getLastModifiedTime(p).toMillis
    val s = java.nio.file.Files.list(p)
    try s.iterator().forEachRemaining { c =>
      v = math.max(v, java.nio.file.Files.getLastModifiedTime(c).toMillis)
    } finally s.close()
    v
  }
}
