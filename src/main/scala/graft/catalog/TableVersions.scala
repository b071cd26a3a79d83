package graft.catalog

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.io.ByteStore

/** Version log for managed tables — the Spark re-expression of the
  * reference's Lance-backed versioned commits (beacon-lance/src/io.rs:207
  * "Replace all rows: a new dataset version containing only the streamed
  * rows"; provider.rs:213 reopen-to-latest). Lance keeps a manifest per
  * dataset version listing immutable data fragments; graft keeps a JSON
  * manifest per table version listing immutable COMMIT DIRECTORIES under
  * the table's data directory.
  *
  * Layout:
  * {{{
  *   <warehouse>/<table>/c000000001/           immutable parquet commit
  *   <warehouse>/<table>/c000000002/
  *   <warehouse>/_versions/<table>/v000000001.json
  *   <warehouse>/_versions/<table>/v000000002.json
  * }}}
  *
  * Every mutation writes NEW files into a NEW commit directory and then
  * publishes a new manifest — data files are never rewritten in place and
  * never renamed, which is exactly the object-store-safe commit protocol
  * (S3 has no atomic rename; a single small manifest PUT is the commit
  * point). Reads resolve the manifest to a list of directories and hand
  * them to one parquet scan, so pushdown/pruning behave as on any
  * multi-root parquet relation:
  *  - CREATE / INSERT OVERWRITE / DELETE / UPDATE / ALTER → manifest
  *    references only the freshly-written commit,
  *  - INSERT INTO (append) → manifest = previous dirs + new commit
  *    (append never copies or links existing data),
  *  - RESTORE → manifest = the restored version's dirs (metadata-only),
  *  - VACUUM → drops old manifests and any commit directory no retained
  *    manifest references.
  *
  * All manifest I/O rides [[ByteStore]], so the warehouse can live on
  * any Hadoop scheme (`hdfs://`, `s3a://`) as well as local disk — the
  * same seam every custom reader already uses.
  */
object TableVersions {

  /** one published table version */
  final case class Entry(
      version: Long,
      operation: String,
      tsMs: Long,
      dirs: Seq[String]) // commit dir names, relative to the table data dir

  private def versionsDir(warehouse: String, table: String): String =
    ByteStore.resolve(ByteStore.resolve(warehouse, "_versions"), table)

  private def manifestPath(warehouse: String, table: String, v: Long): String =
    ByteStore.resolve(versionsDir(warehouse, table), f"v$v%09d.json")

  def list(warehouse: String, table: String): Seq[Entry] = {
    val d = versionsDir(warehouse, table)
    if (!ByteStore.exists(d)) return Seq.empty
    ByteStore.list(d)
      .filter(p => ByteStore.fileName(p).matches("v\\d{9}\\.json"))
      .map(p => parse(ByteStore.readString(p)))
      .sortBy(_.version)
  }

  def latest(warehouse: String, table: String): Option[Entry] =
    list(warehouse, table).lastOption

  def get(warehouse: String, table: String, version: Long): Option[Entry] = {
    val p = manifestPath(warehouse, table, version)
    if (ByteStore.exists(p)) Some(parse(ByteStore.readString(p))) else None
  }

  /** absolute paths of a version's commit directories */
  def dataDirs(warehouse: String, table: String, e: Entry): Seq[String] =
    e.dirs.map(d => ByteStore.resolve(ByteStore.resolve(warehouse, table), d))

  /** the version's parquet files, SORTED — the one shared definition
    * of "this version's file inventory" (remote split tickets carve
    * it, so every consumer must list identically) */
  def parquetFiles(warehouse: String, table: String, e: Entry): Seq[String] =
    dataDirs(warehouse, table, e)
      .flatMap(dir => ByteStore.walkFiles(dir).filter(_.endsWith(".parquet")))
      .sorted

  // commit dirs ALLOCATED but not yet published: writers call
  // nextCommitDir, spend seconds-to-minutes writing parquet into it,
  // then commit — so allocation must reserve the name under the same
  // lock commit uses, or two concurrent same-JVM writers would both
  // read max=c4, both write into c5, and the loser's data files would
  // land in a directory the winner's manifest references. Keyed by
  // (normalized warehouse, table); a reservation abandoned by a failed
  // write merely skips a number.
  private val inFlight = scala.collection.mutable.Set.empty[(String, String, String)]

  private def whKey(warehouse: String): String =
    if (ByteStore.hasScheme(warehouse)) warehouse.stripSuffix("/")
    else java.nio.file.Paths.get(ByteStore.toLocal(warehouse))
      .toAbsolutePath.normalize.toString

  /** atomically allocate-and-reserve the next commit directory name
    * (not created on disk — the parquet write creates it); the
    * reservation is released when a commit publishes the dir */
  def nextCommitDir(warehouse: String, table: String): String = synchronized {
    val key = whKey(warehouse)
    val used = list(warehouse, table).flatMap(_.dirs)
      .map(_.stripPrefix("c").toLong)
    val reserved = inFlight.collect {
      case (w, t, d) if w == key && t == table => d.stripPrefix("c").toLong
    }
    val next = f"c${(used ++ reserved).maxOption.getOrElse(0L) + 1}%09d"
    inFlight += ((key, table, next))
    next
  }

  /** drop a reservation whose write failed — without this an abandoned
    * reservation stays in [[inFlight]] forever, permanently skipping a
    * commit number and leaking one entry per failed write on a
    * long-lived engine */
  def releaseCommitDir(warehouse: String, table: String, dir: String): Unit =
    synchronized { inFlight.remove((whKey(warehouse), table, dir)): Unit }

  /** observable for specs: live reservations of one table */
  def inFlightCount(warehouse: String, table: String): Int = synchronized {
    val key = whKey(warehouse)
    inFlight.count { case (w, t, _) => w == key && t == table }
  }

  /** allocate a commit dir, run the write/publish block with it, and
    * RELEASE the reservation if the block throws (a successful commit
    * releases it by publishing). Every writer goes through this so a
    * failed parquet write cannot leak its reservation. */
  def withCommitDir[A](warehouse: String, table: String)(f: String => A): A = {
    val d = nextCommitDir(warehouse, table)
    try f(d)
    catch {
      case e: Throwable => releaseCommitDir(warehouse, table, d); throw e
    }
  }

  /** publish the next version; returns the entry written. Serialized
    * per JVM — and commit-dir allocation shares this lock (see
    * [[nextCommitDir]]), so two same-process writers can neither
    * publish the same version twice nor write into the same commit dir
    * (cross-process coordination is the object store's conditional-put
    * problem, out of scope here — same stance as the reference's
    * single-writer Lance datasets). */
  def commit(warehouse: String, table: String, operation: String,
      dirs: Seq[String]): Entry = synchronized {
    val v = latest(warehouse, table).map(_.version).getOrElse(0L) + 1
    val e = Entry(v, operation, System.currentTimeMillis(), dirs)
    ByteStore.createDirectories(versionsDir(warehouse, table))
    ByteStore.writeString(manifestPath(warehouse, table, v), render(e))
    val key = whKey(warehouse)
    dirs.foreach(d => inFlight.remove((key, table, d)))
    e
  }

  /** Run `f` under the SAME monitor [[commit]]/[[commitAppend]] use.
    * The publish-then-re-register pair must be atomic w.r.t. other
    * same-JVM committers: a writer that published v2, then lost the
    * CPU while a second writer published v3 AND re-registered the
    * session view, would re-register its own STALE v2 resolution last
    * — silently dropping the later append from every subsequent read
    * (r17: the r10 concurrent-writers spec caught exactly this under
    * host load — count read 8, manifest v3 held 11). */
  def withCommitLock[A](f: => A): A = synchronized(f)

  /** append-publish: new version = the LATEST version's dirs plus
    * `newDirs`, with the latest re-read INSIDE the commit lock — a
    * writer that computed "previous dirs" before its (long) parquet
    * write would otherwise drop a concurrent append's commit from the
    * manifest (lost update). */
  def commitAppend(warehouse: String, table: String, operation: String,
      newDirs: Seq[String]): Entry = synchronized {
    val prev = latest(warehouse, table).map(_.dirs).getOrElse(Seq.empty)
    commit(warehouse, table, operation, prev ++ newDirs)
  }

  /** drop manifests older than the newest `retainLast` and every commit
    * directory no retained manifest references; returns
    * (manifestsRemoved, commitDirsRemoved). The current version is
    * always retained. */
  def vacuum(warehouse: String, table: String, retainLast: Int): (Int, Int) = {
    require(retainLast >= 1, "VACUUM must retain at least the current version")
    val all = list(warehouse, table)
    if (all.isEmpty) return (0, 0)
    val (dropped, kept) = all.splitAt(math.max(0, all.size - retainLast))
    val keepDirs = kept.flatMap(_.dirs).toSet
    val deadDirs = dropped.flatMap(_.dirs).distinct.filterNot(keepDirs)
    deadDirs.foreach { d =>
      ByteStore.deleteRecursively(
        ByteStore.resolve(ByteStore.resolve(warehouse, table), d))
    }
    dropped.foreach(e =>
      ByteStore.deleteIfExists(manifestPath(warehouse, table, e.version)))
    (dropped.size, deadDirs.size)
  }

  /** remove the whole version log (DROP TABLE) */
  def dropAll(warehouse: String, table: String): Unit =
    ByteStore.deleteRecursively(versionsDir(warehouse, table))

  private def render(e: Entry): String =
    JsonMethods.pretty(JsonMethods.render(JObject(List(
      "version" -> JLong(e.version),
      "operation" -> JString(e.operation),
      "ts_ms" -> JLong(e.tsMs),
      "dirs" -> JArray(e.dirs.map(JString(_)).toList)))))

  private def parse(json: String): Entry = {
    val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    def long(k: String): Long = m(k) match {
      case JLong(v) => v
      case JInt(v) => v.toLong
      case other => throw new IllegalArgumentException(s"bad $k: $other")
    }
    Entry(
      version = long("version"),
      operation = m.get("operation").collect { case JString(s) => s }.getOrElse(""),
      tsMs = long("ts_ms"),
      dirs = m.get("dirs").collect {
        case JArray(xs) => xs.collect { case JString(s) => s }
      }.getOrElse(Seq.empty))
  }
}
