package graft.sources.io

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Storage seam for the pure-JVM readers (netcdf/hdf5/zarr/tiff/atlas/
  * icechunk/bbf/arrow/odv/delta/iceberg): every byte access dispatches on
  * the path's scheme.
  *
  *  - plain and `file:` paths (`/data/x.nc`, `file:/data/x.nc`) →
  *    `java.nio` exactly as before (the local fast path: zero new copies,
  *    mmap-able),
  *  - URI paths (`hdfs://…`, `s3a://…`) → Hadoop `FileSystem`, so the
  *    custom readers accept any scheme the cluster's Hadoop configuration
  *    knows, same as Spark's native parquet scan.
  *
  * Monolithic single-file formats whose parsers walk an mmap (HDF5, TIFF,
  * classic NetCDF, BBF, Arrow IPC) call [[localize]]: identity for plain
  * paths, a per-JVM content-cached download for remote ones — each
  * executor fetches a granule once per (path, mtime, size), then parses at
  * local-disk speed. Chunk-granular stores (zarr/atlas/icechunk) and the
  * table-format metadata readers (delta/iceberg) instead read remote
  * objects directly ([[readAll]]/[[list]]) — no whole-store downloads.
  *
  * The Hadoop `Configuration` is taken from the active `SparkSession` on
  * the driver; executors construct a default `Configuration()` (loads
  * core-site.xml from the executor classpath, the standard cluster
  * deployment). `FileSystem.get` instances are cached by Hadoop itself.
  *
  * `file:/` URIs are a LOCAL path in URI clothing (Spark's DSv2 file
  * listings report them constantly), so they take the `java.nio` fast
  * path — never a cache copy. The Hadoop branch is spec-covered by a
  * `RawLocalFileSystem` subclass registered under a test scheme.
  */
object ByteStore {

  /** true when the path carries a non-`file:` URI scheme (`s3a://…`);
    * single letters are excluded so Windows-style `C:/x` is not a scheme */
  def hasScheme(path: String): Boolean =
    path.indexOf(':') match {
      case -1 => false
      case i  =>
        i >= 2 && path.substring(0, i).matches("[A-Za-z][A-Za-z0-9+.-]+") &&
          !path.startsWith("file:")
    }

  /** plain local path for a plain-or-`file:`-URI input */
  def toLocal(path: String): String =
    if (path.startsWith("file://")) {
      val rest = path.substring("file://".length)
      val slash = rest.indexOf('/')
      if (slash <= 0) rest // "file:///x" → "/x"; "file://x" (no authority path) → x
      else rest.substring(slash) // "file://localhost/x" → "/x"
    } else if (path.startsWith("file:")) path.substring("file:".length)
    else path

  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse {
        // executor side: no SparkSession, but SparkEnv carries the app
        // conf — overlay spark.hadoop.* so s3a credentials/endpoints set
        // on the session reach executor-side reads (the same overlay
        // Spark applies for its own scans)
        val c = new Configuration()
        Option(org.apache.spark.SparkEnv.get).foreach { env =>
          env.conf.getAllWithPrefix("spark.hadoop.").foreach {
            case (k, v) => c.set(k, v)
          }
        }
        c
      }

  private def fs(path: String): (FileSystem, HPath) = {
    val hp = new HPath(path)
    (hp.getFileSystem(hadoopConf), hp)
  }

  // ----------------------------------------------------------- queries

  def exists(path: String): Boolean =
    if (hasScheme(path)) { val (f, p) = fs(path); f.exists(p) }
    else Files.exists(Paths.get(toLocal(path)))

  def isDirectory(path: String): Boolean =
    if (hasScheme(path)) {
      val (f, p) = fs(path)
      try f.getFileStatus(p).isDirectory catch { case _: FileNotFoundException => false }
    } else Files.isDirectory(Paths.get(toLocal(path)))

  def size(path: String): Long =
    if (hasScheme(path)) { val (f, p) = fs(path); f.getFileStatus(p).getLen }
    else Files.size(Paths.get(toLocal(path)))

  def mtime(path: String): Long =
    if (hasScheme(path)) {
      val (f, p) = fs(path)
      try f.getFileStatus(p).getModificationTime catch { case _: FileNotFoundException => -1L }
    } else {
      try Files.getLastModifiedTime(Paths.get(toLocal(path))).toMillis
      catch { case _: java.io.IOException => -1L }
    }

  /** immediate children as full paths (sorted by name for determinism) */
  def list(path: String): Seq[String] =
    if (hasScheme(path)) {
      val (f, p) = fs(path)
      f.listStatus(p).map(_.getPath.toString).toSeq.sorted
    } else {
      val s = Files.list(Paths.get(toLocal(path)))
      try s.iterator().asScala.map(_.toString).toSeq.sorted finally s.close()
    }

  /** child file name relative to its directory (both API shapes produce
    * full paths from [[list]]; name extraction is scheme-safe) */
  def fileName(path: String): String =
    path.stripSuffix("/").substring(path.stripSuffix("/").lastIndexOf('/') + 1)

  def resolve(dir: String, child: String): String =
    if (dir.endsWith("/")) dir + child else dir + "/" + child

  // ------------------------------------------------ writes / management
  // (the catalog + version-log seam: manifests and table definitions go
  // through these, so a `hdfs://`/`s3a://` warehouse works end-to-end —
  // every write is whole-object create-or-replace, no appends, matching
  // the no-rename object-store commit protocol)

  def writeString(path: String, content: String): Unit =
    writeAll(path, content.getBytes(StandardCharsets.UTF_8))

  /** whole-file replace with ATOMIC publication on local filesystems:
    * temp file in the target's directory + rename, so a concurrent
    * reader (another session on the same warehouse) never observes a
    * torn write. Scheme'd stores fall back to [[writeAll]] — whole-
    * object create-or-replace IS the object-store commit primitive. */
  def writeStringAtomic(path: String, content: String): Unit =
    if (hasScheme(path)) writeString(path, content)
    else {
      val p0 = Paths.get(toLocal(path))
      val p = if (p0.getParent == null) p0.toAbsolutePath else p0
      Files.createDirectories(p.getParent)
      val tmp = Files.createTempFile(p.getParent,
        "." + p.getFileName.toString, ".tmp")
      try {
        // createTempFile makes 0600 — widen to the plain-write default
        // (rw-r--r--) so a SECOND user sharing the warehouse can still
        // read the store after this one's atomic replace; non-POSIX
        // filesystems skip silently
        try Files.setPosixFilePermissions(tmp,
          java.nio.file.attribute.PosixFilePermissions.fromString("rw-r--r--"))
        catch { case _: UnsupportedOperationException => () }
        Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING): Unit
      } finally Files.deleteIfExists(tmp): Unit
    }

  def writeAll(path: String, bytes: Array[Byte]): Unit =
    if (hasScheme(path)) {
      val (f, p) = fs(path)
      val out = f.create(p, true)
      try out.write(bytes) finally out.close()
    } else {
      val p = Paths.get(toLocal(path))
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, bytes): Unit
    }

  /** mkdir -p; a no-op concept on object stores (Hadoop mkdirs is cheap
    * and some connectors materialize a marker — either is fine) */
  def createDirectories(path: String): Unit =
    if (hasScheme(path)) { val (f, p) = fs(path); f.mkdirs(p): Unit }
    else Files.createDirectories(Paths.get(toLocal(path))): Unit

  def deleteIfExists(path: String): Boolean =
    if (hasScheme(path)) { val (f, p) = fs(path); f.delete(p, false) }
    else Files.deleteIfExists(Paths.get(toLocal(path)))

  def deleteRecursively(path: String): Unit =
    if (hasScheme(path)) {
      val (f, p) = fs(path)
      if (f.exists(p)) { f.delete(p, true): Unit }
    } else {
      def rec(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.iterator().asScala.toVector.foreach(rec) finally s.close()
        }
        Files.deleteIfExists(p): Unit
      }
      rec(Paths.get(toLocal(path)))
    }

  def move(src: String, dst: String): Unit =
    if (hasScheme(src) || hasScheme(dst)) {
      require(hasScheme(src) && hasScheme(dst),
        s"move must stay within one store: $src -> $dst")
      val (f, sp) = fs(src)
      require(f.rename(sp, new HPath(dst)), s"rename failed: $src -> $dst")
    } else
      Files.move(Paths.get(toLocal(src)), Paths.get(toLocal(dst))): Unit

  /** recursive REGULAR-file listing under a directory (sorted) */
  def walkFiles(path: String): Seq[String] =
    if (hasScheme(path)) {
      val (f, p) = fs(path)
      if (!f.exists(p)) Seq.empty
      else {
        // manual listStatus recursion rather than listFiles(recursive):
        // the latter builds LocatedFileStatus, which some FileSystem
        // implementations make eagerly load permissions
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        def rec(st: org.apache.hadoop.fs.FileStatus): Unit =
          if (st.isDirectory) f.listStatus(st.getPath).foreach(rec)
          else out += st.getPath.toString
        rec(f.getFileStatus(p))
        out.toSeq.sorted
      }
    } else {
      val root = Paths.get(toLocal(path))
      if (!Files.exists(root)) Seq.empty
      else {
        val s = Files.walk(root)
        try s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.toString).toSeq.sorted
        finally s.close()
      }
    }

  // ------------------------------------------------------------- reads

  def readAll(path: String): Array[Byte] =
    if (hasScheme(path)) {
      val (f, p) = fs(path)
      val st = f.getFileStatus(p)
      // the int cast below would wrap for >= 2 GiB objects — fail loudly
      // instead of NegativeArraySizeException / silent truncation
      require(st.getLen <= Int.MaxValue,
        s"file too large for readAll (${st.getLen} bytes): $path")
      val out = new Array[Byte](st.getLen.toInt)
      val in = f.open(p)
      try in.readFully(0L, out) finally in.close()
      out
    } else Files.readAllBytes(Paths.get(toLocal(path)))

  def readString(path: String): String =
    new String(readAll(path), StandardCharsets.UTF_8)

  /** Per-THREAD LRU of open remote input streams for [[readRange]].
    * A zarr/atlas/icechunk scan issues one range read per chunk; with
    * open-per-call an object store charges a connection setup + GET
    * handshake per CHUNK. Task threads re-read the same granule many
    * times in a row, so a small per-thread cache makes opens ∝ distinct
    * files per task instead — and thread confinement means positioned
    * reads never contend on a shared stream (Hadoop only guarantees
    * PositionedReadable thread-safety per implementation). Capacity 8:
    * chunk scans walk files one or two at a time; eviction closes. */
  private val handleCap = 8
  private val handles: ThreadLocal[java.util.LinkedHashMap[String, org.apache.hadoop.fs.FSDataInputStream]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, org.apache.hadoop.fs.FSDataInputStream](
        handleCap, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, org.apache.hadoop.fs.FSDataInputStream]): Boolean = {
          val evict = this.size() > handleCap
          if (evict) { try e.getValue.close() catch { case _: java.io.IOException => () } }
          evict
        }
      })

  private def openCached(path: String): org.apache.hadoop.fs.FSDataInputStream = {
    val m = handles.get()
    var in = m.get(path)
    if (in == null) {
      val (f, p) = fs(path)
      in = f.open(p)
      m.put(path, in)
    }
    in
  }

  /** positioned range read without fetching the whole object */
  def readRange(path: String, offset: Long, len: Int): Array[Byte] =
    if (hasScheme(path)) {
      val out = new Array[Byte](len)
      try openCached(path).readFully(offset, out)
      catch { case _: java.io.IOException =>
        // stale handle (object replaced/expired connection): reopen once
        handles.get().remove(path) match {
          case null => ()
          case s => try s.close() catch { case _: java.io.IOException => () }
        }
        openCached(path).readFully(offset, out)
      }
      out
    } else {
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(toLocal(path)), java.nio.file.StandardOpenOption.READ)
      try {
        val bb = java.nio.ByteBuffer.allocate(len)
        ch.position(offset)
        while (bb.hasRemaining && ch.read(bb) >= 0) {}
        require(!bb.hasRemaining, s"short read at $offset+$len of $path")
        bb.array()
      } finally ch.close()
    }

  /** read channel over [[localize]]d bytes — the one-line seam for the
    * monolithic mmap-walking parsers (HDF5/TIFF/classic NetCDF/BBF/Arrow) */
  def openLocalChannel(path: String): java.nio.channels.FileChannel =
    java.nio.channels.FileChannel.open(
      Paths.get(localize(path)), java.nio.file.StandardOpenOption.READ)

  /** Staged single-file egress — [[localize]] in reverse: a LOCAL path
    * for the writer to produce, plus a publish() that streams the
    * finished file to `target` when it names a remote scheme (no-op for
    * local targets, so the local path IS the target). The reference
    * routes every file output through its object store
    * (beacon-core/src/query/output.rs:52-83; COPY path rewrite
    * statement_plan/lower.rs:243-245). */
  def stageOut(target: String): (Path, () => Unit) =
    if (!hasScheme(target)) {
      val p = Paths.get(toLocal(target))
      Option(p.getParent).foreach(Files.createDirectories(_))
      (p, () => ())
    } else {
      val tmp = Files.createTempFile("graft-egress", ".out")
      (tmp, () => {
        val (f, hp) = fs(target)
        val out = f.create(hp, true)
        try Files.copy(tmp, out) finally out.close()
        Files.deleteIfExists(tmp): Unit
      })
    }

  // ---------------------------------------------------------- localize

  private val cacheDir: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft-bytestore-cache")
  /** in-flight download coordination within this JVM (the rename below
    * makes cross-JVM races safe; this just avoids duplicate fetches) */
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  /** observable for specs: completed cache downloads in this JVM */
  val cacheDownloads = new java.util.concurrent.atomic.AtomicLong(0)

  /** buffered read stream over any scheme (caller closes) */
  def openStream(path: String): java.io.InputStream =
    if (hasScheme(path)) { val (f, p) = fs(path); f.open(p) }
    else new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(toLocal(path))))

  /** A local filesystem path holding this granule's bytes: the path
    * itself when plain, else a per-JVM cached copy keyed by
    * (path, mtime, size) — re-fetched when the remote object changes,
    * shared by every task on the executor. Atomic rename publication, so
    * concurrent JVMs sharing a tmpdir never see a half-written file. */
  def localize(path: String): String =
    if (!hasScheme(path)) toLocal(path)
    else localizeTransformed(path, "raw")((in, out) => in.transferTo(out))

  /** [[localize]] with a byte transform (container decompression): the
    * cache entry is the TRANSFORMED bytes, keyed by
    * (path, mtime, size, tag) — applied even for local paths, since the
    * caller wants the decoded form on disk. Same atomic publication. */
  def localizeTransformed(path: String, tag: String)(
      transform: (java.io.InputStream, java.io.OutputStream) => Unit): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$path|${mtime(path)}|${size(path)}|$tag".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val dst = cacheDir.resolve(key)
    if (Files.exists(dst)) return dst.toString
    val lock = inFlight.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      if (!Files.exists(dst)) {
        Files.createDirectories(cacheDir)
        val tmp = Files.createTempFile(cacheDir, key, ".part")
        val in = openStream(path)
        val out = new java.io.BufferedOutputStream(
          Files.newOutputStream(tmp))
        try transform(in, out) finally { out.close(); in.close() }
        Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        cacheDownloads.incrementAndGet()
      }
    }
    inFlight.remove(key)
    dst.toString
  }
}
