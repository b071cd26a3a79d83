package graft.catalog

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Warehouse persistence for `CREATE PERSISTENT CRS` parameter rows
  * (the [[graft.functions.Geo.registerCrs]] registry is JVM-global and
  * dies with the session): rows live as `<warehouse>/_crs.json` — a
  * plain parameter table, exactly the "EPSG row as data" stance — and
  * re-register at catalog construction, so a projected CRS defined
  * once is addressable in every later session on the warehouse. The
  * secrets model ([[Secrets]]) without the encryption: CRS parameters
  * are published constants, not credentials. */
class CrsStore(warehouse: String) {

  private def path: String =
    graft.sources.io.ByteStore.resolve(warehouse, "_crs.json")

  private case class Row(srid: Int, family: String, params: Map[String, Double])

  private def readAll(): Seq[Row] =
    try {
      JsonMethods.parse(graft.sources.io.ByteStore.readString(path)) match {
        case JArray(xs) => xs.map { x =>
          val srid = x \ "srid" match {
            case JInt(i) => i.toInt
            case other => throw new IllegalArgumentException(
              s"_crs.json: srid must be an integer, got $other")
          }
          val family = x \ "family" match {
            case JString(f) => f
            case other => throw new IllegalArgumentException(
              s"_crs.json: family must be a string, got $other")
          }
          val params = x \ "params" match {
            case JObject(fs) => fs.map {
              case (k, JDouble(v)) => k -> v
              case (k, JInt(v)) => k -> v.toDouble
              case (k, other) => throw new IllegalArgumentException(
                s"_crs.json: parameter '$k' must be numeric, got $other")
            }.toMap
            case other => throw new IllegalArgumentException(
              s"_crs.json: params must be an object, got $other")
          }
          Row(srid, family, params)
        }
        case other => throw new IllegalArgumentException(
          s"_crs.json must be an array of CRS rows, got $other")
      }
    } catch { case _: java.io.FileNotFoundException => Nil
      case _: java.nio.file.NoSuchFileException => Nil }

  private def writeAll(rows: Seq[Row]): Unit = {
    val doc = JArray(rows.sortBy(_.srid).toList.map { r =>
      JObject("srid" -> JInt(r.srid), "family" -> JString(r.family),
        "params" -> JObject(r.params.toList.sortBy(_._1)
          .map { case (k, v) => k -> JDouble(v) }))
    })
    // atomic rename (ADVICE r16): a reader in another session never
    // sees a torn _crs.json mid-replace
    graft.sources.io.ByteStore.writeStringAtomic(path,
      JsonMethods.pretty(JsonMethods.render(doc)))
  }

  /** serialize the read-modify-write cycles below: in-JVM via the
    * process-wide monitor, cross-PROCESS (two sessions, one local
    * warehouse) via an advisory lock on a `_crs.json.lock` sidecar —
    * concurrent createPersistent/drop on the same warehouse can no
    * longer lose each other's rows (ADVICE r16). Scheme'd warehouses
    * get the in-JVM serialization plus the atomic replace only (object
    * stores offer no lock primitive; last whole-file write wins, which
    * is at least a CONSISTENT row set, never a merge-lost torn one). */
  private def withStoreLock[T](body: => T): T =
    CrsStore.jvmLock.synchronized {
      if (graft.sources.io.ByteStore.hasScheme(path)) body
      else {
        val lockPath = java.nio.file.Paths.get(
          graft.sources.io.ByteStore.toLocal(path) + ".lock")
        Option(lockPath.getParent)
          .foreach(java.nio.file.Files.createDirectories(_))
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try { val l = ch.lock(); try body finally l.release() }
        finally ch.close()
      }
    }

  /** srids persisted on this warehouse (for SHOW CRS's source column) */
  def persistedSrids(): Set[Int] = readAll().map(_.srid).toSet

  /** register in the session AND persist to the warehouse (upsert by
    * srid; a conflicting in-session definition raises before the file
    * is touched, so the store never holds a rejected row) */
  def createPersistent(srid: Int, family: String,
      params: Map[String, Double]): Unit = {
    graft.functions.Geo.registerCrs(srid, family, params)
    withStoreLock {
      val rest = readAll().filterNot(_.srid == srid)
      writeAll(rest :+ Row(srid, family, params))
    }
  }

  /** drop a RUNTIME-REGISTERED row: removes the session registration
    * and the persisted row if present. Returns false when the srid was
    * not a dynamic registration (builtins are not droppable). */
  def drop(srid: Int): Boolean = {
    val wasDynamic = graft.functions.Geo.unregisterCrs(srid)
    withStoreLock {
      val rows = readAll()
      if (rows.exists(_.srid == srid)) writeAll(rows.filterNot(_.srid == srid))
      wasDynamic || rows.exists(_.srid == srid)
    }
  }

  /** re-register every persisted row into the session (idempotent —
    * an identical JVM-wide registration is a no-op; a CONFLICTING one
    * raises loudly rather than silently shadowing either side) */
  def loadAll(): Unit = readAll().foreach { r =>
    graft.functions.Geo.registerCrs(r.srid, r.family, r.params)
  }
}

object CrsStore {
  /** in-JVM serialization of _crs.json read-modify-write (one monitor
    * for ALL warehouses: CRS DDL is rare, contention is irrelevant) */
  private[catalog] val jvmLock = new Object
}
