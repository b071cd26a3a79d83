package graft.catalog

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Typed, consumer-facing table extensions — metadata about HOW TO USE
  * a table, distinct from its storage definition (reference
  * beacon-core/src/extensions.rs; DDL test runtime.rs:841-907):
  *
  *  - `mcp`: how a downstream MCP server should surface the table
  *    (tool name/description, exposed columns, free-form guardrails);
  *  - `preset`: named, predefined filter sets consumers apply
  *    downstream (`{"presets":[{name, filters:[{column, op, value}]}]}`,
  *    ops `= != < <= > >= between in`).
  *
  * Stored as an `extensions.json` sidecar per table under
  * `<warehouse>/_extensions/` (the reference's `db://<name>/
  * extensions.json`), so they apply to every table kind, survive
  * re-registration, and vanish with DROP TABLE. Every SET validates the
  * whole document against the table's CURRENT schema — a preset or
  * exposed column over a column the table doesn't have is rejected at
  * write time, not discovered downstream.
  */
object TableExtensions {

  val kinds = Set("mcp", "preset")
  private val presetOps = Set("=", "!=", "<", "<=", ">", ">=", "between", "in")

  def sidecar(warehouse: String, table: String): String =
    graft.sources.io.ByteStore.resolve(
      graft.sources.io.ByteStore.resolve(warehouse, "_extensions"), s"$table.json")

  /** current document (empty object when none set) */
  def load(warehouse: String, table: String): JObject = {
    import graft.sources.io.ByteStore
    val p = sidecar(warehouse, table)
    if (!ByteStore.exists(p)) JObject(Nil)
    else JsonMethods.parse(ByteStore.readString(p)) match {
      case o: JObject => o
      case other => throw new IllegalStateException(s"bad extensions sidecar: $other")
    }
  }

  /** parse `json` as extension `kind`, splice it into the document,
    * validate everything against `schema`, persist */
  def set(warehouse: String, table: String, kind: String, json: String,
      schema: StructType): Unit = {
    val k = kind.toLowerCase
    require(kinds(k), s"unknown extension kind '$kind'; expected one of: mcp, preset")
    val payload = JsonMethods.parse(json) match {
      case o: JObject => o
      case other => throw new IllegalArgumentException(
        s"'$k' extension payload must be a JSON object, got $other")
    }
    val doc = JObject(load(warehouse, table).obj.filterNot(_._1 == k) :+ (k -> (payload: JValue)))
    validate(doc, schema)
    graft.sources.io.ByteStore.writeString(sidecar(warehouse, table),
      JsonMethods.pretty(JsonMethods.render(doc)))
  }

  /** remove one kind; an empty document deletes the sidecar */
  def drop(warehouse: String, table: String, kind: String): Unit = {
    val k = kind.toLowerCase
    require(kinds(k), s"unknown extension kind '$kind'; expected one of: mcp, preset")
    import graft.sources.io.ByteStore
    val remaining = load(warehouse, table).obj.filterNot(_._1 == k)
    val p = sidecar(warehouse, table)
    if (remaining.isEmpty) { ByteStore.deleteIfExists(p): Unit }
    else ByteStore.writeString(p, JsonMethods.pretty(JsonMethods.render(JObject(remaining))))
  }

  def dropAll(warehouse: String, table: String): Unit = {
    graft.sources.io.ByteStore.deleteIfExists(sidecar(warehouse, table)): Unit
  }

  /** the SHOW EXTENSIONS payload: the whole document as one JSON string */
  def show(warehouse: String, table: String): String =
    JsonMethods.compact(JsonMethods.render(load(warehouse, table)))

  // -------------------------------------------------------- validation

  private def validate(doc: JObject, schema: StructType): Unit = {
    val cols = schema.fieldNames.toSet
    doc.obj.foreach {
      case ("preset", p) => validatePreset(p, cols)
      case ("mcp", m) => validateMcp(m, cols)
      case (other, _) => throw new IllegalArgumentException(
        s"unknown extension kind '$other'")
    }
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def str(v: JValue, what: String): String = v match {
    case JString(s) => s
    case other => fail(s"$what must be a string, got $other")
  }

  private def validatePreset(p: JValue, cols: Set[String]): Unit = {
    val presets = (p \ "presets") match {
      case JArray(xs) => xs
      case _ => fail("'preset' extension needs a presets array")
    }
    val names = presets.map { pr =>
      val name = str(pr \ "name", "preset name")
      val filters = (pr \ "filters") match {
        case JArray(fs) => fs
        case _ => fail(s"preset '$name' needs a filters array")
      }
      filters.foreach { f =>
        val c = str(f \ "column", "filter column")
        if (!cols(c)) fail(s"preset '$name' filters unknown column '$c'")
        val op = str(f \ "op", "filter op")
        if (!presetOps(op)) fail(
          s"preset '$name': op '$op' not one of ${presetOps.toSeq.sorted.mkString(", ")}")
        (op, f \ "value") match {
          case ("between", JArray(v)) if v.length == 2 => ()
          case ("between", other) => fail(
            s"preset '$name': between needs a [lo, hi] value, got $other")
          case ("in", JArray(_)) => ()
          case ("in", other) => fail(s"preset '$name': in needs an array value, got $other")
          case (_, JNothing) => fail(s"preset '$name': filter on '$c' has no value")
          case _ => ()
        }
      }
      name
    }
    if (names.distinct.length != names.length)
      fail(s"duplicate preset names: ${names.diff(names.distinct).distinct.mkString(", ")}")
  }

  private def validateMcp(m: JValue, cols: Set[String]): Unit = {
    (m \ "tool_name") match {
      case JString(n) =>
        if (n.isEmpty || n.length > 64 || !n.forall(c =>
            c.isLetterOrDigit && c < 128 || c == '_' || c == '-'))
          fail(s"mcp tool_name '$n' must be 1-64 characters of letters, " +
            "digits, '_' or '-'")
      case JNothing | JNull => ()
      case other => fail(s"mcp tool_name must be a string, got $other")
    }
    (m \ "exposed_columns") match {
      case JArray(xs) => xs.foreach { x =>
        val name = x match {
          case JString(s) => s
          case o: JObject => str(o \ "name", "exposed column name")
          case other => fail(s"exposed column must be a name or {name, description}, got $other")
        }
        if (!cols(name)) fail(s"mcp exposes unknown column '$name'")
      }
      case JNothing | JNull => ()
      case other => fail(s"mcp exposed_columns must be an array, got $other")
    }
  }

  // ------------------------------------------------------ preset → SQL

  /** a preset's filters as one ANSI WHERE clause — the downstream-apply
    * path (the reference's `PresetOp::as_sql` consumers) */
  def presetWhereSql(warehouse: String, table: String, preset: String): String = {
    val doc = load(warehouse, table)
    val presets = (doc \ "preset" \ "presets") match {
      case JArray(xs) => xs
      case _ => fail(s"no presets on $table")
    }
    val pr = presets.find(p => (p \ "name") == JString(preset))
      .getOrElse(fail(s"no preset '$preset' on $table"))
    val conds = (pr \ "filters") match {
      case JArray(fs) => fs.map { f =>
        val c = "`" + str(f \ "column", "column").replace("`", "``") + "`"
        def lit(v: JValue): String = v match {
          case JString(s) => "'" + s.replace("'", "''") + "'"
          case JInt(i) => i.toString
          case JLong(l) => l.toString
          case JDouble(d) => d.toString
          case JDecimal(d) => d.toString
          case JBool(b) => b.toString
          case other => fail(s"unsupported preset literal $other")
        }
        (str(f \ "op", "op"), f \ "value") match {
          case ("between", JArray(List(lo, hi))) => s"$c BETWEEN ${lit(lo)} AND ${lit(hi)}"
          case ("in", JArray(vs)) => s"$c IN (${vs.map(lit).mkString(", ")})"
          case (op, v) => s"$c $op ${lit(v)}"
        }
      }
      case _ => fail(s"preset '$preset' has no filters")
    }
    if (conds.isEmpty) "true" else conds.mkString(" AND ")
  }
}
