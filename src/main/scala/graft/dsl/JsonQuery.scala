package graft.dsl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.functions.{Geo, GraftFunctions}
import graft.sources.FileCollection

/** The structured JSON query DSL compiler — semantics re-expressed from
  * the reference's `beacon-core/src/query/ (mod, compiler, filter, from)`
  * onto DataFrame operations. Application order matches the reference
  * compiler (compiler.rs): scan → project(select) → filter(s) → sort →
  * distinct_on → offset/limit.
  *
  * Pinned behaviors (reference inline tests; FIXTURES.md §5):
  *  - JSON numbers coerce to the filtered column's type so pushdown and
  *    pruning are not defeated by a Float64 cast; out-of-range falls back
  *    to the double literal; fractional bounds TRUNCATE into integer
  *    columns (1.5 → 1, -1.5 → -1).
  *  - Timestamp-looking strings (ISO local datetime) become timestamp
  *    literals in comparison predicates.
  *  - `and: []` ≡ true, `or: []` ≡ false.
  *  - Sort is nulls-last in both directions (SortExpr::new(_, _, false)).
  *  - Legacy aliases: `filters` array (ANDed), `min`/`max`/`low`/`high`
  *    for between, `skip_fill_values`/`skip_missing` for is_not_null,
  *    `for_query_parameter` for column, `query_parameters` for select.
  */
object JsonQuery {

  final class DslException(msg: String) extends IllegalArgumentException(msg)

  def compile(
      spark: SparkSession,
      json: String,
      tableResolver: String => DataFrame = null): DataFrame = {
    val ast = JsonMethods.parse(json) match {
      case o: JObject => o
      case other => throw new DslException(s"query body must be an object, got $other")
    }
    compileAst(spark, ast,
      Option(tableResolver).getOrElse((n: String) => spark.table(n)))
  }

  /** The reference's `/api/query/validate`: fully analyze the query —
    * parse, resolve tables/files, type-check every expression — WITHOUT
    * executing anything, and return the result schema. The output
    * clause is validated for shape (path + known format) but its write
    * is skipped, so validate never touches the filesystem. Errors
    * surface as [[DslException]] / analysis exceptions. */
  def validate(spark: SparkSession, json: String,
      tableResolver: String => DataFrame = null): org.apache.spark.sql.types.StructType = {
    val ast = JsonMethods.parse(json) match {
      case o: JObject => o
      case other => throw new DslException(s"query body must be an object, got $other")
    }
    val noOutput = JObject(ast.obj.filterNot(_._1 == "output"))
    ast.obj.toMap.get("output").foreach {
      case JObject(o) =>
        val om = o.toMap
        if (!om.contains("path")) throw new DslException("output requires path")
        om.get("format").foreach {
          case JString(_) | JObject(_) => ()
          case other => throw new DslException(s"bad output format: $other")
        }
      case other => throw new DslException(s"bad output: $other")
    }
    compileAst(spark, noOutput,
      Option(tableResolver).getOrElse((n: String) => spark.table(n))).schema
  }

  def compileAst(
      spark: SparkSession,
      body: JObject,
      tableResolver: String => DataFrame): DataFrame = {
    val fields = body.obj.toMap

    // ---- from (file-stats pruning consults the query's own filter
    // tree BEFORE the scan's file list is built — see FileStats)
    var df = fields.get("from") match {
      case Some(JString(name)) => tableResolver(name)
      case Some(o: JObject)    => fromFormat(spark, o, pruneConds(fields))
      case Some(other) => throw new DslException(s"bad from: $other")
      case None => tableResolver("default")
    }

    // ---- select (alias: query_parameters)
    val selects = fields.get("select").orElse(fields.get("query_parameters")) match {
      case Some(JArray(items)) => items
      case None => throw new DslException("query requires a select list")
      case Some(other) => throw new DslException(s"bad select: $other")
    }
    if (selects.nonEmpty)
      df = df.select(selects.map(selectItem): _*)

    // ---- filter / filters (legacy list = AND); literal coercion runs
    // against the POST-projection schema (the reference parses filters
    // against builder.schema() after .project — compiler.rs:47-57)
    val projSchema = df.schema
    fields.get("filter").foreach { f => df = df.filter(filterExpr(f, projSchema)) }
    fields.get("filters").foreach {
      case JArray(fs) => fs.foreach { f => df = df.filter(filterExpr(f, projSchema)) }
      case JNothing   => ()
      case other => throw new DslException(s"bad filters: $other")
    }

    // ---- sort_by
    val sortCols = fields.get("sort_by") match {
      case Some(JArray(items)) => items.map(sortItem)
      case None => Seq.empty
      case Some(other) => throw new DslException(s"bad sort_by: $other")
    }
    if (sortCols.nonEmpty) df = df.orderBy(sortCols: _*)

    // ---- distinct {on, select}
    fields.get("distinct").foreach {
      case JObject(d) =>
        val dm = d.toMap
        val on = dm.get("on") match {
          case Some(JArray(items)) => items.map(selectItem)
          case _ => throw new DslException("distinct requires on: [...]")
        }
        val sel = dm.get("select") match {
          case Some(JArray(items)) => items.map(selectItem)
          case _ => throw new DslException("distinct requires select: [...]")
        }
        // DISTINCT ON: first row per `on` group under the query's sort
        // (row_number window — partition-parallel, no driver collect)
        import org.apache.spark.sql.expressions.Window
        val orderCols: Seq[Column] = if (sortCols.nonEmpty) sortCols else Seq(lit(1))
        val w = Window.partitionBy(on: _*).orderBy(orderCols: _*)
        df = df.withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1)
          .select(sel: _*)
        if (sortCols.nonEmpty) df = df.orderBy(sortCols: _*)
      case other => throw new DslException(s"bad distinct: $other")
    }

    // ---- offset / limit (builder.limit(offset, limit))
    fields.get("offset").collect { case JInt(n) => df = df.offset(n.toInt) }
    fields.get("limit").collect { case JInt(n) => df = df.limit(n.toInt) }

    // ---- output (reference: wrap the plan in COPY TO — output.rs):
    // {"output": {"format": "...", "path": "..."}} writes the result and
    // returns a one-row receipt frame
    fields.get("output").foreach {
      case JObject(o) =>
        val om = o.toMap
        val path = om.get("path").collect { case JString(p) => p }
          .getOrElse(throw new DslException("output requires path"))
        import spark.implicits._
        val n: Long = om.get("format") match {
          // simple formats: csv | parquet | netcdf | odv | bbf |
          // ipc (alias: arrow) — docs api/querying/index.md
          case None | Some(JString(_)) =>
            val fmt = om.get("format").collect {
              case JString(f) => if (f.equalsIgnoreCase("ipc")) "arrow" else f.toLowerCase
            }
            graft.sql.Outputs.copyTo(df, path, fmt)
          // structured formats: {"format": {"geoparquet"|"nd_netcdf"|"odv": {…}}}
          case Some(JObject(fo)) =>
            def str(v: JValue, what: String): String = v match {
              case JString(s) => s
              case JObject(co) => co.toMap.get("column_name") match {
                case Some(JString(s)) => s
                case _ => throw new DslException(s"output $what needs a column name")
              }
              case _ => throw new DslException(s"output $what needs a column name")
            }
            fo.toMap.toList match {
              case ("geoparquet", JObject(go)) :: Nil =>
                val gm = go.toMap
                val lon = gm.get("longitude_column").map(str(_, "geoparquet")).getOrElse("longitude")
                val lat = gm.get("latitude_column").map(str(_, "geoparquet")).getOrElse("latitude")
                require(df.columns.contains(lon) && df.columns.contains(lat),
                  s"geoparquet output needs columns $lon, $lat")
                val obs = new org.apache.spark.sql.Observation("graft.dsl.rows")
                val counted = df.observe(obs,
                  org.apache.spark.sql.functions.count(
                    org.apache.spark.sql.functions.lit(1)).as("rows"))
                // r15: `morton_files: N` switches to the Z-order
                // clustered layout — each of the N files covers a
                // compact spatial box, so bbox file pruning pays off
                // on the written collection
                gm.get("morton_files") match {
                  case Some(JInt(n)) if n > 0 =>
                    graft.sources.GeoParquet.writeSorted(
                      counted, path, lon, lat, n.toInt)
                  case Some(other) => throw new DslException(
                    s"geoparquet morton_files must be a positive integer, got $other")
                  case None =>
                    graft.sources.GeoParquet.write(counted, path, lon, lat)
                }
                obs.get("rows").asInstanceOf[Long] // distributed write: one action
              case ("nd_netcdf", JObject(no)) :: Nil =>
                val dims = no.toMap.get("dimension_columns") match {
                  case Some(JArray(ds)) => ds.collect { case JString(d) => d }
                  case _ => throw new DslException("nd_netcdf output needs dimension_columns")
                }
                val nd = graft.nd.NdPivot.pivot(df, dims)
                graft.sources.netcdf.NetcdfWriter.writeNd(nd, path)
                nd.dims.map(_._2.toLong).product // grid cells written
              case ("odv", JObject(oo)) :: Nil =>
                // column-role options: validate the referenced columns
                // exist; the writer derives labels/types from the schema
                val omap = oo.toMap
                val refCols = omap.collect {
                  case (k, v) if k.endsWith("_column") => str(v, "odv")
                  case ("key_column", JString(s)) => s
                }.toSeq ++ (omap.get("data_columns") match {
                  case Some(JArray(cs)) => cs.map(str(_, "odv"))
                  case _ => Nil
                })
                refCols.foreach(c => require(df.columns.contains(c),
                  s"odv output references missing column $c"))
                graft.sources.OdvWriter.write(df, path)
              case (other, _) :: Nil =>
                throw new DslException(s"output format '$other' unsupported")
              case _ => throw new DslException("output format object needs exactly one key")
            }
          case Some(other) => throw new DslException(s"bad output format: $other")
        }
        df = Seq((path, n)).toDF("path", "rows")
      case other => throw new DslException(s"bad output: $other")
    }
    df
  }

  // ------------------------------------------------------------- from

  private val formatKeys = Set("csv", "parquet", "geoparquet", "jsonl", "arrow", "netcdf", "hdf5", "odv", "tiff", "zarr", "atlas", "icechunk", "bbf", "delta", "iceberg", "warc", "cdx")

  /** Output names the select list produces from anything OTHER than the
    * same-named plain column. DSL filters bind POST-projection (the
    * reference compiles filters against builder.schema() after
    * .project), so a filter on such a name constrains the projected
    * value, not the scan column — a prune cond keyed on it would
    * misprune files. Plain passthroughs (`"surt"`, `{"column":"surt"}`,
    * `{"column":"surt","alias":"surt"}`) are safe; renames and computed
    * items with an alias are not. Computed items WITHOUT an alias get
    * Spark's expression-string name, which cannot collide with a plain
    * scan column name. */
  private def shadowedOutputNames(fields: Map[String, JValue]): Set[String] = {
    val items = fields.get("select").orElse(fields.get("query_parameters")) match {
      case Some(JArray(xs)) => xs
      case _ => return Set.empty
    }
    items.flatMap {
      case JString(_) => None
      case JObject(o) =>
        val m = o.toMap
        val alias = m.get("alias").collect { case JString(a) => a }
        val colName = m.get("column").orElse(m.get("column_name"))
          .collect { case JString(c) => c }
        (alias, colName) match {
          case (None, _)                    => None // keeps its own name
          case (Some(a), Some(c)) if a == c => None // explicit passthrough
          case (Some(a), _)                 => Some(a)
        }
      case _ => None
    }.toSet
  }

  /** best-effort pruning conditions: AND-reachable comparison leaves of
    * the filter tree (OR subtrees contribute nothing — conservative);
    * conds on select-shadowed output names are dropped (see
    * [[shadowedOutputNames]]) */
  private def pruneConds(fields: Map[String, JValue]): Seq[graft.stats.FileStats.Cond] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[graft.stats.FileStats.Cond]
    def condOf(column: String, op: String, v: JValue): Unit = v match {
      case JInt(n)     => out += graft.stats.FileStats.Cond(column, op, Some(n.toDouble), None)
      case JLong(n)    => out += graft.stats.FileStats.Cond(column, op, Some(n.toDouble), None)
      case JDouble(d)  => out += graft.stats.FileStats.Cond(column, op, Some(d), None)
      case JDecimal(d) => out += graft.stats.FileStats.Cond(column, op, Some(d.toDouble), None)
      case JString(s)  => out += graft.stats.FileStats.Cond(column, op, None, Some(s))
      case _ => ()
    }
    def walk(v: JValue): Unit = v match {
      case JObject(o) =>
        val m = o.toMap
        def column: Option[String] =
          m.get("column").orElse(m.get("for_query_parameter"))
            .collect { case JString(c) => c }
        if (m.contains("and")) m("and") match {
          case JArray(fs) => fs.foreach(walk)
          case _ => ()
        }
        else column.foreach { c =>
          Seq("eq" -> "eq", "gt" -> "gt", "gt_eq" -> "gte", "min" -> "gte",
            "low" -> "gte", "lt" -> "lt", "lt_eq" -> "lte", "max" -> "lte",
            "high" -> "lte").foreach { case (key, op) =>
            m.get(key).foreach(condOf(c, op, _))
          }
        }
      case _ => ()
    }
    fields.get("filter").foreach(walk)
    fields.get("filters").foreach { case JArray(fs) => fs.foreach(walk); case _ => () }
    val shadowed = shadowedOutputNames(fields)
    out.toSeq.filterNot(c => shadowed(c.column))
  }

  /** Derive a [lo, hi) SURT key range from the prune conds, if the
    * filter tree pins any bound. Closed upper bounds (`lte`/`eq`)
    * become exclusive by appending the minimum code point; a strict
    * `gt` keeps the conservative closed lower bound (may keep one
    * extra file, never drops a matching one); an unpinned side widens
    * to the extreme. None when no surt bound exists — no pruning. */
  private def surtBounds(
      conds: Seq[graft.stats.FileStats.Cond]): Option[(String, String)] = {
    val ss = conds.filter(c => c.column == "surt" && c.str.isDefined)
    if (ss.isEmpty) return None
    var lo = ""
    var hi: String = null
    ss.foreach { c =>
      val v = c.str.get
      c.op match {
        case "gte" | "gt" => if (v > lo) lo = v
        case "lt"         => if (hi == null || v < hi) hi = v
        case "lte" => val h = v + " "; if (hi == null || h < hi) hi = h
        case "eq" =>
          if (v > lo) lo = v
          val h = v + " "; if (hi == null || h < hi) hi = h
        case _ => ()
      }
    }
    if (lo.isEmpty && hi == null) None
    else Some((lo, if (hi == null) "\uffff\uffff" else hi))
  }

  private def fromFormat(spark: SparkSession, o: JObject,
      conds: Seq[graft.stats.FileStats.Cond] = Seq.empty): DataFrame = {
    val m = o.obj.toMap
    val fmtKey = m.keys.find(formatKeys.contains).getOrElse(
      throw new DslException(s"unknown from format in ${m.keys.mkString(",")}"))
    val spec = m(fmtKey) match {
      case JObject(s) => s.toMap
      case other => throw new DslException(s"bad $fmtKey spec: $other")
    }
    val paths0 = spec.get("paths") match {
      case Some(JArray(ps)) => ps.collect { case JString(p) => p }
      case Some(JString(p)) => Seq(p)
      case _ => throw new DslException(s"$fmtKey requires paths")
    }
    // A newest-wins read must not let non-key conds prune files: a
    // file holding a key's NEWEST capture (whose row happens to fail
    // the filter) would vanish, and an older capture from a surviving
    // file would pass the filter — a stale row the unpruned plan never
    // returns. Only `surt` conds align with the per-key winner choice
    // (newest-wins partitions by surt), so under `latest: true` the
    // stats registry may prune on those alone.
    val latestRead = fmtKey == "cdx" && (spec.get("latest") match {
      case Some(JBool(true)) => true
      case _ => false
    })
    // r15: geoparquet `bbox: [xmin, ymin, xmax, ymax]` — the spatial
    // window becomes four range conditions over the writer's covering
    // columns, so the SAME stats registry that prunes numeric filters
    // prunes space; the exact rectangle filter is applied in-plan after
    // the read (pruning is never the correctness boundary)
    val bbox: Option[(Double, Double, Double, Double)] =
      if (fmtKey != "geoparquet") None
      else spec.get("bbox").map {
        case JArray(vs) if vs.length == 4 =>
          val ds = vs.map {
            case JDouble(d) => d
            case JInt(i) => i.toDouble
            case other => throw new DslException(
              s"geoparquet bbox values must be numbers, got $other")
          }
          if (ds(0) > ds(2) || ds(1) > ds(3)) throw new DslException(
            s"geoparquet bbox is [xmin, ymin, xmax, ymax]; got $ds")
          (ds(0), ds(1), ds(2), ds(3))
        case other => throw new DslException(
          s"geoparquet bbox must be [xmin, ymin, xmax, ymax], got $other")
      }
    val bboxConds = bbox.toSeq.flatMap { case (x0, y0, x1, y1) =>
      Seq(
        graft.stats.FileStats.Cond("bbox_xmin", "lte", Some(x1), None),
        graft.stats.FileStats.Cond("bbox_xmax", "gte", Some(x0), None),
        graft.stats.FileStats.Cond("bbox_ymin", "lte", Some(y1), None),
        graft.stats.FileStats.Cond("bbox_ymax", "gte", Some(y0), None))
    }
    val pruneConds =
      (if (latestRead) conds.filter(_.column == "surt") else conds) ++ bboxConds
    // stats registry next to the data: prune the file list up front
    val statsPruned = spec.get("stats").collect { case JString(statsDir) =>
      val files = FileCollection.expandGlobs(spark, paths0)
      graft.stats.FileStats.pruneFiles(spark, statsDir, files, pruneConds)
    }.getOrElse(paths0)
    // CDX SURT-range pushdown (r14): the DSL front door reaches the
    // same plan-time sidecar pruning the column API's
    // [[graft.sources.CdxSource.lookup]] uses — a filter tree pinning a
    // `surt` range opens only the index runs whose recorded (min,max)
    // range intersects. Conservative by construction: an unpinned bound
    // widens to the extreme, conds on select-shadowed names never reach
    // here, an unprobeable file stays in, and the row-level filter still
    // applies downstream.
    val paths =
      if (fmtKey != "cdx") statsPruned
      else surtBounds(conds) match {
        case Some((lo, hi)) =>
          graft.sources.CdxSource.pruneFiles(statsPruned, lo, hi)._1
        case None => statsPruned
      }
    // When stats pruning removes every file, later select/filter clauses
    // must still resolve: return an empty frame with the format's real
    // scan schema (built over the un-pruned list, limit 0 → no data read)
    // instead of a zero-column emptyDataFrame.
    val df0 =
      if (paths.isEmpty) readFormat(spark, fmtKey, spec, paths0).limit(0)
      else readFormat(spark, fmtKey, spec, paths)
    bbox match {
      case Some((x0, y0, x1, y1)) =>
        import org.apache.spark.sql.functions.col
        df0.filter(col("bbox_xmin") <= x1 && col("bbox_xmax") >= x0 &&
          col("bbox_ymin") <= y1 && col("bbox_ymax") >= y0)
      case None => df0
    }
  }

  private def readFormat(spark: SparkSession, fmtKey: String,
      spec: Map[String, JValue], paths: Seq[String]): DataFrame =
    fmtKey match {
      case "parquet" => FileCollection.parquet(spark, paths: _*)
      case "geoparquet" => graft.sources.GeoParquet.read(spark, paths)
      case "csv" =>
        val delim = spec.get("delimiter").collect { case JString(d) => d }.getOrElse(",")
        FileCollection.csv(spark, paths, Map("delimiter" -> delim))
      case "jsonl" => spark.read.json(paths: _*)
      case "arrow" => graft.sources.ArrowSource.read(spark, paths)
      case "odv"   => graft.sources.OdvSource.read(spark, paths)
      case "netcdf" | "hdf5" | "tiff" => // one ND container scan path:
        // NetCDF-4 IS an HDF5 container; TIFF/GeoTIFF flattens through
        // the same arrays→tables rule (magic-byte dispatch inside)
        val dims = spec.get("dimensions") match {
          case Some(JArray(ds)) => Some(ds.collect { case JString(d) => d })
          case _ => None
        }
        graft.sources.netcdf.NetcdfSource.read(spark, paths, dims)
      case "zarr" =>
        val dims = spec.get("dimensions") match {
          case Some(JArray(ds)) => Some(ds.collect { case JString(d) => d })
          case _ => None
        }
        graft.sources.zarr.ZarrSource.read(spark, paths, dims)
      case "icechunk" => // read_icechunk(repo [, branch|tag|snapshot])
        require(paths.size == 1, "icechunk takes exactly one repository location")
        def opt(k: String) = spec.get(k).collect { case JString(s) => s }
        graft.sources.icechunk.IcechunkSource.read(spark, paths.head,
          opt("branch"), opt("tag"), opt("snapshot"))
      case "warc" => // read_warc(files [, split_bytes]): crawl archives
        val split = spec.get("split_bytes") match {
          case Some(JInt(n)) => n.toLong
          case Some(JLong(n)) => n
          case None => graft.sources.WarcSource.DefaultSplitBytes
          case other => throw new DslException(s"bad split_bytes: $other")
        }
        // archives that legitimately carry larger records (media
        // captures, non-truncating crawlers) raise the allocation
        // ceiling here without losing the guard
        val maxRec = spec.get("max_record_bytes") match {
          case Some(JInt(n)) => n.toLong
          case Some(JLong(n)) => n
          case None => graft.sources.WarcSource.MaxRecordBytes
          case other => throw new DslException(s"bad max_record_bytes: $other")
        }
        graft.sources.WarcSource.read(spark, paths, split, maxRec)
      case "cdx" => // read_cdx(files [, latest]): CDXJ crawl-index lines
        spec.get("latest") match {
          // latest: true — read the paths as index GENERATIONS and keep
          // the newest capture per SURT key (the incremental-recrawl
          // maintenance read; ties break on filename, then offset).
          // Composes with the surt-range file pruning: pruning keeps
          // every file whose range contains an in-range key, so each
          // such key's full capture history reaches the newest-wins
          // window.
          case Some(JBool(true)) =>
            graft.sources.CdxSource.latest(
              graft.sources.CdxSource.read(spark, paths))
          case None | Some(JBool(false)) =>
            graft.sources.CdxSource.read(spark, paths)
          case Some(other) => throw new DslException(s"bad cdx latest: $other")
        }
      case "bbf" => // read_bbf(files [, entry]): multi-entry binary containers
        val entry = spec.get("entry").collect { case JString(e) => e }
        graft.sources.bbf.BbfSource.read(spark, paths, entry)
      case "atlas" => // read_atlas(store [, dataset]): one store dir
        require(paths.size == 1, "atlas takes exactly one store location")
        val dataset = spec.get("dataset").collect { case JString(d) => d }
        graft.sources.atlas.AtlasSource.read(spark, paths.head, dataset)
      case "delta" => // read_delta(location [, version_or_ts]): one table dir
        require(paths.size == 1, "delta takes exactly one table location")
        graft.sources.delta.DeltaSource.read(spark, paths.head, travelSpec(spec))
      case "iceberg" =>
        require(paths.size == 1, "iceberg takes exactly one table location")
        graft.sources.iceberg.IcebergSource.read(spark, paths.head, travelSpec(spec))
      case other => throw new DslException(s"format '$other' reader not available")
    }

  /** optional time travel: integer version or RFC-3339 timestamp */
  private def travelSpec(spec: Map[String, JValue]): Option[String] =
    spec.get("version_or_timestamp").orElse(spec.get("version")).orElse(spec.get("timestamp"))
      .map {
        case JString(s)  => s
        case JInt(n)     => n.toString
        case JLong(n)    => n.toString
        case other => throw new DslException(s"bad version_or_timestamp: $other")
      }

  // ----------------------------------------------------------- select

  /** Select item → Column (reference Select::to_expr). Function names
    * resolve against the session FunctionRegistry via call_function, so
    * engine functions (st_within_point, try_arrow_cast, …) and all Spark
    * builtins are addressable. */
  def selectItem(v: JValue): Column = v match {
    case JString(name) => col(quote(name))
    case JObject(o) =>
      val m = o.toMap
      val alias = m.get("alias").collect { case JString(a) => a }
      val base =
        if (m.contains("column") || m.contains("column_name"))
          col(quote(str(m.getOrElse("column", m("column_name")), "column")))
        else if (m.contains("function")) {
          val fn = str(m("function"), "function")
          val args = m.get("args") match {
            case Some(JArray(as)) => as.map(selectItem)
            case None => Seq.empty
            case Some(other) => throw new DslException(s"bad args: $other")
          }
          call_function(fn, args: _*)
        } else if (m.contains("value")) literal(m("value"))
        else throw new DslException(s"bad select item: $v")
      alias.map(base.as).getOrElse(base)
    case other => throw new DslException(s"bad select item: $other")
  }

  private def literal(v: JValue): Column = v match {
    case JString(s)  => lit(s)
    case JInt(n)     => lit(n.toDouble)  // DSL numbers are f64 (reference Literal::Number)
    case JLong(n)    => lit(n.toDouble)
    case JDouble(d)  => lit(d)
    case JDecimal(d) => lit(d.toDouble)
    case JBool(b)    => lit(b)
    case JNull       => lit(null)
    case other => throw new DslException(s"bad literal: $other")
  }

  // ----------------------------------------------------------- filter

  def filterExpr(v: JValue, schema: StructType): Column = v match {
    case JObject(o) =>
      val m = o.toMap
      def column: String =
        str(m.getOrElse("column", m.getOrElse("for_query_parameter",
          throw new DslException(s"filter needs column: $v"))), "column")

      if (m.contains("and"))
        m("and") match {
          case JArray(fs) => fs.map(filterExpr(_, schema)).foldLeft(lit(true))(_ && _)
          case other => throw new DslException(s"bad and: $other")
        }
      else if (m.contains("or"))
        m("or") match {
          case JArray(fs) => fs.map(filterExpr(_, schema)).foldLeft(lit(false))(_ || _)
          case other => throw new DslException(s"bad or: $other")
        }
      else if (m.contains("is_not_null") || m.contains("skip_fill_values") || m.contains("skip_missing")) {
        val payload = m.getOrElse("is_not_null",
          m.getOrElse("skip_fill_values", m("skip_missing")))
        col(quote(payloadColumn(payload))).isNotNull
      }
      else if (m.contains("is_null"))
        col(quote(payloadColumn(m("is_null")))).isNull
      else if (m.contains("geometry")) {
        val lonCol = str(m.getOrElse("longitude_column",
          m.getOrElse("longitude_query_parameter",
            throw new DslException("geojson filter needs longitude_column"))), "longitude_column")
        val latCol = str(m.getOrElse("latitude_column",
          m.getOrElse("latitude_query_parameter",
            throw new DslException("geojson filter needs latitude_column"))), "latitude_column")
        val wkt = Geo.geoJsonToWkt(JsonMethods.compact(JsonMethods.render(m("geometry"))))
        GraftFunctions.st_within_point(lit(wkt), col(quote(lonCol)), col(quote(latCol)))
      }
      // between first (untagged order in the reference): both bounds
      // present, with min/max/low/high as legacy aliases
      else if (Seq("gt_eq", "min", "low").exists(m.contains) &&
               Seq("lt_eq", "max", "high").exists(m.contains)) {
        val lo = m(Seq("gt_eq", "min", "low").find(m.contains).get)
        val hi = m(Seq("lt_eq", "max", "high").find(m.contains).get)
        val c = col(quote(column))
        c >= comparisonLit(lo, column, schema) && c <= comparisonLit(hi, column, schema)
      }
      else if (m.contains("eq"))    col(quote(column)) === comparisonLit(m("eq"), column, schema)
      else if (Seq("neq", "not_eq", "not_equal").exists(m.contains)) {
        val v0 = m(Seq("neq", "not_eq", "not_equal").find(m.contains).get)
        col(quote(column)) =!= comparisonLit(v0, column, schema)
      }
      else if (m.contains("gt"))    col(quote(column)) > comparisonLit(m("gt"), column, schema)
      else if (m.contains("gt_eq")) col(quote(column)) >= comparisonLit(m("gt_eq"), column, schema)
      else if (m.contains("lt"))    col(quote(column)) < comparisonLit(m("lt"), column, schema)
      else if (m.contains("lt_eq")) col(quote(column)) <= comparisonLit(m("lt_eq"), column, schema)
      // one-sided range (docs api/querying/json.md: {"column": "time",
      // "min": "2025-01-01"} with no max, and the mirror case)
      else if (Seq("min", "low").exists(m.contains)) {
        val lo = m(Seq("min", "low").find(m.contains).get)
        col(quote(column)) >= comparisonLit(lo, column, schema)
      }
      else if (Seq("max", "high").exists(m.contains)) {
        val hi = m(Seq("max", "high").find(m.contains).get)
        col(quote(column)) <= comparisonLit(hi, column, schema)
      }
      else throw new DslException(s"unrecognized filter: $v")
    case other => throw new DslException(s"bad filter: $other")
  }

  private def payloadColumn(v: JValue): String = v match {
    case JString(c) => c
    case JObject(o) => o.toMap.get("column")
      .orElse(o.toMap.get("for_query_parameter"))
      .collect { case JString(c) => c }
      .getOrElse(throw new DslException(s"bad null-check payload: $v"))
    case other => throw new DslException(s"bad null-check payload: $other")
  }

  /** Comparison literal with the reference's coercion rules. */
  private def comparisonLit(v: JValue, column: String, schema: StructType): Column = {
    val colType = schema.fields.find(_.name == column).map(_.dataType)
    v match {
      case JString(s) =>
        parseLocalDateTime(s) match {
          case Some(ts) => lit(ts)
          case None     => lit(s)
        }
      case JBool(b) => lit(b)
      case JNull    => lit(null)
      case n: JValue =>
        val d = n match {
          case JInt(i)     => i.toDouble
          case JLong(l)    => l.toDouble
          case JDouble(dd) => dd
          case JDecimal(b) => b.toDouble
          case other => throw new DslException(s"bad comparison value: $other")
        }
        coerceNumber(d, colType)
    }
  }

  /** try_coerce_number_to_schema (filter/mod.rs:92-108): narrow the f64
    * to the column type when it fits (truncating fractions into integer
    * columns — pinned); otherwise keep the double literal. */
  def coerceNumber(d: Double, colType: Option[DataType]): Column = colType match {
    case Some(t) if SuperTypeIntegral(t) =>
      val trunc = d.toLong  // toward zero, like num::cast
      val fits = t match {
        case ByteType    => trunc >= Byte.MinValue && trunc <= Byte.MaxValue
        case ShortType   => trunc >= Short.MinValue && trunc <= Short.MaxValue
        case IntegerType => trunc >= Int.MinValue && trunc <= Int.MaxValue
        case _           => d >= Long.MinValue.toDouble && d <= Long.MaxValue.toDouble
      }
      if (!d.isFinite || !fits) lit(d)
      else t match {
        case ByteType    => lit(trunc.toByte)
        case ShortType   => lit(trunc.toShort)
        case IntegerType => lit(trunc.toInt)
        case _           => lit(trunc)
      }
    case Some(FloatType) if d.isFinite &&
        (d == 0.0 || (math.abs(d) >= Float.MinPositiveValue && math.abs(d) <= Float.MaxValue)) =>
      lit(d.toFloat)
    case _ => lit(d)
  }

  private object SuperTypeIntegral {
    def apply(t: DataType): Boolean = graft.core.SuperType.isIntegral(t)
  }

  /** ISO local datetime (what serde's NaiveDateTime accepts): "T" or " "
    * separator, optional fractional seconds. */
  private[dsl] def parseLocalDateTime(s: String): Option[java.sql.Timestamp] = {
    val re = """^(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})(\.\d+)?$""".r
    s match {
      case re(y, mo, da, h, mi, se, frac) =>
        try {
          val ldt = java.time.LocalDateTime.of(
            y.toInt, mo.toInt, da.toInt, h.toInt, mi.toInt, se.toInt,
            Option(frac).map(f => (f.toDouble * 1e9).round.toInt).getOrElse(0))
          Some(java.sql.Timestamp.valueOf(ldt))
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  // ----------------------------------------------------------- sort

  private def sortItem(v: JValue): Column = v match {
    case JObject(o) => o.toMap.toList match {
      case (k, JString(c)) :: Nil if k.equalsIgnoreCase("asc")  => col(quote(c)).asc_nulls_last
      case (k, JString(c)) :: Nil if k.equalsIgnoreCase("desc") => col(quote(c)).desc_nulls_last
      case _ => throw new DslException(s"bad sort item: $v")
    }
    case JString(c) => col(quote(c)).asc_nulls_last
    case other => throw new DslException(s"bad sort item: $other")
  }

  private def str(v: JValue, what: String): String = v match {
    case JString(s) => s
    case other => throw new DslException(s"bad $what: $other")
  }

  private def quote(name: String): String = "`" + name.replace("`", "``") + "`"
}
