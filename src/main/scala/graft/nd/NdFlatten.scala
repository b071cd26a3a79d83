package graft.nd

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The arrays→tables flattening rule (reference
  * docs/2.0.0-rc2/arrays-to-tables.md:13-24; broadcast stride engine
  * beacon-datafusion-ext/src/nd/broadcast.rs):
  *
  *  1. The grid = dimensions of the largest-volume variable (or the
  *     explicit `dimensions` argument). Row count = product of grid
  *     dimension sizes; rows enumerate the grid in C-order (last dim
  *     cycles fastest).
  *  2. Full-grid variables map element-for-element; lower-rank
  *     variables broadcast by stride arithmetic (their value repeats
  *     across the dims they lack); scalars are constant columns.
  *  3. Variables with any dimension outside the grid are dropped
  *     ("excluded variables").
  *  4. Attribute columns: `<variable>.<attribute>` per variable
  *     attribute and `.<attribute>` per global attribute — constant
  *     strings.
  *
  * CF decoding (cf-decoding.md; applied per variable before flattening):
  *  - `units` containing " since " → timestamp column (µs — the
  *    reference keeps ns; documented divergence, SURVEY §7.3),
  *    proleptic Gregorian only.
  *  - `scale_factor` / `add_offset` → value*scale+offset as double.
  *  - `_FillValue` → NULL. `missing_value`/`valid_min`/`valid_max`
  *    are deliberately ignored (pinned reference behavior).
  *
  * Distribution: rows are generated partition-parallel from row-index
  * ranges; variable arrays travel as a Spark broadcast. That is the
  * right shape for in-memory datasets and small-file scans; for
  * 100 TB containers the same stride math runs inside a DSv2 reader
  * where partition = chunk and only chunk-local slabs load (SURVEY
  * §7.1 step 7) — the rule below is that reader's core.
  */
object NdFlatten {

  final case class DecodedVar(
      name: String,
      dims: Seq[String],
      tpe: DataType,                    // Double, TimestampNTZ or String
      data: Array[Double],              // NaN = null after fill handling
      fill: Option[Double],
      timeBase: Option[(Long, Long)],   // (epochMicros of base, microsPerUnit)
      sdata: Array[String] = null)      // string variables pass through

  /** Everything needed to turn row indexes into rows — shared by the
    * Spark range-partitioned path and the per-task local path used by
    * the file readers (partition = file). */
  final case class FlattenPlan(
      schema: StructType,
      rowCount: Long,
      varPlans: Array[(DecodedVar, Array[(Int, Long)])],
      gridStrides: Array[Long],
      gridSizes: Array[Int],
      attrVals: Array[String]) extends Serializable

  def plan(ds: NdDataset, dimensions: Option[Seq[String]]): FlattenPlan = {
    val grid: Seq[String] = dimensions.getOrElse {
      val largest = ds.variables.maxBy(v => (ds.volume(v), -ds.variables.indexOf(v)))
      largest.dims
    }
    require(grid.nonEmpty, "grid selection produced no dimensions")
    val gridSizes = grid.map(ds.dimSize)
    val rowCount = gridSizes.map(_.toLong).product

    // keep only variables whose dims all lie inside the grid
    val kept = ds.variables.filter(_.dims.forall(grid.contains))
    val decoded = kept.map(decode)

    // stride of each grid dim in C-order row index
    val gridStrides = new Array[Long](grid.length)
    var acc = 1L
    for (i <- grid.indices.reverse) {
      gridStrides(i) = acc
      acc *= gridSizes(i)
    }
    // per variable: for each of ITS dims (in its own order), the grid
    // position and its own C-order stride
    val varPlans: Seq[(DecodedVar, Array[(Int, Long)])] = decoded.map { v =>
      var vAcc = 1L
      val plan = new Array[(Int, Long)](v.dims.length)
      for (i <- v.dims.indices.reverse) {
        plan(i) = (grid.indexOf(v.dims(i)), vAcc)
        vAcc *= ds.dimSize(v.dims(i))
      }
      (v, plan)
    }

    val dataCols = decoded.map(v => StructField(v.name, v.tpe, nullable = true))
    val attrCols =
      kept.flatMap(v => v.attrs.keys.map(a => StructField(s"${v.name}.$a", StringType))) ++
        ds.globalAttrs.keys.map(a => StructField(s".$a", StringType))
    val schema = StructType(dataCols ++ attrCols)
    val attrVals: Seq[String] =
      kept.flatMap(v => v.attrs.values.toSeq) ++ ds.globalAttrs.values.toSeq

    FlattenPlan(schema, rowCount, varPlans.toArray, gridStrides,
      gridSizes.toArray, attrVals.toArray)
  }

  /** One row of the flattened table from its C-order row index. */
  def rowAt(p: FlattenPlan, r: Long, idx: Array[Long]): Row = {
    val nGrid = p.gridStrides.length
    var i = 0
    while (i < nGrid) {
      idx(i) = (r / p.gridStrides(i)) % p.gridSizes(i)
      i += 1
    }
    val plans = p.varPlans
    val vals = new Array[Any](plans.length + p.attrVals.length)
    var vi = 0
    while (vi < plans.length) {
      val (v, plan) = plans(vi)
      var flat = 0L
      var d = 0
      while (d < plan.length) {
        flat += idx(plan(d)._1) * plan(d)._2
        d += 1
      }
      vals(vi) =
        if (v.sdata != null) v.sdata(flat.toInt)
        else decodeValue(v, v.data(flat.toInt))
      vi += 1
    }
    var ai = 0
    while (ai < p.attrVals.length) {
      vals(plans.length + ai) = p.attrVals(ai)
      ai += 1
    }
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }

  /** Local (no Spark) flattened rows — the per-task path of the file
    * readers: each task parses its file and streams rows. */
  def localRows(ds: NdDataset, dimensions: Option[Seq[String]] = None): (StructType, Iterator[Row]) = {
    val p = plan(ds, dimensions)
    val idx = new Array[Long](p.gridStrides.length)
    (p.schema, (0L until p.rowCount).iterator.map(r => rowAt(p, r, idx)))
  }

  /** Flatten with the default grid (largest-volume variable). */
  def flatten(spark: SparkSession, ds: NdDataset, partitions: Int = 0): DataFrame =
    flatten(spark, ds, None, partitions)

  def flatten(spark: SparkSession, ds: NdDataset, dimensions: Option[Seq[String]],
      partitions: Int): DataFrame = {
    val p = plan(ds, dimensions)
    val nParts = if (partitions > 0) partitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (p.rowCount / 65536 + 1).toInt))
    val bc = spark.sparkContext.broadcast(p)

    val enc = RowEncoder.encoderFor(p.schema)
    import spark.implicits._
    spark.range(0, p.rowCount, 1, nParts).as[Long].mapPartitions { it =>
      val plan = bc.value
      val idx = new Array[Long](plan.gridStrides.length)
      it.map(r => rowAt(plan, r, idx))
    }(enc).toDF()
  }

  // ------------------------------------------------------ CF decoding

  private val sinceRe = """(?i)^\s*(\w+)\s+since\s+(.+?)\s*$""".r

  /** tolerant _FillValue parse: plain number, NaN, or (zarr) base64 of
    * the raw little-endian float/double bytes */
  def parseFill(s: String): Option[Double] = {
    scala.util.Try(s.toDouble).toOption.orElse {
      scala.util.Try {
        val bytes = java.util.Base64.getDecoder.decode(s)
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bytes.length match {
          case 8 => bb.getDouble()
          case 4 => bb.getFloat().toDouble
          case _ => throw new IllegalArgumentException(s)
        }
      }.toOption
    }
  }

  /** Planning-time pruning stats for a raw coordinate slab: min/max in
    * the SAME units the flattened rows (and therefore filter literals)
    * carry — scale_factor/add_offset applied, _FillValue and NaN
    * elements excluded. None when the axis is CF-time encoded (filter
    * literals arrive as timestamps, not raw numbers) or when no
    * comparable value remains — callers must keep the chunk/file then. */
  def pruneStats(attrs: Map[String, String], raw: Array[Double]): Option[(Double, Double)] = {
    if (attrs.get("units").exists(_.contains(" since "))) return None
    val fill = attrs.get("_FillValue").flatMap(parseFill)
    val scale = attrs.get("scale_factor").map(_.toDouble).getOrElse(1.0)
    val offset = attrs.get("add_offset").map(_.toDouble).getOrElse(0.0)
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var any = false
    var i = 0
    while (i < raw.length) {
      val r = raw(i)
      if (!r.isNaN && !fill.contains(r)) {
        val v = r * scale + offset
        if (!v.isNaN) {
          if (v < mn) mn = v
          if (v > mx) mx = v
          any = true
        }
      }
      i += 1
    }
    if (any) Some((mn, mx)) else None
  }

  private[nd] def decode(v: NdVariable): DecodedVar = {
    if (v.isString)
      return DecodedVar(v.name, v.dims, StringType, null, None, None, v.sdata)
    val fill = v.attrs.get("_FillValue").flatMap(parseFill)
    // CF `calendar` scopes the BASE-date parse (offsets are uniform
    // unit counts in every supported calendar, so only the date→instant
    // conversion differs); unsupported calendars reject loudly rather
    // than decoding proleptic-Gregorian-wrong
    val calendar = v.attrs.get("calendar").map(_.trim.toLowerCase).getOrElse("standard")
    val timeBase = v.attrs.get("units").flatMap {
      case sinceRe(unit, base) =>
        unitMicros(unit).map(m => (parseBaseMicros(base, calendar), m))
      case _ => None
    }
    val scale = v.attrs.get("scale_factor").map(_.toDouble)
    val offset = v.attrs.get("add_offset").map(_.toDouble)
    val scaled =
      if (scale.isDefined || offset.isDefined)
        v.data.map(x => x * scale.getOrElse(1.0) + offset.getOrElse(0.0))
      else v.data
    // fill check happens against the RAW value, before scale/offset
    val withFill = fill match {
      case Some(f) => v.data.zip(scaled).map { case (raw, x) => if (raw == f) Double.NaN else x }
      case None => scaled
    }
    val tpe = if (timeBase.isDefined) TimestampNTZType else DoubleType
    DecodedVar(v.name, v.dims, tpe, withFill, fill, timeBase)
  }

  private def decodeValue(v: DecodedVar, x: Double): Any =
    if (x.isNaN) null
    else v.timeBase match {
      case Some((baseMicros, perUnit)) =>
        java.time.LocalDateTime.ofEpochSecond(0, 0, java.time.ZoneOffset.UTC)
          .plusNanos((baseMicros + (x * perUnit).toLong) * 1000L)
      case None => x
    }

  private[nd] def unitMicros(unit: String): Option[Long] = unit.toLowerCase match {
    case "day" | "days" | "d"                      => Some(86400L * 1000000L)
    case "hour" | "hours" | "h" | "hr" | "hrs"     => Some(3600L * 1000000L)
    case "minute" | "minutes" | "min" | "mins"     => Some(60L * 1000000L)
    case "second" | "seconds" | "sec" | "secs" | "s" => Some(1000000L)
    case "millisecond" | "milliseconds" | "ms"     => Some(1000L)
    case "microsecond" | "microseconds" | "us"     => Some(1L)
    case _ => None
  }

  /** "1950-01-01", "1950-01-01 00:00:00", optional 'T' separator and a
    * trailing UTC/Z/+00:00 zone designator, UTC.
    *
    * `calendar` is the CF attribute (case-folded): standard/gregorian/
    * proleptic_gregorian parse proleptic Gregorian (the pre-1582
    * standard-calendar cutover is out of scope, matching the
    * reference's Gregorian+Julian support, cf-decoding.md:16-43);
    * `julian` interprets the base DATE under Julian leap rules and
    * maps it to the equivalent instant (e.g. julian 1858-11-05 =
    * gregorian 1858-11-17). Non-instant calendars (360_day, noleap,
    * all_leap, none) cannot map to timestamps and reject loudly. */
  def parseBaseMicros(base: String, calendar: String = "standard"): Long = {
    var norm = base.trim
      .replaceAll("(?i)\\s*(UTC|GMT|Z|\\+0+:?0*)\\s*$", "")
      .trim.replace("T", " ")
    val withTime = if (norm.contains(" ")) norm else s"$norm 00:00:00"
    calendar match {
      case "standard" | "gregorian" | "proleptic_gregorian" | "" =>
        val ldt = java.time.LocalDateTime.parse(withTime.replace(" ", "T"))
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case "julian" =>
        val Array(datePart, timePart) = withTime.split(" ", 2)
        val neg = datePart.startsWith("-")
        val ds = (if (neg) datePart.substring(1) else datePart).split("-")
        require(ds.length == 3, s"unparseable julian base date '$datePart'")
        val y = ds(0).toInt * (if (neg) -1 else 1)
        val m = ds(1).toInt
        val d = ds(2).toInt
        require(m >= 1 && m <= 12 && d >= 1 && d <= 31,
          s"unparseable julian base date '$datePart'")
        // Julian-calendar date → Julian Day Number (Fliegel/Van Flandern
        // form for the Julian calendar), then to the 1970-01-01 epoch
        // (Gregorian JDN 2440588)
        val a = (14 - m) / 12
        val y2 = y + 4800 - a
        val m2 = m + 12 * a - 3
        val jdn = d.toLong + (153L * m2 + 2) / 5 + 365L * y2 + y2 / 4 - 32083L
        val lt = java.time.LocalTime.parse(timePart)
        (jdn - 2440588L) * 86400000000L + lt.toNanoOfDay / 1000L
      case other =>
        throw new IllegalArgumentException(
          s"unsupported CF calendar '$other': supported calendars are " +
            "standard/gregorian/proleptic_gregorian and julian; " +
            "360_day/noleap/all_leap grids have no timestamp equivalent — " +
            "drop or rename the 'units … since' attribute to read the raw numbers")
    }
  }
}
