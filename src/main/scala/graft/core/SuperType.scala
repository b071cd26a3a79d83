package graft.core

import org.apache.spark.sql.types._

/** Schema super-typing: the widening lattice that merges heterogeneous
  * file schemas and drives UNION ALL BY NAME.
  *
  * Semantics re-expressed from the reference engine's analyzer rule
  * (beacon-datafusion-ext/src/analyzer_rules/union_by_name.rs:120-230) and
  * schema merge (beacon-common/src/super_typing.rs), translated onto Spark's
  * type system:
  *  - Spark has no unsigned integers; readers widen UInt8→Short,
  *    UInt16→Int, UInt32→Long, UInt64→Decimal(20,0) at ingest (SURVEY §1.2),
  *    so the unsigned×signed rows of the reference lattice collapse into
  *    the signed/decimal rows here.
  *  - Spark has a single µs Timestamp and a single Date type, so the
  *    time-unit max rules collapse.
  *  - Nested types (Array/Struct/Map) merge recursively — a Spark-first
  *    extension (the reference surface is flat).
  *
  * Pinned behaviors (reference tests, FIXTURES.md §5):
  *  - mismatched-precision/scale decimals → error (lossy coercion refused)
  *  - decimal with non-zero scale × integer → error
  *  - merge result is independent of input order
  *  - column missing from one input → nullable in the merged schema
  */
object SuperType {

  final class SuperTypeException(msg: String) extends IllegalArgumentException(msg)

  private def err(l: DataType, r: DataType): Nothing =
    throw new SuperTypeException(
      s"no supertype for ${l.simpleString} and ${r.simpleString}")

  private val intOrder: Map[DataType, Int] =
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  def isIntegral(t: DataType): Boolean = intOrder.contains(t)

  /** Least common supertype of two Spark types per the engine lattice. */
  def superType(l: DataType, r: DataType): DataType = (l, r) match {
    case (a, b) if a == b => a

    // Null promotes to the other side
    case (NullType, o) => o
    case (o, NullType) => o

    // String absorbs binary (Utf8 × Binary → Utf8 in the reference)
    case (StringType, BinaryType) | (BinaryType, StringType) => StringType

    // Integral widening
    case (a, b) if isIntegral(a) && isIntegral(b) =>
      if (intOrder(a) >= intOrder(b)) a else b

    // Float widening; integral × float keeps the float width (pinned —
    // Int64 × Float32 → Float32 in the reference, lossy but intentional)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (a, FloatType) if isIntegral(a) => FloatType
    case (FloatType, b) if isIntegral(b) => FloatType
    case (a, DoubleType) if isIntegral(a) => DoubleType
    case (DoubleType, b) if isIntegral(b) => DoubleType

    // Decimal rules: refuse lossy widening
    case (a: DecimalType, b: DecimalType) =>
      if (a.precision == b.precision && a.scale == b.scale) a
      else throw new SuperTypeException(
        s"cannot supercast between different decimal types: " +
          s"${a.precision},${a.scale} vs ${b.precision},${b.scale}")
    case (d: DecimalType, b) if isIntegral(b) =>
      if (d.scale == 0) d
      else throw new SuperTypeException(
        s"cannot supercast decimal with non-zero scale and integer: ${d.simpleString}")
    case (a, d: DecimalType) if isIntegral(a) =>
      if (d.scale == 0) d
      else throw new SuperTypeException(
        s"cannot supercast decimal with non-zero scale and integer: ${d.simpleString}")
    case (_: DecimalType, FloatType | DoubleType) => DoubleType
    case (FloatType | DoubleType, _: DecimalType) => DoubleType

    // Temporal: Spark's single µs timestamp / single date collapse the
    // unit-max rules; LTZ×NTZ is a timezone mismatch → error (the
    // reference requires equal timezones).
    case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) =>
      throw new SuperTypeException(
        "cannot supercast timestamps with different timezone semantics (LTZ vs NTZ)")

    // Intervals: mixed interval kinds promote to CalendarInterval
    // (≈ Arrow MonthDayNano)
    case (_: YearMonthIntervalType, _: DayTimeIntervalType) => CalendarIntervalType
    case (_: DayTimeIntervalType, _: YearMonthIntervalType) => CalendarIntervalType
    case (a: YearMonthIntervalType, _: YearMonthIntervalType) => a
    case (a: DayTimeIntervalType, _: DayTimeIntervalType) => a

    // Nested (Spark-first extension)
    case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
      ArrayType(superType(e1, e2), n1 || n2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
      MapType(superType(k1, k2), superType(v1, v2), n1 || n2)
    case (s1: StructType, s2: StructType) =>
      superTypeSchema(Seq(s1, s2))

    case _ => err(l, r)
  }

  /** Scan-merge lattice — the multi-file schema merge the reference
    * applies when unifying per-file schemas into one listing table
    * (beacon-common/src/super_typing.rs), which is *wider* than the
    * UNION ALL BY NAME coercion rule above:
    *  - Utf8 absorbs any scalar (a string file column merged with a
    *    numeric one reads as string),
    *  - Boolean × numeric → the numeric type,
    *  - integral × Float32/Float64 → Float64 (NOT the float's width:
    *    Int64 → Float32 would corrupt integers above 2^24).
    * Everything else falls through to [[superType]]. Keep [[superType]]
    * for UNION ALL BY NAME; sources use this one. */
  def superTypeScan(l: DataType, r: DataType): DataType = (l, r) match {
    case (a, b) if a == b => a
    case (NullType, o) => o
    case (o, NullType) => o
    // Utf8 absorbs scalars
    case (StringType, o) if isScalar(o) => StringType
    case (o, StringType) if isScalar(o) => StringType
    // Boolean × numeric → numeric
    case (BooleanType, o) if isNumeric(o) => o
    case (o, BooleanType) if isNumeric(o) => o
    // integral × float → double (lossless for 64-bit ints up to 2^53;
    // the reference widens to Float64 for the same reason)
    case (a, FloatType | DoubleType) if isIntegral(a) => DoubleType
    case (FloatType | DoubleType, b) if isIntegral(b) => DoubleType
    case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
      ArrayType(superTypeScan(e1, e2), n1 || n2)
    case _ => superType(l, r)
  }

  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  private def isScalar(t: DataType): Boolean = t match {
    case _: NumericType | BooleanType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Merge N schemas: first-appearance column order (order of names from
    * the first input they appear in), per-column supertype fold, nullable
    * if any input lacks the column or has it nullable. */
  def superTypeSchema(schemas: Seq[StructType]): StructType =
    mergeSchemas(schemas, superType)

  /** [[superTypeSchema]] under the scan-merge lattice (multi-file scans). */
  def superTypeSchemaScan(schemas: Seq[StructType]): StructType =
    mergeSchemas(schemas, superTypeScan)

  private def mergeSchemas(
      schemas: Seq[StructType], lub: (DataType, DataType) => DataType): StructType = {
    require(schemas.nonEmpty, "superTypeSchema of no schemas")
    val ordered = scala.collection.mutable.LinkedHashSet.empty[String]
    schemas.foreach(_.fieldNames.foreach(ordered.add))
    val fields = ordered.toSeq.map { name =>
      var tpe: DataType = NullType
      var nullable = false
      schemas.foreach { s =>
        s.fields.find(_.name == name) match {
          case Some(f) =>
            tpe = lub(tpe, f.dataType)
            nullable ||= f.nullable
          case None =>
            nullable = true
        }
      }
      StructField(name, tpe, nullable)
    }
    StructType(fields)
  }
}
