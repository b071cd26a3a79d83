package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SuperType
import graft.core.SuperType.SuperTypeException

/** Pins the widening lattice (FIXTURES.md §5; reference
  * union_by_name.rs:120-230 + super_typing.rs tests). */
class SuperTypeSpec extends AnyFunSuite {
  import SuperType._

  test("equal types are identity") {
    for (t <- Seq(IntegerType, StringType, DoubleType, DateType, BooleanType))
      assert(superType(t, t) == t)
  }

  test("null promotes to the other side") {
    assert(superType(NullType, LongType) == LongType)
    assert(superType(StringType, NullType) == StringType)
  }

  test("integer widening") {
    assert(superType(ByteType, ShortType) == ShortType)
    assert(superType(ShortType, LongType) == LongType)
    assert(superType(IntegerType, LongType) == LongType)
    assert(superType(LongType, ByteType) == LongType)
  }

  test("int × float keeps float width (pinned lossy rule)") {
    assert(superType(LongType, FloatType) == FloatType)
    assert(superType(FloatType, IntegerType) == FloatType)
    assert(superType(LongType, DoubleType) == DoubleType)
    assert(superType(FloatType, DoubleType) == DoubleType)
  }

  test("UInt64-stand-in decimal: Int64 × Decimal(20,0) → Decimal(20,0)") {
    assert(superType(LongType, DecimalType(20, 0)) == DecimalType(20, 0))
  }

  test("mismatched decimals error") {
    intercept[SuperTypeException](superType(DecimalType(10, 2), DecimalType(12, 2)))
    intercept[SuperTypeException](superType(DecimalType(10, 2), DecimalType(10, 3)))
  }

  test("decimal with non-zero scale × integer errors") {
    intercept[SuperTypeException](superType(DecimalType(10, 2), IntegerType))
  }

  test("decimal × float → double") {
    assert(superType(DecimalType(20, 0), FloatType) == DoubleType)
    assert(superType(DoubleType, DecimalType(10, 2)) == DoubleType)
  }

  test("string absorbs binary") {
    assert(superType(StringType, BinaryType) == StringType)
  }

  test("no supertype for incompatible pairs") {
    intercept[SuperTypeException](superType(DateType, LongType))
    intercept[SuperTypeException](superType(BooleanType, IntegerType))
    intercept[SuperTypeException](superType(TimestampType, TimestampNTZType))
  }

  test("nested arrays merge recursively") {
    assert(superType(ArrayType(IntegerType, false), ArrayType(DoubleType, true))
      == ArrayType(DoubleType, true))
  }

  test("schema merge: FIXTURES §5 two-file example") {
    val a = StructType(Seq(
      StructField("temperature", FloatType), StructField("depth", IntegerType),
      StructField("salinity", DoubleType)))
    val b = StructType(Seq(
      StructField("temperature", DoubleType), StructField("depth", LongType)))
    val merged = superTypeSchema(Seq(a, b))
    assert(merged("temperature").dataType == DoubleType)
    assert(merged("depth").dataType == LongType)
    assert(merged("salinity").dataType == DoubleType)
    assert(merged("salinity").nullable)
  }

  private val scalarTypes: Seq[DataType] = Seq(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, BooleanType, DateType, TimestampType,
    DecimalType(20, 0), NullType)

  test("supertype is commutative over all scalar pairs (or errors on both sides)") {
    for (a <- scalarTypes; b <- scalarTypes) {
      val lr = try Right(superType(a, b)) catch { case e: SuperTypeException => Left(()) }
      val rl = try Right(superType(b, a)) catch { case e: SuperTypeException => Left(()) }
      assert(lr.isRight == rl.isRight, s"$a x $b asymmetric")
      (lr, rl) match {
        case (Right(x), Right(y)) => assert(x == y, s"$a x $b -> $x vs $y")
        case _ =>
      }
    }
  }

  test("supertype is associative over compatible triples") {
    val ts = Seq[DataType](IntegerType, LongType, FloatType, DoubleType, NullType)
    for (a <- ts; b <- ts; c <- ts) {
      assert(superType(superType(a, b), c) == superType(a, superType(b, c)),
        s"($a,$b,$c) not associative")
    }
  }

  test("schema merge is order-independent on types") {
    val a = StructType(Seq(StructField("x", IntegerType), StructField("y", FloatType)))
    val b = StructType(Seq(StructField("y", DoubleType), StructField("z", StringType)))
    val c = StructType(Seq(StructField("x", LongType)))
    val perms = Seq(Seq(a, b, c), Seq(c, b, a), Seq(b, a, c)).map(superTypeSchema)
    val typeSets = perms.map(_.fields.map(f => (f.name, f.dataType, f.nullable)).toSet)
    assert(typeSets.distinct.size == 1)
  }

  // scan-merge lattice (super_typing.rs): wider than the union rule
  test("scan lattice: Utf8 absorbs scalars, bool x numeric, int x float -> double") {
    import SuperType.superTypeScan
    assert(superTypeScan(StringType, LongType) == StringType)
    assert(superTypeScan(DoubleType, StringType) == StringType)
    assert(superTypeScan(StringType, BooleanType) == StringType)
    assert(superTypeScan(BooleanType, IntegerType) == IntegerType)
    assert(superTypeScan(FloatType, BooleanType) == FloatType)
    // Int64 x Float32 must widen to Double in a scan merge — Float32
    // would corrupt integers above 2^24 (ADVICE r1)
    assert(superTypeScan(LongType, FloatType) == DoubleType)
    assert(superTypeScan(FloatType, IntegerType) == DoubleType)
    // union rule intentionally differs (keeps float width)
    assert(SuperType.superType(LongType, FloatType) == FloatType)
    // fall-through to the shared rules
    assert(superTypeScan(IntegerType, LongType) == LongType)
    assert(superTypeScan(FloatType, DoubleType) == DoubleType)
  }
}
