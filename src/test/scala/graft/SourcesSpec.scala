package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowSource, OdvSource}

/** Arrow IPC + ODV ASCII source coverage. The ODV fixture is the
  * reference repo's own sample spreadsheet (used as INPUT data only). */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  lazy val tmp: String = java.nio.file.Files.createTempDirectory("graft-src").toString

  val odvFixture =
    "/root/reference/beacon-db/beacon-file-formats/beacon-arrow-odv/test-data/test_file.txt"

  test("arrow scans read columnar (zero-copy ArrowColumnVector batches)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-arrowcol")
    val path = s"$tmp/c.arrow"
    ArrowSource.writeSingleFile(
      spark.range(0, 1000).toDF("id").select($"id", ($"id" * 1.5).as("v")), path)
    val df = ArrowSource.read(spark, Seq(path))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"arrow scan should surface ColumnarBatches, plan was:\n$plan")
    assert(df.agg(org.apache.spark.sql.functions.sum($"v")).collect()(0).getDouble(0) ==
      (0 until 1000).map(_ * 1.5).sum)
  }

  test("arrow DSv2: projection prunes the scan's read schema") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-arrowprune")
    val path = s"$tmp/p.arrow"
    ArrowSource.writeSingleFile(
      spark.range(0, 10).toDF("id").select($"id", ($"id" * 2).as("b"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("s"), $"id").as("c")), path)
    val df = ArrowSource.read(spark, Seq(path)).select("b")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.nonEmpty && scans.head.output.map(_.name) == Seq("b"),
      s"scan should read only 'b', got ${scans.map(_.output.map(_.name))}")
    assert(df.collect().map(_.getLong(0)).sorted.sameElements((0 until 10).map(_ * 2L)))
  }

  test("arrow IPC round-trip preserves types, values and nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, 10, 1.5d, 2.5f, "alpha", true),
      (2L, 20, 2.5d, 3.5f, "beta", false))
      .toDF("l", "i", "d", "f", "s", "b")
      .withColumn("maybe", org.apache.spark.sql.functions
        .when($"l" === 1, $"s"))
    val path = s"$tmp/roundtrip.arrow"
    ArrowSource.writeSingleFile(df, path)

    val back = ArrowSource.read(spark, Seq(path))
    assert(back.schema("l").dataType == LongType)
    assert(back.schema("i").dataType == IntegerType)
    assert(back.schema("f").dataType == FloatType)
    assert(back.schema("b").dataType == BooleanType)
    val rows = back.orderBy("l").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("maybe") == "alpha")
    assert(rows(1).isNullAt(rows(1).fieldIndex("maybe")))
    assert(rows(1).getAs[Float]("f") == 3.5f)
  }

  test("arrow read merges heterogeneous files through the supercast lattice") {
    import spark.implicits._
    ArrowSource.writeSingleFile(Seq((1, 1.5f)).toDF("k", "v"), s"$tmp/m1.arrow")
    ArrowSource.writeSingleFile(Seq((2L, 2.5d, "x")).toDF("k", "v", "extra"), s"$tmp/m2.arrow")
    val df = ArrowSource.read(spark, Seq(s"$tmp/m1.arrow", s"$tmp/m2.arrow"))
    assert(df.schema("k").dataType == LongType)
    assert(df.schema("v").dataType == DoubleType)
    assert(df.count() == 2)
    assert(df.filter("extra IS NULL").count() == 1)
  }

  test("arrow timestamp columns round-trip at microsecond precision") {
    import spark.implicits._
    val t = java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 15, 123456000)
    val df = Seq(Tuple1(t)).toDF("ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    ArrowSource.writeSingleFile(df, s"$tmp/ts.arrow")
    val back = ArrowSource.read(spark, Seq(s"$tmp/ts.arrow")).collect()
    assert(back(0).getAs[java.time.LocalDateTime](0) == t)
  }

  test("ODV: schema mapping from semantic headers") {
    val odv = OdvSource.readSchema(odvFixture)
    val s = odv.schema
    assert(s("Cruise").dataType == StringType)
    assert(s("yyyy-mm-ddThh:mm:ss.sss").dataType == TimestampNTZType)
    assert(s("Longitude").dataType == FloatType)
    assert(s("Longitude").metadata.getString("units") == "degrees_east")
    assert(s("EDMO_code").dataType == LongType)
    // QV:SEADATANET after "Depth [m]" → Depth_qc
    assert(s.fieldNames.contains("Depth_qc"))
    // trailing QV:SEADATANET:SAMPLE → SAMPLE_qc
    assert(s.fieldNames.contains("SAMPLE_qc"))
  }

  test("ODV: .zst spreadsheets decompress transparently (reference fixture)") {
    val zst = "/root/reference/test-datasets/test_file.txt.zst"
    val plain = "/root/reference/test-datasets/test_file.txt"
    val a = OdvSource.read(spark, Seq(zst))
    val b = OdvSource.read(spark, Seq(plain))
    assert(a.schema == b.schema)
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ODV: data rows parse with NULL empties and typed values") {
    val df = OdvSource.read(spark, Seq(odvFixture))
    assert(df.count() > 0)
    val r = df.orderBy("Depth").limit(1).collect()(0)
    assert(r.getAs[String]("Cruise") == "1/86")
    assert(r.getAs[Float]("Longitude") == -9.665497f)
    assert(r.getAs[java.time.LocalDateTime]("yyyy-mm-ddThh:mm:ss.sss") ==
      java.time.LocalDateTime.of(1986, 9, 21, 0, 24, 0))
    // unmeasured parameters are NULL (empty cells)
    val phIdx = df.schema.fieldNames.indexWhere(_.startsWith("Water body pH"))
    assert(phIdx >= 0 && r.isNullAt(phIdx))
  }

  test("ODV through the JSON DSL from clause") {
    val q = s"""{"select": ["Cruise", "Station", "Depth"],
                 "filter": {"column": "Depth", "lt_eq": 10},
                 "from": {"odv": {"paths": ["$odvFixture"]}}}"""
    val rows = graft.dsl.JsonQuery.compile(spark, q).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Float]("Depth") <= 10))
  }
}
