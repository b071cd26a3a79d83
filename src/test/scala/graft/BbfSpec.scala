package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.bbf.{BbfScanPlanner, BbfSource, BbfSpec => Spec, BbfStore, BbfTools}

/** read_bbf: multi-entry binary container with per-block column
  * statistics pruning (semantics per the reference's bbf bridge,
  * beacon-arrow-bbf/src/datafusion/opener.rs: entries adapt onto the
  * merged table schema with absent columns null, and the pruning index
  * skips containers without reading them, failing open on uncertainty;
  * the byte layout is graft-designed — the beacon-binary-format crate
  * is external to the reference tree). */
class BbfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def freshFile(name: String = "t.bbf"): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-bbf").resolve(name)

  test("bbf: all column types round-trip with nulls across blocks") {
    import spark.implicits._
    val path = freshFile()
    val df = spark.range(0, 10).toDF("id").select(
      $"id".cast(IntegerType).as("i32"),
      $"id".cast(LongType).as("i64"),
      ($"id" * 1.5).as("f64"),
      ($"id" % 2 === 0).as("flag"),
      concat(lit("row-"), $"id").as("s"),
      expr("make_timestamp_ntz(2024, 3, 1, id + 2, 0, 0)").as("ts"),
      to_date(lit("2024-03-01")).as("d"))
      .withColumn("s", when($"i32" === 3, lit(null)).otherwise($"s"))
      .withColumn("f64", when($"i32" === 4, lit(null)).otherwise($"f64"))
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 4)
    val entry = BbfStore.open(path.toString).entry("data")
    assert(entry.blocks.map(_.rows) == Seq(4, 4, 2), "10 rows at blockRows=4")
    val back = BbfSource.read(spark, Seq(path.toString)).orderBy("i32").collect()
    assert(back.length == 10)
    val r3 = back(3); val r5 = back(5)
    assert(r3.isNullAt(r3.fieldIndex("s")))
    assert(back(4).isNullAt(back(4).fieldIndex("f64")))
    assert(r5.getString(r5.fieldIndex("s")) == "row-5")
    assert(r5.getLong(r5.fieldIndex("i64")) == 5L)
    assert(r5.getDouble(r5.fieldIndex("f64")) == 7.5)
    assert(r5.getBoolean(r5.fieldIndex("flag")) == false)
    assert(r5.getAs[java.time.LocalDateTime]("ts") ==
      java.time.LocalDateTime.of(2024, 3, 1, 7, 0, 0))
    assert(String.valueOf(r5.getAs[Any]("d")) == "2024-03-01")
  }

  test("bbf: multi-entry scan is the supercast union; absent columns are null") {
    import spark.implicits._
    val path = freshFile()
    val a = Seq((1, "x", 10.0), (2, "y", 20.0)).toDF("k", "tag", "v")
    // entry b: k is int64 (widens the merged k to int64), no 'tag', extra 'w'
    val b = Seq((3L, 1.5, true), (4L, 2.5, false)).toDF("k", "w", "flag")
    BbfStore.Writer.write(path, Seq("a" -> a, "b" -> b))
    val all = BbfSource.read(spark, Seq(path.toString))
    assert(all.schema("k").dataType == LongType)
    assert(all.count() == 4)
    val rows = all.orderBy("k").collect()
    assert(rows(0).getString(rows(0).fieldIndex("tag")) == "x")
    assert(rows(2).isNullAt(rows(2).fieldIndex("tag")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("w")))
    assert(rows(2).getDouble(rows(2).fieldIndex("w")) == 1.5)
    // single-entry read sees only that entry's native schema
    val justA = BbfSource.read(spark, Seq(path.toString), Some("a"))
    assert(justA.schema.fieldNames.toSeq == Seq("k", "tag", "v"))
    assert(justA.count() == 2)
  }

  test("bbf: numeric block statistics prune partitions and skip chunk reads") {
    import spark.implicits._
    val path = freshFile()
    // 40 sorted rows, blockRows=10 → 4 blocks with disjoint [min,max]
    val df = spark.range(0, 40).toDF("id")
      .select($"id".cast(IntegerType).as("k"), ($"id" * 2.0).as("v"))
      .coalesce(1).orderBy("k")
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 10)
    val spec = Spec(Seq(path.toString -> "data"))
    import org.apache.spark.sql.sources
    def blocks(fs: sources.Filter*): Seq[Int] =
      BbfScanPlanner.partitions(spec, fs.toArray).map(_._3).toSeq
    assert(blocks().size == 4)
    // k >= 35 lives only in the last block
    assert(blocks(sources.GreaterThanOrEqual("k", 35)) == Seq(3))
    // v < 20 (doubles) lives only in the first block
    assert(blocks(sources.LessThan("v", 20.0)) == Seq(0))
    // AND of both is unsatisfiable everywhere
    assert(blocks(sources.GreaterThanOrEqual("k", 35), sources.LessThan("v", 20.0)).isEmpty)
    // end-to-end: the pruned blocks' chunks never open
    val before = BbfStore.chunkReads.get()
    val got = BbfSource.read(spark, Seq(path.toString))
      .filter($"k" >= 35).agg(sum($"v")).collect()(0).getDouble(0)
    assert(got == (35 until 40).map(_ * 2.0).sum)
    val reads = BbfStore.chunkReads.get() - before
    assert(reads <= 2, s"one block × (k,v) chunks expected, got $reads")
  }

  test("bbf: string statistics prune; uncertainty fails open") {
    import spark.implicits._
    val path = freshFile()
    val df = Seq("apple", "apricot", "banana", "cherry", "damson", "elder")
      .toDF("fruit").coalesce(1).orderBy("fruit")
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 2)
    val spec = Spec(Seq(path.toString -> "data"))
    import org.apache.spark.sql.sources
    def blocks(fs: sources.Filter*): Seq[Int] =
      BbfScanPlanner.partitions(spec, fs.toArray).map(_._3).toSeq
    assert(blocks().size == 3)
    assert(blocks(sources.EqualTo("fruit", "banana")) == Seq(1))
    assert(blocks(sources.GreaterThan("fruit", "cherry")) == Seq(2))
    // unknown operator shape: every block kept (fail open)
    assert(blocks(sources.StringContains("fruit", "an")).size == 3)
    // correctness unaffected by pruning
    assert(BbfSource.read(spark, Seq(path.toString))
      .filter($"fruit" === "banana").count() == 1)
  }

  test("bbf: all-null blocks prune under IS NOT NULL and comparisons") {
    import spark.implicits._
    val path = freshFile()
    val df = spark.range(0, 6).toDF("id").select(
      $"id".cast(IntegerType).as("k"),
      when($"id" < 3, $"id" * 1.0).otherwise(lit(null)).as("v"))
      .coalesce(1).orderBy("k")
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 3)
    val spec = Spec(Seq(path.toString -> "data"))
    import org.apache.spark.sql.sources
    def blocks(fs: sources.Filter*): Seq[Int] =
      BbfScanPlanner.partitions(spec, fs.toArray).map(_._3).toSeq
    assert(blocks(sources.IsNotNull("v")) == Seq(0))
    assert(blocks(sources.GreaterThan("v", -1.0)) == Seq(0))
    assert(blocks(sources.IsNull("v")) == Seq(1))
  }

  test("bbf: a many-file collection plans one scan per distinct schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bbf-many")
    // 6 files × 2 entries of schema A, plus one file with schema B
    (0 until 6).foreach { i =>
      BbfStore.Writer.write(dir.resolve(s"part$i.bbf"), Seq(
        "x" -> Seq((i, i * 1.0)).toDF("k", "v"),
        "y" -> Seq((i + 100, i * 2.0)).toDF("k", "v")))
    }
    BbfStore.Writer.write(dir.resolve("other.bbf"),
      Seq("z" -> Seq(("tag", 1L)).toDF("name", "cnt")))
    val paths = (0 until 6).map(i => dir.resolve(s"part$i.bbf").toString) :+
      dir.resolve("other.bbf").toString
    val df = BbfSource.read(spark, paths)
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.size == 2, s"13 (file, entry) members must fold into 2 scans, got ${scans.size}")
    assert(df.count() == 13)
    assert(df.filter($"k" === 103).count() == 1)
  }

  test("bbf: timestamp and date literals prune blocks in stats units") {
    import spark.implicits._
    val path = freshFile()
    // 12 hourly rows on 2024-03-01..03, blockRows=4 → 3 disjoint blocks
    val df = spark.range(0, 12).toDF("id").select(
      expr("make_timestamp_ntz(2024, 3, 1 + CAST(id / 4 AS INT), CAST(id % 4 AS INT), 0, 0)").as("ts"),
      expr("make_date(2024, 3, 1 + CAST(id / 4 AS INT))").as("d"),
      $"id".cast(IntegerType).as("k")).coalesce(1).orderBy("k")
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 4)
    val spec = Spec(Seq(path.toString -> "data"))
    import org.apache.spark.sql.sources
    def blocks(fs: sources.Filter*): Seq[Int] =
      BbfScanPlanner.partitions(spec, fs.toArray).map(_._3).toSeq
    // day 3 lives only in block 2 — LocalDateTime literal (TimestampNTZ pushdown shape)
    assert(blocks(sources.GreaterThanOrEqual("ts",
      java.time.LocalDateTime.of(2024, 3, 3, 0, 0))) == Seq(2))
    // date literal, both java.time and java.sql shapes
    assert(blocks(sources.EqualTo("d", java.time.LocalDate.of(2024, 3, 2))) == Seq(1))
    assert(blocks(sources.LessThan("d", java.sql.Date.valueOf("2024-03-02"))) == Seq(0))
    // end-to-end correctness with the filter applied post-scan too
    assert(BbfSource.read(spark, Seq(path.toString))
      .filter($"ts" >= "2024-03-03").count() == 4)
  }

  test("bbf: column pruning reads only projected chunks") {
    import spark.implicits._
    val path = freshFile()
    val df = spark.range(0, 20).toDF("id").select(
      $"id".cast(IntegerType).as("a"), ($"id" * 1.0).as("b"),
      concat(lit("s"), $"id").as("c"))
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 20)
    val before = BbfStore.chunkReads.get()
    assert(BbfSource.read(spark, Seq(path.toString)).select("b")
      .agg(sum($"b")).collect()(0).getDouble(0) == (0 until 20).map(_ * 1.0).sum)
    assert(BbfStore.chunkReads.get() - before == 1,
      "only column b's single chunk should be read")
  }

  test("bbf: COPY TO egress, LIST DATASETS classification, DSL read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bbf-ls")
    val path = dir.resolve("daily.bbf").toString
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s")
    val receipt = graft.sql.Outputs.copyTo(df, path, None) // inferred from .bbf
    assert(receipt == 3L)
    val listed = graft.sql.Outputs.listDatasets(spark, dir.toString).collect()
    assert(listed.exists(r => r.getString(0) == path && r.getString(1) == "bbf"))
    val viaDsl = graft.dsl.JsonQuery.compile(spark,
      s"""{"select": ["k", "s"], "from": {"bbf": {"paths": ["$path"], "entry": "data"}},
           "sort_by": [{"Asc": "k"}]}""").collect()
    assert(viaDsl.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    val desc = graft.sql.Outputs.describeFormat(spark, "bbf", Seq(path)).collect()
    assert(desc.map(_.getString(0)).toSet == Set("k", "s"))
  }

  test("bbf: repetitive chunks deflate on disk and round-trip exactly") {
    import spark.implicits._
    val path = freshFile()
    // highly repetitive strings + constant doubles: deflate must bite
    val df = spark.range(0, 2000).toDF("id").select(
      lit("the same long repetitive payload string to compress away").as("s"),
      lit(42.0).as("v"),
      $"id".cast(IntegerType).as("k"))
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 2000)
    val entry = BbfStore.open(path.toString).entry("data")
    val chunks = entry.blocks.head.columns
    assert(chunks("s").codec == "deflate" && chunks("v").codec == "deflate",
      s"repetitive chunks should deflate, got ${chunks.view.mapValues(_.codec).toMap}")
    // raw payload would be ≥ 61 bytes/row for s alone; the file must be
    // far smaller than the uncompressed row estimate
    assert(java.nio.file.Files.size(path) < 2000L * 30)
    val back = BbfSource.read(spark, Seq(path.toString))
    assert(back.count() == 2000)
    assert(back.filter($"s" =!= "the same long repetitive payload string to compress away")
      .count() == 0)
    assert(back.agg(sum($"v")).collect()(0).getDouble(0) == 2000 * 42.0)
  }

  test("bbf: scans read columnar (vectorized) into WholeStageCodegen") {
    import spark.implicits._
    val path = freshFile()
    BbfStore.Writer.write(path,
      Seq("data" -> spark.range(0, 100).toDF("id").select($"id".cast(IntegerType).as("k"))))
    val df = BbfSource.read(spark, Seq(path.toString))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"bbf scan should surface ColumnarBatches, plan was:\n$plan")
    assert(df.agg(sum($"k")).collect()(0).getLong(0) == (0 until 100).sum.toLong)
  }

  test("bbf: OR filters keep the union of satisfiable blocks") {
    import spark.implicits._
    val path = freshFile()
    val df = spark.range(0, 30).toDF("id")
      .select($"id".cast(IntegerType).as("k")).coalesce(1).orderBy("k")
    BbfStore.Writer.write(path, Seq("data" -> df), blockRows = 10)
    val spec = Spec(Seq(path.toString -> "data"))
    import org.apache.spark.sql.sources
    val kept = BbfScanPlanner.partitions(spec, Array(
      sources.Or(sources.LessThan("k", 5), sources.GreaterThan("k", 25)))).map(_._3).toSeq
    assert(kept == Seq(0, 2), "OR keeps first and last block, prunes the middle")
    // Not / unknown operators fail open
    assert(BbfScanPlanner.partitions(spec, Array(
      sources.Not(sources.EqualTo("k", 1)))).size == 3)
  }

  test("bbf: unsupported column types and unknown entries fail loudly") {
    import spark.implicits._
    val path = freshFile()
    val bad = Seq((1, Seq(1.0, 2.0))).toDF("k", "vec")
    val e = intercept[IllegalArgumentException] {
      BbfStore.Writer.write(path, Seq("data" -> bad))
    }
    assert(e.getMessage.contains("cannot store column type"))
    BbfStore.Writer.write(path, Seq("data" -> Seq(1, 2).toDF("k")))
    val e2 = intercept[IllegalArgumentException] {
      BbfSource.read(spark, Seq(path.toString), Some("nope")).collect()
    }
    assert(e2.getMessage.contains("'nope' not in"))
  }

  test("bbf: an empty entry round-trips as zero rows with intact schema") {
    import spark.implicits._
    val path = freshFile()
    val empty = Seq((1, "x")).toDF("k", "s").filter($"k" > 99)
    BbfStore.Writer.write(path, Seq("data" -> empty, "full" -> Seq((2, "y")).toDF("k", "s")))
    val entry = BbfStore.open(path.toString).entry("data")
    assert(entry.rows == 0 && entry.blocks.isEmpty)
    assert(entry.sparkSchema.fieldNames.toSeq == Seq("k", "s"))
    val justEmpty = BbfSource.read(spark, Seq(path.toString), Some("data"))
    assert(justEmpty.count() == 0)
    assert(BbfSource.read(spark, Seq(path.toString)).count() == 1)
  }

  test("bbf: glob paths expand (docs: read_bbf('bbf/**/*.bbf'))") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bbf-glob")
    java.nio.file.Files.createDirectories(dir.resolve("sub"))
    BbfStore.Writer.write(dir.resolve("a.bbf"), Seq("d" -> Seq(1).toDF("k")))
    BbfStore.Writer.write(dir.resolve("sub/b.bbf"), Seq("d" -> Seq(2).toDF("k")))
    assert(BbfSource.read(spark, Seq(s"$dir/*.bbf")).count() == 1)
    assert(BbfSource.read(spark, Seq(s"$dir/*/*.bbf")).count() == 1)
    assert(BbfSource.read(spark, Seq(s"$dir/*.bbf", s"$dir/*/*.bbf")).count() == 2)
  }

  test("bbf toolbox: create from a mixed collection, list, pruning index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bbftools")
    // a parquet, a csv and an arrow input file
    Seq((1, "a"), (2, "b")).toDF("k", "s").coalesce(1)
      .write.parquet(dir.resolve("pq").toString)
    val pqFile = new java.io.File(dir.resolve("pq").toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val pqRenamed = dir.resolve("obs_a.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(pqFile), pqRenamed)
    java.nio.file.Files.writeString(dir.resolve("obs_b.csv"), "k,s\n3,c\n4,d\n5,e\n")
    graft.sources.ArrowSource.writeSingleFile(
      Seq((6, "f")).toDF("k", "s"), dir.resolve("obs_c.arrow").toString)
    val out = dir.resolve("all.bbf")
    val n = BbfTools.create(spark,
      Seq(s"$dir/*.parquet", s"$dir/*.csv", s"$dir/*.arrow"), out)
    assert(n == 6)
    val listed = BbfTools.listEntries(spark, out.toString).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(listed == Map("obs_a.parquet" -> 2L, "obs_b.csv" -> 3L, "obs_c.arrow" -> 1L))
    // regex filter (toolbox datasets_regex)
    assert(BbfTools.listEntries(spark, out.toString, Some("csv$")).count() == 1)
    // the pruning index exposes per-(entry, block, column) statistics
    val idx = BbfTools.pruningIndex(spark, out.toString).collect()
    val kRow = idx.find(r => r.getString(0) == "obs_b.csv" && r.getString(2) == "k").get
    assert(kRow.getString(5) == "3.0" && kRow.getString(6) == "5.0")
    // the union scan sees all six rows (supercast across entries)
    assert(BbfSource.read(spark, Seq(out.toString)).count() == 6)
    // unreadable inputs: fail fast by default, skip with the flag
    java.nio.file.Files.writeString(dir.resolve("bad.arrow"), "not arrow")
    intercept[IllegalArgumentException] {
      BbfTools.create(spark, Seq(s"$dir/*.arrow"), dir.resolve("x.bbf"))
    }
    assert(BbfTools.create(spark, Seq(s"$dir/*.arrow"),
      dir.resolve("y.bbf"), skipOnError = true) == 1)
  }

  test("bbf toolbox: logical entry delete and reinterpret-safe datatype update") {
    import spark.implicits._
    val path = freshFile()
    // epoch_day mis-typed as int32 — THE update_schema use case
    BbfStore.Writer.write(path, Seq(
      "a" -> Seq((1, 19789), (2, 19790)).toDF("k", "epoch_day"),
      "b" -> Seq((3, 19791)).toDF("k", "epoch_day")))
    // logical delete: data untouched, scans skip, explicit access rejects
    BbfTools.deleteEntry(path, "b")
    assert(BbfSource.read(spark, Seq(path.toString)).count() == 2)
    assert(BbfTools.listEntries(spark, path.toString).collect()
      .find(_.getString(0) == "b").get.getBoolean(3))
    val e = intercept[IllegalArgumentException] {
      BbfSource.read(spark, Seq(path.toString), Some("b")).collect()
    }
    assert(e.getMessage.contains("logically deleted"))
    BbfTools.undeleteEntry(path, "b")
    assert(BbfSource.read(spark, Seq(path.toString)).count() == 3)
    // int32 → date reinterprets the same 4 bytes as epoch days
    BbfTools.updateDatatype(path, "epoch_day", "date")
    val back = BbfSource.read(spark, Seq(path.toString)).orderBy("k").collect()
    assert(back(0).schema("epoch_day").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(String.valueOf(back(0).getAs[Any]("epoch_day")) ==
      java.time.LocalDate.ofEpochDay(19789).toString)
    // width-changing updates are rejected, not guessed
    val e2 = intercept[IllegalArgumentException] {
      BbfTools.updateDatatype(path, "k", "int64")
    }
    assert(e2.getMessage.contains("not reinterpretation-safe"))
  }

  test("bbf: corrupt or non-bbf files are rejected, not guessed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bbf-bad")
    val notBbf = dir.resolve("x.bbf")
    java.nio.file.Files.write(notBbf, Array.fill(64)(7.toByte))
    assert(!BbfStore.isBbf(notBbf.toString))
    val e = intercept[IllegalArgumentException](BbfStore.open(notBbf.toString))
    assert(e.getMessage.contains("bad magic"))
    // truncated trailer
    val path = freshFile()
    import spark.implicits._
    BbfStore.Writer.write(path, Seq("data" -> Seq(1, 2).toDF("k")))
    val bytes = java.nio.file.Files.readAllBytes(path)
    val cut = dir.resolve("cut.bbf")
    java.nio.file.Files.write(cut, java.util.Arrays.copyOf(bytes, bytes.length - 3))
    intercept[IllegalArgumentException](BbfStore.open(cut.toString))
  }
}
