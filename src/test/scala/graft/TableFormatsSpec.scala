package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.DeltaSource
import graft.sources.iceberg.IcebergSource

/** Delta + Iceberg table-format layer: transaction-log/snapshot round
  * trips through our own minimal writers, time travel, checkpoint
  * replay, partition-branch pruning, and reject paths for the protocol
  * features the readers do not implement. The Iceberg reader is also
  * pointed at the reference repo's own fixture (metadata written by
  * iceberg-rust) to prove it decodes third-party Avro manifests. */
class TableFormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").resolve("t").toString

  // ------------------------------------------------------------ delta

  test("delta: append → read round trip") {
    import spark.implicits._
    val t = freshDir("delta")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "k", "v")
    val v = DeltaSource.Writer.append(df, t)
    assert(v == 0L)
    val back = DeltaSource.read(spark, t)
    assert(back.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("delta: overwrite replaces contents in one commit") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append(Seq((1L, "old")).toDF("id", "k"), t)
    val v = DeltaSource.Writer.overwrite(spark, Seq((9L, "new"), (10L, "new")).toDF("id", "k"), t)
    assert(v == 1L)
    assert(DeltaSource.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq == Seq(9L, 10L))
    // time travel back to v0 still sees the old contents
    assert(DeltaSource.read(spark, t, Some("0")).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("delta: deleteWhere keeps NOT-predicate rows; version time travel") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append((1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "k"), t)
    DeltaSource.Writer.deleteWhere(spark, t, "k = 'even'")
    assert(DeltaSource.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 9L))
    assert(DeltaSource.read(spark, t, Some("0")).count() == 10)
  }

  test("delta: checkpoint replay gives the same snapshot; names the snapshotted version") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append(Seq((1L, "a")).toDF("id", "k"), t)
    DeltaSource.Writer.append(Seq((2L, "b")).toDF("id", "k"), t)
    DeltaSource.Writer.checkpoint(spark, t)
    val ckpt = java.nio.file.Paths.get(t, "_delta_log")
      .resolve(f"${1L}%020d.checkpoint.parquet")
    assert(java.nio.file.Files.exists(ckpt))
    DeltaSource.Writer.append(Seq((3L, "c")).toDF("id", "k"), t)
    // snapshot starts from the checkpoint and replays only commit 2
    assert(DeltaSource.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(DeltaSource.snapshot(spark, t).version == 2L)
  }

  test("delta: timestamp time travel picks the last commit at or before the cutoff") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append(Seq((1L, "a")).toDF("id", "k"), t)
    DeltaSource.Writer.append(Seq((2L, "b")).toDF("id", "k"), t)
    // cutoff far in the future resolves to the latest version
    assert(DeltaSource.resolveVersion(t, Some("2100-01-01T00:00:00Z")) == 1L)
  }

  test("delta: partitioned write prunes branches for partition predicates") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append(
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p"), t, partitionColumns = Seq("p"))
    val df = DeltaSource.read(spark, t)
    assert(df.filter($"p" === "a").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // the p='b' branch constant-folds away: exactly one parquet scan survives
    val scans = df.filter($"p" === "a").queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.length == 1)
  }

  test("delta: 1000-partition table plans as ONE relation and prunes to matched files") {
    import spark.implicits._
    val t = freshDir("delta-manyparts")
    // one REAL partition (p=7) written through the writer...
    DeltaSource.Writer.append(Seq((7L, 7)).toDF("id", "p"), t, partitionColumns = Seq("p"))
    // ...plus 999 partitions that exist only in the log. Planning never
    // opens data files and pruning to p=7 never reads these, so synthetic
    // add actions are enough to prove the scan is O(1) in partition count.
    val log = java.nio.file.Paths.get(t, "_delta_log")
    val adds = (0 until 1000).filterNot(_ == 7).map { i =>
      s"""{"add":{"path":"fake-$i.parquet","partitionValues":{"p":"$i"},""" +
        s""""size":1024,"modificationTime":0,"dataChange":true}}"""
    }
    java.nio.file.Files.write(log.resolve(f"${1L}%020d.json"),
      adds.mkString("", "\n", "\n").getBytes("UTF-8"))
    val df = DeltaSource.read(spark, t)
    // plan is one leaf relation — not a per-partition Union fan
    assert(df.queryExecution.optimizedPlan.collectLeaves().length == 1)
    assert(df.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.isEmpty)
    // partition pruning happens in the manifest: only p=7's real file is read
    val q = df.filter($"p" === 7)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(7L))
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value == 1L)
  }

  test("delta: unsupported protocol features are rejected, not ignored") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append(Seq((1L, "a")).toDF("id", "k"), t)
    val log = java.nio.file.Paths.get(t, "_delta_log")
    // an unknown column mapping mode is rejected, not guessed
    java.nio.file.Files.write(log.resolve(f"${1L}%020d.json"),
      ("""{"metaData":{"id":"m","schemaString":"{\"type\":\"struct\",\"fields\":[]}",""" +
        """"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"bogus"}}}""")
        .getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](DeltaSource.read(spark, t).collect())
    assert(e2.getMessage.contains("column mapping"))
  }

  test("deletion vectors: z85 + roaring codec round-trips, all container kinds") {
    import graft.sources.delta.DeletionVectors._
    // z85 reference vector (ZeroMQ spec test case: "HelloWorld")
    assert(z85Encode(Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)) == "HelloWorld")
    assert(z85Decode("HelloWorld").map(_ & 0xFF).toSeq ==
      Seq(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B))
    // array container (sparse), bitset container (>4096 in one key), and
    // a second 32-bit bitmap (row ≥ 2^32)
    val rows = (0L until 5000L).toArray ++ Array(70000L, (1L << 32) + 7L)
    assert(decodeBitmap(encodeBitmap(rows)).toSeq == rows.toSeq)
    val sparse = Array(1L, 17L, 65536L, 123456L)
    assert(decodeBitmap(encodeBitmap(sparse)).toSeq == sparse.toSeq)
  }

  test("delta: DV deleteWhere removes rows without rewriting data files") {
    import spark.implicits._
    val t = freshDir("delta")
    val df = (1L to 100L).map(i => (i, if (i % 10 == 0) "del" else "keep")).toDF("id", "k")
    DeltaSource.Writer.append(df, t)
    val dataFilesBefore = DeltaSource.snapshot(spark, t).files.map(_.path).toSet
    DeltaSource.Writer.dvDeleteWhere(spark, t, "k = 'del'")
    val snap = DeltaSource.snapshot(spark, t)
    // merge-on-read: same data files, now carrying DVs
    assert(snap.files.map(_.path).toSet == dataFilesBefore)
    assert(snap.files.exists(_.deletionVector.isDefined))
    val got = DeltaSource.read(spark, t).select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (1L to 100L).filterNot(_ % 10 == 0))
    // time travel to v0: all rows
    assert(DeltaSource.read(spark, t, Some("0")).count() == 100)
    // compounding second DV delete merges with the first
    DeltaSource.Writer.dvDeleteWhere(spark, t, "id = 1")
    assert(DeltaSource.read(spark, t).count() == 89)
  }

  test("delta: inline ('i') and absolute-path ('p') deletion vectors decode") {
    import graft.sources.delta.{DeletionVectors => DV}
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append((1L to 20L).toDF("id"), t)
    val snap0 = DeltaSource.snapshot(spark, t)
    val rel = snap0.files.head.path
    // inline: the z85 payload IS the roaring bitmap (rows 0,1,2)
    val inline = DV.z85Encode {
      val data = DV.encodeBitmap(Array(0L, 1L, 2L))
      java.util.Arrays.copyOf(data, (data.length + 3) / 4 * 4) // 4-byte align
    }
    val log = java.nio.file.Paths.get(t, "_delta_log")
    java.nio.file.Files.write(log.resolve(f"${1L}%020d.json"),
      (s"""{"add":{"path":"$rel","partitionValues":{},"size":0,"modificationTime":0,""" +
        s""""dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inline",""" +
        s""""offset":0,"sizeInBytes":${DV.encodeBitmap(Array(0L, 1L, 2L)).length},"cardinality":3}}}""")
        .getBytes("UTF-8"))
    assert(DeltaSource.read(spark, t).count() == 17)
    // absolute path: same bitmap via a DV file named by full path
    val descs = DV.writeFile(java.nio.file.Paths.get(t), Seq(rel -> Array(0L, 1L)))
    val (_, d) = descs.head
    // resolve the file the "u" descriptor names, then reference it as "p"
    val uuidFile = java.nio.file.Files.list(java.nio.file.Paths.get(t)).iterator()
    val dvFile = {
      var f: java.nio.file.Path = null
      while (uuidFile.hasNext) {
        val p = uuidFile.next()
        if (p.getFileName.toString.startsWith("deletion_vector_")) f = p
      }
      f
    }
    java.nio.file.Files.write(log.resolve(f"${2L}%020d.json"),
      (s"""{"add":{"path":"$rel","partitionValues":{},"size":0,"modificationTime":0,""" +
        s""""dataChange":true,"deletionVector":{"storageType":"p","pathOrInlineDv":"$dvFile",""" +
        s""""offset":${d.offset},"sizeInBytes":${d.sizeInBytes},"cardinality":2}}}""")
        .getBytes("UTF-8"))
    assert(DeltaSource.read(spark, t).count() == 18)
  }

  test("delta: DVs survive a checkpoint") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append((1L to 50L).toDF("id"), t)
    DeltaSource.Writer.dvDeleteWhere(spark, t, "id <= 10")
    DeltaSource.Writer.checkpoint(spark, t)
    // replay starts AFTER the checkpointed version, so the DV add is
    // visible only through the checkpoint row — this fails if the
    // checkpoint drops descriptors
    assert(DeltaSource.read(spark, t).count() == 40)
  }

  test("delta: column mapping mode 'name' scans physical names, serves logical") {
    import spark.implicits._
    val t = freshDir("delta")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "label")
    DeltaSource.Writer.appendWithColumnMapping(df, t,
      Map("id" -> "col-a7f2", "label" -> "col-9c1d"))
    val back = DeltaSource.read(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("id", "label"))
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // the data files really do carry the physical names
    val snap = DeltaSource.snapshot(spark, t)
    val raw = spark.read.parquet(
      java.nio.file.Paths.get(t).resolve(snap.files.head.path).toString)
    assert(raw.schema.fieldNames.toSet == Set("col-a7f2", "col-9c1d"))
  }

  test("delta: column mapping mode 'id' binds by parquet field id across renames") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = freshDir("delta")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "label")
    DeltaSource.Writer.appendWithColumnMapping(df, t,
      Map("id" -> "c1", "label" -> "c2"), mode = "id")
    assert(DeltaSource.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
    // simulate a column-mapping RENAME: a new metaData commit changes the
    // physical names while keeping the field ids; the existing parquet
    // files still carry c1/c2 — id mode must bind by field id, which
    // name-mode lookup could not
    def fld(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val renamed = StructType(Seq(
      fld("id", LongType, "renamed-c1", 1L), fld("label", StringType, "renamed-c2", 2L)))
    val schemaJson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.JString(renamed.json)).drop(1).dropRight(1) // keep inner escaping
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      (s"""{"metaData":{"id":"m2","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaJson","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"id"}}}""").getBytes("UTF-8"))
    assert(DeltaSource.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("delta: reachable through DSL, SQL statement and catalog restore") {
    import spark.implicits._
    val t = freshDir("delta")
    DeltaSource.Writer.append(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), t)
    // JSON DSL
    val viaDsl = graft.dsl.JsonQuery.compile(spark,
      s"""{"select": ["id"], "filter": {"column": "k", "eq": "a"},
           "from": {"delta": {"paths": ["$t"]}}}""")
    assert(viaDsl.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // DSL time travel by version
    DeltaSource.Writer.deleteWhere(spark, t, "k = 'a'")
    val viaDslV0 = graft.dsl.JsonQuery.compile(spark,
      s"""{"select": ["id"], "from": {"delta": {"paths": ["$t"], "version": 0}}}""")
    assert(viaDslV0.count() == 2)
    // SQL: CREATE EXTERNAL TABLE ... STORED AS DELTA (+ VERSION AS OF)
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val eng = GraftEngine(spark, wh)
    eng.sql(s"CREATE EXTERNAL TABLE dlt STORED AS DELTA LOCATION '$t'")
    assert(spark.table("dlt").count() == 1)
    eng.sql(s"CREATE EXTERNAL TABLE dlt0 STORED AS DELTA LOCATION '$t' VERSION AS OF 0")
    assert(spark.table("dlt0").count() == 2)
    // restore from persisted definitions re-registers both
    spark.catalog.dropTempView("dlt"); spark.catalog.dropTempView("dlt0")
    GraftEngine(spark, wh).restore()
    assert(spark.table("dlt").count() == 1 && spark.table("dlt0").count() == 2)
  }

  // ---------------------------------------------------------- iceberg

  test("iceberg: append → read round trip with types") {
    import spark.implicits._
    val t = freshDir("iceberg")
    val df = Seq((1L, "a", 1.5, 10), (2L, "b", 2.5, 20)).toDF("id", "name", "v", "flag")
    val snap = IcebergSource.Writer.append(spark, df, t)
    assert(snap == 1L)
    val back = IcebergSource.read(spark, t)
    assert(back.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(back.schema("flag").dataType == org.apache.spark.sql.types.IntegerType)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("iceberg: multi-snapshot append + snapshot-id and timestamp travel") {
    import spark.implicits._
    val t = freshDir("iceberg")
    IcebergSource.Writer.append(spark, Seq((1L, "x")).toDF("id", "k"), t)
    IcebergSource.Writer.append(spark, Seq((2L, "y")).toDF("id", "k"), t)
    assert(IcebergSource.read(spark, t).count() == 2)
    assert(IcebergSource.read(spark, t, Some("1")).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // timestamp in the far future resolves to the latest snapshot
    assert(IcebergSource.snapshot(t, Some("2100-01-01T00:00:00Z")).snapshotId == 2L)
  }

  test("iceberg: decodes the reference fixture's iceberg-rust metadata + manifests") {
    val fixture = "/root/reference/test-datasets/iceberg-example"
    val snap = IcebergSource.snapshot(fixture)
    // per the fixture's snapshot summary: 3 data files, 6 records total
    assert(snap.files.length == 3)
    assert(snap.files.map(_.recordCount).sum == 6L)
    assert(snap.files.forall(_.format == "parquet"))
    // absolute /tmp build paths are relocated under the fixture dir
    assert(snap.files.forall(_.path.startsWith(fixture)))
    // current schema (schema-id 1) carries the evolved 4th column
    assert(snap.schema.fieldNames.toSeq == Seq("id", "name", "value", "qc_flag"))
    // time travel to the first snapshot in the log: 1 data file
    val first = IcebergSource.snapshot(fixture, Some("3936930930679545465"))
    assert(first.files.length == 1)
  }

  test("iceberg: position deletes remove exactly the matched (file, pos) rows") {
    import spark.implicits._
    val t = freshDir("iceberg")
    val df = (1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "k")
    IcebergSource.Writer.append(spark, df, t)
    IcebergSource.Writer.deleteWhere(spark, t, "id IN (2, 5, 9)")
    val snap = IcebergSource.snapshot(t)
    assert(snap.deletes.nonEmpty && snap.deletes.forall(_.content == 1))
    assert(IcebergSource.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L, 6L, 7L, 8L, 10L))
    // travel back before the delete: all rows
    assert(IcebergSource.read(spark, t, Some("1")).count() == 10)
  }

  test("iceberg: equality deletes apply only to data files older than the delete") {
    import spark.implicits._
    val t = freshDir("iceberg")
    IcebergSource.Writer.append(spark,
      Seq((1L, "keep"), (2L, "drop"), (3L, "drop"), (4L, "keep")).toDF("id", "k"), t)
    IcebergSource.Writer.equalityDelete(spark, t, Seq("drop").toDF("k"))
    // re-append a 'drop' row AFTER the delete: sequence semantics keep it
    IcebergSource.Writer.append(spark, Seq((5L, "drop")).toDF("id", "k"), t)
    val got = IcebergSource.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "keep"), (4L, "keep"), (5L, "drop")))
    val snap = IcebergSource.snapshot(t)
    assert(snap.deletes.exists(d => d.content == 2 && d.equalityCols == Seq("k")))
  }

  test("iceberg: position + equality deletes compose in one table") {
    import spark.implicits._
    val t = freshDir("iceberg")
    IcebergSource.Writer.append(spark,
      (1L to 8L).map(i => (i, s"g${i % 3}")).toDF("id", "k"), t)
    IcebergSource.Writer.deleteWhere(spark, t, "id = 7")
    IcebergSource.Writer.equalityDelete(spark, t, Seq("g0").toDF("k"))
    val got = IcebergSource.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq
    // g0 = ids 3,6 (and 7 already position-deleted, 8 ≡ g2)
    assert(got == Seq(1L, 2L, 4L, 5L, 8L))
  }

  test("merge-on-read gate plans: anti-joins, never nested loops or cartesian products") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_iceberg_deletes", "q_delta_dv")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("iceberg: reachable through DSL and SQL statement") {
    import spark.implicits._
    val t = freshDir("iceberg")
    IcebergSource.Writer.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "k"), t)
    val viaDsl = graft.dsl.JsonQuery.compile(spark,
      s"""{"select": ["id"], "filter": {"column": "k", "eq": "b"},
           "from": {"iceberg": {"paths": ["$t"]}}}""")
    assert(viaDsl.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val eng = GraftEngine(spark, wh)
    eng.sql(s"CREATE EXTERNAL TABLE ice STORED AS ICEBERG LOCATION '$t'")
    assert(spark.table("ice").count() == 2)
  }
}
