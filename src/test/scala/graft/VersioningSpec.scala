package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.TableVersions

/** Versioned managed storage (the Lance-versioned-commits analog,
  * beacon-lance/src/io.rs:207): every mutation of a plain managed table
  * publishes an immutable manifest; SHOW HISTORY / tableAt / RESTORE /
  * VACUUM operate over the log. */
class VersioningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  lazy val wh: String = java.nio.file.Files.createTempDirectory("graft-verwh").toString
  lazy val engine: GraftEngine = GraftEngine(spark, wh)
  val sf = "/root/testdata/sf0.001"

  test("CTAS/INSERT/DELETE publish versions; time travel reads each") {
    engine.sql(s"CREATE EXTERNAL TABLE ver_nation STORED AS parquet LOCATION '$sf/nation.parquet'")
    engine.sql("CREATE TABLE ver_t AS SELECT n_nationkey, n_name FROM ver_nation WHERE n_nationkey < 10")
    engine.sql("INSERT INTO ver_t SELECT n_nationkey, n_name FROM ver_nation WHERE n_nationkey >= 20")
    engine.sql("DELETE FROM ver_t WHERE n_nationkey % 2 = 0")

    val h = engine.catalog.history("ver_t")
    assert(h.map(e => (e.version, e.operation)) ==
      Seq((1L, "create"), (2L, "insert"), (3L, "delete")))
    // append shares commit dirs with the prior version — no data copied
    assert(h(1).dirs.take(1) == h(0).dirs && h(1).dirs.size == 2)

    assert(engine.catalog.tableAt("ver_t", 1).count() == 10)
    assert(engine.catalog.tableAt("ver_t", 2).count() == 15)
    assert(engine.catalog.tableAt("ver_t", 3).count() == 7)
    assert(engine.sql("SELECT count(*) FROM ver_t").collect()(0).getLong(0) == 7)
  }

  test("SHOW HISTORY / RESTORE statements") {
    val rows = engine.sql("SHOW HISTORY FOR ver_t").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "create"), (2L, "insert"), (3L, "delete")))
    engine.sql("RESTORE TABLE ver_t VERSION AS OF 2")
    assert(engine.sql("SELECT count(*) FROM ver_t").collect()(0).getLong(0) == 15)
    val h = engine.catalog.history("ver_t")
    assert(h.last.operation == "restore:v2")
    // restore is metadata-only: it references version 2's commit dirs
    assert(h.last.dirs == h(1).dirs)
  }

  test("INSERT OVERWRITE starts a fresh commit set") {
    engine.sql("INSERT OVERWRITE ver_t SELECT n_nationkey, n_name FROM ver_nation WHERE n_nationkey = 0")
    val h = engine.catalog.history("ver_t")
    assert(h.last.operation == "insert_overwrite" && h.last.dirs.size == 1)
    assert(engine.sql("SELECT count(*) FROM ver_t").collect()(0).getLong(0) == 1)
    // the overwritten-away versions still read until VACUUM
    assert(engine.catalog.tableAt("ver_t", 3).count() == 7)
  }

  test("VACUUM drops old manifests and unreferenced commits; current survives") {
    val before = TableVersions.list(wh, "ver_t").size
    engine.sql("VACUUM ver_t RETAIN 1 VERSIONS")
    val h = TableVersions.list(wh, "ver_t")
    assert(h.size == 1 && h.head.operation == "insert_overwrite")
    assert(before > 1)
    assert(engine.sql("SELECT count(*) FROM ver_t").collect()(0).getLong(0) == 1)
    val gone = intercept[IllegalArgumentException] {
      engine.catalog.tableAt("ver_t", 1)
    }
    assert(gone.getMessage.contains("no version 1"))
    // vacuumed commit dirs are physically gone
    val dd = java.nio.file.Paths.get(wh, "ver_t")
    val left = java.nio.file.Files.list(dd).iterator()
    var dirs = List.empty[String]
    while (left.hasNext) dirs ::= left.next().getFileName.toString
    assert(dirs.count(_.startsWith("c")) == 1)
  }

  test("RESTORE to a vacuumed version fails loudly") {
    val e = intercept[IllegalArgumentException] {
      engine.sql("RESTORE TABLE ver_t VERSION AS OF 2")
    }
    assert(e.getMessage.contains("no version 2"))
  }

  test("partitioned managed tables version across multi-root commits") {
    engine.sql(s"CREATE EXTERNAL TABLE ver_orders STORED AS parquet LOCATION '$sf/orders.parquet'")
    engine.sql("""CREATE TABLE ver_p PARTITIONED BY (o_orderstatus) AS
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM ver_orders WHERE o_orderkey % 2 = 0""")
    engine.sql("""INSERT INTO ver_p
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM ver_orders WHERE o_orderkey % 2 = 1""")
    val full = engine.sql("SELECT count(*) FROM ver_orders").collect()(0).getLong(0)
    // current version reads across two commit roots, partition column intact
    assert(engine.sql("SELECT count(*) FROM ver_p").collect()(0).getLong(0) == full)
    val st = engine.sql(
      "SELECT count(DISTINCT o_orderstatus) FROM ver_p").collect()(0).getLong(0)
    assert(st == 3)
    // partition pruning still works over the multi-root relation
    val v1 = engine.catalog.tableAt("ver_p", 1)
    assert(v1.count() < full && v1.columns.contains("o_orderstatus"))
  }

  test("ALTER publishes a version; old version keeps the old schema") {
    engine.sql("CREATE TABLE ver_a AS SELECT n_nationkey, n_name FROM ver_nation WHERE n_nationkey < 5")
    engine.sql("ALTER TABLE ver_a ADD COLUMN note STRING")
    val h = engine.catalog.history("ver_a")
    assert(h.map(_.operation) == Seq("create", "alter"))
    assert(!engine.catalog.tableAt("ver_a", 1).columns.contains("note"))
    assert(engine.sql("SELECT * FROM ver_a").columns.contains("note"))
  }

  test("legacy (pre-versioning) data dir imports on first mutation") {
    import spark.implicits._
    val dd = java.nio.file.Paths.get(wh, "leg_t")
    Seq((1, "a"), (2, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(dd.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wh, "_catalog", "leg_t.json"),
      """{"name": "leg_t", "kind": "managed"}""")
    val eng2 = GraftEngine(spark, wh)
    eng2.restore() // restart: registers the legacy read
    assert(eng2.sql("SELECT count(*) FROM leg_t").collect()(0).getLong(0) == 2)
    eng2.sql("INSERT INTO leg_t SELECT 3, 'c'")
    val h = eng2.catalog.history("leg_t")
    assert(h.map(_.operation) == Seq("import", "insert"))
    assert(eng2.sql("SELECT count(*) FROM leg_t").collect()(0).getLong(0) == 3)
    assert(eng2.catalog.tableAt("leg_t", 1).count() == 2)
  }

  test("DROP removes the version log") {
    engine.sql("DROP TABLE ver_a")
    assert(TableVersions.list(wh, "ver_a").isEmpty)
  }

  test("SELECT ... VERSION AS OF reads a published version through SQL (r9)") {
    engine.sql("CREATE TABLE ver_sql AS SELECT n_nationkey, n_name FROM ver_nation WHERE n_nationkey < 10")
    engine.sql("INSERT INTO ver_sql SELECT n_nationkey, n_name FROM ver_nation WHERE n_nationkey >= 20")
    engine.sql("DELETE FROM ver_sql WHERE n_nationkey % 2 = 0")
    // v1 create (10 rows), v2 insert (15), v3 delete (7)
    assert(engine.sql("SELECT count(*) FROM ver_sql VERSION AS OF 1")
      .collect()(0).getLong(0) == 10)
    assert(engine.sql("SELECT count(*) FROM ver_sql VERSION AS OF 2")
      .collect()(0).getLong(0) == 15)
    // two versions of the SAME table join against each other
    val gone = engine.sql(
      """SELECT count(*) FROM ver_sql VERSION AS OF 2 a
         LEFT ANTI JOIN ver_sql VERSION AS OF 3 b ON a.n_nationkey = b.n_nationkey""")
      .collect()(0).getLong(0)
    assert(gone == 8, s"15 - 7 = 8 rows deleted, got $gone")
    // the phrase inside a string literal is untouched
    val lit = engine.sql("SELECT 'x VERSION AS OF 1' AS s FROM ver_sql LIMIT 1")
      .collect()(0).getString(0)
    assert(lit == "x VERSION AS OF 1")
    // unknown version fails loudly
    val e = intercept[Exception] {
      engine.sql("SELECT * FROM ver_sql VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("no version 99"))
    engine.sql("DROP TABLE ver_sql")
  }

  test("OPTIMIZE compacts the current version; z-order clusters files (r9)") {
    val sfBig = "/root/testdata/sf0.01"
    engine.sql(s"CREATE EXTERNAL TABLE opt_li STORED AS parquet LOCATION '$sfBig/lineitem.parquet'")
    engine.sql("CREATE TABLE opt_t AS SELECT l_orderkey, l_partkey, l_quantity FROM opt_li")
    // five appends → six commit dirs, many small files
    (1 to 5).foreach { i =>
      engine.sql(s"INSERT INTO opt_t SELECT l_orderkey + ${i}0000000, l_partkey, l_quantity FROM opt_li WHERE l_linenumber = $i")
    }
    val before = engine.sql("SELECT count(*) FROM opt_t").collect()(0).getLong(0)
    val sumBefore = engine.sql("SELECT sum(l_quantity) FROM opt_t").collect()(0).getDouble(0)
    val preVersion = engine.catalog.history("opt_t").last.version
    val msg = engine.sql("OPTIMIZE opt_t").collect()(0).getString(0)
    assert(msg.contains("optimized opt_t"), msg)
    // content identical, one commit dir, fewer files
    assert(engine.sql("SELECT count(*) FROM opt_t").collect()(0).getLong(0) == before)
    assert(math.abs(engine.sql("SELECT sum(l_quantity) FROM opt_t")
      .collect()(0).getDouble(0) - sumBefore) < 1e-6)
    val h = engine.catalog.history("opt_t")
    assert(h.last.operation == "optimize" && h.last.dirs.size == 1)
    // pre-optimize version still time-travels
    assert(engine.catalog.tableAt("opt_t", preVersion).count() == before)

    // ZORDER BY: still identical content, operation recorded, and the
    // per-file min/max boxes on the z-ordered column tighten — the
    // max spread of (max-min) per file must shrink vs the unclustered
    // layout for stats pruning to bite
    engine.sql("OPTIMIZE opt_t ZORDER BY (l_orderkey, l_partkey)")
    val h2 = engine.catalog.history("opt_t")
    assert(h2.last.operation == "optimize:zorder(l_orderkey,l_partkey)")
    assert(engine.sql("SELECT count(*) FROM opt_t").collect()(0).getLong(0) == before)
    import org.apache.spark.sql.functions._
    val dirs = TableVersions.dataDirs(wh, "opt_t", h2.last)
    val spans = spark.read.parquet(dirs: _*)
      .withColumn("f", input_file_name())
      .groupBy("f").agg((max("l_orderkey") - min("l_orderkey")).as("span"))
      .collect().map(_.getLong(1))
    val fullSpan = engine.sql("SELECT max(l_orderkey) - min(l_orderkey) FROM opt_t")
      .collect()(0).getLong(0)
    if (spans.length > 1)
      assert(spans.min < fullSpan, "z-ordered files must cover sub-ranges")

    // guards: bucketed tables and partitioned+zorder reject loudly
    val err = intercept[Exception] {
      engine.sql("OPTIMIZE nonexistent_t_xyz")
    }
    assert(err.getMessage.contains("not a managed table"))

    // partitioned: compaction clusters by the hive partition, so each
    // partition dir ends up with ONE file (plain repartition would
    // scatter every partition across all output tasks)
    engine.sql("""CREATE TABLE opt_part PARTITIONED BY (l_returnflag) AS
      SELECT l_orderkey, l_quantity, l_returnflag FROM opt_li""")
    (1 to 3).foreach { i =>
      engine.sql(s"INSERT INTO opt_part SELECT l_orderkey + ${i}0000000, " +
        s"l_quantity, l_returnflag FROM opt_li WHERE l_linenumber = $i")
    }
    val nBefore = engine.sql("SELECT count(*) FROM opt_part").collect()(0).getLong(0)
    engine.sql("OPTIMIZE opt_part")
    assert(engine.sql("SELECT count(*) FROM opt_part").collect()(0).getLong(0) == nBefore)
    val commit = TableVersions.dataDirs(wh, "opt_part",
      engine.catalog.history("opt_part").last).head
    val perDir = new java.io.File(commit).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perDir.nonEmpty && perDir.forall(_._2 == 1),
      s"each partition dir must hold one compacted file: ${perDir.toSeq}")
    // and ZORDER on a partitioned table rejects loudly
    val zerr = intercept[Exception] {
      engine.sql("OPTIMIZE opt_part ZORDER BY (l_orderkey)")
    }
    assert(zerr.getMessage.contains("not supported on partitioned"))
  }

  test("concurrent same-JVM writers get disjoint commit dirs (r10)") {
    engine.sql("CREATE TABLE ver_race AS SELECT n_nationkey, n_name FROM ver_nation WHERE n_nationkey < 5")
    // two threads INSERT INTO the same table at once: allocation is a
    // reservation under the commit lock, so the loser cannot write its
    // parquet into a directory the winner's manifest references
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        try engine.sql(
          s"INSERT INTO ver_race SELECT n_nationkey + ${100 * (i + 1)}, n_name " +
            "FROM ver_nation WHERE n_nationkey < 3")
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent inserts must both succeed: ${errs.peek()}")
    val h = engine.catalog.history("ver_race")
    assert(h.size == 3, s"create + two inserts expected: ${h.map(_.operation)}")
    // each insert's FRESH dir (the one not in its predecessor) is unique
    val freshDirs = h.sliding(2).map { case Seq(prev, cur) =>
      (cur.dirs.toSet -- prev.dirs.toSet).toSeq
    }.toSeq
    assert(freshDirs.forall(_.size == 1), s"one fresh dir per insert: $freshDirs")
    assert(freshDirs.flatten.distinct.size == 2,
      s"concurrent inserts must land in DISJOINT commit dirs: $freshDirs")
    // and the final table holds base + both inserts
    assert(engine.sql("SELECT count(*) FROM ver_race").collect()(0).getLong(0)
      == 5 + 3 + 3)
    engine.sql("DROP TABLE ver_race")
  }

  test("VERSION AS OF: case-insensitive keywords, comments untouched (r10)") {
    engine.sql("CREATE TABLE ver_ci AS SELECT n_nationkey FROM ver_nation WHERE n_nationkey < 10")
    engine.sql("INSERT INTO ver_ci SELECT n_nationkey FROM ver_nation WHERE n_nationkey >= 20")
    // lowercase keywords must rewrite exactly like uppercase
    assert(engine.sql("select count(*) from ver_ci version as of 1")
      .collect()(0).getLong(0) == 10)
    // the phrase inside comments stays verbatim (the commented table
    // name must NOT be registered/rewritten): the live reference still
    // rewrites, the comment text survives analysis untouched
    assert(engine.sql(
      """select count(*) -- not this: ver_ci VERSION AS OF 99
         from ver_ci version as of 1""").collect()(0).getLong(0) == 10)
    assert(engine.sql(
      """select /* ver_ci VERSION AS OF 99 */ count(*)
         from ver_ci VERSION AS OF 2""").collect()(0).getLong(0) == 15)
    // an apostrophe inside a comment must not flip string state
    assert(engine.sql(
      """select count(*) -- don't trip the scanner
         from ver_ci VERSION AS OF 1""").collect()(0).getLong(0) == 10)
    engine.sql("DROP TABLE ver_ci")
  }

  test("a failed write releases its commit-dir reservation (r11)") {
    engine.sql(s"CREATE EXTERNAL TABLE ver_res_src STORED AS parquet LOCATION '$sf/nation.parquet'")
    engine.sql("CREATE TABLE ver_res AS SELECT n_nationkey AS k FROM ver_res_src")
    assert(TableVersions.inFlightCount(wh, "ver_res") == 0,
      "a successful commit publishes (and releases) its reservation")
    // a write that throws mid-parquet: the reservation must not leak
    intercept[Exception] {
      engine.sql(
        "INSERT INTO ver_res SELECT CAST(raise_error('boom') AS BIGINT) FROM ver_res_src")
    }
    assert(TableVersions.inFlightCount(wh, "ver_res") == 0,
      "a failed write must release its reservation")
    // and the NEXT writer reuses the number the failure abandoned
    val before = TableVersions.latest(wh, "ver_res").get
    engine.sql("INSERT INTO ver_res SELECT n_nationkey + 100 FROM ver_res_src")
    val after = TableVersions.latest(wh, "ver_res").get
    assert(after.version == before.version + 1)
    val dirNums = after.dirs.map(_.stripPrefix("c").toLong).sorted
    assert(dirNums == dirNums.indices.map(_ + 1L),
      s"abandoned numbers must be reusable, got dirs ${after.dirs}")
    // raw API: release makes the number immediately reusable
    val d1 = TableVersions.nextCommitDir(wh, "ver_res")
    TableVersions.releaseCommitDir(wh, "ver_res", d1)
    val d2 = TableVersions.nextCommitDir(wh, "ver_res")
    assert(d1 == d2)
    TableVersions.releaseCommitDir(wh, "ver_res", d2)
    engine.sql("DROP TABLE ver_res")
  }
}
