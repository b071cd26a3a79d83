package graft

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.TableVersions

/** [[MockFs]] twin registered under its own scheme so this suite's
  * warehouse traffic is isolated from ByteStoreSpec's. */
class WhFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("whfs:///")
}

/** The WHOLE warehouse on a Hadoop scheme — catalog definitions,
  * version manifests, auth, secrets, extensions and query metrics all
  * ride the [[graft.sources.io.ByteStore]] seam, so `hdfs://`/`s3a://`
  * warehouses work end-to-end, not just the data files (the 100 TB
  * deployment shape: nothing POSIX anywhere). Exercised over a real
  * Hadoop FileSystem registered under a test scheme. */
class RemoteWarehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = GraftSession.build("local[4]", 4)
    s.sparkContext.hadoopConfiguration.set("fs.whfs.impl", classOf[WhFs].getName)
    s
  }
  val sf = "/root/testdata/sf0.001"

  lazy val wh: String = {
    spark // force FS registration first
    "whfs:" + Files.createTempDirectory("graft-remote-warehouse").toString
  }
  lazy val engine: GraftEngine = GraftEngine(spark, wh)

  test("managed lifecycle on a scheme warehouse: CREATE/INSERT/DELETE/RESTORE/VACUUM") {
    engine.sql(s"CREATE EXTERNAL TABLE rw_nation STORED AS parquet LOCATION '$sf/nation.parquet'")
    engine.sql("CREATE TABLE rw_t AS SELECT n_nationkey, n_name FROM rw_nation WHERE n_nationkey < 10")
    engine.sql("INSERT INTO rw_t SELECT n_nationkey, n_name FROM rw_nation WHERE n_nationkey >= 20")
    engine.sql("DELETE FROM rw_t WHERE n_nationkey % 2 = 0")
    // the version log lives ON the scheme store
    val h = engine.catalog.history("rw_t")
    assert(h.map(e => (e.version, e.operation)) ==
      Seq((1L, "create"), (2L, "insert"), (3L, "delete")))
    assert(h.forall(_.dirs.nonEmpty))
    // time travel across the wire-scheme manifests
    assert(engine.catalog.tableAt("rw_t", 1).count() == 10)
    assert(engine.catalog.tableAt("rw_t", 2).count() == 15)
    assert(engine.sql("SELECT count(*) FROM rw_t").collect()(0).getLong(0) == 7)
    // VERSION AS OF through SQL
    assert(engine.sql("SELECT count(*) FROM rw_t VERSION AS OF 2")
      .collect()(0).getLong(0) == 15)
    // RESTORE is metadata-only and works over the scheme
    engine.sql("RESTORE TABLE rw_t VERSION AS OF 2")
    assert(engine.sql("SELECT count(*) FROM rw_t").collect()(0).getLong(0) == 15)
    // VACUUM deletes scheme-store commit dirs + manifests
    val hAll = engine.catalog.history("rw_t")
    engine.sql("VACUUM rw_t RETAIN 1 VERSIONS")
    val hKept = engine.catalog.history("rw_t")
    assert(hKept.size == 1 && hKept.head.version == hAll.last.version)
    assert(engine.sql("SELECT count(*) FROM rw_t").collect()(0).getLong(0) == 15)
    // nothing leaked onto the LOCAL filesystem relative to cwd: the
    // naive Paths.get(warehouse, ...) handling would have created a
    // literal "whfs:" directory here
    assert(!Files.exists(java.nio.file.Paths.get("whfs:")),
      "scheme warehouse must never materialize as a local 'whfs:' dir")
  }

  test("catalog + auth + extensions metadata persist and restore over the scheme") {
    engine.sql("CREATE USER rw_user WITH PASSWORD 'rw-pw'")
    engine.sql("CREATE ROLE rw_readers")
    engine.sql("GRANT SELECT ON TABLE rw_t TO ROLE rw_readers")
    engine.sql("GRANT ROLE rw_readers TO USER rw_user")
    engine.sql("""SET EXTENSION 'preset' FOR rw_t TO
      '{"presets":[{"name":"low","filters":[{"column":"n_nationkey","op":"<","value":5}]}]}'""")
    // a SECOND engine over the same scheme warehouse restores everything
    val again = GraftEngine(spark.newSession(), wh)
    again.restore()
    assert(again.catalog.tables().map(_.name).contains("rw_t"))
    assert(again.sql("SELECT count(*) FROM rw_t").collect()(0).getLong(0) == 15)
    assert(again.authenticate("rw_user", "rw-pw").isDefined,
      "auth store must round-trip through the scheme")
    assert(again.sql("SHOW EXTENSIONS FOR rw_t").collect()
      .exists(_.mkString(",").contains("low")))
    // query metrics landed as per-row objects on the scheme store
    val metrics = engine.sql("SHOW QUERY METRICS").collect()
    assert(metrics.nonEmpty, "metrics must persist on the scheme store")
  }

  test("OPTIMIZE compacts on the scheme store") {
    engine.sql("INSERT INTO rw_t SELECT n_nationkey + 50, n_name FROM rw_nation WHERE n_nationkey < 5")
    val before = engine.sql("SELECT count(*) FROM rw_t").collect()(0).getLong(0)
    engine.sql("OPTIMIZE rw_t")
    assert(engine.sql("SELECT count(*) FROM rw_t").collect()(0).getLong(0) == before)
    val h = engine.catalog.history("rw_t")
    assert(h.last.operation == "optimize" && h.last.dirs.size == 1)
  }
}
