package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ATTACH/DETACH — a foreign engine instance mounted as a named V2
  * catalog (reference beacon_parser.rs:455-490 + remote/catalog.rs):
  * snapshot listing at attach time, lazy table resolution, credential
  * validation, redaction in SHOW, read-only mounts, and the JDBC
  * endpoint flavor. */
class AttachSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  lazy val wh: String = java.nio.file.Files.createTempDirectory("graft-att-wh").toString
  lazy val engine: GraftEngine = GraftEngine(spark, wh)
  val sf = "/root/testdata/sf0.001"

  private def peerWarehouse(): (String, GraftEngine) = {
    val pw = java.nio.file.Files.createTempDirectory("graft-att-peer").toString
    (pw, GraftEngine(spark, pw))
  }

  test("attach a peer warehouse; three-part names resolve through the V2 catalog") {
    val (pw, peer) = peerWarehouse()
    peer.sql(s"CREATE EXTERNAL TABLE att_nation STORED AS parquet LOCATION '$sf/nation.parquet'")
    peer.catalog.createManagedTable("att_managed",
      spark.range(0, 50).selectExpr("id AS v"))
    engine.sql(s"ATTACH '$pw' AS peer1")
    assert(engine.sql("SELECT count(*) FROM peer1.public.att_nation")
      .collect()(0).getLong(0) == 25)
    assert(engine.sql("SELECT sum(v) FROM peer1.public.att_managed")
      .collect()(0).getLong(0) == 1225)
    // the scan is a real DSv2 relation with pushdown: filtered count
    val filtered = engine.sql(
      "SELECT count(*) FROM peer1.public.att_nation WHERE n_regionkey = 0")
    assert(filtered.collect()(0).getLong(0) == 5)
    assert(filtered.queryExecution.analyzed.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation]))
    // SHOW TABLES enumerates the snapshot
    val listed = engine.sql("SHOW TABLES IN peer1.public").collect()
      .map(_.getString(1)).toSet
    assert(listed == Set("att_nation", "att_managed"))
  }

  test("snapshot semantics: tables created after ATTACH need re-ATTACH") {
    val (pw, peer) = peerWarehouse()
    peer.catalog.createManagedTable("att_before",
      spark.range(0, 10).selectExpr("id AS v"))
    engine.sql(s"ATTACH '$pw' AS peer2")
    peer.catalog.createManagedTable("att_after",
      spark.range(0, 10).selectExpr("id AS v"))
    assert(engine.sql("SELECT count(*) FROM peer2.public.att_before")
      .collect()(0).getLong(0) == 10)
    val e = intercept[Exception] {
      engine.sql("SELECT * FROM peer2.public.att_after").collect()
    }
    assert(e.getMessage.toLowerCase.contains("att_after"))
    // re-attach refreshes the snapshot (remote/catalog.rs contract)
    engine.sql(s"ATTACH '$pw' AS peer2")
    assert(engine.sql("SELECT count(*) FROM peer2.public.att_after")
      .collect()(0).getLong(0) == 10)
  }

  test("DETACH invalidates immediately; unknown DETACH fails loudly") {
    val (pw, peer) = peerWarehouse()
    peer.catalog.createManagedTable("att_d", spark.range(0, 5).toDF("v"))
    engine.sql(s"ATTACH '$pw' AS peer3")
    assert(engine.sql("SELECT count(*) FROM peer3.public.att_d")
      .collect()(0).getLong(0) == 5)
    engine.sql("DETACH peer3")
    intercept[Exception] {
      engine.sql("SELECT count(*) FROM peer3.public.att_d").collect()
    }
    intercept[IllegalArgumentException] { engine.sql("DETACH peer3") }
  }

  test("attachments are session-scoped: same name in two sessions cannot cross-mount") {
    val (pw1, peer1) = peerWarehouse()
    peer1.catalog.createManagedTable("scoped_t", spark.range(0, 5).toDF("v"))
    val (pw2, peer2) = peerWarehouse()
    peer2.catalog.createManagedTable("scoped_t", spark.range(0, 9).toDF("v"))
    val s2 = spark.newSession()
    val e2 = GraftEngine(s2,
      java.nio.file.Files.createTempDirectory("graft-att-wh2").toString)
    engine.sql(s"ATTACH '$pw1' AS dual")
    e2.sql(s"ATTACH '$pw2' AS dual")
    // same mount name, two sessions, two different peers — each session
    // resolves through ITS registry entry (pre-r9 the process-global
    // name key meant last-attach-wins across sessions)
    assert(engine.sql("SELECT count(*) FROM dual.public.scoped_t")
      .collect()(0).getLong(0) == 5)
    assert(e2.sql("SELECT count(*) FROM dual.public.scoped_t")
      .collect()(0).getLong(0) == 9)
    // SHOW ATTACHMENTS is per-session too
    assert(engine.sql("SHOW ATTACHMENTS").collect()
      .filter(_.getString(0) == "dual").map(_.getString(1)).toSeq == Seq(pw1))
    // DETACH in one session leaves the other's mount intact
    e2.sql("DETACH dual")
    intercept[Exception] {
      e2.sql("SELECT count(*) FROM dual.public.scoped_t").collect()
    }
    assert(engine.sql("SELECT count(*) FROM dual.public.scoped_t")
      .collect()(0).getLong(0) == 5)
    engine.sql("DETACH dual")
  }

  test("SHOW ATTACHMENTS lists mounts and redacts credential values") {
    val (pw, peer) = peerWarehouse()
    peer.sql("CREATE USER fed WITH PASSWORD 'hunter2'")
    peer.sql("CREATE ROLE fedr")
    peer.sql("GRANT ROLE fedr TO USER fed")
    peer.catalog.createManagedTable("att_s", spark.range(0, 3).toDF("v"))
    peer.sql("GRANT SELECT ON TABLE att_s TO ROLE fedr")
    engine.sql(s"ATTACH '$pw' AS peer4 WITH ('username' 'fed', 'password' 'hunter2', tls 'false')")
    val rows = engine.sql("SHOW ATTACHMENTS").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(4)))
    val p4 = rows.find(_._1 == "peer4").get
    assert(p4._2 == pw && p4._3 == "peer")
    assert(p4._4.contains("password=<redacted>"))
    assert(!rows.mkString.contains("hunter2"),
      s"credential values must never surface: ${rows.mkString}")
  }

  test("peer credentials: validated like the reference; listing is grant-filtered") {
    val (pw, peer) = peerWarehouse()
    peer.sql("CREATE USER limited WITH PASSWORD 'pw'")
    peer.sql("CREATE ROLE lim")
    peer.sql("GRANT ROLE lim TO USER limited")
    peer.catalog.createManagedTable("att_open", spark.range(0, 4).toDF("v"))
    peer.catalog.createManagedTable("att_closed", spark.range(0, 4).toDF("v"))
    peer.sql("GRANT SELECT ON TABLE att_open TO ROLE lim")
    // wrong password refuses the mount
    intercept[SecurityException] {
      engine.sql(s"ATTACH '$pw' AS peerx WITH (username 'limited', password 'nope')")
    }
    // ambiguous / incomplete combinations, reference messages
    assert(intercept[IllegalArgumentException] {
      engine.sql(s"ATTACH '$pw' AS peerx WITH (token 't', username 'u', password 'p')")
    }.getMessage.contains("not both"))
    assert(intercept[IllegalArgumentException] {
      engine.sql(s"ATTACH '$pw' AS peerx WITH (username 'limited')")
    }.getMessage.contains("without a password"))
    // a valid credential mounts only what it may SELECT
    engine.sql(s"ATTACH '$pw' AS peer5 WITH (username 'limited', password 'pw')")
    val listed = engine.sql("SHOW TABLES IN peer5.public").collect()
      .map(_.getString(1)).toSet
    assert(listed == Set("att_open"))
    assert(engine.sql("SELECT count(*) FROM peer5.public.att_open")
      .collect()(0).getLong(0) == 4)
    intercept[Exception] {
      engine.sql("SELECT * FROM peer5.public.att_closed").collect()
    }
  }

  test("attached mounts are read-only") {
    val (pw, peer) = peerWarehouse()
    peer.catalog.createManagedTable("att_ro", spark.range(0, 3).toDF("v"))
    engine.sql(s"ATTACH '$pw' AS peer6")
    val e = intercept[Exception] {
      engine.sql("INSERT INTO peer6.public.att_ro VALUES (99)")
    }
    // the wrapper strips write capabilities, so the analyzer itself
    // rejects the append; catalog-level DDL reports "read-only"
    assert(e.getMessage.toLowerCase.contains("does not support append")
      || e.getMessage.toLowerCase.contains("read-only"))
    assert(engine.sql("SELECT count(*) FROM peer6.public.att_ro")
      .collect()(0).getLong(0) == 3, "no rows may have landed")
  }

  test("jdbc endpoint: metadata listing + DSv2 pushdown scan") {
    val url = "jdbc:derby:memory:graftattach;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    val st = c.createStatement()
    try st.execute("DROP TABLE fed_t") catch { case _: java.sql.SQLException => () }
    st.execute("CREATE TABLE fed_t (id INT, v DOUBLE)")
    st.execute("INSERT INTO fed_t VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    st.close(); c.close()
    engine.sql(s"ATTACH '$url' AS dbx")
    // Derby surfaces user tables under APP
    assert(engine.sql("SELECT count(*) FROM dbx.APP.FED_T WHERE ID > 1")
      .collect()(0).getLong(0) == 2)
    val listed = engine.sql("SHOW TABLES IN dbx.APP").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("FED_T"))
  }

  test("non-super-users cannot read attached tables without a path grant") {
    val (pw, peer) = peerWarehouse()
    peer.catalog.createManagedTable("att_guard", spark.range(0, 3).toDF("v"))
    engine.sql(s"ATTACH '$pw' AS peer7")
    engine.sql("CREATE USER att_user")
    val u = engine.catalog.auth.identityOf("att_user")
    intercept[graft.auth.Authz.PermissionDenied] {
      engine.sqlAs(u, "SELECT * FROM peer7.public.att_guard").collect()
    }
    // a path grant over the peer warehouse authorizes the mounted scan
    engine.sql("CREATE ROLE att_role")
    engine.sql(s"GRANT SELECT ON PATH '$pw/**' TO ROLE att_role")
    engine.sql("GRANT ROLE att_role TO USER att_user")
    val u2 = engine.catalog.auth.identityOf("att_user")
    assert(engine.sqlAs(u2, "SELECT count(*) FROM peer7.public.att_guard")
      .collect()(0).getLong(0) == 3)
  }
}
