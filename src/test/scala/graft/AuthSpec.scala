package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.Auth
import graft.auth.Authz.PermissionDenied

/** RBAC (reference beacon-auth + statement_plan/authz.rs): deny-wins
  * default-deny evaluation, segment-aware path globs, the super-user
  * gate on statements, scan-by-scan read authorization, persistence,
  * and password authentication. */
class AuthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[2]", 2)
  lazy val wh: String = java.nio.file.Files.createTempDirectory("graft-auth-wh").toString
  lazy val engine: GraftEngine = GraftEngine(spark, wh)
  val sf = "/root/testdata/sf0.001"

  test("glob semantics: * stays inside a segment, ** crosses") {
    assert(Auth.pathMatches("/data/*.parquet", "/data/x.parquet"))
    assert(!Auth.pathMatches("/data/*.parquet", "/data/sub/x.parquet"))
    assert(!Auth.pathMatches("/data/*", "/data_2/file.parquet"))
    assert(Auth.pathMatches("/data/**", "/data/sub/deep/x.parquet"))
    assert(Auth.pathMatches("/d?ta/x", "/data/x"))
    assert(!Auth.pathMatches("/d?ta/x", "/daata/x"))
  }

  test("directory DDL + deny-wins evaluation") {
    engine.sql("CREATE USER alice WITH PASSWORD 'wonder'")
    engine.sql("CREATE USER bob")
    engine.sql("CREATE ROLE readers")
    engine.sql("CREATE ROLE blocked")
    engine.sql("GRANT ROLE readers TO USER alice")
    engine.sql(s"CREATE EXTERNAL TABLE auth_nation STORED AS parquet LOCATION '$sf/nation.parquet'")
    engine.sql(s"CREATE EXTERNAL TABLE auth_region STORED AS parquet LOCATION '$sf/region.parquet'")
    engine.sql("GRANT SELECT ON TABLE auth_nation TO ROLE readers")

    val alice = engine.catalog.auth.identityOf("alice")
    assert(!alice.isSuperUser)
    // granted table reads; ungranted denies (default-deny)
    assert(engine.sqlAs(alice, "SELECT count(*) FROM auth_nation").collect()(0).getLong(0) == 25)
    val denied = intercept[PermissionDenied] {
      engine.sqlAs(alice, "SELECT count(*) FROM auth_region").collect()
    }
    assert(denied.getMessage.contains("auth_region"))
    // a join needs BOTH scans granted
    intercept[PermissionDenied] {
      engine.sqlAs(alice,
        "SELECT * FROM auth_nation n JOIN auth_region r ON n.n_regionkey = r.r_regionkey")
    }
    // deny beats grant, even via a second role
    engine.sql("DENY SELECT ON TABLE auth_nation TO ROLE blocked")
    engine.sql("GRANT ROLE blocked TO USER alice")
    intercept[PermissionDenied] {
      engine.sqlAs(engine.catalog.auth.identityOf("alice"),
        "SELECT count(*) FROM auth_nation")
    }
    engine.sql("REVOKE ROLE blocked FROM USER alice")
    // subquery scans are checked too
    intercept[PermissionDenied] {
      engine.sqlAs(engine.catalog.auth.identityOf("alice"),
        "SELECT * FROM auth_nation WHERE n_regionkey IN (SELECT r_regionkey FROM auth_region)")
    }
  }

  test("PATH grants authorize raw file scans with glob scope") {
    engine.sql("CREATE ROLE pathreaders")
    engine.sql(s"GRANT SELECT ON PATH '$sf/*.parquet' TO ROLE pathreaders")
    engine.sql("CREATE USER carol")
    engine.sql("GRANT ROLE pathreaders TO USER carol")
    val carol = engine.catalog.auth.identityOf("carol")
    assert(engine.sqlAs(carol,
      s"SELECT count(*) FROM parquet.`$sf/region.parquet`").collect()(0).getLong(0) == 5)
    // a segment-crossing path is outside the single-star grant
    intercept[PermissionDenied] {
      engine.sqlAs(carol, "SELECT count(*) FROM parquet.`/root/testdata/sf0.01/region.parquet`")
    }
  }

  test("statements and DDL/DML require super-user; global ALL grant confers it") {
    val bob = engine.catalog.auth.identityOf("bob")
    intercept[PermissionDenied] { engine.sqlAs(bob, "SHOW GRAFT TABLES") }
    intercept[PermissionDenied] { engine.sqlAs(bob, "DROP TABLE auth_nation") }
    intercept[PermissionDenied] {
      engine.sqlAs(bob, "CREATE TABLE stolen AS SELECT 1 AS x")
    }
    intercept[PermissionDenied] {
      engine.sqlAs(bob, "INSERT INTO auth_nation VALUES (1)")
    }
    engine.sql("CREATE ROLE admins")
    engine.sql("GRANT ALL TO ROLE admins")
    engine.sql("GRANT ROLE admins TO USER bob")
    val admin = engine.catalog.auth.identityOf("bob")
    assert(admin.isSuperUser)
    assert(engine.sqlAs(admin, "SELECT count(*) FROM auth_region").collect()(0).getLong(0) == 5)
  }

  test("REVOKE removes rules; SHOW ROLES/USERS list the directory (no hashes)") {
    engine.sql("REVOKE SELECT ON TABLE auth_nation FROM ROLE readers")
    intercept[PermissionDenied] {
      engine.sqlAs(engine.catalog.auth.identityOf("alice"),
        "SELECT count(*) FROM auth_nation")
    }
    engine.sql("GRANT SELECT ON TABLE auth_nation TO ROLE readers") // restore
    val roles = engine.sql("SHOW ROLES").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(roles.contains(("readers", "grant", "SELECT")))
    assert(roles.contains(("blocked", "deny", "SELECT")))
    val users = engine.sql("SHOW USERS").collect()
    assert(users.map(_.getString(0)).toSet == Set("alice", "bob", "carol"))
    assert(users.length == 3 && users.forall(_.length == 2)) // name+roles only
  }

  test("graft rewrites (SUMMARIZE / UNION ALL BY NAME) authorize their sources") {
    val alice = engine.catalog.auth.identityOf("alice") // SELECT on auth_nation only
    assert(engine.sqlAs(alice, "SUMMARIZE auth_nation").count() > 0)
    intercept[PermissionDenied] { engine.sqlAs(alice, "SUMMARIZE auth_region") }
    assert(engine.sqlAs(alice,
      """SELECT n_name AS name FROM auth_nation
         UNION ALL BY NAME
         SELECT n_nationkey AS k, n_name AS name FROM auth_nation""").count() == 50)
    intercept[PermissionDenied] {
      engine.sqlAs(alice,
        """SELECT n_name AS name FROM auth_nation
           UNION ALL BY NAME
           SELECT r_name AS name FROM auth_region""")
    }
  }

  test("visible_tables: the catalog filtered by the caller's grants") {
    val alice = engine.catalog.auth.identityOf("alice")
    assert(engine.visibleTables(alice) == Seq("auth_nation"))
    val admin = engine.catalog.auth.identityOf("bob") // global ALL from prior test
    assert(engine.visibleTables(admin).toSet.contains("auth_region"))
    val nobody = Auth.AuthIdentity("ghost", Seq.empty, isSuperUser = false)
    assert(engine.visibleTables(nobody).isEmpty)
  }

  test("authentication + directory persistence across engines") {
    assert(engine.authenticate("alice", "wonder").map(_.name).contains("alice"))
    assert(engine.authenticate("alice", "nope").isEmpty)
    assert(engine.authenticate("bob", "anything").isEmpty) // passwordless
    // hashes at rest, never the password
    val raw = java.nio.file.Files.readString(
      java.nio.file.Paths.get(wh, "_auth", "auth.json"))
    assert(!raw.contains("wonder") && raw.contains("pbkdf2"))
    // a fresh engine sees the same directory and enforces identically
    val e2 = GraftEngine(spark, wh)
    e2.restore()
    assert(e2.authenticate("alice", "wonder").isDefined)
    assert(e2.sqlAs(e2.catalog.auth.identityOf("alice"),
      "SELECT count(*) FROM auth_nation").collect()(0).getLong(0) == 25)
    intercept[PermissionDenied] {
      e2.sqlAs(e2.catalog.auth.identityOf("alice"), "SELECT 1 FROM auth_region")
    }
  }

  test("alias spoofing cannot launder a denied scan (ADVICE r8)") {
    val alice = engine.catalog.auth.identityOf("alice") // SELECT on auth_nation only
    // denied table aliased to a granted name: the boundary check sees the
    // plan underneath is NOT auth_nation's and authorizes the real scan
    intercept[PermissionDenied] {
      engine.sqlAs(alice, "SELECT * FROM auth_region AS auth_nation").collect()
    }
    intercept[PermissionDenied] {
      engine.sqlAs(alice,
        "SELECT * FROM (SELECT * FROM auth_region) AS auth_nation").collect()
    }
    // legit: the granted table under ANY alias — even another table's name
    assert(engine.sqlAs(alice,
      "SELECT count(*) FROM auth_nation AS x").collect()(0).getLong(0) == 25)
    assert(engine.sqlAs(alice,
      "SELECT count(*) FROM auth_nation AS auth_region").collect()(0).getLong(0) == 25)
  }

  test("INSERT OVERWRITE DIRECTORY denied for non-super-users (ADVICE r8)") {
    engine.sql("CREATE USER mallory")
    val m = engine.catalog.auth.identityOf("mallory")
    val tgt = java.nio.file.Files.createTempDirectory("graft-auth-iod")
    intercept[PermissionDenied] {
      engine.sqlAs(m,
        s"INSERT OVERWRITE DIRECTORY '$tgt/out' USING parquet SELECT 1 AS x")
    }
    assert(!java.nio.file.Files.exists(tgt.resolve("out")),
      "the write must be rejected before execution, not after")
    // CTE-wrapped writes are caught by the analyzed-plan re-check
    intercept[PermissionDenied] {
      engine.sqlAs(m, s"WITH c AS (SELECT 1 AS x) " +
        s"INSERT OVERWRITE DIRECTORY '$tgt/out2' USING parquet SELECT * FROM c")
    }
    assert(!java.nio.file.Files.exists(tgt.resolve("out2")))
  }
}
