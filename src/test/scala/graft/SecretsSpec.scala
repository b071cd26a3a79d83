package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CREATE/DROP/SHOW SECRET — scoped object-store credentials applied
  * as Hadoop configuration (reference secrets.rs; parser
  * beacon_parser.rs:492-564). */
class SecretsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[2]", 2)
  lazy val wh: String = java.nio.file.Files.createTempDirectory("graft-sec-wh").toString
  lazy val engine: GraftEngine = GraftEngine(spark, wh)

  private def conf(k: String): String =
    Option(spark.sparkContext.hadoopConfiguration.get(k)).orNull

  test("bucket-scoped S3 secret lands on S3A per-bucket keys; scheme-wide on base keys") {
    engine.sql("""CREATE SECRET 'acct_a' (TYPE S3, KEY_ID 'AKA', SECRET 'sA',
      REGION 'eu-west-1', SCOPE 's3a://bucket-a')""")
    engine.sql("""CREATE SECRET wide (TYPE S3, KEY_ID 'AKW', SECRET 'sW')""")
    assert(conf("fs.s3a.bucket.bucket-a.access.key") == "AKA")
    assert(conf("fs.s3a.bucket.bucket-a.secret.key") == "sA")
    assert(conf("fs.s3a.bucket.bucket-a.endpoint.region") == "eu-west-1")
    // scheme-wide default coexists — the longest-prefix semantics land
    // on Hadoop's own per-bucket-overrides-base resolution
    assert(conf("fs.s3a.access.key") == "AKW")
    assert(conf("fs.s3a.secret.key") == "sW")
  }

  test("allow_http inverts to the S3A ssl toggle; endpoint maps") {
    engine.sql("""CREATE SECRET minio (TYPE S3, KEY_ID 'mk', SECRET 'ms',
      ENDPOINT 'http://localhost:9000', ALLOW_HTTP 'true', SCOPE 's3a://local-bucket')""")
    assert(conf("fs.s3a.bucket.local-bucket.endpoint") == "http://localhost:9000")
    assert(conf("fs.s3a.bucket.local-bucket.connection.ssl.enabled") == "false")
  }

  test("SHOW SECRETS lists names/types/scopes/keys, never values") {
    val rows = engine.sql("SHOW SECRETS").collect()
    assert(rows.map(_.getString(0)).toSet == Set("acct_a", "wide", "minio"))
    val all = rows.map(_.toSeq.mkString("|")).mkString("\n")
    assert(!all.contains("sA") && !all.contains("AKA") && !all.contains("ms"),
      s"credential values must not surface in SHOW SECRETS:\n$all")
    val acct = rows.find(_.getString(0) == "acct_a").get
    assert(acct.getString(2) == "s3a://bucket-a")
    assert(acct.getString(4) == "key_id,region,secret")
  }

  test("DROP SECRET unsets its keys; remaining secrets stay applied") {
    engine.sql("DROP SECRET minio")
    assert(conf("fs.s3a.bucket.local-bucket.access.key") == null)
    assert(conf("fs.s3a.bucket.bucket-a.access.key") == "AKA") // untouched
    intercept[IllegalArgumentException] { engine.sql("DROP SECRET minio") }
    engine.sql("DROP SECRET IF EXISTS minio") // tolerated
  }

  test("PERSISTENT secrets survive a fresh engine, encrypted at rest") {
    engine.sql("""CREATE PERSISTENT SECRET keeper (TYPE S3, KEY_ID 'PK',
      SECRET 'PS', SCOPE 's3a://persist-bucket')""")
    // at rest: ciphertext only
    val enc = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(wh, "_secrets", "secrets.enc"))
    val raw = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!raw.contains("PK") && !raw.contains("persist-bucket"),
      "secrets file must not contain plaintext")
    // a fresh engine over the same warehouse re-applies on open
    spark.sparkContext.hadoopConfiguration.unset("fs.s3a.bucket.persist-bucket.access.key")
    val e2 = GraftEngine(spark, wh)
    assert(conf("fs.s3a.bucket.persist-bucket.access.key") == "PK")
    assert(e2.sql("SHOW SECRETS").collect().exists(r =>
      r.getString(0) == "keeper" && r.getBoolean(3)))
    // TEMPORARY secrets did NOT persist
    assert(!e2.sql("SHOW SECRETS").collect().exists(_.getString(0) == "wide"))
  }

  test("unknown TYPE rejected") {
    assert(intercept[IllegalArgumentException] {
      engine.sql("CREATE SECRET bad (TYPE FTP, KEY_ID 'x')")
    }.getMessage.contains("TYPE"))
  }

  test("schemed warehouse refuses a store-local key without opt-in (ADVICE r10)") {
    spark.sparkContext.hadoopConfiguration.set("fs.mockfs.impl", classOf[MockFs].getName)
    val base = java.nio.file.Files.createTempDirectory("graft-sec-schemed").toString
    val sec = new graft.catalog.Secrets(spark, s"mockfs:$base")
    sys.props.remove("GRAFT_SECRETS_KEY"); sys.props.remove("GRAFT_SECRETS_ALLOW_STORE_KEY")
    val ex = intercept[IllegalStateException] {
      sec.create("k1", "s3", Some("s3a://b1"),
        Map("key_id" -> "AK1", "secret" -> "S1"), persistent = true)
    }
    assert(ex.getMessage.contains("GRAFT_SECRETS_KEY"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base, "_secrets", ".key")),
      "no plaintext key may land beside the ciphertext")
  }

  test("external GRAFT_SECRETS_KEY encrypts on a schemed warehouse with no key in the store") {
    spark.sparkContext.hadoopConfiguration.set("fs.mockfs.impl", classOf[MockFs].getName)
    val base = java.nio.file.Files.createTempDirectory("graft-sec-extkey").toString
    sys.props("GRAFT_SECRETS_KEY") = "ab" * 32
    try {
      val sec = new graft.catalog.Secrets(spark, s"mockfs:$base")
      sec.create("k2", "s3", Some("s3a://b2"),
        Map("key_id" -> "AK2", "secret" -> "S2"), persistent = true)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(base, "_secrets", "secrets.enc")))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base, "_secrets", ".key")),
        "external key must never be written to the store")
      // fresh instance decrypts with the same external key
      val sec2 = new graft.catalog.Secrets(spark, s"mockfs:$base")
      assert(sec2.list().exists(_._1 == "k2"))
      // wrong-length key rejected loudly
      sys.props("GRAFT_SECRETS_KEY") = "abcd"
      intercept[IllegalArgumentException] { new graft.catalog.Secrets(spark, s"mockfs:$base").create(
        "k3", "s3", None, Map("key_id" -> "x"), persistent = true) }
    } finally sys.props.remove("GRAFT_SECRETS_KEY")
  }

  test("GRAFT_SECRETS_ALLOW_STORE_KEY=true opts back in to a store-local key") {
    spark.sparkContext.hadoopConfiguration.set("fs.mockfs.impl", classOf[MockFs].getName)
    val base = java.nio.file.Files.createTempDirectory("graft-sec-optin").toString
    sys.props("GRAFT_SECRETS_ALLOW_STORE_KEY") = "true"
    try {
      val sec = new graft.catalog.Secrets(spark, s"mockfs:$base")
      sec.create("k4", "s3", Some("s3a://b4"),
        Map("key_id" -> "AK4", "secret" -> "S4"), persistent = true)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(base, "_secrets", ".key")))
      assert(new graft.catalog.Secrets(spark, s"mockfs:$base").list().exists(_._1 == "k4"))
    } finally sys.props.remove("GRAFT_SECRETS_ALLOW_STORE_KEY")
  }

  test("replacing a secret unsets the old scope's keys (ADVICE r8)") {
    engine.sql("""CREATE SECRET mover (TYPE S3, KEY_ID 'M1', SECRET 'S1',
      SCOPE 's3a://old-bucket')""")
    assert(conf("fs.s3a.bucket.old-bucket.access.key") == "M1")
    engine.sql("""CREATE SECRET mover (TYPE S3, KEY_ID 'M2', SECRET 'S2',
      SCOPE 's3a://new-bucket')""")
    assert(conf("fs.s3a.bucket.old-bucket.access.key") == null,
      "the replaced secret's keys must be unset")
    assert(conf("fs.s3a.bucket.new-bucket.access.key") == "M2")
  }
}
