package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.PosixFilePermissions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** CREATE SECRET — named object-store credentials scoped to a URL
  * prefix (reference beacon-datafusion-ext/src/secrets.rs; parser
  * beacon_parser.rs:492-564). Spark-first application: a secret's
  * options become Hadoop FileSystem configuration keys on the session,
  * which Spark serializes into every job — so native scans AND the
  * pure-JVM readers' driver-side metadata access pick them up with no
  * further plumbing. An S3 secret whose scope names a bucket maps to
  * S3A's per-bucket override keys (`fs.s3a.bucket.<b>.…`), so multiple
  * accounts coexist exactly like the reference's longest-prefix store;
  * a scheme-wide scope sets the base keys.
  *
  * `PERSISTENT` secrets are AES-GCM-encrypted at rest under
  * `<warehouse>/_secrets/` with a warehouse-local key file (0600) —
  * the same at-rest posture as the reference's chacha20poly1305 store
  * in `beacon.db` — and reload+re-apply when an engine opens the
  * warehouse. `TEMPORARY` (default) secrets live only in this session.
  * SHOW SECRETS never returns credential values, only option keys.
  *
  * Boundary (documented): executor-side chunk reads through ByteStore
  * build their Hadoop conf from cluster/site config plus
  * `spark.hadoop.*` set at session start; dynamically-created secrets
  * reach all Spark-native scans and driver-side reads.
  */
class Secrets(spark: SparkSession, warehouse: String) {

  import Secrets._

  private val store =
    new java.util.concurrent.ConcurrentHashMap[String, Secret]()

  load().foreach { s => store.put(s.name, s); apply(s) }

  def create(name: String, secretType: String, scope: Option[String],
      options: Map[String, String], persistent: Boolean): Unit = {
    val tpe = secretType.toLowerCase match {
      case "s3" => "s3"
      case "gcs" | "gs" => "gcs"
      case "azure" | "az" => "azure"
      case "http" | "https" => "http"
      case other => throw new IllegalArgumentException(
        s"unknown secret TYPE '$other' (S3, GCS, AZURE, HTTP)")
    }
    val sc = scope.getOrElse(defaultScope(tpe))
    val s = Secret(name, tpe, sc,
      options.map { case (k, v) => k.toLowerCase -> v }, persistent)
    val old = store.put(name, s)
    if (old != null) {
      // replacing: the old secret's scope/options may map to hadoop keys
      // the new one doesn't cover — unset them, then re-apply every
      // remaining secret (same repair drop() performs)
      unapply(old)
      store.values.asScala.foreach(apply)
    } else apply(s)
    if (persistent || (old != null && old.persistent)) persist()
  }

  def drop(name: String, ifExists: Boolean): Unit = {
    val s = store.remove(name)
    if (s == null) {
      if (!ifExists) throw new IllegalArgumentException(s"no secret '$name'")
    } else {
      unapply(s)
      if (s.persistent) persist()
      // another secret may cover the same scope with different keys
      store.values.asScala.foreach(apply)
    }
  }

  /** one row per secret; values never leave the store */
  def list(): Seq[(String, String, String, Boolean, String)] =
    store.values.asScala.toSeq.sortBy(_.name).map(s =>
      (s.name, s.secretType, s.scope, s.persistent,
        s.options.keys.toSeq.sorted.mkString(",")))

  // ------------------------------------------------ hadoop application

  /** hadoop keys this secret materializes as */
  private def hadoopKeys(s: Secret): Map[String, String] = s.secretType match {
    case "s3" =>
      // scope "s3://bucket[/...]" → S3A per-bucket override keys;
      // scheme-wide "s3://" → base keys
      val bucket = bucketOf(s.scope)
      val prefix = bucket match {
        case Some(b) => s"fs.s3a.bucket.$b."
        case None => "fs.s3a."
      }
      s.options.flatMap { case (k, v) =>
        s3Suffix(k).map { suffix =>
          // object_store's allow_http is the inverse of S3A's ssl toggle
          val value =
            if (k.equalsIgnoreCase("allow_http")) (!v.toBoolean).toString else v
          (prefix + suffix) -> value
        }
      }
    case "gcs" =>
      s.options.flatMap {
        case ("service_account_key", v) =>
          Seq("fs.gs.auth.service.account.json.keyfile" -> v)
        case ("project_id", v) => Seq("fs.gs.project.id" -> v)
        case _ => Nil
      }
    case "azure" =>
      // account-keyed: ACCOUNT 'name' + KEY 'value'
      (s.options.get("account"), s.options.get("key")) match {
        case (Some(a), Some(k)) =>
          Map(s"fs.azure.account.key.$a.dfs.core.windows.net" -> k,
            s"fs.azure.account.key.$a.blob.core.windows.net" -> k)
        case _ => Map.empty
      }
    case _ => Map.empty // http: carried for SHOW; no hadoop mapping
  }

  private def apply(s: Secret): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    hadoopKeys(s).foreach { case (k, v) => conf.set(k, v) }
  }

  private def unapply(s: Secret): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    hadoopKeys(s).keys.foreach(conf.unset)
  }

  // -------------------------------------------------------- at rest

  private def dir: String =
    graft.sources.io.ByteStore.resolve(warehouse, "_secrets")

  private def persist(): Unit = {
    val doc = JArray(store.values.asScala.filter(_.persistent).toList
      .sortBy(_.name).map { s =>
        JObject(List(
          "name" -> JString(s.name), "type" -> JString(s.secretType),
          "scope" -> JString(s.scope), "persistent" -> JBool(true),
          "options" -> JObject(s.options.toList.sorted.map {
            case (k, v) => k -> (JString(v): JValue)
          })))
      })
    import graft.sources.io.ByteStore
    ByteStore.createDirectories(dir)
    val plain = JsonMethods.compact(JsonMethods.render(doc))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ByteStore.writeAll(ByteStore.resolve(dir, "secrets.enc"),
      Crypto.encrypt(keyBytes(), plain))
  }

  private def load(): Seq[Secret] = {
    import graft.sources.io.ByteStore
    val f = ByteStore.resolve(dir, "secrets.enc")
    if (!ByteStore.exists(f)) return Seq.empty
    val plain = Crypto.decrypt(keyBytes(), ByteStore.readAll(f))
    JsonMethods.parse(new String(plain, java.nio.charset.StandardCharsets.UTF_8)) match {
      case JArray(xs) => xs.collect { case o: JObject =>
        val m = o.obj.toMap
        def str(k: String) = m(k).asInstanceOf[JString].s
        Secret(str("name"), str("type"), str("scope"),
          m.get("options").collect { case JObject(opts) =>
            opts.collect { case (k, JString(v)) => k -> v }.toMap
          }.getOrElse(Map.empty),
          persistent = true)
      }
      case _ => Seq.empty
    }
  }

  /** 256-bit secrets key. Preference order:
    *  1. externally supplied — `GRAFT_SECRETS_KEY` env var or system
    *     property (64 hex chars); never touches the store, so on an
    *     object-store warehouse bucket readers see only ciphertext;
    *  2. warehouse-local `.key`, created on first use (0600 where the
    *     store is a POSIX filesystem). On a SCHEMED (s3a/hdfs/...)
    *     warehouse a store-local key sits beside the ciphertext —
    *     encryption degrades to obfuscation — so that path requires
    *     an explicit `GRAFT_SECRETS_ALLOW_STORE_KEY=true` opt-in. */
  private def keyBytes(): Array[Byte] = {
    import graft.sources.io.ByteStore
    externalKey() match {
      case Some(k) => return k
      case None => ()
    }
    ByteStore.createDirectories(dir)
    val kf = ByteStore.resolve(dir, ".key")
    if (!ByteStore.exists(kf)) {
      // the guard applies to CREATING a new key only: refusing to read
      // a key that already sits in the store would brick an existing
      // warehouse on upgrade without adding any security (that
      // exposure already happened — rotate via GRAFT_SECRETS_KEY)
      if (ByteStore.hasScheme(kf) && !storeKeyOptIn)
        throw new IllegalStateException(
          "persistent secrets on a schemed warehouse need an external key: " +
            "set GRAFT_SECRETS_KEY (64 hex chars) so the key never lands in " +
            "the same store as the ciphertext, or explicitly opt in to a " +
            "store-local key with GRAFT_SECRETS_ALLOW_STORE_KEY=true")
      val k = new Array[Byte](32)
      new java.security.SecureRandom().nextBytes(k)
      ByteStore.writeAll(kf, k)
      if (!ByteStore.hasScheme(kf))
        try Files.setPosixFilePermissions(Paths.get(ByteStore.toLocal(kf)),
          PosixFilePermissions.fromString("rw-------"))
        catch { case _: UnsupportedOperationException => () } // non-POSIX FS
    }
    ByteStore.readAll(kf)
  }

  private def setting(name: String): Option[String] =
    sys.props.get(name).orElse(sys.env.get(name)).map(_.trim).filter(_.nonEmpty)

  private def storeKeyOptIn: Boolean =
    setting("GRAFT_SECRETS_ALLOW_STORE_KEY").exists(_.equalsIgnoreCase("true"))

  private def externalKey(): Option[Array[Byte]] =
    setting("GRAFT_SECRETS_KEY").map { hex =>
      require(hex.length == 64 && hex.forall(c => Character.digit(c, 16) >= 0),
        "GRAFT_SECRETS_KEY must be 64 hex characters (256-bit key)")
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
}

object Secrets {

  final case class Secret(name: String, secretType: String, scope: String,
      options: Map[String, String], persistent: Boolean) {
    // never let credential VALUES reach logs via toString
    override def toString: String =
      s"Secret($name, $secretType, $scope, keys=${options.keys.toSeq.sorted.mkString("/")})"
  }

  def defaultScope(tpe: String): String = tpe match {
    case "s3" => "s3a://"
    case "gcs" => "gs://"
    case "azure" => "abfss://"
    case _ => "https://"
  }

  /** "s3a://bucket/prefix" → Some(bucket); scheme-wide "s3://" → None */
  def bucketOf(scope: String): Option[String] = {
    val i = scope.indexOf("://")
    if (i < 0) None
    else {
      val rest = scope.substring(i + 3)
      val b = rest.takeWhile(_ != '/')
      if (b.isEmpty) None else Some(b)
    }
  }

  /** reference/object_store option names (+ the parser's KEY_ID/SECRET
    * spellings) → S3A key suffixes */
  def s3Suffix(k: String): Option[String] = k.toLowerCase match {
    case "key_id" | "access_key_id" => Some("access.key")
    case "secret" | "secret_access_key" => Some("secret.key")
    case "session_token" => Some("session.token")
    case "region" => Some("endpoint.region")
    case "endpoint" => Some("endpoint")
    case "allow_http" => Some("connection.ssl.enabled")
    case "path_style" | "force_path_style" => Some("path.style.access")
    case _ => None
  }

  /** AES-256-GCM, random 12-byte IV prepended to the ciphertext */
  object Crypto {
    private val ivLen = 12
    def encrypt(key: Array[Byte], plain: Array[Byte]): Array[Byte] = {
      val iv = new Array[Byte](ivLen)
      new java.security.SecureRandom().nextBytes(iv)
      val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.GCMParameterSpec(128, iv))
      iv ++ c.doFinal(plain)
    }
    def decrypt(key: Array[Byte], enc: Array[Byte]): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.GCMParameterSpec(128, enc.take(ivLen)))
      c.doFinal(enc.drop(ivLen))
    }
  }
}
