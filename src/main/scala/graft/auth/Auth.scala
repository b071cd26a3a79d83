package graft.auth

import java.nio.file.{Files, Path, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** RBAC for the embedded engine — the reference's authorization model
  * (beacon-auth/src/role.rs; query-time walk statement_plan/authz.rs)
  * re-expressed for a library: the host application supplies an
  * [[AuthIdentity]] and calls `GraftEngine.sqlAs`, which checks every
  * table/path the plan scans before execution.
  *
  * Semantics pinned to the reference:
  *  - privileges SELECT/INSERT/UPDATE/DELETE/CREATE/DROP/ALL; a rule's
  *    target is TABLE <name>, PATH '<glob>' or ALL (absent = every
  *    target);
  *  - roles hold grant AND deny rule sets; **deny wins** over any
  *    grant, and absent a matching grant access is denied
  *    (default-deny);
  *  - path globs are segment-aware: a single star does not cross `/`
  *    (so a `data` star pattern matches neither `data_2/x` nor
  *    `data/sub/x`), a double star does;
  *  - super-user = any held role carrying a global ALL grant; DDL/DML
  *    statements require super-user (the reference's
  *    validate_query_plan gate), reads are checked per scan.
  *
  * Users carry PBKDF2-hashed passwords (the library analog of the
  * reference's Argon2 column) and a role list. The directory persists
  * as JSON under `<warehouse>/_auth/` — hashes only, never passwords.
  */
object Auth {

  val privileges = Set("SELECT", "INSERT", "UPDATE", "DELETE", "CREATE", "DROP", "ALL")

  /** a grant/deny rule; targetType ∈ none|all|table|path */
  final case class Rule(privilege: String, targetType: String, targetValue: String) {
    def matches(privilege: String, target: Target): Boolean = {
      val p = this.privilege == privilege || this.privilege == "ALL"
      p && (targetType match {
        case "none" | "all" => true
        case "table" => target match {
          case Target.Table(n) => n == targetValue
          case _ => false
        }
        case "path" => target match {
          case Target.Path(p) => pathMatches(targetValue, p)
          case _ => false
        }
        case _ => false
      })
    }
  }

  sealed trait Target
  object Target {
    final case class Table(name: String) extends Target
    final case class Path(path: String) extends Target
  }

  final case class Role(name: String, grants: Set[Rule], denies: Set[Rule])

  final case class User(name: String, passwordHash: Option[String], roles: Seq[String])

  /** the caller: name + resolved roles; `system` bypasses every check */
  final case class AuthIdentity(name: String, roles: Seq[String], isSuperUser: Boolean)
  object AuthIdentity {
    val system: AuthIdentity = AuthIdentity("system", Seq.empty, isSuperUser = true)
  }

  /** segment-aware glob: `?` = one non-/ char, `*` = any run without /,
    * `**` = any run including / (reference role.rs path_matches with
    * require_literal_separator) */
  def pathMatches(pattern: String, path: String): Boolean = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '*' if i + 1 < pattern.length && pattern.charAt(i + 1) == '*' =>
          sb.append(".*"); i += 2
        case '*' => sb.append("[^/]*"); i += 1
        case '?' => sb.append("[^/]"); i += 1
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c); i += 1
        case c => sb.append(c); i += 1
      }
    }
    try path.matches(sb.toString)
    catch { case _: java.util.regex.PatternSyntaxException => pattern == path }
  }

  // ------------------------------------------------------------ hashes

  /** PBKDF2-HMAC-SHA256, 120k rounds, 16-byte salt; encoded
    * `pbkdf2$<rounds>$<salt-hex>$<hash-hex>` */
  def hashPassword(password: String): String = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    val rounds = 120000
    s"pbkdf2$$$rounds$$${hex(salt)}$$${hex(pbkdf2(password, salt, rounds))}"
  }

  def verifyPassword(password: String, encoded: String): Boolean =
    encoded.split("\\$") match {
      case Array("pbkdf2", r, saltHex, hashHex) =>
        java.security.MessageDigest.isEqual(
          pbkdf2(password, unhex(saltHex), r.toInt), unhex(hashHex))
      case _ => false
    }

  private def pbkdf2(password: String, salt: Array[Byte], rounds: Int): Array[Byte] =
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, rounds, 256))
      .getEncoded

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
}

/** The mutable role/user directory with JSON persistence. */
class AuthStore(warehouse: String) {

  import Auth._

  private var roles = Map.empty[String, Role]
  private var users = Map.empty[String, User]
  load()

  // ---------------------------------------------------------- directory

  def createUser(name: String, password: Option[String]): Unit = synchronized {
    require(!users.contains(name), s"user '$name' already exists")
    users += name -> User(name, password.map(hashPassword), Seq.empty)
    persist()
  }

  def dropUser(name: String): Unit = synchronized {
    require(users.contains(name), s"no user '$name'")
    users -= name
    persist()
  }

  def createRole(name: String): Unit = synchronized {
    require(!roles.contains(name), s"role '$name' already exists")
    roles += name -> Role(name, Set.empty, Set.empty)
    persist()
  }

  def dropRole(name: String): Unit = synchronized {
    require(roles.contains(name), s"no role '$name'")
    roles -= name
    users = users.view.mapValues(u =>
      u.copy(roles = u.roles.filterNot(_ == name))).toMap
    persist()
  }

  def grantRoleToUser(role: String, user: String): Unit = synchronized {
    require(roles.contains(role), s"no role '$role'")
    val u = users.getOrElse(user, throw new IllegalArgumentException(s"no user '$user'"))
    if (!u.roles.contains(role))
      users += user -> u.copy(roles = u.roles :+ role)
    persist()
  }

  def revokeRoleFromUser(role: String, user: String): Unit = synchronized {
    val u = users.getOrElse(user, throw new IllegalArgumentException(s"no user '$user'"))
    users += user -> u.copy(roles = u.roles.filterNot(_ == role))
    persist()
  }

  def addRule(role: String, rule: Rule, deny: Boolean): Unit = synchronized {
    require(privileges(rule.privilege), s"unknown privilege ${rule.privilege}")
    val r = roles.getOrElse(role, throw new IllegalArgumentException(s"no role '$role'"))
    roles += role -> (if (deny) r.copy(denies = r.denies + rule)
                      else r.copy(grants = r.grants + rule))
    persist()
  }

  def removeRule(role: String, rule: Rule): Unit = synchronized {
    val r = roles.getOrElse(role, throw new IllegalArgumentException(s"no role '$role'"))
    roles += role -> r.copy(grants = r.grants - rule, denies = r.denies - rule)
    persist()
  }

  def listRoles(): Seq[Role] = synchronized(roles.values.toSeq.sortBy(_.name))
  def listUsers(): Seq[User] = synchronized(users.values.toSeq.sortBy(_.name))

  /** name+password → identity (roles resolved, super-user from a
    * global ALL grant), or None on bad credentials */
  def authenticate(name: String, password: String): Option[AuthIdentity] = synchronized {
    users.get(name)
      .filter(_.passwordHash.exists(verifyPassword(password, _)))
      .map(u => identityOf(u.name))
  }

  /** identity for a known user (trusted caller — no password check) */
  def identityOf(name: String): AuthIdentity = synchronized {
    val rs = users.get(name).map(_.roles).getOrElse(Seq.empty)
    AuthIdentity(name, rs, isSuperUser = hasGlobalAllGrant(rs))
  }

  // ----------------------------------------------------------- evaluate

  def hasGlobalAllGrant(roleNames: Seq[String]): Boolean = synchronized {
    roleNames.flatMap(roles.get).exists(_.grants.exists(r =>
      r.privilege == "ALL" && (r.targetType == "none" || r.targetType == "all")))
  }

  /** deny-wins, default-deny */
  def isAllowed(roleNames: Seq[String], privilege: String, target: Target): Boolean =
    synchronized {
      val held = roleNames.flatMap(roles.get)
      if (held.exists(_.denies.exists(_.matches(privilege, target)))) false
      else held.exists(_.grants.exists(_.matches(privilege, target)))
    }

  // ------------------------------------------------------------ at rest

  private def file: String = graft.sources.io.ByteStore.resolve(
    graft.sources.io.ByteStore.resolve(warehouse, "_auth"), "auth.json")

  private def persist(): Unit = {
    def rule(r: Rule): JValue = JObject(List(
      "privilege" -> JString(r.privilege),
      "target_type" -> JString(r.targetType),
      "target_value" -> JString(r.targetValue)))
    val doc = JObject(List(
      "roles" -> JArray(roles.values.toList.sortBy(_.name).map(r => JObject(List(
        "name" -> JString(r.name),
        "grants" -> JArray(r.grants.toList.sortBy(_.toString).map(rule)),
        "denies" -> JArray(r.denies.toList.sortBy(_.toString).map(rule)))))),
      "users" -> JArray(users.values.toList.sortBy(_.name).map(u => JObject(List(
        "name" -> JString(u.name),
        "password_hash" -> u.passwordHash.map(JString(_): JValue).getOrElse(JNull),
        "roles" -> JArray(u.roles.toList.map(JString(_)))))))))
    graft.sources.io.ByteStore.writeString(file,
      JsonMethods.pretty(JsonMethods.render(doc)))
  }

  private def load(): Unit = {
    if (!graft.sources.io.ByteStore.exists(file)) return
    val doc = JsonMethods.parse(graft.sources.io.ByteStore.readString(file))
    def rule(v: JValue): Rule = Rule(
      (v \ "privilege").asInstanceOf[JString].s,
      (v \ "target_type").asInstanceOf[JString].s,
      (v \ "target_value").asInstanceOf[JString].s)
    roles = (doc \ "roles") match {
      case JArray(xs) => xs.map { r =>
        val name = (r \ "name").asInstanceOf[JString].s
        name -> Role(name,
          (r \ "grants").asInstanceOf[JArray].arr.map(rule).toSet,
          (r \ "denies").asInstanceOf[JArray].arr.map(rule).toSet)
      }.toMap
      case _ => Map.empty
    }
    users = (doc \ "users") match {
      case JArray(xs) => xs.map { u =>
        val name = (u \ "name").asInstanceOf[JString].s
        name -> User(name,
          (u \ "password_hash") match {
            case JString(h) => Some(h); case _ => None
          },
          (u \ "roles") match {
            case JArray(rs) => rs.collect { case JString(s) => s }
            case _ => Seq.empty
          })
      }.toMap
      case _ => Map.empty
    }
  }
}
