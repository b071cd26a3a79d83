package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.GraftCatalog
import graft.dsl.JsonQuery
import graft.sql.{GraftSql, Statements}

/** The embedded engine facade (SURVEY §7.1 step 1; ≈ the reference's
  * `Runtime` as used by the Python bindings): one object exposing the
  * SQL front door (standard SQL + engine statements), the JSON query
  * DSL, and the persisted catalog over a warehouse directory.
  *
  * {{{
  * val engine = GraftEngine(spark, "/data/warehouse")
  * engine.sql("CREATE EXTERNAL TABLE obs STORED AS parquet LOCATION '/data/obs/POSIX-glob.parquet'")
  * engine.sql("SUMMARIZE obs")
  * engine.jsonQuery("""{"select": ["temperature"], "from": "obs", "limit": 10}""")
  * }}}
  */
class GraftEngine private (val spark: SparkSession, val catalog: GraftCatalog) {

  /** SQL entry point: engine statements → catalog; SUMMARIZE /
    * UNION ALL BY NAME → rewrites; everything else → Catalyst.
    * Runs as the system identity (super-user) — the embedded default. */
  def sql(text: String): DataFrame =
    Statements.tryExecute(spark, catalog, text)
      .getOrElse(GraftSql.sql(spark, text))

  /** [[sql]] with `$1..$n` bind parameters (the reference's embedded
    * `with_param_values` path) — values bind as typed literals at
    * analysis, never by string splicing. Plain queries only. */
  def sql(text: String, params: Seq[Any]): DataFrame =
    GraftSql.sql(spark, text, params)

  /** [[sql]] under an identity (the reference's authorization
    * lifecycle, runtime.rs:94-155): engine statements and standard
    * DDL/DML require super-user (validate_query_plan's gate), reads
    * are checked scan-by-scan against the caller's roles — deny-wins,
    * default-deny — before anything executes. */
  def sqlAs(identity: graft.auth.Auth.AuthIdentity, text: String): DataFrame = {
    if (identity.isSuperUser) return sql(text)
    if (Statements.recognizes(text))
      throw new graft.auth.Authz.PermissionDenied(
        s"permission denied: engine statements require super-user (user ${identity.name})")
    val trimmed = text.trim.stripSuffix(";")
    // graft rewrites have no Catalyst SQL text (the parser below would
    // reject them) AND SUMMARIZE executes a scan while building — so
    // authorize their SOURCE frames first, then build through the
    // normal path
    if (trimmed.toUpperCase.startsWith("SUMMARIZE")) {
      val src = trimmed.substring("SUMMARIZE".length).trim
      val inner =
        if (src.startsWith("(") && src.endsWith(")"))
          spark.sql(src.substring(1, src.length - 1))
        else spark.table(src)
      graft.auth.Authz.authorizeRead(catalog, catalog.auth, identity, inner)
      return GraftSql.sql(spark, trimmed)
    }
    val unionParts = GraftSql.splitUnionByName(trimmed)
    if (unionParts.length > 1) {
      unionParts.foreach { p =>
        graft.auth.Authz.authorizeRead(catalog, catalog.auth, identity,
          spark.sql(GraftSql.stripParens(p)))
      }
      return GraftSql.sql(spark, trimmed)
    }
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    assertNotCommandParsed(parsed, identity)
    // defense-in-depth: analyze WITHOUT constructing a Dataset (Dataset
    // construction eagerly executes command plans) and reject anything
    // that analyzes to a command or write — catches shapes the parse-
    // time denylist misses, including CTE-wrapped writes
    assertNotAnalyzedWrite(
      spark.sessionState.executePlan(parsed).analyzed, identity)
    val df = GraftSql.sql(spark, text)
    graft.auth.Authz.authorizeRead(catalog, catalog.auth, identity, df)
    df
  }

  /** prepare-time validation for the wire's prepared statements:
    * markers rewrite (up to 99 positional params) and the text must
    * parse to a non-command shape for this identity — nothing
    * executes, and reads are NOT authorized here (execute re-runs the
    * full sqlAs lifecycle against live grants). Plain Catalyst
    * queries only: engine rewrites (SUMMARIZE, UNION ALL BY NAME)
    * aren't preparable. */
  def assertPreparableAs(identity: graft.auth.Auth.AuthIdentity,
      text: String): Unit = {
    val named = GraftSql.rewriteMarkers(spark, text, 99)
    assertNotCommandParsed(
      spark.sessionState.sqlParser.parsePlan(named), identity)
  }

  /** Result schema of a preparable statement WITHOUT executing it —
    * the Flight CreatePreparedStatement contract (the reference runs
    * the query at prepare to answer the schema,
    * beacon-server/src/flight_sql/service.rs:40-130; here analysis
    * alone answers it). `$n` markers bind as untyped NULLs, so a
    * column that IS a bare parameter analyzes as void — every other
    * column carries its real type. For non-super-users this path also
    * runs both denylist guards, subsuming [[assertPreparableAs]]. */
  def prepareSchemaAs(identity: graft.auth.Auth.AuthIdentity,
      text: String): org.apache.spark.sql.types.StructType = {
    val named = GraftSql.rewriteMarkers(spark, text, 99)
    val parsed = spark.sessionState.sqlParser.parsePlan(named)
    if (!identity.isSuperUser) assertNotCommandParsed(parsed, identity)
    val bound = org.apache.spark.sql.catalyst.analysis.NameParameterizedQuery(
      parsed, (1 to 99).map(ix => s"graft_p$ix" ->
        (org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.NullType):
          org.apache.spark.sql.catalyst.expressions.Expression)).toMap)
    val analyzed = spark.sessionState.executePlan(bound).analyzed
    if (!identity.isSuperUser) {
      assertNotAnalyzedWrite(analyzed, identity)
      // the schema itself is metadata of the scanned tables: answering
      // it without SELECT grants would leak column names/types of
      // tables visibleTables deliberately hides — authorize reads at
      // prepare exactly like execution will
      graft.auth.Authz.authorizeReadPlan(catalog, catalog.auth, identity, analyzed)
    }
    analyzed.schema
  }

  /** parse-time command denylist shared by both sqlAs paths */
  private def assertNotCommandParsed(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      identity: graft.auth.Auth.AuthIdentity): Unit = {
    val isCommand = parsed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Command => true
      case _: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement => true
      // INSERT OVERWRITE DIRECTORY parses to InsertIntoDir — a plain
      // UnaryNode, not a Command (ADVICE r7 high: arbitrary-path write)
      case _: org.apache.spark.sql.catalyst.plans.logical.InsertIntoDir => true
      // unresolved DDL parses to *Statement nodes before analysis; be
      // denylist-generous on anything write-shaped by name
      case p => p.nodeName.endsWith("Statement") ||
        p.nodeName.startsWith("Insert") || p.nodeName.startsWith("WriteTo") ||
        p.nodeName.startsWith("Merge") || p.nodeName.startsWith("Delete") ||
        p.nodeName.startsWith("Update")
    }
    if (isCommand)
      throw new graft.auth.Authz.PermissionDenied(
        s"permission denied: DDL/DML requires super-user (user ${identity.name})")
  }

  /** analysis-time write denylist shared by both sqlAs paths */
  private def assertNotAnalyzedWrite(
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      identity: graft.auth.Auth.AuthIdentity): Unit = {
    val analyzedWrite = analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Command => true
      case _: org.apache.spark.sql.catalyst.plans.logical.InsertIntoDir => true
      case p => p.nodeName.contains("Command") || p.nodeName.startsWith("WriteTo")
    }
    if (analyzedWrite)
      throw new graft.auth.Authz.PermissionDenied(
        s"permission denied: DDL/DML requires super-user (user ${identity.name})")
  }

  /** [[sqlAs]] with `$1..$n` bind parameters — the wire's prepared-
    * statement path (the reference's Flight prepared statements,
    * beacon-server/src/flight_sql/service.rs). Plain queries only:
    * engine statements and anything command-shaped are rejected for
    * non-super-users BEFORE the parameterized Dataset is built (the
    * markers rewrite to named parameters first, so the parse-time
    * denylist sees the same tree the execution binds). Values bind
    * as typed literals at analysis — never string splicing, so a
    * parameter value cannot inject SQL. */
  def sqlAs(identity: graft.auth.Auth.AuthIdentity, text: String,
      params: Seq[Any]): DataFrame = {
    if (params.isEmpty) return sqlAs(identity, text)
    if (identity.isSuperUser) return sql(text, params)
    if (Statements.recognizes(text))
      throw new graft.auth.Authz.PermissionDenied(
        s"permission denied: engine statements require super-user (user ${identity.name})")
    val named = GraftSql.rewriteMarkers(spark, text, params.length)
    val parsed = spark.sessionState.sqlParser.parsePlan(named)
    assertNotCommandParsed(parsed, identity)
    // defense-in-depth WITHOUT constructing a Dataset (which eagerly
    // executes command plans): bind the parameters at the catalyst
    // level and analyze — a command shape the parse denylist missed
    // is rejected BEFORE anything can execute
    val bound = org.apache.spark.sql.catalyst.analysis.NameParameterizedQuery(
      parsed, params.zipWithIndex.map { case (v, ix) =>
        s"graft_p${ix + 1}" ->
          (org.apache.spark.sql.catalyst.expressions.Literal(v):
            org.apache.spark.sql.catalyst.expressions.Expression)
      }.toMap)
    assertNotAnalyzedWrite(
      spark.sessionState.executePlan(bound).analyzed, identity)
    val df = GraftSql.sql(spark, text, params)
    graft.auth.Authz.authorizeRead(catalog, catalog.auth, identity, df)
    df
  }

  /** name+password → identity via the warehouse auth directory */
  def authenticate(user: String, password: String): Option[graft.auth.Auth.AuthIdentity] =
    catalog.auth.authenticate(user, password)

  /** catalog names the identity may SELECT (the reference's
    * `Runtime::visible_tables` — regular callers enumerate the catalog
    * through this, never information_schema) */
  def visibleTables(identity: graft.auth.Auth.AuthIdentity): Seq[String] = {
    val all = catalog.tables().filterNot(_.kind == "crawler").map(_.name).sorted
    if (identity.isSuperUser) all
    else all.filter(n => catalog.auth.isAllowed(
      identity.roles, "SELECT", graft.auth.Auth.Target.Table(n)))
  }

  /** Structured JSON query (reference JSON DSL). Named tables resolve
    * through the session catalog (where this engine registers its
    * tables as temp views). */
  def jsonQuery(json: String): DataFrame = JsonQuery.compile(spark, json)

  /** Analyze a JSON query without executing it and return the result
    * schema (the reference's `/api/query/validate` endpoint). */
  def validateJsonQuery(json: String): org.apache.spark.sql.types.StructType =
    JsonQuery.validate(spark, json)

  /** Re-register every persisted table definition (restart path). */
  def restore(): Unit = catalog.restore()
}

object GraftEngine {
  def apply(spark: SparkSession, warehouse: String): GraftEngine = {
    GraftSession.configure(spark)
    // the reference records every completed query into its persisted
    // query_metrics table (query_metrics_store.rs); listener-driven here
    graft.sql.QueryMetrics.install(spark, warehouse)
    val catalog = new GraftCatalog(spark, warehouse)
    // secondary-index file pruning (CREATE INDEX): one rule instance
    // per session; the registry keeps the newest catalog per warehouse
    graft.plans.IndexPruneRule.register(catalog)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.IndexPruneRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new graft.plans.IndexPruneRule
    // same-peer equi-joins over an ATTACHed network peer run ON the
    // peer (one RemoteScan, join output crosses the wire)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.RemoteJoinRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new graft.plans.RemoteJoinRule
    new GraftEngine(spark, catalog)
  }
}
