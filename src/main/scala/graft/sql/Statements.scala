package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.GraftCatalog

/** The engine's SQL statement extensions over the catalog (SURVEY
  * §2.11; reference parser beacon-core/src/parser/beacon_parser.rs).
  * Recognition is regex-with-anchors over the statement head — the same
  * "peek a few tokens, else hand to the standard planner" strategy the
  * reference uses; the query payloads inside (AS <query>, INSERT
  * source, predicates, SET expressions) are full Catalyst SQL.
  *
  * Identifiers accept bare words, backtick quoting and double quoting
  * (the reference runs ident-normalization off, i.e. case-sensitive
  * quoted names — beacon_parser.rs round-trip tests pin quoting).
  * UPDATE/DELETE locate their WHERE with the quote/paren-aware scanner,
  * not a lazy regex, so a SET expression containing the word `where`
  * inside a string literal parses correctly.
  */
object Statements {

  private val Id = """(\w+|`(?:[^`]|``)+`|"(?:[^"]|"")+")"""

  /** CURATE TABLE target FROM source USING '<json stages>' — the
    * curation-pipeline DSL ([[graft.dsl.CuratePipeline]]) materialized
    * through the managed catalog, CTAS-style */
  private val reCurate =
    ("""(?is)^CURATE\s+TABLE\s+""" + Id + """\s+FROM\s+""" + Id +
      """\s+USING\s+'((?:[^']|'')+)'\s*$""").r

  /** SESSIONIZE table BY user ON ts GAP n MINUTES [AGG value]
    * [FUNNEL typeCol STEPS 's1','s2',…] — gap sessionization (and the
    * ordered-step funnel) as a first-class statement over
    * [[graft.operators.Sessions]] */
  private val reSessionize =
    ("""(?is)^SESSIONIZE\s+""" + Id + """\s+BY\s+""" + Id + """\s+ON\s+""" +
      Id + """\s+GAP\s+(\d+)\s+MINUTES(?:\s+AGG\s+""" + Id +
      """)?(?:\s+FUNNEL\s+""" + Id + """\s+STEPS\s+(.+?))?\s*$""").r

  private val reExternal =
    ("""(?is)^CREATE\s+EXTERNAL\s+TABLE\s+""" + Id +
      """\s+STORED\s+AS\s+(\w+)\s+LOCATION\s+(.+?)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'((?:[^']|'')+)')?""" +
      """(?:\s+OPTIONS\s*\((.+?)\))?\s*$""").r
  private val reMView =
    ("""(?is)^CREATE\s+MATERIALIZED\s+VIEW\s+""" + Id + """\s+AS\s+(.+)$""").r
  private val reView =
    ("""(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+""" + Id + """\s+AS\s+(.+)$""").r
  private val reCtas =
    ("""(?is)^CREATE\s+TABLE\s+""" + Id +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?""" +
      """(?:\s+CLUSTERED\s+BY\s*\(([^)]+)\)\s+INTO\s+(\d+)\s+BUCKETS)?""" +
      """\s+AS\s+(.+)$""").r
  private val reRefresh =
    ("""(?is)^REFRESH\s+(?:TABLE\s+)?""" + Id + """\s*$""").r
  private val reDrop =
    ("""(?is)^DROP\s+(?:TABLE|VIEW|MATERIALIZED\s+VIEW)\s+(?:IF\s+EXISTS\s+)?""" + Id + """\s*$""").r
  private val reInsert =
    ("""(?is)^INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?""" + Id + """\s+(.+)$""").r
  private val reDelete =
    ("""(?is)^DELETE\s+FROM\s+""" + Id + """\s*(.*)$""").r
  private val reUpdate =
    ("""(?is)^UPDATE\s+""" + Id + """\s+SET\s+(.+)$""").r
  private val reShowTables =
    """(?is)^SHOW\s+GRAFT\s+TABLES\s*$""".r
  private val reShowFunctions =
    """(?is)^SHOW\s+GRAFT\s+FUNCTIONS\s*$""".r
  private val reAnalyze =
    ("""(?is)^ANALYZE\s+FILES\s+(?:FOR\s+)?""" + Id + """\s*$""").r
  private val reShowStats =
    ("""(?is)^SHOW\s+FILE\s+STATISTICS\s+(?:FOR\s+)?""" + Id + """\s*$""").r
  private val reCopy =
    """(?is)^COPY\s+(.+?)\s+TO\s+'((?:[^']|'')+)'(?:\s+FORMAT\s+(\w+))?\s*$""".r
  private val reAlterAdd =
    ("""(?is)^ALTER\s+TABLE\s+""" + Id + """\s+ADD\s+COLUMN\s+""" + Id + """\s+([\w()\d,\s]+?)\s*$""").r
  private val reAlterDrop =
    ("""(?is)^ALTER\s+TABLE\s+""" + Id + """\s+DROP\s+COLUMN\s+""" + Id + """\s*$""").r
  private val reAlterRename =
    ("""(?is)^ALTER\s+TABLE\s+""" + Id + """\s+RENAME\s+COLUMN\s+""" + Id + """\s+TO\s+""" + Id + """\s*$""").r
  private val reListDatasets =
    """(?is)^LIST\s+DATASETS\s+'((?:[^']|'')+)'\s*$""".r
  private val reRunCrawler =
    """(?is)^RUN\s+CRAWLER\s+'((?:[^']|'')+)'\s*$""".r
  private val reCreateCrawler =
    ("""(?is)^CREATE\s+CRAWLER\s+""" + Id + """\s+ON\s+'((?:[^']|'')+)'""" +
      """(?:\s+WITH\s*\((.+?)\))?\s*$""").r
  private val reRunNamedCrawler =
    ("""(?is)^RUN\s+CRAWLER\s+""" + Id + """\s*$""").r
  private val reDropCrawler =
    ("""(?is)^DROP\s+CRAWLER\s+""" + Id + """\s*$""").r
  private val reShowCrawlers =
    """(?is)^SHOW\s+CRAWLERS\s*$""".r
  private val reShowQueryMetrics =
    """(?is)^SHOW\s+QUERY\s+METRICS\s*$""".r
  private val reDescribeStatistics =
    """(?is)^DESCRIBE\s+STATISTICS\s+'((?:[^']|'')+)'\s*$""".r
  private val reShowStatsCache =
    """(?is)^SHOW\s+STATISTICS\s+CACHE\s*$""".r
  private val reDescribeFormat =
    """(?is)^DESCRIBE\s+FORMAT\s+(\w+)\s+(.+?)\s*$""".r
  private val Named = """('(?:[^']|'')+'|\w+)""" // quoted-string or bare name
  private val reCreateUser =
    ("""(?is)^CREATE\s+USER\s+""" + Named +
      """(?:\s+WITH\s+PASSWORD\s+'((?:[^']|'')*)')?\s*$""").r
  private val reDropUser =
    ("""(?is)^DROP\s+USER\s+""" + Named + """\s*$""").r
  private val reCreateRole =
    ("""(?is)^CREATE\s+ROLE\s+""" + Named + """\s*$""").r
  private val reDropRole =
    ("""(?is)^DROP\s+ROLE\s+""" + Named + """\s*$""").r
  private val reGrantRoleUser =
    ("""(?is)^GRANT\s+ROLE\s+""" + Named + """\s+TO\s+(?:USER\s+)?""" + Named + """\s*$""").r
  private val reRevokeRoleUser =
    ("""(?is)^REVOKE\s+ROLE\s+""" + Named + """\s+FROM\s+(?:USER\s+)?""" + Named + """\s*$""").r
  private val reGrantPriv =
    ("""(?is)^(GRANT|DENY)\s+(\w+)(?:\s+ON\s+(?:TABLE\s+""" + Id +
      """|PATH\s+'((?:[^']|'')+)'|(ALL)))?\s+TO\s+ROLE\s+""" + Named + """\s*$""").r
  private val reRevokePriv =
    ("""(?is)^REVOKE\s+(\w+)(?:\s+ON\s+(?:TABLE\s+""" + Id +
      """|PATH\s+'((?:[^']|'')+)'|(ALL)))?\s+FROM\s+ROLE\s+""" + Named + """\s*$""").r
  private val reShowRoles =
    """(?is)^SHOW\s+ROLES\s*$""".r
  private val reShowUsers =
    """(?is)^SHOW\s+USERS\s*$""".r
  private val reCreateCrs =
    """(?is)^CREATE\s+(?:(PERSISTENT|TEMPORARY)\s+)?CRS\s+(\d+)\s*\((.+)\)\s*$""".r
  private val reShowCrs =
    """(?is)^SHOW\s+CRS\s*$""".r
  private val reDropCrs =
    """(?is)^DROP\s+CRS\s+(?:(IF\s+EXISTS)\s+)?(\d+)\s*$""".r
  private val reCreateSecret =
    ("""(?is)^CREATE\s+(?:(PERSISTENT|TEMPORARY)\s+)?SECRET\s+""" + Named +
      """\s*\((.+)\)\s*$""").r
  private val reDropSecret =
    ("""(?is)^DROP\s+SECRET\s+(?:(IF\s+EXISTS)\s+)?""" + Named + """\s*$""").r
  private val reShowSecrets =
    """(?is)^SHOW\s+SECRETS\s*$""".r
  private val reSetExtension =
    ("""(?is)^SET\s+EXTENSION\s+'((?:[^']|'')+)'\s+FOR\s+""" + Id +
      """\s+TO\s+'((?:[^']|'')+)'\s*$""").r
  private val reDropExtension =
    ("""(?is)^DROP\s+EXTENSION\s+'((?:[^']|'')+)'\s+FOR\s+""" + Id + """\s*$""").r
  private val reShowExtensions =
    ("""(?is)^SHOW\s+EXTENSIONS\s+FOR\s+""" + Id + """\s*$""").r
  private val reCreateIndex =
    ("""(?is)^CREATE\s+INDEX\s+(?:""" + Id + """\s+)?ON\s+""" + Id +
      """\s*\(\s*""" + Id + """\s*\)(?:\s+USING\s+(\w+))?\s*$""").r
  private val reShowIndexes =
    ("""(?is)^SHOW\s+INDEXES\s+ON\s+""" + Id + """\s*$""").r
  private val reDropIndex =
    ("""(?is)^DROP\s+INDEX\s+""" + Id + """\s+ON\s+""" + Id + """\s*$""").r
  private val reShowHistory =
    ("""(?is)^SHOW\s+HISTORY\s+(?:FOR\s+)?""" + Id + """\s*$""").r
  private val reRestore =
    ("""(?is)^RESTORE\s+TABLE\s+""" + Id + """\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*$""").r
  private val reVacuum =
    ("""(?is)^VACUUM\s+""" + Id + """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?\s*$""").r
  private val reOptimize =
    ("""(?is)^OPTIMIZE\s+""" + Id +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*$""").r
  private val reAttach =
    ("""(?is)^ATTACH\s+'((?:[^']|'')+)'\s+AS\s+""" + Named +
      """(?:\s+WITH\s*\((.+?)\))?\s*$""").r
  private val reDetach =
    ("""(?is)^DETACH\s+""" + Named + """\s*$""").r
  private val reShowAttachments =
    """(?is)^SHOW\s+ATTACHMENTS\s*$""".r

  /** GRANT/DENY/REVOKE target triple → an auth rule */
  private def privRule(priv: String, tbl0: String, path0: String,
      all: String): graft.auth.Auth.Rule = {
    val (tt, tv) =
      if (tbl0 != null) ("table", unquote(tbl0))
      else if (path0 != null) ("path", path0.replace("''", "'"))
      else if (all != null) ("all", "")
      else ("none", "")
    graft.auth.Auth.Rule(priv.toUpperCase, tt, tv)
  }

  /** true when `text` is one of the engine's own statements (used by
    * the authorization gate: statements are super-user-only) */
  def recognizes(text: String): Boolean = {
    val t = text.trim.stripSuffix(";")
    statementRes.exists(_.findFirstIn(t).isDefined)
  }

  private lazy val statementRes = Seq(
    reExternal, reMView, reView, reCtas, reRefresh, reDrop, reInsert,
    reDelete, reUpdate, reShowTables, reShowFunctions, reAnalyze,
    reShowStats, reCopy, reAlterAdd, reAlterDrop, reAlterRename,
    reListDatasets, reRunCrawler, reCreateCrawler, reRunNamedCrawler,
    reDropCrawler, reShowCrawlers, reShowQueryMetrics,
    reDescribeStatistics, reShowStatsCache, reDescribeFormat,
    reCreateIndex, reShowIndexes, reDropIndex, reSetExtension,
    reDropExtension, reShowExtensions, reCreateSecret, reDropSecret,
    reShowSecrets, reCreateUser, reDropUser, reCreateRole, reDropRole,
    reGrantRoleUser, reRevokeRoleUser, reGrantPriv, reRevokePriv,
    reShowRoles, reShowUsers, reAttach, reDetach, reShowAttachments,
    reCurate, reSessionize, reShowHistory, reRestore, reVacuum, reOptimize)

  private val reVersionRef =
    """(?i)([A-Za-z_][A-Za-z0-9_]*|`(?:[^`]|``)+`)\s+VERSION\s+AS\s+OF\s+(\d+)""".r

  /** rewrite `<table> VERSION AS OF <n>` references (outside string
    * literals AND comments — same protected spans as the bind scanner,
    * [[GraftSql.sql]]: an apostrophe inside `-- don't` must not flip
    * string state, and the phrase inside a comment stays verbatim) to
    * views over [[GraftCatalog.tableAt]] */
  private def rewriteVersionRefs(spark: SparkSession, catalog: GraftCatalog,
      t: String): String = {
    // split into alternating rewritable/protected spans; protected =
    // 'strings' ('' escapes), -- line comments, /* block comments */
    val spans = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    var i = 0
    var start = 0
    def protect(endExclusive: Int): Unit = {
      spans += ((t.substring(start, i), false))
      spans += ((t.substring(i, endExclusive), true))
      i = endExclusive
      start = endExclusive
    }
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '\'') {
        var j = i + 1
        var open = true
        while (j < t.length && open) {
          if (t.charAt(j) == '\'') {
            if (j + 1 < t.length && t.charAt(j + 1) == '\'') j += 2
            else { open = false; j += 1 }
          } else j += 1
        }
        protect(j)
      } else if (c == '-' && i + 1 < t.length && t.charAt(i + 1) == '-') {
        val nl = t.indexOf('\n', i)
        protect(if (nl < 0) t.length else nl + 1)
      } else if (c == '/' && i + 1 < t.length && t.charAt(i + 1) == '*') {
        val close = t.indexOf("*/", i + 2)
        protect(if (close < 0) t.length else close + 2)
      } else i += 1
    }
    spans += ((t.substring(start), false))
    spans.map {
      case (s, true) => s // string literal or comment: verbatim
      case (s, false) =>
        reVersionRef.replaceAllIn(s, m => {
          val name = unquote(m.group(1))
          val v = m.group(2).toLong
          // reserved prefix: can't shadow a user table/view by accident
          val view = s"__graft_tt_${name}_v$v"
          catalog.tableAt(name, v).createOrReplaceTempView(view)
          java.util.regex.Matcher.quoteReplacement(view)
        })
    }.mkString
  }

  /** a [[Named]] capture: single-quoted string (unescaped) or bare word */
  private def unquoteName(n: String): String =
    if (n.length >= 2 && n.head == '\'' && n.last == '\'')
      n.substring(1, n.length - 1).replace("''", "'")
    else n

  /** strip one level of backtick / double quoting (doubled quotes unescape) */
  private[sql] def unquote(id: String): String =
    if (id.length >= 2 && id.head == '`' && id.last == '`')
      id.substring(1, id.length - 1).replace("``", "`")
    else if (id.length >= 2 && id.head == '"' && id.last == '"')
      id.substring(1, id.length - 1).replace("\"\"", "\"")
    else id

  /** Try to run `text` as a catalog statement; None = not one of ours. */
  def tryExecute(spark: SparkSession, catalog: GraftCatalog, text: String): Option[DataFrame] = {
    val t = text.trim.stripSuffix(";")
    // SELECT … FROM <managed> VERSION AS OF <n>: the time-travel read
    // surface over the version log (catalog.tableAt). Each reference is
    // rewritten to a registered view of that version's commit dirs —
    // rewriting only OUTSIDE single-quoted literals, so a string
    // containing the phrase is untouched.
    locally {
      val u = t.toUpperCase
      if ((u.startsWith("SELECT") || u.startsWith("WITH")) &&
          u.contains("VERSION AS OF")) {
        val rewritten = rewriteVersionRefs(spark, catalog, t)
        if (rewritten != t) return Some(GraftSql.sql(spark, rewritten))
      }
    }
    t match {
      case reExternal(name0, fmt, locs, ver, ts, opts) =>
        val name = unquote(name0)
        val travel = Option(ver).orElse(Option(ts).map(_.replace("''", "'")))
        val options = Option(opts).map(parseOptions).getOrElse(Map.empty) ++
          travel.map("versionAsOf" -> _)
        catalog.createExternalTable(name, fmt.toLowerCase, parsePaths(locs), options)
        Some(status(spark, s"created external table $name"))
      case reMView(name0, sql) =>
        val name = unquote(name0)
        catalog.createMaterializedView(name, sql.trim)
        Some(status(spark, s"created materialized view $name"))
      case reView(name0, sql) =>
        val name = unquote(name0)
        catalog.createView(name, sql.trim)
        Some(status(spark, s"created view $name"))
      case reCurate(name0, src0, json) =>
        val name = unquote(name0)
        val src = unquote(src0)
        val out = graft.dsl.CuratePipeline.compile(
          spark.table(src), json.replace("''", "'"))
        catalog.createManagedTable(name, out, None, Nil)
        Some(status(spark, s"curated $src into $name"))
      case reSessionize(tbl0, user0, ts0, gap, value0, type0, steps0) =>
        val df = spark.table(unquote(tbl0))
        val user = unquote(user0); val ts = unquote(ts0)
        Some(Option(type0) match {
          case Some(typeCol) =>
            // tokenize QUOTED strings, not raw commas — a legitimate
            // step containing a comma ('add,to,cart') must survive
            val stepListRe =
              "(?s)\\s*'(?:[^']|'')*'(?:\\s*,\\s*'(?:[^']|'')*')*\\s*"
            require(steps0.matches(stepListRe),
              s"SESSIONIZE: FUNNEL steps must be a comma-separated list " +
                s"of quoted strings, got $steps0")
            val steps = "'((?:[^']|'')*)'".r.findAllMatchIn(steps0)
              .map(_.group(1).replace("''", "'")).toSeq
            graft.operators.Sessions.funnel(df, user, ts,
              unquote(typeCol), steps, gap.toInt)
          case None =>
            graft.operators.Sessions.gapSessions(df, user, ts, gap.toInt,
              Option(value0).map(unquote))
        })
      case reCtas(name0, partCols, bucketCols, bucketN, sql) =>
        val name = unquote(name0)
        val buckets = Option(bucketCols).map(cs =>
          (cs.split(",").map(c => unquote(c.trim)).toSeq, bucketN.toInt))
        val partitions = Option(partCols).toSeq
          .flatMap(_.split(",").map(c => unquote(c.trim)).toSeq)
        catalog.createManagedTable(name, spark.sql(sql.trim), buckets, partitions)
        Some(status(spark, s"created table $name"))
      case reRefresh(name0) =>
        val name = unquote(name0)
        catalog.refresh(name)
        Some(status(spark, s"refreshed $name"))
      case reDrop(name0) =>
        val name = unquote(name0)
        catalog.drop(name)
        Some(status(spark, s"dropped $name"))
      case reInsert(mode, name0, src) =>
        val name = unquote(name0)
        catalog.insertInto(name, spark.sql(src.trim),
          overwrite = mode.equalsIgnoreCase("OVERWRITE"))
        Some(status(spark, s"inserted into $name"))
      case reDelete(name0, rest) =>
        val name = unquote(name0)
        val pred = parseWhereTail(rest).getOrElse("true")
        val n = catalog.delete(name, pred)
        Some(status(spark, s"deleted $n rows from $name"))
      case reUpdate(name0, rest) =>
        val name = unquote(name0)
        val (sets, pred) = splitAtTopLevelWhere(rest) match {
          case Some((s, p)) => (s, Some(p))
          case None         => (rest, None)
        }
        catalog.update(name, parseAssignments(sets), pred.map(_.trim))
        Some(status(spark, s"updated $name"))
      case reCopy(src, path0, fmt) =>
        val path = path0.replace("''", "'")
        val df =
          if (src.trim.startsWith("(") && src.trim.endsWith(")"))
            spark.sql(src.trim.stripPrefix("(").stripSuffix(")"))
          else spark.table(unquote(src.trim))
        val n = Outputs.copyTo(df, path, Option(fmt).map(_.toLowerCase))
        Some(status(spark, s"copied $n rows to $path"))
      case reAlterAdd(name0, col0, tpe) =>
        catalog.alterAddColumn(unquote(name0), unquote(col0), tpe.trim)
        Some(status(spark, s"added column ${unquote(col0)}"))
      case reAlterDrop(name0, col0) =>
        catalog.alterDropColumn(unquote(name0), unquote(col0))
        Some(status(spark, s"dropped column ${unquote(col0)}"))
      case reAlterRename(name0, from0, to0) =>
        catalog.alterRenameColumn(unquote(name0), unquote(from0), unquote(to0))
        Some(status(spark, s"renamed column ${unquote(from0)} to ${unquote(to0)}"))
      case reListDatasets(root) =>
        Some(Outputs.listDatasets(spark, root.replace("''", "'")))
      case reRunCrawler(root) =>
        Some(graft.catalog.Crawler.run(spark, catalog, root.replace("''", "'")))
      case reCreateCrawler(name0, prefix, opts) =>
        val name = unquote(name0)
        catalog.createCrawler(name, prefix.replace("''", "'"),
          Option(opts).map(parseOptions).getOrElse(Map.empty))
        Some(status(spark, s"created crawler $name"))
      case reRunNamedCrawler(name0) =>
        // serialized with the background timer — a manual trigger never
        // races a scheduled one (manager.rs:44 run_lock contract)
        Some(graft.catalog.CrawlerScheduler.runSerialized(catalog, unquote(name0)))
      case reDropCrawler(name0) =>
        catalog.drop(unquote(name0))
        Some(status(spark, s"dropped crawler ${unquote(name0)}"))
      case reShowCrawlers() =>
        import spark.implicits._
        Some(catalog.crawlers().map { d =>
          val sched = graft.catalog.CrawlerScheduler
            .scheduleOf(catalog.warehouse, d.name)
            .orElse(graft.catalog.CrawlerScheduler
              .effectiveScheduleSecs(catalog, d.options))
          (d.name, d.paths.mkString(","), sched,
            graft.catalog.CrawlerScheduler.completedPasses(catalog.warehouse, d.name))
        }.toDF("name", "prefix", "schedule_secs", "runs"))
      case reShowQueryMetrics() =>
        // the reference's queryable `query_metrics` system table
        // (query_metrics_store.rs): persisted per-action rows
        Some(QueryMetrics.show(spark, catalog.warehouse))
      case reDescribeStatistics(path) =>
        // the reference's view_dataset_statistics(path) table function
        Some(graft.stats.DatasetStatistics.describe(spark, path.replace("''", "'")))
      case reShowStatsCache() =>
        // the reference's view_statistics_cache() table function
        Some(graft.stats.DatasetStatistics.showCache(spark))
      case reDescribeFormat(fmt, locs) =>
        Some(Outputs.describeFormat(spark, fmt.toLowerCase, parsePaths(locs)))
      case reCreateUser(name0, password) =>
        catalog.auth.createUser(unquoteName(name0),
          Option(password).map(_.replace("''", "'")))
        Some(status(spark, s"created user ${unquoteName(name0)}"))
      case reDropUser(name0) =>
        catalog.auth.dropUser(unquoteName(name0))
        Some(status(spark, s"dropped user ${unquoteName(name0)}"))
      case reCreateRole(name0) =>
        catalog.auth.createRole(unquoteName(name0))
        Some(status(spark, s"created role ${unquoteName(name0)}"))
      case reDropRole(name0) =>
        catalog.auth.dropRole(unquoteName(name0))
        Some(status(spark, s"dropped role ${unquoteName(name0)}"))
      case reGrantRoleUser(role0, user0) =>
        catalog.auth.grantRoleToUser(unquoteName(role0), unquoteName(user0))
        Some(status(spark, s"granted role ${unquoteName(role0)}"))
      case reRevokeRoleUser(role0, user0) =>
        catalog.auth.revokeRoleFromUser(unquoteName(role0), unquoteName(user0))
        Some(status(spark, s"revoked role ${unquoteName(role0)}"))
      case reGrantPriv(verb, priv, tbl0, path0, all, role0) =>
        catalog.auth.addRule(unquoteName(role0),
          privRule(priv, tbl0, path0, all),
          deny = verb.equalsIgnoreCase("DENY"))
        Some(status(spark, s"${verb.toLowerCase} ${priv.toUpperCase} recorded"))
      case reRevokePriv(priv, tbl0, path0, all, role0) =>
        catalog.auth.removeRule(unquoteName(role0), privRule(priv, tbl0, path0, all))
        Some(status(spark, s"revoked ${priv.toUpperCase}"))
      case reShowRoles() =>
        import spark.implicits._
        Some(catalog.auth.listRoles().flatMap { r =>
          r.grants.toSeq.map(g => (r.name, "grant", g.privilege, g.targetType, g.targetValue)) ++
            r.denies.toSeq.map(d => (r.name, "deny", d.privilege, d.targetType, d.targetValue))
        }.sortBy(x => (x._1, x._2, x._3, x._4, x._5))
          .toDF("role", "kind", "privilege", "target_type", "target_value"))
      case reShowUsers() =>
        import spark.implicits._
        Some(catalog.auth.listUsers().map(u => (u.name, u.roles.mkString(",")))
          .toDF("name", "roles"))
      case reCreateCrs(persistence, sridS, params) =>
        // the parameter-row CRS registry on the SQL surface (r16):
        //   CREATE CRS 27700 (FAMILY 'tmerc', A 6377563.396,
        //     RF 299.3249646, LAT_0 49, LON_0 -2, K_0 0.9996012717,
        //     X_0 400000, Y_0 -100000)
        // keys are the PROJ-style names Geo.registerCrs documents
        var family: Option[String] = None
        val crsParams = scala.collection.mutable.Map.empty[String, Double]
        splitTopLevel(params, ',').foreach { kv =>
          val famRe = """(?is)^FAMILY\s+'?(\w+)'?$""".r
          val numRe =
            """(?is)^(\w+)\s+(-?(?:\d+\.?\d*|\.\d+)(?:[eE]-?\d+)?)$""".r
          kv.trim match {
            case famRe(f) => family = Some(f.toLowerCase)
            case numRe(k, v) => crsParams(k.toLowerCase) = v.toDouble
            case other => throw new IllegalArgumentException(
              s"bad CRS parameter: $other (want FAMILY " +
                "'tmerc|lcc|laea|aea|stere|merc|eqc|sinu|geos|longlat' " +
                "or <name> <number>)")
          }
        }
        val fam = family.getOrElse(throw new IllegalArgumentException(
          "CREATE CRS needs FAMILY ('tmerc'|'lcc'|'laea'|'aea'|'stere'|" +
            "'merc'|'eqc'|'sinu'|'geos'|'longlat')"))
        val persistent =
          Option(persistence).exists(_.equalsIgnoreCase("PERSISTENT"))
        if (persistent) catalog.crs.createPersistent(sridS.toInt, fam,
          crsParams.toMap)
        else graft.functions.Geo.registerCrs(sridS.toInt, fam, crsParams.toMap)
        Some(status(spark,
          s"registered ${if (persistent) "persistent " else ""}CRS EPSG:$sridS"))
      case reDropCrs(ifExists, sridS) =>
        val dropped = catalog.crs.drop(sridS.toInt)
        if (!dropped && ifExists == null) throw new IllegalArgumentException(
          s"DROP CRS: EPSG:$sridS is not a registered parameter row " +
            "(builtins cannot be dropped)")
        Some(status(spark, s"dropped CRS EPSG:$sridS"))
      case reShowCrs() =>
        import spark.implicits._
        val persisted = catalog.crs.persistedSrids()
        Some(graft.functions.Geo.listCrs()
          .map { case (srid, fam, src, defn) =>
            (srid, fam, if (persisted(srid)) "persistent" else src, defn) }
          .toDF("srid", "family", "source", "definition"))
      case reCreateSecret(persistence, name0, params) =>
        val name = unquoteName(name0)
        var tpe: Option[String] = None
        var scope: Option[String] = None
        val opts = scala.collection.mutable.Map.empty[String, String]
        splitTopLevel(params, ',').foreach { p =>
          val typeRe = """(?is)^TYPE\s+(\w+)$""".r
          val kvRe = """(?is)^(\w+)\s+'((?:[^']|'')*)'$""".r
          p match {
            case typeRe(t) => tpe = Some(t)
            case kvRe(k, v) =>
              val value = v.replace("''", "'")
              if (k.equalsIgnoreCase("SCOPE")) scope = Some(value)
              else opts(k.toLowerCase) = value
            case other => throw new IllegalArgumentException(
              s"bad secret parameter: $other")
          }
        }
        catalog.secrets.create(name,
          tpe.getOrElse(throw new IllegalArgumentException("secret needs TYPE")),
          scope, opts.toMap,
          persistent = Option(persistence).exists(_.equalsIgnoreCase("PERSISTENT")))
        Some(status(spark, s"created secret $name"))
      case reDropSecret(ifExists, name0) =>
        catalog.secrets.drop(unquoteName(name0), ifExists = ifExists != null)
        Some(status(spark, s"dropped secret ${unquoteName(name0)}"))
      case reShowSecrets() =>
        import spark.implicits._
        Some(catalog.secrets.list()
          .toDF("name", "type", "scope", "persistent", "option_keys"))
      case reSetExtension(kind, tbl0, json) =>
        val tbl = unquote(tbl0)
        graft.catalog.TableExtensions.set(catalog.warehouse, tbl,
          kind.replace("''", "'"), json.replace("''", "'"), spark.table(tbl).schema)
        Some(status(spark, s"set extension $kind for $tbl"))
      case reDropExtension(kind, tbl0) =>
        graft.catalog.TableExtensions.drop(
          catalog.warehouse, unquote(tbl0), kind.replace("''", "'"))
        Some(status(spark, s"dropped extension $kind"))
      case reShowExtensions(tbl0) =>
        import spark.implicits._
        Some(Seq(graft.catalog.TableExtensions.show(catalog.warehouse, unquote(tbl0)))
          .toDF("extensions"))
      case reCreateIndex(idx0, tbl0, col0, using) =>
        val tbl = unquote(tbl0); val column = unquote(col0)
        val kind = Option(using).map(_.toLowerCase).getOrElse("btree")
        // unnamed indexes get the reference's <column>_idx convention
        val idx = Option(idx0).map(unquote).getOrElse(s"${column}_idx")
        catalog.createIndex(tbl, idx, column, kind)
        Some(status(spark, s"created $kind index $idx on $tbl($column)"))
      case reShowIndexes(tbl0) =>
        import spark.implicits._
        Some(catalog.indexes(unquote(tbl0))
          .map(d => (d.name, d.column, d.kind))
          .toDF("name", "column", "type"))
      case reDropIndex(idx0, tbl0) =>
        catalog.dropIndex(unquote(tbl0), unquote(idx0))
        Some(status(spark, s"dropped index ${unquote(idx0)}"))
      case reShowHistory(name0) =>
        import spark.implicits._
        Some(catalog.history(unquote(name0))
          .map(e => (e.version, e.operation,
            new java.sql.Timestamp(e.tsMs).toString, e.dirs.size))
          .toDF("version", "operation", "timestamp", "n_commits"))
      case reRestore(name0, v) =>
        val name = unquote(name0)
        catalog.restoreVersion(name, v.toLong)
        Some(status(spark, s"restored $name to version $v"))
      case reVacuum(name0, retain) =>
        val name = unquote(name0)
        val keep = Option(retain).map(_.toInt).getOrElse(1)
        val (vs, ds) = catalog.vacuumTable(name, keep)
        Some(status(spark, s"vacuumed $name: removed $vs versions, $ds commits"))
      case reOptimize(name0, zcols) =>
        val name = unquote(name0)
        val z = Option(zcols).map(_.split(",").toSeq
          .map(c => unquote(c.trim)).filter(_.nonEmpty)).getOrElse(Seq.empty)
        val (before, after) = catalog.optimizeTable(name, z)
        Some(status(spark,
          s"optimized $name: $before files -> $after" +
            (if (z.nonEmpty) s" (zorder by ${z.mkString(",")})" else "")))
      case reAttach(url0, name0, opts) =>
        val name = unquoteName(name0)
        graft.catalog.Attachments.attach(spark, name, url0.replace("''", "'"),
          Option(opts).map(parseAttachOptions).getOrElse(Map.empty))
        Some(status(spark, s"attached $name"))
      case reDetach(name0) =>
        graft.catalog.Attachments.detach(spark, unquoteName(name0))
        Some(status(spark, s"detached ${unquoteName(name0)}"))
      case reShowAttachments() =>
        import spark.implicits._
        Some(graft.catalog.Attachments.list(spark).map(a =>
          (a.name, a.url, a.kind, a.listing.keys.toSeq.sorted.mkString(","),
            a.shownOptions.map { case (k, v) => s"$k=$v" }.mkString(",")))
          .toDF("name", "url", "kind", "schemas", "options"))
      case reAnalyze(name0) =>
        val name = unquote(name0)
        val n = catalog.analyzeFiles(name)
        Some(status(spark, s"analyzed $n files of $name"))
      case reShowStats(name0) =>
        Some(catalog.fileStats(unquote(name0)))
      case reShowFunctions() =>
        // the reference's function catalog (runtime.rs:419-426): every
        // session-resolvable function incl. the engine's registered ones
        import spark.implicits._
        Some(spark.catalog.listFunctions()
          .map(f => (f.name, Option(f.description).getOrElse(""), f.isTemporary))
          .toDF("name", "description", "is_temporary"))
      case reShowTables() =>
        import spark.implicits._
        Some(catalog.tables()
          .map(d => (d.name, d.kind, d.format.getOrElse(""), d.paths.mkString(",")))
          .toDF("name", "kind", "format", "paths"))
      case _ => None
    }
  }

  /** remainder after `DELETE FROM t`: empty, or `WHERE <pred>` */
  private def parseWhereTail(rest: String): Option[String] = {
    val r = rest.trim
    if (r.isEmpty) None
    else if (r.length > 5 && r.substring(0, 5).equalsIgnoreCase("WHERE") &&
      !Character.isLetterOrDigit(r.charAt(5)))
      Some(r.substring(5).trim)
    else throw new IllegalArgumentException(s"expected WHERE clause, got: $r")
  }

  /** find the first WHERE at top level (outside quotes/backticks/parens)
    * and split around it */
  private[sql] def splitAtTopLevelWhere(s: String): Option[(String, String)] = {
    var depth = 0
    var inS = false; var inD = false; var inB = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inS) { if (c == '\'') inS = false }
      else if (inD) { if (c == '"') inD = false }
      else if (inB) { if (c == '`') inB = false }
      else c match {
        case '\'' => inS = true
        case '"'  => inD = true
        case '`'  => inB = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case _ if depth == 0 && i + 5 <= s.length &&
            s.regionMatches(true, i, "WHERE", 0, 5) &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
            (i + 5 == s.length || !Character.isLetterOrDigit(s.charAt(i + 5))) =>
          return Some((s.substring(0, i).trim, s.substring(i + 5).trim))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** LOCATION 'a' [, 'b' ...] — single-quoted paths. */
  private[sql] def parsePaths(locs: String): Seq[String] =
    "'((?:[^']|'')*)'".r.findAllMatchIn(locs).map(_.group(1).replace("''", "'")).toSeq

  /** OPTIONS (key 'value', "key" 'value', ...) */
  private[sql] def parseOptions(s: String): Map[String, String] =
    ("""(\w+|"(?:[^"]|"")+")\s+'((?:[^']|'')*)'""").r.findAllMatchIn(s).map { m =>
      unquote(m.group(1)) -> m.group(2).replace("''", "'")
    }.toMap

  /** ATTACH's WITH list additionally admits the reference's
    * single-quoted keys: WITH ('token' 't', tls 'true') */
  private[sql] def parseAttachOptions(s: String): Map[String, String] =
    splitTopLevel(s, ',').map { p =>
      val kv = """(?is)^('(?:[^']|'')+'|\w+|"(?:[^"]|"")+")\s+'((?:[^']|'')*)'$""".r
      p.trim match {
        case kv(k, v) => unquoteName(unquote(k)) -> v.replace("''", "'")
        case other => throw new IllegalArgumentException(
          s"bad ATTACH option: $other")
      }
    }.toMap

  /** SET a = expr, b = expr — split on top-level commas (quotes and
    * parens respected), then on the first `=`. */
  private[sql] def parseAssignments(sets: String): Seq[(String, String)] =
    splitTopLevel(sets, ',').map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad assignment: $a")
      (a.substring(0, i).trim, a.substring(i + 1).trim)
    }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQ = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case `sep` if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def status(spark: SparkSession, msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("status")
  }
}
