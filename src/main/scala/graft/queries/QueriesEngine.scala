package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftSession, Tables}
import graft.dsl.JsonQuery
import graft.functions.VocabRegistry
import graft.sql.{GraftSql, Summarize}

/** Engine-feature coverage for the correctness gate: JSON DSL pipeline,
  * SUMMARIZE, UNION ALL BY NAME, geo predicate, vocabulary mapping,
  * coalesce_label — each expressed through the engine's own surface
  * (not plain DataFrame code) and oracled in ANSI SQL.
  */
object QueriesEngine {

  /** four disjoint-longitude-band geoparquet shards from lineitem +
    * their FileStats registry — the staging both spatial-pruning gates
    * (q_geo_pruned_scan, q_geo_dsl_bbox) share, so the shard layout
    * and the lon formula live exactly once */
  private def stageGeoShards(s: SparkSession,
      dir: String): (String, String) = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-geoprune")
    val pts = graft.Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        (($"l_orderkey" % 4) * 90 - 180 + $"l_discount" * 100 * 0.8).as("lon"),
        $"l_quantity".cast("double").as("lat"))
    (0 until 4).foreach { i =>
      graft.sources.GeoParquet.write(
        pts.filter($"l_orderkey" % 4 === i).coalesce(1),
        root.resolve(s"shard$i.parquet").toString, "lon", "lat")
    }
    val statsDir = root.resolve("stats").toString
    graft.stats.FileStats.write(
      graft.stats.FileStats.collect(s, "parquet",
        (0 until 4).map(i => root.resolve(s"shard$i.parquet").toString)),
      statsDir)
    (root.toString, statsDir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- the JSON DSL path end-to-end (select/filter-tree/sort/offset/limit)
    "q_dsl_pipeline" -> { (s, dir) =>
      GraftSession.configure(s)
      val q = s"""{"select": ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
                   "filter": {"and": [{"column": "l_quantity", "gt": 45},
                                      {"column": "l_extendedprice", "lt": 60000}]},
                   "sort_by": [{"Desc": "l_extendedprice"}, {"Asc": "l_orderkey"}, {"Asc": "l_linenumber"}],
                   "from": {"parquet": {"paths": ["$dir/lineitem.parquet"]}},
                   "offset": 10, "limit": 200}"""
      JsonQuery.compile(s, q)
    },

    // ---- DSL between + timestamp-string literal + distinct_on
    "q_dsl_distinct_on" -> { (s, dir) =>
      GraftSession.configure(s)
      val q = s"""{"select": ["o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"],
                   "filter": {"column": "o_orderdate", "gt_eq": "1993-01-01T00:00:00",
                              "lt_eq": "1997-12-31T23:59:59"},
                   "sort_by": [{"Desc": "o_orderdate"}, {"Desc": "o_orderkey"}],
                   "distinct": {"on": ["o_custkey"],
                                "select": ["o_custkey", "o_orderkey", "o_totalprice"]},
                   "from": {"parquet": {"paths": ["$dir/orders.parquet"]}}}"""
      JsonQuery.compile(s, q).orderBy(col("o_custkey"))
    },

    // ---- named + default table resolution: `from: "name"` resolves
    // through the session catalog (the reference's default_table /
    // named dataset binding); an absent `from` binds the table
    // registered as "default"
    "q_dsl_named_table" -> { (s, dir) =>
      GraftSession.configure(s)
      s.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("dsl_nation")
      s.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("default")
      val named = JsonQuery.compile(s,
        """{"select": ["n_regionkey", "n_name"],
            "filter": {"column": "n_regionkey", "lt_eq": 2},
            "from": "dsl_nation"}""")
      val dflt = JsonQuery.compile(s, """{"select": ["r_regionkey", "r_name"]}""")
      named.join(dflt, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name"), col("r_name")).orderBy(col("n_name"))
    },

    // ---- the DDL/catalog surface end-to-end through GraftEngine.sql:
    // external registration → CTAS → INSERT INTO → copy-on-write DELETE
    // and UPDATE → SELECT; the oracle recomputes the surviving rows
    // from the source parquet (DELETE keeps NOT-true, UPDATE is the
    // CASE-WHEN projection — the reference lower.rs semantics)
    "q_ddl_lifecycle" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-ddlgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE ddl_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      eng.sql("""CREATE TABLE ddl_live AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM ddl_orders WHERE o_orderkey % 3 = 0""")
      eng.sql("""INSERT INTO ddl_live
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM ddl_orders WHERE o_orderkey % 3 = 1""")
      eng.sql("DELETE FROM ddl_live WHERE o_totalprice < 50000")
      eng.sql("UPDATE ddl_live SET o_orderstatus = 'X' WHERE o_custkey % 10 = 0")
      eng.sql("SELECT * FROM ddl_live").orderBy(col("o_orderkey"))
    },

    // ---- CREATE INDEX end-to-end (reference managed-tables.md):
    // multi-file managed table → btree + bitmap indexes → a filtered
    // query planned through the index-pruning rule; the oracle replays
    // the same predicate over the source — identical rows proves the
    // pruned scan loses nothing
    "q_create_index" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-idxgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE idxg_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      eng.sql("""CREATE TABLE idxg AS
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM idxg_orders WHERE o_orderkey % 4 = 0""")
      (1 until 4).foreach { k =>
        eng.sql(s"""INSERT INTO idxg
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM idxg_orders WHERE o_orderkey % 4 = $k""")
      }
      eng.sql("CREATE INDEX ON idxg (o_totalprice) USING btree")
      eng.sql("CREATE INDEX status_idx ON idxg (o_orderstatus) USING bitmap")
      eng.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM idxg
        WHERE o_totalprice > 150000 AND o_orderstatus = 'F'""")
        .orderBy(col("o_orderkey"))
    },

    // ---- ATTACH end-to-end: a second (peer) warehouse mounted as a
    // foreign V2 catalog; the aggregate resolves through the attached
    // three-part name with DSv2 pushdown, and the oracle replays it
    // over the same parquet the peer serves.
    "q_attach_catalog" -> { (s, dir) =>
      GraftSession.configure(s)
      val peerWh = java.nio.file.Files.createTempDirectory("graft-attpeer").toString
      val peer = graft.GraftEngine(s, peerWh)
      peer.sql(s"CREATE EXTERNAL TABLE attg_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      val wh = java.nio.file.Files.createTempDirectory("graft-attloc").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"ATTACH '$peerWh' AS attgate")
      eng.sql("""SELECT o_orderpriority, count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM attgate.public.attg_orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },

    // ---- OPTIMIZE end-to-end: append-fragmented versioned table,
    // compacted + z-ordered through the statement; content must be
    // IDENTICAL to the logical union the oracle replays (layout
    // rewrites may never change results), and the scan benefits from
    // tight per-file min/max boxes on the z-ordered columns.
    "q_optimize_table" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-optgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE optg_li STORED AS parquet LOCATION '$dir/lineitem.parquet'")
      eng.sql("""CREATE TABLE optg_t AS SELECT l_orderkey, l_partkey,
        l_quantity, l_extendedprice FROM optg_li""")
      eng.sql("""INSERT INTO optg_t SELECT l_orderkey + 10000000, l_partkey,
        l_quantity, l_extendedprice FROM optg_li WHERE l_linenumber = 1""")
      eng.sql("OPTIMIZE optg_t ZORDER BY (l_orderkey, l_partkey)")
      eng.sql("""SELECT l_partkey, count(*) AS n,
          round(sum(l_extendedprice), 2) AS rev
        FROM optg_t WHERE l_orderkey < 1000000
        GROUP BY l_partkey ORDER BY l_partkey""")
    },

    // ---- ATTACH over the network wire: a peer engine SERVED by a
    // RemoteServer (TCP + Arrow IPC streaming — the reference's Flight
    // SQL transport seat), mounted via graft://host:port with a
    // basic-credential handshake. The filter pushes across the wire
    // (RemoteScan ships it to the server's plan); the aggregate runs
    // client-side over the returned stream; the oracle replays the
    // whole query over the same parquet the server reads.
    "q_attach_remote" -> { (s, dir) =>
      GraftSession.configure(s)
      val peerWh = java.nio.file.Files.createTempDirectory("graft-remwh").toString
      val peer = graft.GraftEngine(s, peerWh)
      peer.sql(s"CREATE EXTERNAL TABLE remg_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      peer.sql("CREATE USER rem_reader WITH PASSWORD 'remote-pw'")
      peer.sql("CREATE ROLE rem_readers")
      peer.sql("GRANT SELECT ON TABLE remg_orders TO ROLE rem_readers")
      peer.sql("GRANT ROLE rem_readers TO USER rem_reader")
      // daemon acceptor/handler threads: the server outlives this gate
      // builder so the returned (lazy) DataFrame can stream later
      val server = new graft.remote.RemoteServer(s, peerWh)
      val wh = java.nio.file.Files.createTempDirectory("graft-remloc").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS remgate " +
        "WITH (username 'rem_reader', password 'remote-pw')")
      eng.sql("""SELECT o_orderstatus, count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM remgate.public.remg_orders
        WHERE o_totalprice > 50000.0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },

    // ---- same-peer JOIN over the ATTACH wire: the equi-join of two
    // tables mounted from ONE RemoteServer collapses to a single
    // RemoteScan carrying a join spec (the reference runs same-remote
    // joins ON the remote — remote-tables.md:41); the aggregate then
    // pushes into the JOINED relation, so one row per group crosses
    // the network. Plan pins enforced inside the gate; the oracle
    // replays the join + aggregate over the same parquet.
    "q_attach_remote_join" -> { (s, dir) =>
      GraftSession.configure(s)
      val peerWh = java.nio.file.Files.createTempDirectory("graft-remjwh").toString
      val peer = graft.GraftEngine(s, peerWh)
      peer.sql(s"CREATE EXTERNAL TABLE remj_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      peer.sql(s"CREATE EXTERNAL TABLE remj_customer STORED AS parquet LOCATION '$dir/customer.parquet'")
      peer.sql("CREATE USER remj_reader WITH PASSWORD 'remj-pw'")
      peer.sql("CREATE ROLE remj_readers")
      peer.sql("GRANT SELECT ON TABLE remj_orders TO ROLE remj_readers")
      peer.sql("GRANT SELECT ON TABLE remj_customer TO ROLE remj_readers")
      peer.sql("GRANT ROLE remj_readers TO USER remj_reader")
      val server = new graft.remote.RemoteServer(s, peerWh)
      val wh = java.nio.file.Files.createTempDirectory("graft-remjloc").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS remjoin " +
        "WITH (username 'remj_reader', password 'remj-pw')")
      val df = eng.sql("""SELECT c_mktsegment, count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM remjoin.public.remj_orders JOIN remjoin.public.remj_customer
          ON o_custkey = c_custkey
        WHERE o_totalprice > 50000.0
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      // plan pins: ONE remote relation carrying the join (wire rows ≈
      // join output), no client-side Join, aggregate pushed with it
      val lp = df.queryExecution.optimizedPlan.toString
      require(lp.contains("⋈"),
        s"same-peer join must collapse into the remote relation:\n$lp")
      require(lp.sliding("RelationV2".length).count(_ == "RelationV2") == 1,
        s"exactly one remote relation expected:\n$lp")
      require(!lp.contains("Join "),
        s"no client-side join may remain:\n$lp")
      df
    },

    // ---- SET EXTENSION preset end-to-end: a preset document
    // registered on a parquet-backed table compiles to one WHERE
    // clause (presetWhereSql — the reference's PresetOp::as_sql apply
    // path, runtime.rs:841-907); the oracle replays the identical
    // predicate over the same parquet.
    "q_extension_preset" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-extgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE extg_li STORED AS parquet LOCATION '$dir/lineitem.parquet'")
      eng.sql("""SET EXTENSION 'preset' FOR extg_li TO
        '{"presets":[{"name":"returned_bulk","filters":[
           {"column":"l_returnflag","op":"=","value":"R"},
           {"column":"l_quantity","op":"between","value":[30,50]},
           {"column":"l_linestatus","op":"in","value":["F","O"]}]}]}'""")
      val where = graft.catalog.TableExtensions
        .presetWhereSql(wh, "extg_li", "returned_bulk")
      eng.sql(s"""SELECT l_orderkey, l_linenumber, l_quantity, l_linestatus
        FROM extg_li WHERE $where ORDER BY l_orderkey, l_linenumber""")
    },

    // ---- RBAC end-to-end: users/roles/grants, then a join run
    // through sqlAs — the authorized path must return exactly what the
    // oracle computes over the same parquet (authorization mustn't
    // perturb results). Default-deny and the r7 alias-spoof bypass are
    // asserted inside the gate (a regression makes the gate error).
    "q_rbac_read" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-rbacgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE rbac_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      eng.sql(s"CREATE EXTERNAL TABLE rbac_customer STORED AS parquet LOCATION '$dir/customer.parquet'")
      eng.sql(s"CREATE EXTERNAL TABLE rbac_lineitem STORED AS parquet LOCATION '$dir/lineitem.parquet'")
      eng.sql("CREATE USER analyst WITH PASSWORD 'pw'")
      eng.sql("CREATE ROLE order_readers")
      eng.sql("GRANT SELECT ON TABLE rbac_orders TO ROLE order_readers")
      eng.sql("GRANT SELECT ON TABLE rbac_customer TO ROLE order_readers")
      eng.sql("GRANT ROLE order_readers TO USER analyst")
      val analyst = eng.catalog.auth.identityOf("analyst")
      val denied =
        try { eng.sqlAs(analyst, "SELECT count(*) FROM rbac_lineitem").collect(); false }
        catch { case _: Exception => true }
      require(denied, "default-deny must reject the ungranted scan")
      val spoofed =
        try {
          eng.sqlAs(analyst,
            "SELECT count(*) FROM rbac_lineitem AS rbac_orders").collect(); false
        } catch { case _: Exception => true }
      require(spoofed, "an alias equal to a granted table must not bypass authz")
      eng.sqlAs(analyst, """SELECT o_orderstatus, count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM rbac_orders JOIN rbac_customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderstatus""").orderBy(col("o_orderstatus"))
    },

    // ---- LIST DATASETS end-to-end: four single-file formats written
    // by our own writers into one directory, classified by marker/
    // extension/magic; the oracle pins the classification table.
    "q_list_datasets" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-lsgate")
      val df = Tables.load(s, dir, "nation")
        .select($"n_nationkey".cast(IntegerType).as("k"),
          $"n_name".as("name")).orderBy("k")
      graft.sql.Outputs.copyTo(df, root.resolve("d.arrow").toString, None)
      graft.sql.Outputs.copyTo(df, root.resolve("d.bbf").toString, None)
      graft.sql.Outputs.copyTo(df, root.resolve("d.nc").toString, None)
      graft.sql.Outputs.copyTo(df, root.resolve("d.odv").toString, None)
      graft.sql.Outputs.listDatasets(s, root.toString)
        .select(regexp_extract(col("path"), "[^/]+$", 0).as("name"), col("format"))
        .orderBy("name")
    },

    // ---- DESCRIBE FORMAT end-to-end over a bbf file carrying every
    // storable dtype; the oracle pins the dtype → Spark type mapping.
    "q_describe_format" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val f = java.nio.file.Files.createTempDirectory("graft-descgate").resolve("t.bbf")
      val df = Tables.load(s, dir, "events").limit(10).select(
        col("event_id").cast(IntegerType).as("c_int32"),
        col("user_id").cast(LongType).as("c_int64"),
        col("value").cast(DoubleType).as("c_float64"),
        (col("value") > 0.5).as("c_bool"),
        col("event_type").as("c_string"),
        col("ts").cast(TimestampNTZType).as("c_timestamp"),
        col("ts").cast(DateType).as("c_date"))
      graft.sources.bbf.BbfStore.Writer.write(f, Seq("data" -> df))
      graft.sql.Outputs.describeFormat(s, "bbf", Seq(f.toString))
        .orderBy("column_name")
    },

    // ---- SQL-database federation end-to-end: a real external database
    // (embedded Derby over plain JDBC) with deterministic rows,
    // registered via STORED AS JDBC, aggregated through Spark's JDBC
    // source (filter/projection pushdown); oracle replays the rows.
    "q_jdbc_federation" -> { (s, dir) =>
      GraftSession.configure(s)
      val url = "jdbc:derby:memory:graftfedgate;create=true"
      val c = java.sql.DriverManager.getConnection(url)
      val st = c.createStatement()
      try st.execute("DROP TABLE gate_obs") catch { case _: java.sql.SQLException => () }
      st.execute("CREATE TABLE gate_obs (id INT, station VARCHAR(16), temp DOUBLE)")
      st.execute("INSERT INTO gate_obs VALUES (1,'aa',11.5),(2,'bb',12.5)," +
        "(3,'aa',13.0),(4,'cc',9.25),(5,'bb',10.75)")
      st.close(); c.close()
      val wh = java.nio.file.Files.createTempDirectory("graft-fedwh").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql("CREATE EXTERNAL TABLE fed_gate_obs STORED AS JDBC LOCATION " +
        s"'$url' OPTIONS (dbtable 'APP.GATE_OBS')")
      eng.sql("""SELECT STATION AS station, count(*) AS n,
          round(sum(TEMP), 4) AS total_temp
        FROM fed_gate_obs WHERE TEMP > 10 GROUP BY STATION ORDER BY station""")
    },

    // ---- $1..$n bind parameters (r17: previously spec-only §2 #57):
    // a parameterized aggregation runs through the engine's prepare/
    // bind path — $1 repeated, an int and a string bind, and a LITERAL
    // '$1' inside a string that must NOT rewrite (lit_markers = 0
    // proves no substitution happened inside quotes). The oracle is
    // the same statement with the values inlined as constants.
    "q_bind_params" -> { (s, dir) =>
      GraftSession.configure(s)
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("li_bind")
      GraftSql.sql(s,
        """SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
             count(*) AS n,
             CAST(sum(CASE WHEN '$1' = '30' THEN 1 ELSE 0 END) AS BIGINT)
               AS lit_markers
           FROM li_bind
           WHERE l_quantity <= $1 AND l_quantity >= $1 - 25
             AND l_shipdate < CAST($2 AS TIMESTAMP_NTZ)
           GROUP BY l_returnflag, l_linestatus""",
        Seq(30, "1997-06-01"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- domain UDFs through SQL text: the TEOS-10 pressure→depth
    // approximation (pure arithmetic — the oracle replays the identical
    // polynomial) and cast_int8_as_char. map_units stays spec-only: its
    // conversion table is engine data, not SQL-replayable.
    "q_domain_funcs" -> { (s, dir) =>
      GraftSession.configure(s)
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("li_domain")
      GraftSql.sql(s,
        """SELECT l_orderkey, l_linenumber,
             round(pressure_to_depth_teos_10(l_extendedprice / 10.0, l_quantity), 6) AS depth,
             cast_int8_as_char(65 + CAST(l_quantity AS BIGINT) % 26) AS ch
           FROM li_domain""")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- ANALYZE FILES + DSL stats pruning end-to-end: orders staged
    // into 4 disjoint key-range files, per-file min/max collected, then
    // a selective DSL query answers through the pruned scan (the
    // 1-of-4-files-opened pin lives in CatalogSpec; this gates the
    // ANSWER of the pruned path against the oracle).
    "q_stats_pruned_scan" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-statsgate")
      val wh = java.nio.file.Files.createTempDirectory("graft-statswh").toString
      val orders = Tables.load(s, dir, "orders")
      (0 until 4).foreach { i =>
        orders.filter($"o_orderkey" % 4 === i)
          .coalesce(1).write.mode("overwrite").parquet(root.resolve(s"part$i").toString)
      }
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE pruned_orders STORED AS parquet LOCATION '$root/part*/*.parquet'")
      eng.sql("ANALYZE FILES FOR pruned_orders")
      val statsDir = eng.catalog.statsDir("pruned_orders")
      eng.jsonQuery(
        s"""{"select": ["o_orderkey", "o_custkey", "o_totalprice"],
             "filters": [{"column": "o_totalprice", "gt": 400000.0}],
             "from": {"parquet": {"paths": ["$root/part*/*.parquet"], "stats": "$statsDir"}}}""")
        .orderBy(col("o_orderkey"))
    },

    // ---- GeoParquet 1.1 bbox covering + spatial FILE pruning (r15):
    // four spatial shards with disjoint longitude bands, written with
    // the per-row bbox covering columns; one FileStats pass records
    // their ranges; a query rectangle covering only one band scans
    // exactly 1 of 4 files (files_scanned pinned in the output) and
    // returns rows IDENTICAL to the unpruned scan — the oracle
    // recomputes them from the source table. The read reduction the
    // reference's Morton-sort benchmark is about.
    "q_geo_pruned_scan" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val (root, statsDir) = stageGeoShards(s, dir)
      val (pruned, kept, total) = graft.sources.GeoParquet.readPruned(
        s, Seq(s"$root/shard*.parquet/*.parquet"), statsDir,
        xmin = 0, ymin = 0, xmax = 10, ymax = 60)
      pruned.select($"l_orderkey", $"l_linenumber",
          round($"lon", 6).as("lon"), $"lat",
          lit(kept).cast(LongType).as("files_scanned"),
          lit(total).cast(LongType).as("files_total"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- the same spatial pruning through the DSL front door (r15):
    // from.format.geoparquet with `bbox` turns the window into four
    // covering-column range conds against the SAME stats registry;
    // rows equal the direct recompute, files opened stays 1-of-4
    // (verified by the shared machinery the q_geo_pruned_scan gate
    // pins — here the check is the row identity through the DSL).
    "q_geo_dsl_bbox" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val (root, statsDir) = stageGeoShards(s, dir)
      graft.dsl.JsonQuery.compile(s,
        s"""{"select": ["l_orderkey", "l_linenumber", "lon", "lat"],
             "from": {"geoparquet": {
               "paths": ["$root/shard*.parquet/*.parquet"],
               "stats": "$statsDir",
               "bbox": [0, 0, 10, 60]}}}""")
        .select($"l_orderkey", $"l_linenumber",
          round($"lon", 6).as("lon"), $"lat")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- crawler discovery end-to-end: stage per-event-type parquet
    // directories, CREATE + RUN CRAWLER (discover → classify → one
    // external table per (dir, format)), then aggregate through the
    // crawled registrations. Oracle recomputes from the source parquet.
    "q_crawler_discovery" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-crawlgate")
      val wh = java.nio.file.Files.createTempDirectory("graft-crawlwh").toString
      Seq("click", "view").foreach { et =>
        Tables.load(s, dir, "events").filter($"event_type" === et)
          .write.mode("overwrite").parquet(root.resolve(et + "_events").toString)
      }
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE CRAWLER ev_crawler ON '$root'")
      eng.sql("RUN CRAWLER ev_crawler")
      eng.sql("""SELECT 'click' AS et, count(*) AS n, round(sum(value), 4) AS total
                 FROM click_events""")
        .unionAll(eng.sql(
          """SELECT 'view' AS et, count(*) AS n, round(sum(value), 4) AS total
             FROM view_events"""))
        .orderBy(col("et"))
    },

    // ---- ALTER TABLE copy-on-write schema evolution end-to-end:
    // ADD COLUMN (null-filled) → UPDATE fills it → RENAME COLUMN →
    // DROP COLUMN → SELECT. Oracle recomputes the surviving projection
    // from the source parquet.
    "q_alter_table" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-altergate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE alt_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      eng.sql("""CREATE TABLE alt_live AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM alt_orders WHERE o_orderkey % 5 = 0""")
      eng.sql("ALTER TABLE alt_live ADD COLUMN price_band STRING")
      eng.sql("UPDATE alt_live SET price_band = CASE WHEN o_totalprice >= 150000 THEN 'high' ELSE 'low' END WHERE true")
      eng.sql("ALTER TABLE alt_live RENAME COLUMN price_band TO band")
      eng.sql("ALTER TABLE alt_live DROP COLUMN o_orderstatus")
      eng.sql("SELECT * FROM alt_live").orderBy(col("o_orderkey"))
    },

    // ---- views + materialized views end-to-end: a VIEW tracks source
    // mutations live, a MATERIALIZED VIEW serves its frozen snapshot
    // until REFRESH. The INSERT lands between materialization and
    // refresh; `stale_rows` (the MV's row count BEFORE refresh, captured
    // as a literal) pins that the MV really was frozen — the oracle
    // recomputes it from the F-only seed.
    // ---- partitioned + bucketed managed tables through the SQL front
    // door: PARTITIONED BY prunes directories, CLUSTERED BY co-locates
    // the join (zero-exchange, plan-pinned in spec); the oracle replays
    // the data outcome (CoW delete + partition-filtered co-bucketed
    // join) in plain SQL.
    "q_partitioned_bucketed_ddl" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-pbgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE pb_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      eng.sql(s"CREATE EXTERNAL TABLE pb_cust STORED AS parquet LOCATION '$dir/customer.parquet'")
      eng.sql("""CREATE TABLE pb_part PARTITIONED BY (o_orderpriority) AS
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM pb_orders""")
      eng.sql("DELETE FROM pb_part WHERE o_totalprice < 50000")
      eng.sql("""CREATE TABLE pb_bkt CLUSTERED BY (c_custkey) INTO 8 BUCKETS AS
        SELECT c_custkey, c_mktsegment FROM pb_cust""")
      eng.sql("""SELECT o_orderpriority, c_mktsegment, count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM pb_part JOIN pb_bkt ON o_custkey = c_custkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderpriority, c_mktsegment""")
        .orderBy("o_orderpriority", "c_mktsegment")
    },

    // ---- versioned managed storage end-to-end (the Lance versioned-
    // commits analog, beacon-lance/src/io.rs:207): CTAS → INSERT →
    // DELETE → RESTORE each publish an immutable manifest; the gate
    // reads versions 1-3 via time travel plus the restored current
    // state, and the oracle recomputes all four states from the source
    // parquet — identical rows proves no version leaks or loses data.
    "q_time_travel" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-ttgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE tt_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      eng.sql("""CREATE TABLE tt_live AS
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM tt_orders WHERE o_orderkey % 4 = 0""")
      eng.sql("""INSERT INTO tt_live
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM tt_orders WHERE o_orderkey % 4 = 1""")
      eng.sql("DELETE FROM tt_live WHERE o_totalprice < 100000")
      eng.sql("RESTORE TABLE tt_live VERSION AS OF 1")
      val v1 = eng.catalog.tableAt("tt_live", 1).withColumn("v", lit(1))
      val v2 = eng.catalog.tableAt("tt_live", 2).withColumn("v", lit(2))
      val v3 = eng.catalog.tableAt("tt_live", 3).withColumn("v", lit(3))
      val cur = eng.sql("SELECT * FROM tt_live").withColumn("v", lit(4))
      v1.unionAll(v2).unionAll(v3).unionAll(cur)
        .orderBy(col("v"), col("o_orderkey"))
    },

    "q_view_mv_lifecycle" -> { (s, dir) =>
      GraftSession.configure(s)
      val wh = java.nio.file.Files.createTempDirectory("graft-mvgate").toString
      val eng = graft.GraftEngine(s, wh)
      eng.sql(s"CREATE EXTERNAL TABLE mv_orders STORED AS parquet LOCATION '$dir/orders.parquet'")
      eng.sql("""CREATE TABLE mv_base AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM mv_orders WHERE o_orderstatus = 'F'""")
      val q = """SELECT o_custkey, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
                 FROM mv_base GROUP BY o_custkey"""
      eng.sql(s"CREATE VIEW mv_view AS $q")
      eng.sql(s"CREATE MATERIALIZED VIEW mv_mat AS $q")
      eng.sql("""INSERT INTO mv_base
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM mv_orders WHERE o_orderstatus = 'O'""")
      val staleRows = eng.sql("SELECT * FROM mv_mat").count()
      eng.sql("REFRESH mv_mat")
      val live = eng.sql("SELECT * FROM mv_view").withColumn("src", lit("view"))
      val refreshed = eng.sql("SELECT * FROM mv_mat").withColumn("src", lit("mv"))
      live.unionAll(refreshed)
        .withColumn("stale_rows", lit(staleRows))
        .orderBy(col("src"), col("o_custkey"))
    },

    // ---- SUMMARIZE (single-pass profile); avg/std rounded for the
    //      cross-engine gate (different-but-both-correct summation orders)
    "q_summarize_lineitem" -> { (s, dir) =>
      GraftSession.configure(s)
      Summarize.summarize(Tables.load(s, dir, "lineitem"))
        .withColumn("avg", round(col("avg"), 4))
        .withColumn("std", round(col("std"), 4))
        .withColumn("null_percentage", round(col("null_percentage"), 4))
        .orderBy("column_name")
    },

    // ---- UNION ALL BY NAME through the SQL front door
    "q_union_by_name" -> { (s, dir) =>
      GraftSession.configure(s)
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("li_ubn")
      Tables.load(s, dir, "orders").createOrReplaceTempView("o_ubn")
      GraftSql.sql(s,
        """SELECT l_orderkey AS k, l_linenumber AS line, l_quantity AS qty FROM li_ubn
           UNION ALL BY NAME
           SELECT o_orderkey AS k, o_totalprice AS price FROM o_ubn""")
        .orderBy(col("k").asc, col("line").asc_nulls_first, col("price").asc_nulls_first)
    },

    // ---- geo: point-in-triangle over derived coordinates
    "q_geo_within" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      val wkt = "POLYGON ((0 0, 10 0, 10 50, 0 0))"
      Tables.load(s, dir, "lineitem")
        .filter(graft.functions.GraftFunctions.st_within_point(
          lit(wkt), $"l_discount" * 100, $"l_quantity"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_inside"))
        .orderBy($"l_returnflag")
    },

    // ---- ST_* suite: per-row point + rectangle geometries built from
    // data columns as WKT strings (integer coordinates so both engines
    // format identically); the oracle replays the distance/area/
    // intersect/contain semantics as raw arithmetic over the same
    // columns — a genuine cross-check of the WKT parse + geometry math
    // ---- ST_* accessors/measures (r9 widening of the suite):
    // st_x/st_y (NULL for non-points), st_npoints, st_perimeter,
    // st_centroid — same synthetic shapes, arithmetic-replay oracle
    "q_geo_suite2" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      val x = $"x"; val y = $"y"; val w = $"w"
      def i(c: org.apache.spark.sql.Column) = c.cast("string")
      val pointWkt = concat(lit("POINT ("), i(x), lit(" "), i(y), lit(")"))
      val rectWkt = concat(lit("POLYGON (("),
        i(x - w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y - w), lit("))"))
      // r18 note: the q_geo_suite3 final-sort restructure measured
      // NEUTRAL-to-negative here (these ST_* accessors are ~3× cheaper
      // than suite3's buffer build, so the widen exchange costs what
      // the parallelism wins back) — kept in the original shape.
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          round($"l_discount" * 100).cast("int").as("x"),
          $"l_quantity".cast("int").as("y"),
          ($"l_linenumber" % 3 + 1).cast("int").as("w"))
        .orderBy($"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber",
          GeoExprs.st_x(pointWkt).as("px"),
          GeoExprs.st_y(pointWkt).as("py"),
          GeoExprs.st_x(rectWkt).as("rect_x_is_null"),
          GeoExprs.st_npoints(rectWkt).as("np"),
          round(GeoExprs.st_perimeter(rectWkt), 6).as("perim"),
          GeoExprs.st_centroid(rectWkt).as("centroid"))
    },

    // ---- ST_* widening (r11): st_dwithin (distance ≤ r without
    // materializing a buffer), st_envelope (bbox WKT), st_buffer
    // (16-gon circle around a point), plus the bound accessors the
    // extent aggregate composes from. All codegen expressions; the
    // oracle replays the arithmetic (sqrt is correctly-rounded IEEE,
    // buffer area/perimeter replay against the closed-form constants
    // through round(,6)).
    "q_geo_suite3" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      val x = $"x"; val y = $"y"; val w = $"w"
      def i(c: org.apache.spark.sql.Column) = c.cast("string")
      val pointWkt = concat(lit("POINT ("), i(x), lit(" "), i(y), lit(")"))
      val rectWkt = concat(lit("POLYGON (("),
        i(x - w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y - w), lit("))"))
      val buf = GeoExprs.st_buffer(pointWkt, w.cast("double"), lit(16))
      // r18 (guide §2.5/§2.6): the ST_* projection is the whole cost
      // here (16-gon buffer build + re-parses); it used to sit ABOVE
      // the mid-plan sort, i.e. AFTER the range exchange whose ~10 MB
      // output AQE coalesces to a few partitions — measured 2.1 s on 8
      // of 32 cores. Projecting BEFORE the sort on the widened scan
      // runs it at full parallelism; the sort is final — same keys,
      // same row order, same bytes. (suite2/intersect measured neutral
      // under the same treatment — their ST_ calls are too cheap — and
      // keep the original shape.)
      graft.operators.Par.widen(Tables.load(s, dir, "lineitem"))
        .select($"l_orderkey", $"l_linenumber",
          round($"l_discount" * 100).cast("int").as("x"),
          $"l_quantity".cast("int").as("y"),
          ($"l_linenumber" % 3 + 1).cast("int").as("w"))
        .select($"l_orderkey", $"l_linenumber",
          GeoExprs.st_dwithin(pointWkt, lit("POINT (5 25)"), lit(10.0))
            .as("near_center"),
          GeoExprs.st_envelope(rectWkt).as("env"),
          GeoExprs.st_envelope(pointWkt).as("env_pt"),
          GeoExprs.st_npoints(buf).as("buf_np"),
          round(GeoExprs.st_area(buf), 6).as("buf_area"),
          round(GeoExprs.st_perimeter(buf), 6).as("buf_perim"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- real polygon intersection: Sutherland–Hodgman clipping +
    // shoelace (st_intersection_area). The gate's rects are axis-
    // aligned so the oracle replays the closed form exactly — the
    // engine still runs the full general clipping path (the spec
    // covers rotated/triangular convex clips); overlap area is the
    // spatial-coverage measure dedup/join work needs.
    "q_geo_intersect" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      val x = $"x"; val y = $"y"; val w = $"w"
      def i(c: org.apache.spark.sql.Column) = c.cast("string")
      val rectWkt = concat(lit("POLYGON (("),
        i(x - w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y - w), lit("))"))
      val zone = lit("POLYGON ((0 0, 10 0, 10 25, 0 25, 0 0))")
      // r18 note: suite3's final-sort restructure measured neutral-to-
      // negative here (one cheap ST_ call) — kept in the original shape.
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          round($"l_discount" * 100).cast("int").as("x"),
          $"l_quantity".cast("int").as("y"),
          ($"l_linenumber" % 3 + 1).cast("int").as("w"))
        .orderBy($"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber",
          round(GeoExprs.st_intersection_area(rectWkt, zone), 6)
            .as("zone_overlap"))
    },

    // ---- general polygon booleans (r12): Greiner–Hormann st_union /
    // st_intersection over per-row parametric fixtures — square ×
    // rotated diamond (closed forms: ∩ = 2(a+1)²−4, ∪ = 4a²+4) and a
    // CONCAVE scaled U-shape × slab (∩ = s² as TWO components, ∪ =
    // 8.5s² — and st_intersection_area now takes the concave clip
    // path). round(,6) absorbs the crossing-parameter float dust.
    "q_geo_boolean" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def i(c: org.apache.spark.sql.Column) = c.cast("int").cast("string")
      val a = $"a"; val sc = $"sc"
      val sq = concat(lit("POLYGON ((0 0, "), i(a * 2), lit(" 0, "),
        i(a * 2), lit(" "), i(a * 2), lit(", 0 "), i(a * 2), lit(", 0 0))"))
      val di = concat(lit("POLYGON (("), i(a), lit(" -1, "),
        i(a * 2 + 1), lit(" "), i(a), lit(", "),
        i(a), lit(" "), i(a * 2 + 1), lit(", -1 "), i(a), lit(", "),
        i(a), lit(" -1))"))
      val u = concat(lit("POLYGON ((0 0, "), i(sc * 3), lit(" 0, "),
        i(sc * 3), lit(" "), i(sc * 3), lit(", "),
        i(sc * 2), lit(" "), i(sc * 3), lit(", "),
        i(sc * 2), lit(" "), i(sc), lit(", "),
        i(sc), lit(" "), i(sc), lit(", "),
        i(sc), lit(" "), i(sc * 3), lit(", 0 "), i(sc * 3), lit(", 0 0))"))
      val top = (sc.cast("double") * 2.5).cast("string")
      val slab = concat(lit("POLYGON (("), i(-sc), lit(" "), i(sc * 2), lit(", "),
        i(sc * 4), lit(" "), i(sc * 2), lit(", "),
        i(sc * 4), lit(" "), top, lit(", "),
        i(-sc), lit(" "), top, lit(", "),
        i(-sc), lit(" "), i(sc * 2), lit("))"))
      val ix = GeoExprs.st_intersection(u, slab)
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          ($"n_nationkey" % 4 + 2).cast("int").as("a"),
          ($"n_nationkey" % 3 + 1).cast("int").as("sc"))
        .select($"n_nationkey",
          round(GeoExprs.st_area(GeoExprs.st_intersection(sq, di)), 6).as("ia"),
          round(GeoExprs.st_area(GeoExprs.st_union(sq, di)), 6).as("ua"),
          round(GeoExprs.st_intersection_area(slab, u), 6).as("cia"),
          round(GeoExprs.st_area(GeoExprs.st_union(u, slab)), 6).as("uua"),
          GeoExprs.st_npoints(ix).cast(LongType).as("ix_npoints"),
          (size(split(ix, "\\)\\), \\(\\(", -1))).cast(LongType).as("ix_parts"))
        .orderBy($"n_nationkey")
    },

    // ---- hull + simplification (r12): st_convex_hull (monotone
    // chain) over the concave U — hull is the enclosing square, byte-
    // compared as WKT plus closed-form area/npoints — and st_simplify
    // (two-anchor Douglas–Peucker) over a scale-proportional fixture
    // (collinear edge midpoint, 0.25s bump under the 0.5s tolerance, a
    // 3s spike above it): the kept-corner set is scale-invariant, so
    // npoints and the simplified area are CASE closed forms.
    "q_geo_suite4" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def i(c: org.apache.spark.sql.Column) = c.cast("int").cast("string")
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val sc = $"sc"; val t = $"t"
      val u = concat(lit("POLYGON (("), i(t), lit(" "), i(t), lit(", "),
        i(sc * 3 + t), lit(" "), i(t), lit(", "),
        i(sc * 3 + t), lit(" "), i(sc * 3 + t), lit(", "),
        i(sc * 2 + t), lit(" "), i(sc * 3 + t), lit(", "),
        i(sc * 2 + t), lit(" "), i(sc + t), lit(", "),
        i(sc + t), lit(" "), i(sc + t), lit(", "),
        i(sc + t), lit(" "), i(sc * 3 + t), lit(", "),
        i(t), lit(" "), i(sc * 3 + t), lit(", "),
        i(t), lit(" "), i(t), lit("))"))
      val sd = sc.cast("double")
      val simp = concat(lit("POLYGON (("),
        d(t), lit(" "), d(t), lit(", "),
        d(sd + t), lit(" "), d(sd * 0.25 + t), lit(", "),
        d(sd * 4 + t), lit(" "), d(t), lit(", "),
        d(sd * 4 + t), lit(" "), d(sd + t), lit(", "),
        d(sd * 4 + t), lit(" "), d(sd * 2 + t), lit(", "),
        d(sd * 2.5 + t), lit(" "), d(sd * 2 + t), lit(", "),
        d(sd * 2 + t), lit(" "), d(sd * 5 + t), lit(", "),
        d(sd * 1.5 + t), lit(" "), d(sd * 2 + t), lit(", "),
        d(t), lit(" "), d(sd * 2 + t), lit(", "),
        d(t), lit(" "), d(t), lit("))"))
      val simplified = GeoExprs.st_simplify(simp, sd * 0.5)
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          ($"n_nationkey" % 3 + 1).cast("int").as("sc"),
          $"n_nationkey".cast("int").as("t"))
        .select($"n_nationkey",
          GeoExprs.st_convex_hull(u).as("hull_wkt"),
          round(GeoExprs.st_area(GeoExprs.st_convex_hull(u)), 6).as("hull_area"),
          GeoExprs.st_npoints(GeoExprs.st_convex_hull(u)).cast(LongType).as("hull_np"),
          GeoExprs.st_npoints(simplified).cast(LongType).as("simp_np"),
          round(GeoExprs.st_area(simplified), 6).as("simp_area"))
        .orderBy($"n_nationkey")
    },

    // ---- ST_Extent aggregate: per-group bounding box of the points,
    // map-side min/max partials — one 4-double row per group shuffles
    "q_geo_extent" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      val pointWkt = concat(lit("POINT ("),
        $"x".cast("string"), lit(" "), $"y".cast("string"), lit(")"))
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag",
          round($"l_discount" * 100).cast("int").as("x"),
          $"l_quantity".cast("int").as("y"))
        .groupBy($"l_returnflag")
        .agg(GeoExprs.st_extent(pointWkt).as("extent"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // ---- CRS transform (r15): EPSG:4326 → 3857 closed-form spherical
    // Mercator (x = R·λ, y = R·ln tan(π/4 + φ/2)) — the oracle replays
    // the projection's published definition as plain ln/tan/radians
    // arithmetic; the inverse leg round-trips through the engine and
    // must land back on the integer-degree fixtures. A geodetic unit
    // square projects to a perfect rectangle (x is linear in lon, y
    // depends only on lat), so the polygon leg's shoelace area has the
    // closed form R·Δλ · (y(φ+1) − y(φ)). Map-only codegen, no shuffle
    // but the final presentation sort.
    "q_geo_transform" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = $"n_nationkey" % 36 * 10 - 175
      val lat = $"n_nationkey" % 17 * 10 - 80
      val pt = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      val sq = concat(lit("POLYGON (("),
        d(lon), lit(" "), d(lat), lit(", "),
        d(lon + 1), lit(" "), d(lat), lit(", "),
        d(lon + 1), lit(" "), d(lat + 1), lit(", "),
        d(lon), lit(" "), d(lat + 1), lit(", "),
        d(lon), lit(" "), d(lat), lit("))"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(pt, lit(4326), lit(3857)).as("m"),
          GeoExprs.st_transform(sq, lit(4326), lit(3857)).as("msq"))
        .select($"n_nationkey",
          // + 0.0 normalizes IEEE −0.0 (lat 0 → ln(tan(π/4)) ≈ −7e-10
          // → rounds to −0.0 where the oracle's libm lands on +0.0)
          (round(GeoExprs.st_x($"m"), 3) + 0.0).as("mx"),
          (round(GeoExprs.st_y($"m"), 3) + 0.0).as("my"),
          (round(GeoExprs.st_x(
            GeoExprs.st_transform($"m", lit(3857), lit(4326))), 6) + 0.0)
            .as("back_lon"),
          (round(GeoExprs.st_y(
            GeoExprs.st_transform($"m", lit(3857), lit(4326))), 6) + 0.0)
            .as("back_lat"),
          (round(GeoExprs.st_area($"msq"), 0) + 0.0).as("sq_area_m2"))
        .orderBy($"n_nationkey")
    },

    // ---- UTM transform (r15): WGS84 transverse Mercator (the Snyder
    // series) to zone 33N and 33S — the oracle replays the SAME series
    // as plain SQL arithmetic (sin/sqrt/radians), the inverse leg
    // round-trips through the engine back onto the integer-degree
    // fixtures. Map-only codegen.
    "q_geo_transform_utm" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = $"n_nationkey" % 5 * 3 + 9
      val lat = $"n_nationkey" % 13 * 10 - 60
      val latS = -($"n_nationkey" % 8 * 10 + 5)
      val ptN = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      val ptS = concat(lit("POINT ("), d(lon), lit(" "), d(latS), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(ptN, lit(4326), lit(32633)).as("mn"),
          GeoExprs.st_transform(ptS, lit(4326), lit(32733)).as("ms"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"mn"), 3).as("easting"),
          round(GeoExprs.st_y($"mn"), 3).as("northing"),
          round(GeoExprs.st_y($"ms"), 3).as("northing_s"),
          // round 5 (≈1 m): the series' round-trip closure is ~1e-6°
          // at the band edges, which would flip a round-6 boundary
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"mn", lit(32633), lit(4326))), 5)
            .as("back_lon"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"mn", lit(32633), lit(4326))), 5)
            .as("back_lat"))
        .orderBy($"n_nationkey")
    },

    // ---- parameter-row CRS registry (r16): two CRSs that are NOT in
    // any named registry — EPSG:27700 (British National Grid: tmerc on
    // Airy 1830 with a non-equatorial origin and negative false
    // northing) and EPSG:5070 (NAD83 / CONUS Albers: the aea family) —
    // registered at query time from their published EPSG parameters.
    // The oracle replays both forward series (Snyder 8-9..8-17 with
    // the M(lat0) offset; 14-1..14-4 + the authalic q) as raw SQL
    // arithmetic; the inverse legs round-trip through the engine.
    "q_geo_transform_custom" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.{Geo, GeoExprs}
      Geo.registerCrs(27700, "tmerc", Map(
        "a" -> 6377563.396, "rf" -> 299.3249646, "lat_0" -> 49.0,
        "lon_0" -> -2.0, "k_0" -> 0.9996012717,
        "x_0" -> 400000.0, "y_0" -> -100000.0))
      Geo.registerCrs(5070, "aea", Map(
        "a" -> 6378137.0, "rf" -> 298.257222101, "lat_0" -> 23.0,
        "lon_0" -> -96.0, "lat_1" -> 29.5, "lat_2" -> 45.5,
        "x_0" -> 0.0, "y_0" -> 0.0))
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lonGb = $"n_nationkey" % 7 - 5
      val latGb = $"n_nationkey" % 10 + 50
      val lonUs = -($"n_nationkey" % 15 + 89)
      val latUs = $"n_nationkey" % 20 + 25
      val ptGb = concat(lit("POINT ("), d(lonGb), lit(" "), d(latGb), lit(")"))
      val ptUs = concat(lit("POINT ("), d(lonUs), lit(" "), d(latUs), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(ptGb, lit(4326), lit(27700)).as("gb"),
          GeoExprs.st_transform(ptUs, lit(4326), lit(5070)).as("us"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"gb"), 3).as("easting_gb"),
          round(GeoExprs.st_y($"gb"), 3).as("northing_gb"),
          round(GeoExprs.st_x($"us"), 3).as("easting_us"),
          round(GeoExprs.st_y($"us"), 3).as("northing_us"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"gb", lit(27700), lit(4326))), 5)
            .as("back_lon_gb"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"gb", lit(27700), lit(4326))), 5)
            .as("back_lat_gb"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"us", lit(5070), lit(4326))), 5)
            .as("back_lon_us"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"us", lit(5070), lit(4326))), 5)
            .as("back_lat_us"))
        .orderBy($"n_nationkey")
    },

    // ---- datum-correct reprojection (r16): EPSG:27700 with the REAL
    // OSGB36 towgs84 parameters — the oracle replays the ENTIRE
    // pipeline as SQL arithmetic: WGS84 geodetic → geocentric → the
    // exact-inverse Helmert matrix → 8 unrolled iterations of the
    // geodetic-latitude recovery on Airy 1830 → the TM forward series.
    // The inverse leg round-trips through the engine.
    "q_geo_transform_datum" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.{Geo, GeoExprs}
      Geo.registerCrs(920700, "tmerc", Map(
        "a" -> 6377563.396, "rf" -> 299.3249646, "lat_0" -> 49.0,
        "lon_0" -> -2.0, "k_0" -> 0.9996012717,
        "x_0" -> 400000.0, "y_0" -> -100000.0,
        "dx" -> 446.448, "dy" -> -125.157, "dz" -> 542.060,
        "rx" -> 0.1502, "ry" -> 0.2470, "rz" -> 0.8421, "ds" -> -20.4894))
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = -($"n_nationkey" % 8) + 1
      val lat = $"n_nationkey" % 10 + 50
      val pt = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(pt, lit(4326), lit(920700)).as("g"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"g"), 3).as("easting"),
          round(GeoExprs.st_y($"g"), 3).as("northing"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"g", lit(920700), lit(4326))), 5)
            .as("back_lon"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"g", lit(920700), lit(4326))), 5)
            .as("back_lat"))
        .orderBy($"n_nationkey")
    },

    // ---- equidistant cylindrical (r17): EPSG:4087 — the quick-look
    // world grid. The oracle replays x = a·λ and the Snyder 3-21
    // meridian-arc northing as raw SQL; the inverse (mu-series
    // meridian-arc inversion) round-trips in-engine.
    "q_geo_transform_eqc" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = ($"n_nationkey" * 41) % 357 - 177
      val lat = ($"n_nationkey" % 35) * 5 - 85
      val pt = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(pt, lit(4326), lit(4087)).as("g"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"g"), 3).as("easting"),
          round(GeoExprs.st_y($"g"), 3).as("northing"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"g", lit(4087), lit(4326))), 5)
            .as("back_lon"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"g", lit(4087), lit(4326))), 5)
            .as("back_lat"))
        .orderBy($"n_nationkey")
    },

    // ---- sinusoidal (r17 cont.): the MODIS land grid (authalic
    // sphere R = 6371007.181 — the registry's rf = 0 sphere notation)
    // and an ellipsoidal WGS84 sinusoidal with an off-zero central
    // meridian. The oracle replays both forwards as raw SQL —
    // x = R·λ·cosφ (sphere) and x = a·λ·cosφ/√(1−e²sin²φ) with the
    // Snyder 3-21 meridian-arc northing (ellipsoid) — including the
    // antimeridian wrap of λ−λ0; the inverse legs (mu-series arc
    // inversion) round-trip in-engine.
    "q_geo_transform_sinu" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.{Geo, GeoExprs}
      Geo.registerCrs(96974, "sinu", Map( // MODIS sinusoidal (SR-ORG:6974)
        "a" -> 6371007.181, "rf" -> 0.0, "lon_0" -> 0.0))
      Geo.registerCrs(954008, "sinu", Map( // ellipsoidal, CM 20°E
        "a" -> 6378137.0, "rf" -> 298.257223563, "lon_0" -> 20.0))
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = ($"n_nationkey" * 43) % 357 - 177
      val lat = ($"n_nationkey" % 35) * 5 - 85
      val pt = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(pt, lit(4326), lit(96974)).as("gm"),
          GeoExprs.st_transform(pt, lit(4326), lit(954008)).as("ge"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"gm"), 3).as("easting_m"),
          round(GeoExprs.st_y($"gm"), 3).as("northing_m"),
          round(GeoExprs.st_x($"ge"), 3).as("easting_e"),
          round(GeoExprs.st_y($"ge"), 3).as("northing_e"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"gm", lit(96974), lit(4326))), 5)
            .as("back_lon_m"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"gm", lit(96974), lit(4326))), 5)
            .as("back_lat_m"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"ge", lit(954008), lit(4326))), 5)
            .as("back_lon_e"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"ge", lit(954008), lit(4326))), 5)
            .as("back_lat_e"))
        .orderBy($"n_nationkey")
    },

    // ---- geostationary satellite view (r17 cont.): the native grid
    // of GOES-R ABI (sweep axis x, GRS80, lon_0 −75) and a Meteosat
    // 0°-style y-sweep row — the CGMS normalized geostationary
    // projection (CF `geostationary`). The oracle replays BOTH sweep
    // variants' forward vector math (geocentric latitude, view vector,
    // scan angles × height) as raw SQL; the inverse legs (view-ray ∩
    // ellipsoid quadratic) round-trip in-engine. Fixture lon/lats stay
    // on each satellite's visible disc.
    "q_geo_transform_geos" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.{Geo, GeoExprs}
      Geo.registerCrs(990075, "geos", Map( // GOES-East ABI fixed grid
        "a" -> 6378137.0, "rf" -> 298.257222101, "h" -> 35786023.0,
        "lon_0" -> -75.0, "sweep_x" -> 1.0))
      Geo.registerCrs(990000, "geos", Map( // Meteosat 0° (y sweep)
        "a" -> 6378137.0, "rf" -> 298.257223563, "h" -> 35785831.0,
        "lon_0" -> 0.0))
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lonG = ($"n_nationkey" % 25) * 5 - 135 // -135..-15 (disc of -75°)
      val latG = ($"n_nationkey" % 27) * 5 - 65  // -65..65
      val lonM = ($"n_nationkey" % 23) * 5 - 55  // -55..55 (disc of 0°)
      val latM = ($"n_nationkey" % 27) * 5 - 65
      val ptG = concat(lit("POINT ("), d(lonG), lit(" "), d(latG), lit(")"))
      val ptM = concat(lit("POINT ("), d(lonM), lit(" "), d(latM), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(ptG, lit(4326), lit(990075)).as("gg"),
          GeoExprs.st_transform(ptM, lit(4326), lit(990000)).as("gm"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"gg"), 3).as("scan_x_goes"),
          round(GeoExprs.st_y($"gg"), 3).as("scan_y_goes"),
          round(GeoExprs.st_x($"gm"), 3).as("scan_x_met"),
          round(GeoExprs.st_y($"gm"), 3).as("scan_y_met"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"gg", lit(990075), lit(4326))), 5)
            .as("back_lon_g"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"gg", lit(990075), lit(4326))), 5)
            .as("back_lat_g"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"gm", lit(990000), lit(4326))), 5)
            .as("back_lon_m"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"gm", lit(990000), lit(4326))), 5)
            .as("back_lat_m"))
        .orderBy($"n_nationkey")
    },

    // ---- geographic↔geographic datum shift (r17): EPSG:4277-style
    // OSGB36 GEOGRAPHIC target registered as a `longlat` row with the
    // real towgs84 parameters — the legacy-datum lon/lat column case.
    // The oracle replays the full pipeline (geodetic → geocentric →
    // exact-inverse Helmert → 8 unrolled latitude iterations on Airy
    // 1830 → degrees) with NO projection leg; the engine's inverse
    // (Airy → WGS84) round-trips onto the fixtures.
    "q_geo_transform_longlat" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.{Geo, GeoExprs}
      Geo.registerCrs(924277, "longlat", Map(
        "a" -> 6377563.396, "rf" -> 299.3249646,
        "dx" -> 446.448, "dy" -> -125.157, "dz" -> 542.060,
        "rx" -> 0.1502, "ry" -> 0.2470, "rz" -> 0.8421, "ds" -> -20.4894))
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = -($"n_nationkey" % 8) + 1
      val lat = $"n_nationkey" % 10 + 50
      val pt = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(pt, lit(4326), lit(924277)).as("g"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"g"), 7).as("osgb_lon"),
          round(GeoExprs.st_y($"g"), 7).as("osgb_lat"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"g", lit(924277), lit(4326))), 5)
            .as("back_lon"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"g", lit(924277), lit(4326))), 5)
            .as("back_lat"))
        .orderBy($"n_nationkey")
    },

    // ---- polar stereographic + ellipsoidal Mercator (r17): the three
    // grids a climate lake still needed — EPSG:3413 (NSIDC north,
    // variant B with an OFF-ZERO central meridian), EPSG:3031
    // (Antarctic, south aspect) and EPSG:3395 (World Mercator) — all
    // seed rows of the r16 registry. The oracle replays all three
    // forward series (conformal t, ρ = a·m_c·t/t_c, the south-aspect
    // sign flip, y = −a·ln t) as raw SQL arithmetic including the
    // antimeridian wrap of λ−λ0; the inverse legs (iterative conformal
    // recovery) round-trip through the engine back onto the fixtures.
    "q_geo_transform_polar" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      // lonN spreads -177..179 and INCLUDES points east of +135, whose
      // delta against EPSG:3413's -45° central meridian exceeds 180 —
      // the antimeridian wrap runs in BOTH legs of this gate
      val lonN = ($"n_nationkey" * 47) % 357 - 177
      val latN = $"n_nationkey" % 30 + 55           // 55..79
      val lonS = ($"n_nationkey" * 53) % 357 - 177  // -177..169
      val latS = -($"n_nationkey" % 30) - 55        // -55..-79
      val lonM = ($"n_nationkey" % 18) * 20 - 170   // -170..170
      // latM skips the equator: at lat 0 the two engines' algebraically
      // equal Mercator forms give OPPOSITE-signed ~1e-10 northings and
      // round(,3) splits 0.0 from -0.0
      val latM = ($"n_nationkey" % 25) * 5 - 63     // -63..57, never 0
      val ptN = concat(lit("POINT ("), d(lonN), lit(" "), d(latN), lit(")"))
      val ptS = concat(lit("POINT ("), d(lonS), lit(" "), d(latS), lit(")"))
      val ptM = concat(lit("POINT ("), d(lonM), lit(" "), d(latM), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(ptN, lit(4326), lit(3413)).as("gn"),
          GeoExprs.st_transform(ptS, lit(4326), lit(3031)).as("gs"),
          GeoExprs.st_transform(ptM, lit(4326), lit(3395)).as("gm"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"gn"), 3).as("easting_n"),
          round(GeoExprs.st_y($"gn"), 3).as("northing_n"),
          round(GeoExprs.st_x($"gs"), 3).as("easting_s"),
          round(GeoExprs.st_y($"gs"), 3).as("northing_s"),
          round(GeoExprs.st_x($"gm"), 3).as("easting_m"),
          round(GeoExprs.st_y($"gm"), 3).as("northing_m"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"gn", lit(3413), lit(4326))), 5)
            .as("back_lon_n"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"gn", lit(3413), lit(4326))), 5)
            .as("back_lat_n"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"gs", lit(3031), lit(4326))), 5)
            .as("back_lon_s"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"gs", lit(3031), lit(4326))), 5)
            .as("back_lat_s"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"gm", lit(3395), lit(4326))), 5)
            .as("back_lon_m"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"gm", lit(3395), lit(4326))), 5)
            .as("back_lat_m"))
        .orderBy($"n_nationkey")
    },

    // ---- Lambert-93 (late r15): the LCC-2SP forward (Snyder ch. 15)
    // replayed by the oracle as SQL arithmetic (power/ln/tan); the
    // inverse leg (iterative latitude recovery) round-trips through
    // the engine back onto the fixtures.
    "q_geo_transform_lcc" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = $"n_nationkey" % 7 * 2 - 4
      val lat = $"n_nationkey" % 11 + 41
      val pt = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(pt, lit(4326), lit(2154)).as("m"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"m"), 3).as("easting"),
          round(GeoExprs.st_y($"m"), 3).as("northing"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"m", lit(2154), lit(4326))), 6)
            .as("back_lon"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"m", lit(2154), lit(4326))), 6)
            .as("back_lat"))
        .orderBy($"n_nationkey")
    },

    // ---- ETRS89-LAEA (late r15): the ellipsoidal equal-area forward
    // (Snyder ch. 24) replayed by the oracle as SQL arithmetic; the
    // inverse (iterative authalic recovery) round-trips in-engine.
    "q_geo_transform_laea" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def d(c: org.apache.spark.sql.Column) = c.cast("double").cast("string")
      val lon = $"n_nationkey" % 9 * 5 - 10
      val lat = $"n_nationkey" % 8 * 5 + 35
      val pt = concat(lit("POINT ("), d(lon), lit(" "), d(lat), lit(")"))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          GeoExprs.st_transform(pt, lit(4326), lit(3035)).as("m"))
        .select($"n_nationkey",
          round(GeoExprs.st_x($"m"), 3).as("easting"),
          round(GeoExprs.st_y($"m"), 3).as("northing"),
          round(GeoExprs.st_x(
            GeoExprs.st_transform($"m", lit(3035), lit(4326))), 5)
            .as("back_lon"),
          round(GeoExprs.st_y(
            GeoExprs.st_transform($"m", lit(3035), lit(4326))), 5)
            .as("back_lat"))
        .orderBy($"n_nationkey")
    },

    // ---- st_difference (r15): the Greiner–Hormann difference over
    // parametric fixtures exercising all three crossing shapes — side
    // notch (C-shape, 12s²), interior hole punch (outer+hole, 12s²),
    // and a severing bar (MULTIPOLYGON, 8s²) — plus geometry_type and
    // ring-point counts, every measure a closed form in s.
    "q_geo_difference" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def i(c: org.apache.spark.sql.Column) = c.cast("int").cast("string")
      val sc = $"s"; val t = $"t"
      def rect(x0: org.apache.spark.sql.Column, y0: org.apache.spark.sql.Column,
          x1: org.apache.spark.sql.Column, y1: org.apache.spark.sql.Column) =
        concat(lit("POLYGON (("),
          i(x0 + t), lit(" "), i(y0 + t), lit(", "),
          i(x1 + t), lit(" "), i(y0 + t), lit(", "),
          i(x1 + t), lit(" "), i(y1 + t), lit(", "),
          i(x0 + t), lit(" "), i(y1 + t), lit(", "),
          i(x0 + t), lit(" "), i(y0 + t), lit("))"))
      val sq = rect(lit(0), lit(0), sc * 4, sc * 4)
      val notched = GeoExprs.st_difference(sq,
        rect(sc * 2, sc, sc * 6, sc * 3))
      val punched = GeoExprs.st_difference(sq,
        rect(sc, sc, sc * 3, sc * 3))
      val severed = GeoExprs.st_difference(
        rect(lit(0), lit(0), sc * 6, sc * 2),
        rect(sc * 2, -sc, sc * 4, sc * 3))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          ($"n_nationkey" % 3 + 1).cast("int").as("s"),
          $"n_nationkey".cast("int").as("t"))
        .select($"n_nationkey",
          round(GeoExprs.st_area(notched), 6).as("notch_area"),
          GeoExprs.st_npoints(notched).cast(LongType).as("notch_np"),
          round(GeoExprs.st_area(punched), 6).as("punch_area"),
          GeoExprs.st_geometry_type(punched).as("punch_type"),
          GeoExprs.st_npoints(punched).cast(LongType).as("punch_np"),
          round(GeoExprs.st_area(severed), 6).as("sever_area"),
          GeoExprs.st_geometry_type(severed).as("sever_type"))
        .orderBy($"n_nationkey")
    },

    // ---- negative-radius buffer = EROSION (r15): a rectangle erodes
    // to the inner rectangle (area (24s−4s)(10s−4s) = 120s²); a
    // dumbbell — the rectangle with a full-height width-2s slit —
    // SEVERS into two exact 7s×6s rectangles (the slit-bottom reflex
    // arcs live in the collapsed waist loop the extraction drops, so
    // every surviving coordinate is an integer and every measure a
    // closed form); over-erosion vanishes to POLYGON EMPTY. All three
    // legs parametrized on s = n%3+1 and translated by t = n.
    "q_geo_buffer_neg" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def i(c: org.apache.spark.sql.Column) = c.cast("int").cast("string")
      val sc = $"s"; val t = $"t"
      def xy(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        concat(i(x + t), lit(" "), i(y + t))
      val rect = concat(lit("POLYGON (("),
        xy(lit(0), lit(0)), lit(", "), xy(sc * 24, lit(0)), lit(", "),
        xy(sc * 24, sc * 10), lit(", "), xy(lit(0), sc * 10), lit(", "),
        xy(lit(0), lit(0)), lit("))"))
      val dumbbell = concat(lit("POLYGON (("),
        xy(lit(0), lit(0)), lit(", "), xy(sc * 24, lit(0)), lit(", "),
        xy(sc * 24, sc * 10), lit(", "), xy(sc * 13, sc * 10), lit(", "),
        xy(sc * 13, sc * 2), lit(", "), xy(sc * 11, sc * 2), lit(", "),
        xy(sc * 11, sc * 10), lit(", "), xy(lit(0), sc * 10), lit(", "),
        xy(lit(0), lit(0)), lit("))"))
      val erodedRect = GeoExprs.st_buffer(rect, -(sc * 2), lit(8))
      val severed = GeoExprs.st_buffer(dumbbell, -(sc * 2), lit(8))
      val vanished = GeoExprs.st_buffer(rect, -(sc * 6), lit(8))
      // washer (late r15 — holes supported): [0,40s]² with hole
      // [16s,24s]², erode 4s → outer [4s,36s]² minus the dilated hole
      // (8s)² + 4·8s·4s + octagon 2√2(4s)² → area s²(832 − 32√2)
      val washer = concat(lit("POLYGON (("),
        xy(lit(0), lit(0)), lit(", "), xy(sc * 40, lit(0)), lit(", "),
        xy(sc * 40, sc * 40), lit(", "), xy(lit(0), sc * 40), lit(", "),
        xy(lit(0), lit(0)), lit("), ("),
        xy(sc * 16, sc * 16), lit(", "), xy(sc * 24, sc * 16), lit(", "),
        xy(sc * 24, sc * 24), lit(", "), xy(sc * 16, sc * 24), lit(", "),
        xy(sc * 16, sc * 16), lit("))"))
      val washed = GeoExprs.st_buffer(washer, -(sc * 4), lit(8))
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          ($"n_nationkey" % 3 + 1).cast("int").as("s"),
          $"n_nationkey".cast("int").as("t"))
        .select($"n_nationkey",
          round(GeoExprs.st_area(erodedRect), 6).as("rect_area"),
          GeoExprs.st_geometry_type(severed).as("split_type"),
          round(GeoExprs.st_area(severed), 6).as("split_area"),
          GeoExprs.st_npoints(severed).cast(LongType).as("split_np"),
          round(GeoExprs.st_area(vanished), 6).as("vanished_area"),
          round(GeoExprs.st_area(washed), 6).as("washer_area"),
          GeoExprs.st_npoints(washed).cast(LongType).as("washer_np"))
        .orderBy($"n_nationkey")
    },

    "q_geo_suite" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      // sort FIRST on the narrow key columns, project the geometry
      // after: the range partitioner's sampling pass then reads cheap
      // ints instead of re-evaluating the WKT construction, and each
      // geometry expression runs exactly once per row post-shuffle
      val x = $"x"
      val y = $"y"
      val w = $"w"
      def i(c: org.apache.spark.sql.Column) = c.cast("string")
      val pointWkt = concat(lit("POINT ("), i(x), lit(" "), i(y), lit(")"))
      val rectWkt = concat(lit("POLYGON (("),
        i(x - w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y - w), lit(", "),
        i(x + w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y + w), lit(", "),
        i(x - w), lit(" "), i(y - w), lit("))"))
      val zone = lit("POLYGON ((0 0, 10 0, 10 25, 0 25, 0 0))")
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          round($"l_discount" * 100).cast("int").as("x"),
          $"l_quantity".cast("int").as("y"),
          ($"l_linenumber" % 3 + 1).cast("int").as("w"))
        .orderBy($"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber",
          round(GeoExprs.st_distance(pointWkt, lit("POINT (5 25)")), 6)
            .as("dist_center"),
          GeoExprs.st_area(rectWkt).as("rect_area"),
          GeoExprs.st_intersects(rectWkt, zone).as("hits_zone"),
          GeoExprs.st_contains(zone, pointWkt).as("in_zone"))
    },

    // ---- LINESTRING suite (r14): st_length (the lineal measure),
    // lineal centroid, point→line distance, and the DE-9IM relate
    // predicates st_touches / st_crosses / st_overlaps over parametric
    // line/polygon fixtures. Measures scale with s (exact closed forms
    // — 3-4-5 triangles and perfect squares keep the doubles bit-
    // identical); predicates flip on k, so every CASE arm of the
    // oracle is exercised across rows.
    "q_geo_linestring" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def i(c: org.apache.spark.sql.Column) = c.cast("int").cast("string")
      val sc = $"s"; val k = $"k"
      // L-track along the rect's bottom + right edges
      val track = concat(lit("LINESTRING (0 0, "), i(sc * 2), lit(" 0, "),
        i(sc * 2), lit(" "), i(sc * 2), lit(")"))
      val diag = concat(lit("LINESTRING (0 0, "), i(sc * 3), lit(" "),
        i(sc * 4), lit(")"))
      val rect = concat(lit("POLYGON ((0 0, "), i(sc * 2), lit(" 0, "),
        i(sc * 2), lit(" "), i(sc * 2), lit(", 0 "), i(sc * 2), lit(", 0 0))"))
      val chord = concat(lit("LINESTRING (0 0, "), i(sc * 2), lit(" "),
        i(sc * 2), lit(")"))
      val farPt = concat(lit("POINT ("), i(sc * -3), lit(" "), i(sc * 4), lit(")"))
      // k-keyed probes against FIXED fixtures: k=0 below, k=1 along
      // the bottom edge, k=2 through the interior
      val probe = concat(lit("LINESTRING (8 "), i(k), lit(", 16 "), i(k), lit(")"))
      val box = lit("POLYGON ((10 1, 14 1, 14 3, 10 3, 10 1))")
      val vline = concat(lit("LINESTRING (2 -1, 2 "), i(k), lit(")"))
      val hline = lit("LINESTRING (0 0, 4 0)")
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          ($"n_nationkey" % 4 + 1).cast("int").as("s"),
          ($"n_nationkey" % 3).cast("int").as("k"))
        .select($"n_nationkey",
          GeoExprs.st_length(track).as("len_track"),
          GeoExprs.st_length(diag).as("len_diag"),
          GeoExprs.st_x(GeoExprs.st_centroid(track)).as("cx"),
          GeoExprs.st_y(GeoExprs.st_centroid(track)).as("cy"),
          GeoExprs.st_distance(farPt, track).as("d5"),
          GeoExprs.st_npoints(track).cast(LongType).as("np"),
          GeoExprs.st_touches(probe, box).as("touches_poly"),
          GeoExprs.st_crosses(probe, box).as("crosses_poly"),
          GeoExprs.st_touches(hline, vline).as("touches_line"),
          GeoExprs.st_crosses(hline, vline).as("crosses_line"),
          GeoExprs.st_overlaps(hline, lit("LINESTRING (2 0, 6 0)"))
            .as("overlap_line"),
          GeoExprs.st_contains(rect, track).as("in_rect"),
          GeoExprs.st_contains(track, chord).as("chord"))
        .orderBy($"n_nationkey")
    },

    // ---- st_buffer corridors (r14, closes the last parked geo item):
    // LINESTRING corridors and POLYGON outward expansion via DIRECT
    // OFFSET TRACING (round joins/caps; never a Greiner–Hormann union
    // of per-segment rectangles, so the GH collinear limits don't
    // apply). Caps/joins place vertices ON the radius circle, so every
    // fixture area is rectangles + regular m-gon pieces and every
    // vertex count is affine in m; round(,6) absorbs libm ulps.
    "q_geo_buffer" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def i(c: org.apache.spark.sql.Column) = c.cast("int").cast("string")
      val sc = $"s"
      val m = $"m"
      val capsule = concat(lit("LINESTRING (0 0, "), i(sc * 4), lit(" 0)"))
      val ell = concat(lit("LINESTRING (0 0, "), i(sc * 4), lit(" 0, "),
        i(sc * 4), lit(" "), i(sc * 4), lit(")"))
      val square = concat(lit("POLYGON ((0 0, "), i(sc * 2), lit(" 0, "),
        i(sc * 2), lit(" "), i(sc * 2), lit(", 0 "), i(sc * 2), lit(", 0 0))"))
      val r = sc.cast("double")
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          ($"n_nationkey" % 4 + 1).cast("int").as("s"),
          (($"n_nationkey" % 3 + 1) * 4).cast("int").as("m"))
        .select($"n_nationkey",
          round(GeoExprs.st_area(GeoExprs.st_buffer(capsule, r, m)), 6)
            .as("cap_area"),
          GeoExprs.st_npoints(GeoExprs.st_buffer(capsule, r, m))
            .cast(LongType).as("cap_np"),
          round(GeoExprs.st_area(GeoExprs.st_buffer(ell, r, m)), 6)
            .as("ell_area"),
          GeoExprs.st_npoints(GeoExprs.st_buffer(ell, r, m))
            .cast(LongType).as("ell_np"),
          round(GeoExprs.st_area(GeoExprs.st_buffer(square, r, m)), 6)
            .as("sq_area"),
          GeoExprs.st_npoints(GeoExprs.st_buffer(square, r, m))
            .cast(LongType).as("sq_np"),
          round(GeoExprs.st_area(
            GeoExprs.st_buffer(lit("POINT (3 4)"), r, m)), 6).as("pt_area"))
        .orderBy($"n_nationkey")
    },

    // ---- trajectory construction (r14): st_make_line (ordered
    // points → LINESTRING per group, the Argo points-per-float shape)
    // fed back through st_length / st_npoints. Every segment is a
    // (3, ±4) step, so each length is EXACTLY 5 and the sum is exact
    // in any order; the oracle replays the WKT bytes via string_agg
    // and the measures closed-form.
    "q_geo_trajectory" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      import org.apache.spark.sql.expressions.Window
      val r = row_number().over(
        Window.partitionBy($"g").orderBy($"event_id"))
      val pts = Tables.load(s, dir, "events")
        .select(($"event_id" % 8).as("g"), $"event_id")
        .withColumn("r", r)
        .select($"g", $"r", ($"r" * 3).as("x"), ($"r" % 2 * 4).as("y"))
      pts.groupBy($"g")
        .agg(GeoExprs.st_make_line($"r", $"x", $"y").as("wkt"))
        .select($"g",
          md5(col("wkt").cast("binary")).as("traj_md5"),
          GeoExprs.st_length(col("wkt")).as("dist"),
          GeoExprs.st_npoints(col("wkt")).cast(LongType).as("np"))
        .orderBy($"g")
    },

    // ---- relate aliases + constructors (r14): st_point / st_within /
    // st_disjoint / st_equals / st_geometry_type / st_dimension /
    // st_line_interpolate_point. Fixtures keep every value an exact
    // closed form: the interpolation fraction k/4 of the 4s-long track
    // lands at (k·s, 0) on the first segment; the within/disjoint pair
    // is the complement split 3k ≤ 2s; equality is pinned against a
    // redundant-midpoint-vertex rect (vertex sets differ, geometry
    // doesn't).
    "q_geo_relate2" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      import graft.functions.GeoExprs
      def i(c: org.apache.spark.sql.Column) = c.cast("int").cast("string")
      val sc = $"s"; val k = $"k"
      val rect = concat(lit("POLYGON ((0 0, "), i(sc * 2), lit(" 0, "),
        i(sc * 2), lit(" "), i(sc * 2), lit(", 0 "), i(sc * 2), lit(", 0 0))"))
      val rectRedundant = concat(lit("POLYGON ((0 0, "), i(sc), lit(" 0, "),
        i(sc * 2), lit(" 0, "),
        i(sc * 2), lit(" "), i(sc * 2), lit(", 0 "), i(sc * 2), lit(", 0 0))"))
      val track = concat(lit("LINESTRING (0 0, "), i(sc * 2), lit(" 0, "),
        i(sc * 2), lit(" "), i(sc * 2), lit(")"))
      val pt = GeoExprs.st_point(k * 3, k * 3)
      val mixed = when(k === 0, GeoExprs.st_point(lit(1), lit(1)))
        .when(k === 1, track).otherwise(rect)
      val ip = GeoExprs.st_line_interpolate_point(track,
        k.cast("double") / 4.0)
      Tables.load(s, dir, "nation")
        .select($"n_nationkey",
          ($"n_nationkey" % 4 + 1).cast("int").as("s"),
          ($"n_nationkey" % 3).cast("int").as("k"))
        .select($"n_nationkey",
          GeoExprs.st_within(pt, rect).as("in_rect"),
          GeoExprs.st_disjoint(pt, rect).as("disj"),
          GeoExprs.st_equals(rect, rectRedundant).as("eq_redundant"),
          GeoExprs.st_equals(rect, track).as("eq_mixed"),
          GeoExprs.st_geometry_type(mixed).as("gtype"),
          GeoExprs.st_dimension(mixed).as("dim"),
          GeoExprs.st_x(ip).as("ix"),
          GeoExprs.st_y(ip).as("iy"))
        .orderBy($"n_nationkey")
    },

    // ---- coalesce_label over nullable branches
    "q_coalesce_label" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      Tables.load(s, dir, "orders")
        .select($"o_orderkey",
          expr("""coalesce_label(
                    CASE WHEN o_orderstatus = 'O' THEN o_totalprice END, 'open',
                    CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 'finished',
                    o_totalprice, 'other')""").as("status_label"))
        .orderBy($"o_orderkey")
    },

    // ---- data-driven vocabulary mapping
    "q_map_vocab" -> { (s, dir) =>
      import s.implicits._
      GraftSession.configure(s)
      VocabRegistry.register("return_flags",
        Map("A" -> "accepted", "N" -> "none", "R" -> "returned"))
      Tables.load(s, dir, "lineitem")
        .groupBy(graft.functions.GraftFunctions.map_vocab("return_flags", $"l_returnflag")
          .as("flag_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"flag_label")
    },
  )

  private val summarizeOracle: String = {
    // (name, duckdb expr, spark simpleString type, numeric, orderable)
    val cols = Seq(
      ("l_orderkey", "bigint", true), ("l_partkey", "bigint", true),
      ("l_suppkey", "bigint", true), ("l_linenumber", "int", true),
      ("l_quantity", "double", true), ("l_extendedprice", "double", true),
      ("l_discount", "double", true), ("l_tax", "double", true),
      ("l_returnflag", "string", false), ("l_linestatus", "string", false),
      ("l_shipdate", "timestamp_ntz", false))
    val aggs = "CAST(count(*) AS BIGINT) AS __n" +: cols.zipWithIndex.flatMap {
      case ((c, _, numeric), i) =>
        val avg = if (numeric) s"round(avg(CAST($c AS DOUBLE)), 4)" else "CAST(NULL AS DOUBLE)"
        val std = if (numeric) s"round(stddev(CAST($c AS DOUBLE)), 4)" else "CAST(NULL AS DOUBLE)"
        Seq(
          s"CAST(min($c) AS VARCHAR) AS c${i}_min",
          s"CAST(max($c) AS VARCHAR) AS c${i}_max",
          s"CAST(count(DISTINCT $c) AS BIGINT) AS c${i}_uniq",
          s"$avg AS c${i}_avg", s"$std AS c${i}_std",
          s"CAST(count($c) AS BIGINT) AS c${i}_cnt")
    }
    val branches = cols.zipWithIndex.map { case ((c, t, _), i) =>
      s"""SELECT '$c' AS column_name, '$t' AS column_type,
          c${i}_min AS "min", c${i}_max AS "max", c${i}_uniq AS "distinct",
          c${i}_avg AS "avg", c${i}_std AS "std", c${i}_cnt AS "count",
          round(CASE WHEN __n = 0 THEN 0 ELSE (__n - c${i}_cnt) * 100.0 / __n END, 4) AS null_percentage
          FROM __agg"""
    }
    s"""WITH __agg AS (SELECT ${aggs.mkString(", ")} FROM lineitem)
        SELECT * FROM (${branches.mkString(" UNION ALL ")}) ORDER BY column_name"""
  }

  val oracles: Map[String, String] = Map(
    "q_list_datasets" ->
      """SELECT * FROM (VALUES ('d.arrow', 'arrow'), ('d.bbf', 'bbf'),
           ('d.nc', 'netcdf'), ('d.odv', 'odv')) AS t(name, format)
         ORDER BY name""",
    // the bbf dtype → Spark type lattice, pinned publicly
    "q_describe_format" ->
      """SELECT * FROM (VALUES
           ('c_bool', 'boolean', true), ('c_date', 'date', true),
           ('c_float64', 'double', true), ('c_int32', 'int', true),
           ('c_int64', 'bigint', true), ('c_string', 'string', true),
           ('c_timestamp', 'timestamp_ntz', true))
           AS t(column_name, data_type, nullable)
         ORDER BY column_name""",
    "q_jdbc_federation" ->
      """SELECT station, count(*) AS n,
           round(sum(CAST(temp AS DOUBLE)), 4) AS total_temp
         FROM (VALUES (1,'aa',11.5),(2,'bb',12.5),(3,'aa',13.0),
                      (4,'cc',9.25),(5,'bb',10.75)) AS t(id, station, temp)
         WHERE temp > 10 GROUP BY station ORDER BY station""",
    "q_ddl_lifecycle" ->
      """SELECT o_orderkey, o_custkey,
           CASE WHEN o_custkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
           o_totalprice
         FROM orders
         WHERE o_orderkey % 3 IN (0, 1) AND NOT (o_totalprice < 50000)
         ORDER BY o_orderkey""",
    // r17 bind parameters: the SAME statement with the bound values
    // inlined as constants — including the literal '$1' that must
    // survive as text (lit_markers pins non-substitution in quotes)
    "q_bind_params" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
         count(*) AS n,
         CAST(sum(CASE WHEN '$1' = '30' THEN 1 ELSE 0 END) AS BIGINT)
           AS lit_markers
         FROM lineitem
         WHERE l_quantity <= 30 AND l_quantity >= 30 - 25
           AND l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_domain_funcs" ->
      """SELECT l_orderkey, l_linenumber,
           round(((((-1.82e-15 * p + 2.279e-10) * p - 2.2512e-5) * p + 9.72659) * p) /
             ((9.780318 * (1.0 + (5.2788e-3 + 2.36e-5 * s2) * s2)) + 1.092e-6 * p), 6) AS depth,
           chr(CAST(65 + CAST(l_quantity AS BIGINT) % 26 AS INT)) AS ch
         FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                 l_extendedprice / 10.0 AS p,
                 sin(radians(l_quantity)) * sin(radians(l_quantity)) AS s2
               FROM lineitem)
         ORDER BY l_orderkey, l_linenumber""",
    "q_stats_pruned_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders WHERE o_totalprice > 400000.0
         ORDER BY o_orderkey""",
    // spatial pruning: rows must be IDENTICAL to the unpruned scan
    // (recomputed from the source table); 1-of-4 files scanned pinned
    "q_geo_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber,
           round((l_orderkey % 4) * 90 - 180 + l_discount * 100 * 0.8, 6) AS lon,
           CAST(l_quantity AS DOUBLE) AS lat,
           CAST(1 AS BIGINT) AS files_scanned,
           CAST(4 AS BIGINT) AS files_total
         FROM lineitem WHERE l_orderkey % 4 = 2
         ORDER BY l_orderkey, l_linenumber""",
    "q_geo_dsl_bbox" ->
      """SELECT l_orderkey, l_linenumber,
           round((l_orderkey % 4) * 90 - 180 + l_discount * 100 * 0.8, 6) AS lon,
           CAST(l_quantity AS DOUBLE) AS lat
         FROM lineitem WHERE l_orderkey % 4 = 2
         ORDER BY l_orderkey, l_linenumber""",
    "q_crawler_discovery" ->
      """SELECT et, n, total FROM (
           SELECT 'click' AS et, count(*) AS n, round(sum(value), 4) AS total
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT 'view' AS et, count(*) AS n, round(sum(value), 4) AS total
           FROM events WHERE event_type = 'view')
         ORDER BY et""",
    "q_alter_table" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
           CASE WHEN o_totalprice >= 150000 THEN 'high' ELSE 'low' END AS band
         FROM orders WHERE o_orderkey % 5 = 0
         ORDER BY o_orderkey""",
    "q_partitioned_bucketed_ddl" ->
      """SELECT o_orderpriority, c_mktsegment, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice >= 50000
           AND o_orderpriority IN ('1-URGENT', '2-HIGH')
         GROUP BY o_orderpriority, c_mktsegment
         ORDER BY o_orderpriority, c_mktsegment""",
    "q_time_travel" ->
      """WITH v1 AS (SELECT o_orderkey, o_custkey, o_totalprice
                     FROM orders WHERE o_orderkey % 4 = 0),
           v2 AS (SELECT o_orderkey, o_custkey, o_totalprice
                  FROM orders WHERE o_orderkey % 4 IN (0, 1)),
           v3 AS (SELECT * FROM v2 WHERE NOT (o_totalprice < 100000))
         SELECT * FROM (
           SELECT *, 1 AS v FROM v1
           UNION ALL SELECT *, 2 AS v FROM v2
           UNION ALL SELECT *, 3 AS v FROM v3
           UNION ALL SELECT *, 4 AS v FROM v1)
         ORDER BY v, o_orderkey""",
    "q_view_mv_lifecycle" ->
      """WITH agg AS (SELECT o_custkey, count(*) AS n,
                        round(sum(o_totalprice), 2) AS total
                      FROM orders WHERE o_orderstatus IN ('F', 'O')
                      GROUP BY o_custkey),
           stale AS (SELECT count(*) AS stale_rows FROM
                       (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'))
         SELECT u.*, stale.stale_rows FROM (
           SELECT 'view' AS src, * FROM agg
           UNION ALL
           SELECT 'mv' AS src, * FROM agg) u, stale
         ORDER BY src, o_custkey""",
    "q_dsl_pipeline" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45 AND l_extendedprice < 60000
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 200 OFFSET 10""",
    "q_create_index" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
         ORDER BY o_orderkey""",
    "q_attach_catalog" ->
      """SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_optimize_table" ->
      """WITH t AS (
           SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_orderkey + 10000000, l_partkey, l_quantity, l_extendedprice
           FROM lineitem WHERE l_linenumber = 1)
         SELECT l_partkey, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
         FROM t WHERE l_orderkey < 1000000
         GROUP BY l_partkey ORDER BY l_partkey""",
    "q_attach_remote" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_totalprice > 50000.0
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_attach_remote_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 50000.0
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_extension_preset" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_linestatus FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity BETWEEN 30 AND 50
           AND l_linestatus IN ('F', 'O')
         ORDER BY l_orderkey, l_linenumber""",
    "q_rbac_read" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_dsl_named_table" ->
      """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
         WHERE n_regionkey <= 2 ORDER BY n_name""",
    "q_dsl_distinct_on" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1993-01-01 00:00:00'
             AND o_orderdate <= TIMESTAMP '1997-12-31 23:59:59')
         WHERE rn = 1 ORDER BY o_custkey""",
    "q_summarize_lineitem" -> summarizeOracle,
    "q_union_by_name" ->
      """SELECT k, line, qty, price FROM (
           SELECT l_orderkey AS k, l_linenumber AS line, l_quantity AS qty,
                  CAST(NULL AS DOUBLE) AS price FROM lineitem
           UNION ALL
           SELECT o_orderkey AS k, CAST(NULL AS INTEGER) AS line,
                  CAST(NULL AS DOUBLE) AS qty, o_totalprice AS price FROM orders)
         ORDER BY k ASC, line ASC NULLS FIRST, price ASC NULLS FIRST""",
    "q_geo_within" ->
      """SELECT l_returnflag, count(*) AS n_inside FROM lineitem
         WHERE l_discount * 100 >= 0 AND l_discount * 100 <= 10
           AND l_quantity >= 0 AND l_quantity <= 5 * (l_discount * 100)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    // point/rect geometry semantics as raw arithmetic: Euclidean
    // distance (sqrt over exact-integer squares — correctly rounded on
    // both engines), box area, interval-overlap intersection
    // (boundary touch counts), boundary-inclusive containment
    "q_geo_suite2" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(x AS DOUBLE) AS px, CAST(y AS DOUBLE) AS py,
           CAST(NULL AS DOUBLE) AS rect_x_is_null,
           5 AS np,
           round(CAST(8 * w AS DOUBLE), 6) AS perim,
           'POINT (' || x || ' ' || y || ')' AS centroid
         FROM (SELECT l_orderkey, l_linenumber,
                 CAST(round(l_discount * 100) AS INT) AS x,
                 CAST(l_quantity AS INT) AS y,
                 CAST(l_linenumber % 3 + 1 AS INT) AS w
               FROM lineitem) t
         ORDER BY l_orderkey, l_linenumber""",
    // dwithin replays the exact sqrt comparison; envelope strings
    // rebuild from the int corners; buffer area/perimeter replay the
    // closed forms (n/2)·sin(2π/n)·r² and 2n·r·sin(π/n) as Scala-
    // computed double literals through the same round(,6)
    "q_geo_suite3" -> {
      val areaC = 8.0 * math.sin(math.Pi / 8)    // n=16: (n/2)·sin(2π/n)
      val perimC = 32.0 * math.sin(math.Pi / 16) // n=16: 2n·sin(π/n)
      s"""SELECT l_orderkey, l_linenumber,
           (sqrt(CAST((x - 5) * (x - 5) + (y - 25) * (y - 25) AS DOUBLE)) <= 10.0)
             AS near_center,
           'POLYGON ((' || (x-w) || ' ' || (y-w) || ', ' || (x+w) || ' ' || (y-w)
             || ', ' || (x+w) || ' ' || (y+w) || ', ' || (x-w) || ' ' || (y+w)
             || ', ' || (x-w) || ' ' || (y-w) || '))' AS env,
           'POINT (' || x || ' ' || y || ')' AS env_pt,
           17 AS buf_np,
           round(CAST($areaC AS DOUBLE) * w * w, 6) AS buf_area,
           round(CAST($perimC AS DOUBLE) * w, 6) AS buf_perim
         FROM (SELECT l_orderkey, l_linenumber,
                 CAST(round(l_discount * 100) AS INT) AS x,
                 CAST(l_quantity AS INT) AS y,
                 CAST(l_linenumber % 3 + 1 AS INT) AS w
               FROM lineitem) t
         ORDER BY l_orderkey, l_linenumber"""
    },
    // axis-aligned rect ∩ rect closed form: overlap = clamp(min highs −
    // max lows) per axis, product — exact integer arithmetic
    "q_geo_intersect" ->
      """SELECT l_orderkey, l_linenumber,
           round(CAST(
             GREATEST(0, LEAST(x + w, 10) - GREATEST(x - w, 0)) *
             GREATEST(0, LEAST(y + w, 25) - GREATEST(y - w, 0)) AS DOUBLE), 6)
             AS zone_overlap
         FROM (SELECT l_orderkey, l_linenumber,
                 CAST(round(l_discount * 100) AS INT) AS x,
                 CAST(l_quantity AS INT) AS y,
                 CAST(l_linenumber % 3 + 1 AS INT) AS w
               FROM lineitem) t
         ORDER BY l_orderkey, l_linenumber""",
    // boolean closed forms: square × diamond overhang-cut algebra,
    // scaled-U × slab component counting
    "q_geo_boolean" ->
      """SELECT n_nationkey,
           round(CAST(2 * (a + 1) * (a + 1) - 4 AS DOUBLE), 6) AS ia,
           round(CAST(4 * a * a + 4 AS DOUBLE), 6) AS ua,
           round(CAST(sc * sc AS DOUBLE), 6) AS cia,
           round(CAST(8.5 * sc * sc AS DOUBLE), 6) AS uua,
           CAST(10 AS BIGINT) AS ix_npoints,
           CAST(2 AS BIGINT) AS ix_parts
         FROM (SELECT n_nationkey,
                 CAST(n_nationkey % 4 + 2 AS INT) AS a,
                 CAST(n_nationkey % 3 + 1 AS INT) AS sc
               FROM nation) t
         ORDER BY n_nationkey""",
    // hull = the U's enclosing square (WKT byte-compared, closed-form
    // area/npoints); simplify keeps the scale-invariant corner set
    "q_geo_suite4" ->
      """SELECT n_nationkey,
           'POLYGON ((' || t || ' ' || t || ', '
             || (3 * sc + t) || ' ' || t || ', '
             || (3 * sc + t) || ' ' || (3 * sc + t) || ', '
             || t || ' ' || (3 * sc + t) || ', '
             || t || ' ' || t || '))' AS hull_wkt,
           round(CAST(9 * sc * sc AS DOUBLE), 6) AS hull_area,
           CAST(5 AS BIGINT) AS hull_np,
           CAST(8 AS BIGINT) AS simp_np,
           round(CAST(9.5 * sc * sc AS DOUBLE), 6) AS simp_area
         FROM (SELECT n_nationkey,
                 CAST(n_nationkey % 3 + 1 AS INT) AS sc,
                 CAST(n_nationkey AS INT) AS t
               FROM nation) q
         ORDER BY n_nationkey""",
    // the oracle replays the projection's published definition as
    // arithmetic; the inverse leg must land back on the integer-degree
    // fixtures, and the square's Mercator area is R·Δλ·Δy exactly
    "q_geo_transform" ->
      """SELECT n_nationkey,
           round(6378137 * radians(lon), 3) + 0.0 AS mx,
           round(6378137 * ln(tan(pi()/4 + radians(lat)/2)), 3) + 0.0 AS my,
           round(lon, 6) + 0.0 AS back_lon,
           round(lat, 6) + 0.0 AS back_lat,
           round(6378137 * radians(CAST(1 AS DOUBLE))
             * 6378137 * (ln(tan(pi()/4 + radians(lat + 1)/2))
                          - ln(tan(pi()/4 + radians(lat)/2))), 0) + 0.0
             AS sq_area_m2
         FROM (SELECT n_nationkey,
                 CAST(n_nationkey % 36 * 10 - 175 AS DOUBLE) AS lon,
                 CAST(n_nationkey % 17 * 10 - 80 AS DOUBLE) AS lat
               FROM nation) t
         ORDER BY n_nationkey""",
    // the Snyder transverse-Mercator forward series replayed as SQL
    // arithmetic; the inverse leg lands back on the integer fixtures
    "q_geo_transform_utm" ->
      """WITH src AS (SELECT n_nationkey,
             CAST(n_nationkey % 5 * 3 + 9 AS DOUBLE) AS lon,
             CAST(n_nationkey % 13 * 10 - 60 AS DOUBLE) AS lat,
             CAST(-(n_nationkey % 8 * 10 + 5) AS DOUBLE) AS lat_s
           FROM nation),
         cst AS (SELECT *,
             (1.0/298.257223563) * (2 - 1.0/298.257223563) AS e2,
             radians(15.0) AS lam0
           FROM src),
         fwd AS (SELECT n_nationkey, lon, lat, lat_s, e2, lam0,
             e2/(1-e2) AS ep2, radians(lat) AS phi, radians(lat_s) AS phi_s
           FROM cst),
         leg AS (
           SELECT n_nationkey, lon,
             -- north leg
             6378137.0/sqrt(1-e2*sin(phi)*sin(phi)) AS nn,
             tan(phi)*tan(phi) AS t,
             ep2*cos(phi)*cos(phi) AS c,
             (radians(lon)-lam0)*cos(phi) AS aa,
             6378137.0*((1-e2/4-3*e2*e2/64-5*e2*e2*e2/256)*phi
               - (3*e2/8+3*e2*e2/32+45*e2*e2*e2/1024)*sin(2*phi)
               + (15*e2*e2/256+45*e2*e2*e2/1024)*sin(4*phi)
               - (35*e2*e2*e2/3072)*sin(6*phi)) AS m,
             tan(phi) AS tanp, ep2,
             -- south leg
             6378137.0/sqrt(1-e2*sin(phi_s)*sin(phi_s)) AS nn_s,
             tan(phi_s)*tan(phi_s) AS t_s,
             ep2*cos(phi_s)*cos(phi_s) AS c_s,
             (radians(lon)-lam0)*cos(phi_s) AS aa_s,
             6378137.0*((1-e2/4-3*e2*e2/64-5*e2*e2*e2/256)*phi_s
               - (3*e2/8+3*e2*e2/32+45*e2*e2*e2/1024)*sin(2*phi_s)
               + (15*e2*e2/256+45*e2*e2*e2/1024)*sin(4*phi_s)
               - (35*e2*e2*e2/3072)*sin(6*phi_s)) AS m_s,
             tan(phi_s) AS tanp_s,
             lat, lat_s
           FROM fwd)
         SELECT n_nationkey,
           round(0.9996*nn*(aa + (1-t+c)*aa*aa*aa/6
             + (5-18*t+t*t+72*c-58*ep2)*aa*aa*aa*aa*aa/120) + 500000.0, 3)
             AS easting,
           round(0.9996*(m + nn*tanp*(aa*aa/2
             + (5-t+9*c+4*c*c)*aa*aa*aa*aa/24
             + (61-58*t+t*t+600*c-330*ep2)*aa*aa*aa*aa*aa*aa/720)), 3)
             AS northing,
           round(0.9996*(m_s + nn_s*tanp_s*(aa_s*aa_s/2
             + (5-t_s+9*c_s+4*c_s*c_s)*aa_s*aa_s*aa_s*aa_s/24
             + (61-58*t_s+t_s*t_s+600*c_s-330*ep2)
               *aa_s*aa_s*aa_s*aa_s*aa_s*aa_s/720)) + 10000000.0, 3)
             AS northing_s,
           round(lon, 5) AS back_lon,
           round(lat, 5) AS back_lat
         FROM leg
         ORDER BY n_nationkey""",
    // r16 datum pipeline: WGS84 geodetic → geocentric → exact-inverse
    // Helmert (towgs84) → 8 unrolled geodetic-latitude iterations on
    // Airy 1830 → the TM series, all as SQL arithmetic; inverse leg
    // round-trips through the engine
    "q_geo_transform_datum" ->
      raw"""WITH src AS (SELECT n_nationkey,
             CAST(-(n_nationkey % 8) + 1 AS DOUBLE) AS lon,
             CAST(n_nationkey % 10 + 50 AS DOUBLE) AS lat FROM nation),
         k AS (SELECT 6378137.0 AS aw,
             (1.0/298.257223563)*(2-1.0/298.257223563) AS e2w,
             6377563.396 AS aa2,
             (1.0/299.3249646)*(2-1.0/299.3249646) AS e2a,
             1.0 + (-20.4894)*1e-6 AS hs,
             radians(0.1502/3600.0) AS hrx, radians(0.2470/3600.0) AS hry,
             radians(0.8421/3600.0) AS hrz,
             radians(-2.0) AS lam0, 0.9996012717 AS k0),
         k2 AS (SELECT *, e2a/(1-e2a) AS ep2a,
             1 + hrx*hrx + hry*hry + hrz*hrz AS hdet,
             aa2*((1-e2a/4-3*e2a*e2a/64-5*e2a*e2a*e2a/256)*radians(49.0)
               - (3*e2a/8+3*e2a*e2a/32+45*e2a*e2a*e2a/1024)*sin(2*radians(49.0))
               + (15*e2a*e2a/256+45*e2a*e2a*e2a/1024)*sin(4*radians(49.0))
               - (35*e2a*e2a*e2a/3072)*sin(6*radians(49.0))) AS m0
           FROM k),
         g AS (SELECT s.n_nationkey, s.lon, s.lat, k2.*,
             radians(s.lat) AS phi, radians(s.lon) AS lam FROM src s, k2),
         xyz AS (SELECT *,
             (aw/sqrt(1-e2w*sin(phi)*sin(phi)))*cos(phi)*cos(lam) AS gx,
             (aw/sqrt(1-e2w*sin(phi)*sin(phi)))*cos(phi)*sin(lam) AS gy,
             (aw/sqrt(1-e2w*sin(phi)*sin(phi)))*(1-e2w)*sin(phi) AS gz
           FROM g),
         hel AS (SELECT *, (gx-446.448)/hs AS px, (gy-(-125.157))/hs AS py,
             (gz-542.060)/hs AS pz FROM xyz),
         loc AS (SELECT *,
             ((1+hrx*hrx)*px + (hrz+hrx*hry)*py + (hrx*hrz-hry)*pz)/hdet AS lx,
             ((hrx*hry-hrz)*px + (1+hry*hry)*py + (hrx+hry*hrz)*pz)/hdet AS ly,
             ((hry+hrx*hrz)*px + (hry*hrz-hrx)*py + (1+hrz*hrz)*pz)/hdet AS lz
           FROM hel),
         i0 AS (SELECT *, sqrt(lx*lx+ly*ly) AS pp,
             atan2(lz, sqrt(lx*lx+ly*ly)*(1-e2a)) AS f FROM loc),
         ${(1 to 8).map(i =>
            s"""i$i AS (SELECT * REPLACE (atan2(lz +
               e2a*(aa2/sqrt(1-e2a*sin(f)*sin(f)))*sin(f), pp) AS f)
               FROM i${i - 1})""").mkString(", ")},
         tm AS (SELECT n_nationkey, lon, lat, ep2a, k0, m0, lam0, aa2, e2a,
             radians(degrees(f)) AS phia,
             radians(degrees(atan2(ly, lx))) AS lama FROM i8),
         leg AS (SELECT n_nationkey, lon, lat, k0, m0, ep2a,
             aa2/sqrt(1-e2a*sin(phia)*sin(phia)) AS nn,
             tan(phia)*tan(phia) AS t,
             ep2a*cos(phia)*cos(phia) AS c,
             (lama - lam0)*cos(phia) AS aa,
             aa2*((1-e2a/4-3*e2a*e2a/64-5*e2a*e2a*e2a/256)*phia
               - (3*e2a/8+3*e2a*e2a/32+45*e2a*e2a*e2a/1024)*sin(2*phia)
               + (15*e2a*e2a/256+45*e2a*e2a*e2a/1024)*sin(4*phia)
               - (35*e2a*e2a*e2a/3072)*sin(6*phia)) AS m,
             tan(phia) AS tanp FROM tm)
         SELECT n_nationkey,
           round(k0*nn*(aa + (1-t+c)*aa*aa*aa/6
             + (5-18*t+t*t+72*c-58*ep2a)*aa*aa*aa*aa*aa/120) + 400000.0, 3)
             AS easting,
           round(k0*(m - m0 + nn*tanp*(aa*aa/2
             + (5-t+9*c+4*c*c)*aa*aa*aa*aa/24
             + (61-58*t+t*t+600*c-330*ep2a)*aa*aa*aa*aa*aa*aa/720))
             + (-100000.0), 3) AS northing,
           round(lon, 5) AS back_lon,
           round(lat, 5) AS back_lat
         FROM leg ORDER BY n_nationkey""",
    // r16 parameter-row registry: the OSGB36 tmerc forward (M(lat0)
    // offset, negative false northing) and the CONUS Albers forward
    // (authalic q, Snyder 14-1..14-4) as raw SQL arithmetic; inverse
    // legs round-trip through the engine back onto the fixture points
    "q_geo_transform_custom" ->
      """WITH src AS (SELECT n_nationkey,
             CAST(n_nationkey % 7 - 5 AS DOUBLE) AS lon_gb,
             CAST(n_nationkey % 10 + 50 AS DOUBLE) AS lat_gb,
             CAST(-(n_nationkey % 15 + 89) AS DOUBLE) AS lon_us,
             CAST(n_nationkey % 20 + 25 AS DOUBLE) AS lat_us
           FROM nation),
         gbc AS (SELECT 6377563.396 AS a,
             (1.0/299.3249646) * (2 - 1.0/299.3249646) AS e2,
             radians(-2.0) AS lam0, 0.9996012717 AS k0),
         gbc2 AS (SELECT *, e2/(1-e2) AS ep2,
             a*((1-e2/4-3*e2*e2/64-5*e2*e2*e2/256)*radians(49.0)
               - (3*e2/8+3*e2*e2/32+45*e2*e2*e2/1024)*sin(2*radians(49.0))
               + (15*e2*e2/256+45*e2*e2*e2/1024)*sin(4*radians(49.0))
               - (35*e2*e2*e2/3072)*sin(6*radians(49.0))) AS m0
           FROM gbc),
         usc AS (SELECT 6378137.0 AS ua,
             (1.0/298.257222101) * (2 - 1.0/298.257222101) AS ue2,
             sqrt((1.0/298.257222101) * (2 - 1.0/298.257222101)) AS ue),
         usc2 AS (SELECT *,
             cos(radians(29.5))/sqrt(1-ue2*sin(radians(29.5))*sin(radians(29.5))) AS m1,
             cos(radians(45.5))/sqrt(1-ue2*sin(radians(45.5))*sin(radians(45.5))) AS m2,
             (1-ue2)*(sin(radians(29.5))/(1-ue2*sin(radians(29.5))*sin(radians(29.5)))
               - (1/(2*ue))*ln((1-ue*sin(radians(29.5)))/(1+ue*sin(radians(29.5))))) AS q1,
             (1-ue2)*(sin(radians(45.5))/(1-ue2*sin(radians(45.5))*sin(radians(45.5)))
               - (1/(2*ue))*ln((1-ue*sin(radians(45.5)))/(1+ue*sin(radians(45.5))))) AS q2,
             (1-ue2)*(sin(radians(23.0))/(1-ue2*sin(radians(23.0))*sin(radians(23.0)))
               - (1/(2*ue))*ln((1-ue*sin(radians(23.0)))/(1+ue*sin(radians(23.0))))) AS q0
           FROM usc),
         usc3 AS (SELECT *, (m1*m1 - m2*m2)/(q2 - q1) AS nc FROM usc2),
         usc4 AS (SELECT *, m1*m1 + nc*q1 AS bigc FROM usc3),
         usc5 AS (SELECT *, ua*sqrt(bigc - nc*q0)/nc AS rho0 FROM usc4),
         leg AS (SELECT s.n_nationkey, s.lon_gb, s.lat_gb, s.lon_us, s.lat_us,
             g.e2, g.ep2, g.k0, g.m0,
             radians(s.lat_gb) AS phi,
             g.a/sqrt(1-g.e2*sin(radians(s.lat_gb))*sin(radians(s.lat_gb))) AS nn,
             tan(radians(s.lat_gb))*tan(radians(s.lat_gb)) AS t,
             g.ep2*cos(radians(s.lat_gb))*cos(radians(s.lat_gb)) AS c,
             (radians(s.lon_gb)-g.lam0)*cos(radians(s.lat_gb)) AS aa,
             g.a*((1-g.e2/4-3*g.e2*g.e2/64-5*g.e2*g.e2*g.e2/256)*radians(s.lat_gb)
               - (3*g.e2/8+3*g.e2*g.e2/32+45*g.e2*g.e2*g.e2/1024)*sin(2*radians(s.lat_gb))
               + (15*g.e2*g.e2/256+45*g.e2*g.e2*g.e2/1024)*sin(4*radians(s.lat_gb))
               - (35*g.e2*g.e2*g.e2/3072)*sin(6*radians(s.lat_gb))) AS m,
             tan(radians(s.lat_gb)) AS tanp,
             u.ua, u.nc, u.bigc, u.rho0,
             u.ua*sqrt(u.bigc - u.nc*((1-u.ue2)*(sin(radians(s.lat_us))
                 /(1-u.ue2*sin(radians(s.lat_us))*sin(radians(s.lat_us)))
               - (1/(2*u.ue))*ln((1-u.ue*sin(radians(s.lat_us)))
                                 /(1+u.ue*sin(radians(s.lat_us)))))))/u.nc AS rho,
             u.nc*(radians(s.lon_us) - radians(-96.0)) AS th
           FROM src s, gbc2 g, usc5 u)
         SELECT n_nationkey,
           round(k0*nn*(aa + (1-t+c)*aa*aa*aa/6
             + (5-18*t+t*t+72*c-58*ep2)*aa*aa*aa*aa*aa/120) + 400000.0, 3)
             AS easting_gb,
           round(k0*(m - m0 + nn*tanp*(aa*aa/2
             + (5-t+9*c+4*c*c)*aa*aa*aa*aa/24
             + (61-58*t+t*t+600*c-330*ep2)*aa*aa*aa*aa*aa*aa/720))
             + (-100000.0), 3) AS northing_gb,
           round(rho*sin(th), 3) AS easting_us,
           round(rho0 - rho*cos(th), 3) AS northing_us,
           round(lon_gb, 5) AS back_lon_gb,
           round(lat_gb, 5) AS back_lat_gb,
           round(lon_us, 5) AS back_lon_us,
           round(lat_us, 5) AS back_lat_us
         FROM leg
         ORDER BY n_nationkey""",
    // r17 equidistant cylindrical: x = a·radians(lon) and the Snyder
    // 3-21 meridian-arc series as raw SQL; inverse in-engine
    "q_geo_transform_eqc" ->
      """WITH src AS (SELECT n_nationkey,
             CAST((n_nationkey * 41) % 357 - 177 AS DOUBLE) AS lon,
             CAST(n_nationkey % 35 * 5 - 85 AS DOUBLE) AS lat FROM nation),
         k AS (SELECT 6378137.0 AS a,
             (1.0/298.257223563)*(2-1.0/298.257223563) AS e2)
         SELECT n_nationkey,
           round(a * radians(lon), 3) AS easting,
           round(a*((1-e2/4-3*e2*e2/64-5*e2*e2*e2/256)*radians(lat)
             - (3*e2/8+3*e2*e2/32+45*e2*e2*e2/1024)*sin(2*radians(lat))
             + (15*e2*e2/256+45*e2*e2*e2/1024)*sin(4*radians(lat))
             - (35*e2*e2*e2/3072)*sin(6*radians(lat))), 3) AS northing,
           round(lon, 5) AS back_lon,
           round(lat, 5) AS back_lat
         FROM src, k ORDER BY n_nationkey""",
    // r17 sinusoidal: the spherical (MODIS) and ellipsoidal forwards
    // as raw SQL — x = R·λ·cosφ / a·λ·cosφ/√(1−e²sin²φ), the Snyder
    // 3-21 meridian-arc northing, the antimeridian wrap of λ−20°;
    // inverse legs round-trip in-engine
    "q_geo_transform_sinu" ->
      """WITH src AS (SELECT n_nationkey,
             CAST((n_nationkey * 43) % 357 - 177 AS DOUBLE) AS lon,
             CAST(n_nationkey % 35 * 5 - 85 AS DOUBLE) AS lat FROM nation),
         k AS (SELECT 6371007.181 AS r, 6378137.0 AS a,
             (1.0/298.257223563)*(2-1.0/298.257223563) AS e2),
         leg AS (SELECT s.n_nationkey, s.lon, s.lat, k.r, k.a, k.e2,
             radians(s.lat) AS phi,
             radians(CASE WHEN s.lon - 20.0 < -180.0 THEN s.lon + 340.0
                          ELSE s.lon - 20.0 END) AS dle
           FROM src s, k)
         SELECT n_nationkey,
           round(r * radians(lon) * cos(phi), 3) AS easting_m,
           round(r * phi, 3) AS northing_m,
           round(a * dle * cos(phi) / sqrt(1 - e2*sin(phi)*sin(phi)), 3)
             AS easting_e,
           round(a*((1-e2/4-3*e2*e2/64-5*e2*e2*e2/256)*phi
             - (3*e2/8+3*e2*e2/32+45*e2*e2*e2/1024)*sin(2*phi)
             + (15*e2*e2/256+45*e2*e2*e2/1024)*sin(4*phi)
             - (35*e2*e2*e2/3072)*sin(6*phi)), 3) AS northing_e,
           round(lon, 5) AS back_lon_m, round(lat, 5) AS back_lat_m,
           round(lon, 5) AS back_lon_e, round(lat, 5) AS back_lat_e
         FROM leg ORDER BY n_nationkey""",
    // r17 geostationary: both sweep variants' forward vector math as
    // raw SQL — geocentric latitude atan((b/a)²·tanφ), the normalized
    // view vector, scan angles × satellite height; inverse legs
    // (view-ray ∩ ellipsoid) round-trip in-engine
    "q_geo_transform_geos" ->
      """WITH src AS (SELECT n_nationkey,
             CAST(n_nationkey % 25 * 5 - 135 AS DOUBLE) AS lon_g,
             CAST(n_nationkey % 27 * 5 - 65 AS DOUBLE) AS lat_g,
             CAST(n_nationkey % 23 * 5 - 55 AS DOUBLE) AS lon_m,
             CAST(n_nationkey % 27 * 5 - 65 AS DOUBLE) AS lat_m
           FROM nation),
         k AS (SELECT
             (1-1.0/298.257222101)*(1-1.0/298.257222101) AS rp2g,
             (1-1.0/298.257222101) AS rpg,
             1.0 + 35786023.0/6378137.0 AS rgg, 35786023.0 AS hg,
             (1-1.0/298.257223563)*(1-1.0/298.257223563) AS rp2m,
             (1-1.0/298.257223563) AS rpm,
             1.0 + 35785831.0/6378137.0 AS rgm, 35785831.0 AS hm),
         gc AS (SELECT s.n_nationkey, s.lon_g, s.lat_g, s.lon_m, s.lat_m,
             k.rgg, k.hg, k.rgm, k.hm, k.rp2g, k.rp2m, k.rpg, k.rpm,
             atan(k.rp2g * tan(radians(s.lat_g))) AS pcg,
             radians(s.lon_g + 75.0) AS dlg,
             atan(k.rp2m * tan(radians(s.lat_m))) AS pcm,
             radians(s.lon_m) AS dlm
           FROM src s, k),
         vv AS (SELECT *,
             rpg/sqrt(rp2g*cos(pcg)*cos(pcg) + sin(pcg)*sin(pcg)) AS reg,
             rpm/sqrt(rp2m*cos(pcm)*cos(pcm) + sin(pcm)*sin(pcm)) AS rem
           FROM gc),
         v2 AS (SELECT *,
             reg*cos(pcg)*cos(dlg) AS vxg, reg*cos(pcg)*sin(dlg) AS vyg,
             reg*sin(pcg) AS vzg,
             rem*cos(pcm)*cos(dlm) AS vxm, rem*cos(pcm)*sin(dlm) AS vym,
             rem*sin(pcm) AS vzm
           FROM vv),
         v3 AS (SELECT *, rgg - vxg AS tg, rgm - vxm AS tm FROM v2)
         SELECT n_nationkey,
           round(hg * atan(vyg / sqrt(vzg*vzg + tg*tg)), 3) AS scan_x_goes,
           round(hg * atan(vzg / tg), 3) AS scan_y_goes,
           round(hm * atan(vym / tm), 3) AS scan_x_met,
           round(hm * atan(vzm / sqrt(vym*vym + tm*tm)), 3) AS scan_y_met,
           round(lon_g, 5) AS back_lon_g, round(lat_g, 5) AS back_lat_g,
           round(lon_m, 5) AS back_lon_m, round(lat_m, 5) AS back_lat_m
         FROM v3 ORDER BY n_nationkey""",
    // r17 geographic↔geographic datum shift: the q_geo_transform_datum
    // pipeline truncated before the projection leg — geodetic →
    // geocentric → exact-inverse Helmert → 8 unrolled latitude
    // iterations on Airy 1830 → degrees; inverse round-trips in-engine
    "q_geo_transform_longlat" ->
      raw"""WITH src AS (SELECT n_nationkey,
             CAST(-(n_nationkey % 8) + 1 AS DOUBLE) AS lon,
             CAST(n_nationkey % 10 + 50 AS DOUBLE) AS lat FROM nation),
         k AS (SELECT 6378137.0 AS aw,
             (1.0/298.257223563)*(2-1.0/298.257223563) AS e2w,
             6377563.396 AS aa2,
             (1.0/299.3249646)*(2-1.0/299.3249646) AS e2a,
             1.0 + (-20.4894)*1e-6 AS hs,
             radians(0.1502/3600.0) AS hrx, radians(0.2470/3600.0) AS hry,
             radians(0.8421/3600.0) AS hrz),
         k2 AS (SELECT *, 1 + hrx*hrx + hry*hry + hrz*hrz AS hdet FROM k),
         g AS (SELECT s.n_nationkey, s.lon, s.lat, k2.*,
             radians(s.lat) AS phi, radians(s.lon) AS lam FROM src s, k2),
         xyz AS (SELECT *,
             (aw/sqrt(1-e2w*sin(phi)*sin(phi)))*cos(phi)*cos(lam) AS gx,
             (aw/sqrt(1-e2w*sin(phi)*sin(phi)))*cos(phi)*sin(lam) AS gy,
             (aw/sqrt(1-e2w*sin(phi)*sin(phi)))*(1-e2w)*sin(phi) AS gz
           FROM g),
         hel AS (SELECT *, (gx-446.448)/hs AS px, (gy-(-125.157))/hs AS py,
             (gz-542.060)/hs AS pz FROM xyz),
         loc AS (SELECT *,
             ((1+hrx*hrx)*px + (hrz+hrx*hry)*py + (hrx*hrz-hry)*pz)/hdet AS lx,
             ((hrx*hry-hrz)*px + (1+hry*hry)*py + (hrx+hry*hrz)*pz)/hdet AS ly,
             ((hry+hrx*hrz)*px + (hry*hrz-hrx)*py + (1+hrz*hrz)*pz)/hdet AS lz
           FROM hel),
         i0 AS (SELECT *, sqrt(lx*lx+ly*ly) AS pp,
             atan2(lz, sqrt(lx*lx+ly*ly)*(1-e2a)) AS f FROM loc),
         ${(1 to 8).map(i =>
            s"""i$i AS (SELECT * REPLACE (atan2(lz +
               e2a*(aa2/sqrt(1-e2a*sin(f)*sin(f)))*sin(f), pp) AS f)
               FROM i${i - 1})""").mkString(", ")}
         SELECT n_nationkey,
           round(degrees(atan2(ly, lx)), 7) AS osgb_lon,
           round(degrees(f), 7) AS osgb_lat,
           round(lon, 5) AS back_lon,
           round(lat, 5) AS back_lat
         FROM i8 ORDER BY n_nationkey""",
    // r17 polar/Mercator seed rows: the variant-B polar stereographic
    // forward (conformal t, ρ = a·m_c·t/t_c, south-aspect sign flip,
    // the antimeridian wrap of λ−λ0 against 3413's -45° meridian) and
    // the ellipsoidal-Mercator forward (y = a·ln(tan(π/4+φ/2)·corr))
    // as raw SQL arithmetic; inverse legs round-trip in-engine
    "q_geo_transform_polar" ->
      """WITH src AS (SELECT n_nationkey,
             CAST((n_nationkey * 47) % 357 - 177 AS DOUBLE) AS lon_n,
             CAST(n_nationkey % 30 + 55 AS DOUBLE) AS lat_n,
             CAST((n_nationkey * 53) % 357 - 177 AS DOUBLE) AS lon_s,
             CAST(-(n_nationkey % 30) - 55 AS DOUBLE) AS lat_s,
             CAST(n_nationkey % 18 * 20 - 170 AS DOUBLE) AS lon_m,
             CAST(n_nationkey % 25 * 5 - 63 AS DOUBLE) AS lat_m
           FROM nation),
         k AS (SELECT 6378137.0 AS a,
             (1.0/298.257223563)*(2-1.0/298.257223563) AS e2,
             sqrt((1.0/298.257223563)*(2-1.0/298.257223563)) AS e),
         kn AS (SELECT a, e2, e,
             a * (cos(radians(70.0))
                  /sqrt(1-e2*sin(radians(70.0))*sin(radians(70.0))))
               / (tan(pi()/4 - radians(70.0)/2)
                  /power((1-e*sin(radians(70.0)))/(1+e*sin(radians(70.0))),
                         e/2)) AS rfn,
             a * (cos(radians(71.0))
                  /sqrt(1-e2*sin(radians(71.0))*sin(radians(71.0))))
               / (tan(pi()/4 - radians(71.0)/2)
                  /power((1-e*sin(radians(71.0)))/(1+e*sin(radians(71.0))),
                         e/2)) AS rfs
           FROM k),
         leg AS (SELECT s.n_nationkey, s.lon_n, s.lat_n, s.lon_s, s.lat_s,
             s.lon_m, s.lat_m, k.a, k.e2, k.e, k.rfn, k.rfs,
             radians(CASE WHEN s.lon_n + 45.0 > 180.0
                          THEN s.lon_n + 45.0 - 360.0
                          ELSE s.lon_n + 45.0 END) AS dln,
             tan(pi()/4 - radians(s.lat_n)/2)
               /power((1-k.e*sin(radians(s.lat_n)))
                      /(1+k.e*sin(radians(s.lat_n))), k.e/2) AS tn,
             radians(s.lon_s) AS dls,
             tan(pi()/4 - radians(-s.lat_s)/2)
               /power((1-k.e*sin(radians(-s.lat_s)))
                      /(1+k.e*sin(radians(-s.lat_s))), k.e/2) AS ts2
           FROM src s, kn k)
         SELECT n_nationkey,
           round(rfn * tn * sin(dln), 3) AS easting_n,
           round(-(rfn * tn) * cos(dln), 3) AS northing_n,
           round(rfs * ts2 * sin(dls), 3) AS easting_s,
           round(rfs * ts2 * cos(dls), 3) AS northing_s,
           round(a * radians(lon_m), 3) AS easting_m,
           round(a * ln(tan(pi()/4 + radians(lat_m)/2)
             * power((1-e*sin(radians(lat_m)))/(1+e*sin(radians(lat_m))),
                     e/2)), 3) AS northing_m,
           round(lon_n, 5) AS back_lon_n, round(lat_n, 5) AS back_lat_n,
           round(lon_s, 5) AS back_lon_s, round(lat_s, 5) AS back_lat_s,
           round(lon_m, 5) AS back_lon_m, round(lat_m, 5) AS back_lat_m
         FROM leg ORDER BY n_nationkey""",
    // the LAEA forward (authalic latitude, oblique azimuthal) as SQL
    "q_geo_transform_laea" ->
      """WITH src AS (SELECT n_nationkey,
             CAST(n_nationkey % 9 * 5 - 10 AS DOUBLE) AS lon,
             CAST(n_nationkey % 8 * 5 + 35 AS DOUBLE) AS lat
           FROM nation),
         k0 AS (SELECT 6378137.0 AS a, 1.0/298.257222101 AS f),
         k1 AS (SELECT a, f*(2-f) AS e2, sqrt(f*(2-f)) AS e FROM k0),
         k2 AS (SELECT a, e2, e,
             (1-e2)*(sin(radians(90.0))/(1-e2*sin(radians(90.0))*sin(radians(90.0)))
               - (1/(2*e))*ln((1-e*sin(radians(90.0)))/(1+e*sin(radians(90.0))))) AS qp,
             (1-e2)*(sin(radians(52.0))/(1-e2*sin(radians(52.0))*sin(radians(52.0)))
               - (1/(2*e))*ln((1-e*sin(radians(52.0)))/(1+e*sin(radians(52.0))))) AS q0,
             cos(radians(52.0))/sqrt(1-e2*sin(radians(52.0))*sin(radians(52.0))) AS m1
           FROM k1),
         k3 AS (SELECT a, e2, e, qp, asin(q0/qp) AS beta1,
             a*sqrt(qp/2) AS rq, m1 FROM k2),
         k4 AS (SELECT a, e2, e, qp, beta1, rq,
             a*m1/(rq*cos(beta1)) AS bigd FROM k3),
         leg AS (SELECT s.n_nationkey, s.lon, s.lat, k.beta1, k.rq, k.bigd,
             asin(((1-k.e2)*(sin(radians(s.lat))/(1-k.e2*sin(radians(s.lat))*sin(radians(s.lat)))
               - (1/(2*k.e))*ln((1-k.e*sin(radians(s.lat)))
                                /(1+k.e*sin(radians(s.lat))))))/k.qp) AS beta,
             radians(s.lon) - radians(10.0) AS dl
           FROM src s, k4 k),
         leg2 AS (SELECT n_nationkey, lon, lat, beta1, rq, bigd, beta, dl,
             rq*sqrt(2/(1 + sin(beta1)*sin(beta) + cos(beta1)*cos(beta)*cos(dl))) AS b
           FROM leg)
         SELECT n_nationkey,
           round(4321000.0 + b*bigd*cos(beta)*sin(dl), 3) AS easting,
           round(3210000.0 + (b/bigd)*(cos(beta1)*sin(beta)
             - sin(beta1)*cos(beta)*cos(dl)), 3) AS northing,
           round(lon, 5) AS back_lon,
           round(lat, 5) AS back_lat
         FROM leg2 ORDER BY n_nationkey""",
    // the LCC-2SP forward constants and projection as plain SQL; the
    // inverse leg lands back on the integer-degree fixtures
    "q_geo_transform_lcc" ->
      """WITH src AS (SELECT n_nationkey,
             CAST(n_nationkey % 7 * 2 - 4 AS DOUBLE) AS lon,
             CAST(n_nationkey % 11 + 41 AS DOUBLE) AS lat
           FROM nation),
         k0 AS (SELECT 6378137.0 AS a, 1.0/298.257222101 AS f),
         k1 AS (SELECT a, f, f*(2-f) AS e2, sqrt(f*(2-f)) AS e FROM k0),
         k2 AS (SELECT a, e2, e,
             cos(radians(44.0))/sqrt(1-e2*sin(radians(44.0))*sin(radians(44.0))) AS m1,
             cos(radians(49.0))/sqrt(1-e2*sin(radians(49.0))*sin(radians(49.0))) AS m2,
             tan(pi()/4-radians(44.0)/2)
               /power((1-e*sin(radians(44.0)))/(1+e*sin(radians(44.0))), e/2) AS t1,
             tan(pi()/4-radians(49.0)/2)
               /power((1-e*sin(radians(49.0)))/(1+e*sin(radians(49.0))), e/2) AS t2,
             tan(pi()/4-radians(46.5)/2)
               /power((1-e*sin(radians(46.5)))/(1+e*sin(radians(46.5))), e/2) AS t0
           FROM k1),
         k3 AS (SELECT a, e2, e, (ln(m1)-ln(m2))/(ln(t1)-ln(t2)) AS n, t0, t1, m1
           FROM k2),
         k4 AS (SELECT a, e2, e, n, m1/(n*power(t1, n)) AS bigf, t0 FROM k3),
         k5 AS (SELECT a, e2, e, n, bigf, a*bigf*power(t0, n) AS rho0 FROM k4),
         leg AS (SELECT s.n_nationkey, s.lon, s.lat, k.n, k.rho0,
             k.a*k.bigf*power(
               tan(pi()/4-radians(s.lat)/2)
                 /power((1-k.e*sin(radians(s.lat)))/(1+k.e*sin(radians(s.lat))),
                        k.e/2), k.n) AS rho,
             k.n*(radians(s.lon)-radians(3.0)) AS th
           FROM src s, k5 k)
         SELECT n_nationkey,
           round(700000.0 + rho*sin(th), 3) AS easting,
           round(6600000.0 + rho0 - rho*cos(th), 3) AS northing,
           round(lon, 6) AS back_lon,
           round(lat, 6) AS back_lat
         FROM leg ORDER BY n_nationkey""",
    // difference closed forms: C-shape 12s² (8+1 ring points), punched
    // 12s² POLYGON (5+5 points over two rings), severed 8s² MULTI
    "q_geo_difference" ->
      """SELECT n_nationkey,
           round(CAST(12 * s * s AS DOUBLE), 6) AS notch_area,
           CAST(9 AS BIGINT) AS notch_np,
           round(CAST(12 * s * s AS DOUBLE), 6) AS punch_area,
           'POLYGON' AS punch_type,
           CAST(10 AS BIGINT) AS punch_np,
           round(CAST(8 * s * s AS DOUBLE), 6) AS sever_area,
           'MULTIPOLYGON' AS sever_type
         FROM (SELECT n_nationkey, CAST(n_nationkey % 3 + 1 AS INT) AS s
               FROM nation) q
         ORDER BY n_nationkey""",
    // erosion closed forms: inner rectangle 20s·6s, severed dumbbell
    // 2 × 7s·6s with 5+5 ring points, over-erosion vanishes to 0
    "q_geo_buffer_neg" ->
      """SELECT n_nationkey,
           round(CAST(120 * s * s AS DOUBLE), 6) AS rect_area,
           'MULTIPOLYGON' AS split_type,
           round(CAST(84 * s * s AS DOUBLE), 6) AS split_area,
           CAST(10 AS BIGINT) AS split_np,
           CAST(0 AS DOUBLE) AS vanished_area,
           round(s * s * (832 - 32 * sqrt(2)), 6) AS washer_area,
           CAST(18 AS BIGINT) AS washer_np
         FROM (SELECT n_nationkey, CAST(n_nationkey % 3 + 1 AS INT) AS s
               FROM nation) q
         ORDER BY n_nationkey""",
    "q_geo_extent" ->
      """SELECT l_returnflag,
           'POLYGON ((' || min(x) || ' ' || min(y) || ', ' || max(x) || ' ' || min(y)
             || ', ' || max(x) || ' ' || max(y) || ', ' || min(x) || ' ' || max(y)
             || ', ' || min(x) || ' ' || min(y) || '))' AS extent,
           count(*) AS n
         FROM (SELECT l_returnflag,
                 CAST(round(l_discount * 100) AS INT) AS x,
                 CAST(l_quantity AS INT) AS y
               FROM lineitem) t
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    "q_geo_suite" ->
      """SELECT l_orderkey, l_linenumber,
           round(sqrt(CAST((x - 5) * (x - 5) + (y - 25) * (y - 25) AS DOUBLE)), 6)
             AS dist_center,
           CAST(4 * w * w AS DOUBLE) AS rect_area,
           (x - w <= 10 AND x + w >= 0 AND y - w <= 25 AND y + w >= 0) AS hits_zone,
           (x >= 0 AND x <= 10 AND y >= 0 AND y <= 25) AS in_zone
         FROM (SELECT l_orderkey, l_linenumber,
                 CAST(round(l_discount * 100) AS INT) AS x,
                 CAST(l_quantity AS INT) AS y,
                 CAST(l_linenumber % 3 + 1 AS INT) AS w
               FROM lineitem) t
         ORDER BY l_orderkey, l_linenumber""",
    // the linestring fixtures are built so every measure is an exact
    // closed form (4s, 5s via 3-4-5, 1.5s/0.5s centroid, √(25s²)=5s)
    // and every predicate is a pure function of k — the oracle replays
    // the geometry semantics as arithmetic, no spatial lib involved
    "q_geo_linestring" ->
      """SELECT n_nationkey,
           CAST(4 * s AS DOUBLE) AS len_track,
           CAST(5 * s AS DOUBLE) AS len_diag,
           CAST(1.5 * s AS DOUBLE) AS cx,
           CAST(0.5 * s AS DOUBLE) AS cy,
           CAST(5 * s AS DOUBLE) AS d5,
           CAST(3 AS BIGINT) AS np,
           k = 1 AS touches_poly,
           k = 2 AS crosses_poly,
           k = 0 AS touches_line,
           k > 0 AS crosses_line,
           TRUE AS overlap_line,
           TRUE AS in_rect,
           FALSE AS chord
         FROM (SELECT n_nationkey,
                 CAST(n_nationkey % 4 + 1 AS INT) AS s,
                 CAST(n_nationkey % 3 AS INT) AS k
               FROM nation) t
         ORDER BY n_nationkey""",
    // rectangles + regular m-gon pieces: capsule = 2rL + A_m, the
    // L-path adds the r² reflex trim and a quarter join, the square
    // adds four quarter joins = one full m-gon; vertex counts affine
    // in m (A_m = (m/2)·r²·sin(2π/m) — vertices ON the circle)
    "q_geo_buffer" ->
      """SELECT n_nationkey,
           round(8*s*s + (m/2.0)*s*s*sin(2*pi()/m), 6) AS cap_area,
           CAST(m + 3 AS BIGINT) AS cap_np,
           round(15*s*s + 1.25*(m/2.0)*s*s*sin(2*pi()/m), 6) AS ell_area,
           CAST(5*m/4 + 5 AS BIGINT) AS ell_np,
           round(12*s*s + (m/2.0)*s*s*sin(2*pi()/m), 6) AS sq_area,
           CAST(m + 5 AS BIGINT) AS sq_np,
           round((m/2.0)*s*s*sin(2*pi()/m), 6) AS pt_area
         FROM (SELECT n_nationkey,
                 CAST(n_nationkey % 4 + 1 AS INT) AS s,
                 CAST((n_nationkey % 3 + 1) * 4 AS INT) AS m
               FROM nation) t
         ORDER BY n_nationkey""",
    // WKT bytes replayed via ordered string_agg; 3-4-5 steps make the
    // length the exact closed form 5·(n−1)
    "q_geo_trajectory" ->
      """WITH p AS (SELECT event_id % 8 AS g,
             row_number() OVER (PARTITION BY event_id % 8 ORDER BY event_id) AS r
           FROM events),
         q AS (SELECT g, r, r * 3 AS x, (r % 2) * 4 AS y FROM p),
         t AS (SELECT g,
             'LINESTRING (' ||
               string_agg(CAST(x AS VARCHAR) || ' ' || CAST(y AS VARCHAR),
                 ', ' ORDER BY r) || ')' AS wkt,
             count(*) AS n
           FROM q GROUP BY g)
         SELECT g, md5(wkt) AS traj_md5,
           CAST(5 * (n - 1) AS DOUBLE) AS dist,
           CAST(n AS BIGINT) AS np
         FROM t ORDER BY g""",
    // the relate aliases restated as pure arithmetic over (s, k)
    "q_geo_relate2" ->
      """SELECT n_nationkey,
           3 * k <= 2 * s AS in_rect,
           3 * k > 2 * s AS disj,
           TRUE AS eq_redundant,
           FALSE AS eq_mixed,
           CASE k WHEN 0 THEN 'POINT' WHEN 1 THEN 'LINESTRING'
                  ELSE 'POLYGON' END AS gtype,
           CAST(k AS INTEGER) AS dim,
           CAST(k * s AS DOUBLE) AS ix,
           CAST(0 AS DOUBLE) AS iy
         FROM (SELECT n_nationkey,
                 CAST(n_nationkey % 4 + 1 AS INT) AS s,
                 CAST(n_nationkey % 3 AS INT) AS k
               FROM nation) t
         ORDER BY n_nationkey""",
    "q_coalesce_label" ->
      """SELECT o_orderkey,
         CASE WHEN (CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) IS NOT NULL THEN 'open'
              WHEN (CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) IS NOT NULL THEN 'finished'
              WHEN o_totalprice IS NOT NULL THEN 'other' END AS status_label
         FROM orders ORDER BY o_orderkey""",
    "q_map_vocab" ->
      """SELECT CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'N' THEN 'none'
                WHEN 'R' THEN 'returned' END AS flag_label, count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY flag_label""",
  )
}
