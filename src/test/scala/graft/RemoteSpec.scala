package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.remote.RemoteServer

/** ATTACH over the network wire — a RUNNING RemoteServer mounted via
  * `graft://host:port` (reference: the Flight SQL transport remote
  * tables dial, beacon-server/src/flight_sql/service.rs handshake +
  * beacon-datafusion-ext/src/remote/{connection,executor}.rs):
  * token/basic handshake, grant-filtered listing, filter/column/limit
  * pushdown across the wire, Arrow IPC streaming back, read-only. */
class RemoteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  val sf = "/root/testdata/sf0.001"

  /** a served warehouse: nation+orders external, embeddings external,
    * one managed table, a user granted SELECT on nation+orders only */
  private def servedWarehouse(): (String, RemoteServer) = {
    val wh = java.nio.file.Files.createTempDirectory("graft-remote-wh").toString
    val eng = GraftEngine(spark, wh)
    eng.sql(s"CREATE EXTERNAL TABLE r_nation STORED AS parquet LOCATION '$sf/nation.parquet'")
    eng.sql(s"CREATE EXTERNAL TABLE r_orders STORED AS parquet LOCATION '$sf/orders.parquet'")
    eng.sql(s"CREATE EXTERNAL TABLE r_embeddings STORED AS parquet LOCATION '$sf/embeddings.parquet'")
    eng.sql(s"CREATE EXTERNAL TABLE r_lineitem STORED AS parquet LOCATION '$sf/lineitem.parquet'")
    eng.sql("CREATE TABLE r_managed AS SELECT n_nationkey AS k, n_name AS v FROM r_nation")
    eng.sql("CREATE USER remote_reader WITH PASSWORD 'wire-pw'")
    eng.sql("CREATE ROLE wire_readers")
    eng.sql("GRANT SELECT ON TABLE r_nation TO ROLE wire_readers")
    eng.sql("GRANT SELECT ON TABLE r_orders TO ROLE wire_readers")
    eng.sql("GRANT SELECT ON TABLE r_embeddings TO ROLE wire_readers")
    eng.sql("GRANT SELECT ON TABLE r_managed TO ROLE wire_readers")
    eng.sql("GRANT ROLE wire_readers TO USER remote_reader")
    (wh, new RemoteServer(spark, wh))
  }

  lazy val (wh, server) = servedWarehouse()
  lazy val engine: GraftEngine = {
    val lw = java.nio.file.Files.createTempDirectory("graft-remote-local").toString
    GraftEngine(spark, lw)
  }

  test("basic handshake: listing is grant-filtered; scans stream arrow back") {
    engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS wire " +
      "WITH (username 'remote_reader', password 'wire-pw')")
    val listed = engine.sql("SHOW TABLES IN wire.public").collect()
      .map(_.getString(1)).sorted
    assert(listed.toSeq == Seq("r_embeddings", "r_managed", "r_nation", "r_orders"),
      "listing must be the identity's SELECT grants, nothing more")
    // full scan round-trip
    assert(engine.sql("SELECT count(*) FROM wire.public.r_nation")
      .collect()(0).getLong(0) == 25)
    // managed (versioned) tables serve their current version
    assert(engine.sql("SELECT count(*) FROM wire.public.r_managed")
      .collect()(0).getLong(0) == 25)
    // values survive the wire: compare against the local parquet read
    val viaWire = engine.sql(
      "SELECT n_nationkey, n_name FROM wire.public.r_nation ORDER BY n_nationkey")
      .collect().map(r => (r.get(0).toString, r.getString(1))).toSeq
    val local = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").orderBy("n_nationkey")
      .collect().map(r => (r.get(0).toString, r.getString(1))).toSeq
    assert(viaWire == local)
  }

  test("filters, projection and limit push across the wire") {
    val df = engine.sql("SELECT o_orderkey, o_totalprice FROM wire.public.r_orders " +
      "WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RemoteScan"), s"expected a RemoteScan node:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("o_orderstatus"),
      s"filters must appear pushed in the scan description:\n$plan")
    // and the result matches the same predicate evaluated locally
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .where("o_orderstatus = 'F' AND o_totalprice > 100000.0").count()
    assert(df.count() == expected && expected > 0)
    // pushed limit: a bare LIMIT reaches the remote side
    val lim = engine.sql("SELECT o_orderkey FROM wire.public.r_orders LIMIT 7")
    assert(lim.queryExecution.executedPlan.toString.contains("PushedLimit: 7"))
    assert(lim.count() == 7)
  }

  test("group-by aggregates push complete across the wire") {
    val df = engine.sql("""SELECT o_orderstatus, count(*) AS n,
        sum(o_totalprice) AS total, avg(o_totalprice) AS mean,
        min(o_orderkey) AS lo, max(o_orderkey) AS hi
      FROM wire.public.r_orders GROUP BY o_orderstatus""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"aggregate must appear pushed in the scan description:\n$plan")
    // COMPLETE pushdown: no HashAggregate above the remote scan — only
    // one row per group crossed the wire
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown must drop the client-side aggregate:\n$plan")
    val viaWire = df.collect().map(r => (r.getString(0), r.getLong(1),
      math.round(r.getDouble(2)), math.round(r.getDouble(3)))).sortBy(_._1).toSeq
    val local = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.sum("o_totalprice").as("t"),
        org.apache.spark.sql.functions.avg("o_totalprice").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2)), math.round(r.getDouble(3)))).sortBy(_._1).toSeq
    assert(viaWire == local)
    // DISTINCT pushes as a group-only aggregate
    val d = engine.sql("SELECT DISTINCT o_orderstatus FROM wire.public.r_orders")
    assert(d.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(d.collect().map(_.getString(0)).sorted.toSeq ==
      spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderstatus").distinct().collect().map(_.getString(0)).sorted.toSeq)
    // an inexpressible aggregate (expression argument) still answers,
    // un-pushed, with the aggregate running client-side
    val c = engine.sql("SELECT sum(o_totalprice * 2.0) AS s2 FROM wire.public.r_orders")
    assert(c.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("sum(o_totalprice * 2.0)").collect()(0).getDouble(0)
    assert(math.abs(c.collect()(0).getDouble(0) - expect) < 1e-6 * math.abs(expect))
  }

  test("IN-lists and null predicates push; DESCRIBE resolves the remote schema") {
    val df = engine.sql("SELECT count(*) FROM wire.public.r_orders " +
      "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey IS NOT NULL")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(o_orderpriority") && plan.contains("IsNotNull"),
      s"IN and IS NOT NULL must push:\n$plan")
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .where("o_orderpriority IN ('1-URGENT','2-HIGH') AND o_custkey IS NOT NULL")
      .count()
    assert(df.collect()(0).getLong(0) == expected && expected > 0)
    // DESCRIBE goes through loadTable/get_schema
    val cols = engine.sql("DESCRIBE TABLE wire.public.r_orders").collect()
      .map(_.getString(0)).filter(_.nonEmpty)
    assert(cols.contains("o_orderkey") && cols.contains("o_totalprice"))
  }

  test("ORDER BY ... LIMIT pushes as TopN: only n rows cross the wire") {
    // the sort column is NOT in the projection — the server sorts
    // before projecting
    val df = engine.sql("SELECT o_orderkey FROM wire.public.r_orders " +
      "ORDER BY o_totalprice DESC LIMIT 5")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN"), s"expected a pushed TopN:\n$plan")
    val viaWire = df.collect().map(_.get(0).toString).toSeq
    val local = spark.read.parquet(s"$sf/orders.parquet")
      .orderBy(org.apache.spark.sql.functions.col("o_totalprice").desc)
      .limit(5).select("o_orderkey").collect().map(_.get(0).toString).toSeq
    assert(viaWire == local)
  }

  test("count(*) prunes to a zero-column wire scan and still counts") {
    val n = engine.sql("SELECT count(*) FROM wire.public.r_orders")
      .collect()(0).getLong(0)
    assert(n == spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("array<float> embedding columns survive the wire") {
    val viaWire = engine.sql("SELECT vec_id, embedding FROM wire.public.r_embeddings " +
      "WHERE vec_id < 3 ORDER BY vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val local = spark.read.parquet(s"$sf/embeddings.parquet")
      .where("vec_id < 3").orderBy("vec_id").selectExpr("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    assert(viaWire == local && viaWire.nonEmpty)
  }

  test("ungranted tables: hidden from the listing, denied on direct scan") {
    val listed = engine.sql("SHOW TABLES IN wire.public").collect().map(_.getString(1))
    assert(!listed.contains("r_lineitem"))
    // the snapshot never enumerated it, so the name doesn't resolve
    val e = intercept[Exception] {
      engine.sql("SELECT * FROM wire.public.r_lineitem").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table") ||
      e.getMessage.toLowerCase.contains("not found"))
  }

  test("bearer token: a pre-issued token authenticates; garbage is rejected") {
    val token = server.issueToken("remote_reader")
    engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS wiretok " +
      s"WITH (token '$token')")
    assert(engine.sql("SELECT count(*) FROM wiretok.public.r_nation")
      .collect()(0).getLong(0) == 25)
    // SHOW ATTACHMENTS redacts the token and reports the remote kind
    val shown = engine.sql("SHOW ATTACHMENTS").collect()
      .find(_.getString(0) == "wiretok").get
    assert(shown.mkString(",").contains("remote"))
    assert(!shown.mkString(",").contains(token), "token must be redacted")
    engine.sql("DETACH wiretok")
    val bad = intercept[Exception] {
      engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS wirebad " +
        "WITH (token 'not-a-token')")
    }
    assert(bad.getMessage.contains("invalid or expired token"))
  }

  test("wrong password and anonymous are rejected at handshake") {
    val e = intercept[Exception] {
      engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS wirebad2 " +
        "WITH (username 'remote_reader', password 'wrong')")
    }
    assert(e.getMessage.contains("authentication failed"))
    // server-side combination rule: token next to basic is ambiguous
    // (the client refuses to build it, so speak the wire directly)
    locally {
      import org.json4s._
      import org.json4s.JsonDSL._
      val sock = new java.net.Socket("localhost", server.boundPort)
      try {
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        graft.remote.RemoteWire.writeFrame(out, ("op" -> "handshake") ~
          ("token" -> "t") ~ ("username" -> "u") ~ ("password" -> "p"))
        val resp = graft.remote.RemoteWire.readFrame(
          new java.io.BufferedInputStream(sock.getInputStream))
        assert((resp \ "ok") == JBool(false))
        assert(graft.remote.RemoteWire.str(resp, "error").get.contains("not both"))
      } finally sock.close()
    }
    val anon = intercept[Exception] {
      engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS wireanon")
    }
    assert(anon.getMessage.contains("token or username/password"))
  }

  test("network mounts are read-only") {
    val e = intercept[Exception] {
      engine.sql("INSERT INTO wire.public.r_managed VALUES (99, 'x')").collect()
    }
    assert(e != null)
  }

  test("an embedded-anonymous server grants system access only when opted in") {
    val wh2 = java.nio.file.Files.createTempDirectory("graft-remote-anon").toString
    val eng2 = GraftEngine(spark, wh2)
    eng2.sql(s"CREATE EXTERNAL TABLE anon_region STORED AS parquet LOCATION '$sf/region.parquet'")
    val s2 = new RemoteServer(spark, wh2, allowAnonymous = true)
    try {
      engine.sql(s"ATTACH 'graft://localhost:${s2.boundPort}' AS wireanon2")
      assert(engine.sql("SELECT count(*) FROM wireanon2.public.anon_region")
        .collect()(0).getLong(0) == 5)
      engine.sql("DETACH wireanon2")
    } finally s2.stop()
  }

  test("raw wire: the sql op streams arrow and runs under sqlAs") {
    import org.json4s._
    import org.json4s.JsonDSL._
    import graft.remote.RemoteWire
    def call(op: JValue): (JValue, java.io.InputStream, java.net.Socket) = {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      RemoteWire.writeFrame(out, ("op" -> "handshake") ~
        ("username" -> "remote_reader") ~ ("password" -> "wire-pw"))
      assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
      RemoteWire.writeFrame(out, op)
      (RemoteWire.readFrame(in), in, sock)
    }
    // a read query streams back as one arrow IPC stream
    val (resp, in, sock) = call(("op" -> "sql") ~
      ("sql" -> "SELECT count(*) AS n FROM r_nation"))
    assert((resp \ "ok") == JBool(true))
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
    assert(reader.loadNextBatch())
    val n = reader.getVectorSchemaRoot.getVector("n")
      .asInstanceOf[org.apache.arrow.vector.BigIntVector].get(0)
    assert(n == 25)
    reader.close(); sock.close(); alloc.close()
    // the identity is NOT super-user: DDL is rejected by sqlAs
    val (deny, _, s2) = call(("op" -> "sql") ~ ("sql" -> "DROP TABLE r_nation"))
    assert((deny \ "ok") == JBool(false))
    assert(RemoteWire.str(deny, "error").get.contains("permission denied"))
    s2.close()
    // and an ungranted scan through sql is denied too
    val (deny2, _, s3) = call(("op" -> "sql") ~
      ("sql" -> "SELECT count(*) FROM r_lineitem"))
    assert((deny2 \ "ok") == JBool(false))
    s3.close()
  }

  test("raw wire: sql op binds $n params as typed literals; quotes are data (r11)") {
    import org.json4s._
    import org.json4s.JsonDSL._
    import graft.remote.RemoteWire
    def call(op: JValue): (JValue, java.io.InputStream, java.net.Socket) = {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      RemoteWire.writeFrame(out, ("op" -> "handshake") ~
        ("username" -> "remote_reader") ~ ("password" -> "wire-pw"))
      assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
      RemoteWire.writeFrame(out, op)
      (RemoteWire.readFrame(in), in, sock)
    }
    def longResult(op: JValue): Either[String, Long] = {
      val (resp, in, sock) = call(op)
      try {
        if ((resp \ "ok") != JBool(true))
          Left(RemoteWire.str(resp, "error").getOrElse("unknown"))
        else {
          val alloc = new org.apache.arrow.memory.RootAllocator()
          val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
          assert(reader.loadNextBatch())
          val v = reader.getVectorSchemaRoot.getVector(0)
            .asInstanceOf[org.apache.arrow.vector.BigIntVector].get(0)
          reader.close(); alloc.close()
          Right(v)
        }
      } finally sock.close()
    }
    // string + int params, markers repeated/out of order
    val n = longResult(("op" -> "sql") ~
      ("sql" -> ("SELECT count(*) AS n FROM r_nation " +
        "WHERE n_name = $2 OR n_nationkey < $1")) ~
      ("params" -> JArray(List(JInt(3), JString("FRANCE")))))
    val local = spark.read.parquet(s"$sf/nation.parquet")
      .where("n_name = 'FRANCE' OR n_nationkey < 3").count()
    assert(n == Right(local) && local > 0)
    // timestamp param against the NTZ order date
    val cut = "1997-06-01T00:00:00"
    val nOrders = longResult(("op" -> "sql") ~
      ("sql" -> "SELECT count(*) AS n FROM r_orders WHERE o_orderdate < $1") ~
      ("params" -> JArray(List(
        ("t" -> "timestamp_ntz") ~ ("v" -> cut)))))
    val localOrders = spark.read.parquet(s"$sf/orders.parquet")
      .where(s"o_orderdate < TIMESTAMP_NTZ '1997-06-01 00:00:00'").count()
    assert(nOrders == Right(localOrders) && localOrders > 0,
      s"$nOrders vs $localOrders")
    // a quote-injection attempt stays DATA: no rows match the weird
    // name, and nothing errors or escapes the literal
    val inj = longResult(("op" -> "sql") ~
      ("sql" -> "SELECT count(*) AS n FROM r_nation WHERE n_name = $1") ~
      ("params" -> JArray(List(JString("' OR '1'='1")))))
    assert(inj == Right(0L), s"injection text must bind as a literal: $inj")
    // DDL through the params path is still denied for non-super-users
    val deny = longResult(("op" -> "sql") ~
      ("sql" -> "DROP TABLE r_nation") ~
      ("params" -> JArray(List(JString("x")))))
    assert(deny.isLeft && deny.swap.toOption.get.contains("permission denied"))
    // an out-of-range marker fails loudly
    val oor = longResult(("op" -> "sql") ~
      ("sql" -> "SELECT count(*) AS n FROM r_nation WHERE n_nationkey = $3") ~
      ("params" -> JArray(List(JInt(1)))))
    assert(oor.isLeft && oor.swap.toOption.get.contains("out of range"))
  }

  test("raw wire: prepared statements — handle + TTL, rebind, close, identity-bound (r11)") {
    import org.json4s._
    import org.json4s.JsonDSL._
    import graft.remote.RemoteWire
    def call(op: JValue, user: String = "remote_reader",
        pw: String = "wire-pw"): (JValue, java.io.InputStream, java.net.Socket) = {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      RemoteWire.writeFrame(out, ("op" -> "handshake") ~
        ("username" -> user) ~ ("password" -> pw))
      assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
      RemoteWire.writeFrame(out, op)
      (RemoteWire.readFrame(in), in, sock)
    }
    def longResult(op: JValue): Either[String, Long] = {
      val (resp, in, sock) = call(op)
      try {
        if ((resp \ "ok") != JBool(true))
          Left(RemoteWire.str(resp, "error").getOrElse("unknown"))
        else {
          val alloc = new org.apache.arrow.memory.RootAllocator()
          val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
          assert(reader.loadNextBatch())
          val v = reader.getVectorSchemaRoot.getVector(0)
            .asInstanceOf[org.apache.arrow.vector.BigIntVector].get(0)
          reader.close(); alloc.close()
          Right(v)
        }
      } finally sock.close()
    }
    // prepare parks the text and answers a handle + ttl
    val (prep, _, s1) = call(("op" -> "prepare") ~
      ("sql" -> "SELECT count(*) AS n FROM r_nation WHERE n_nationkey < $1"))
    s1.close()
    assert((prep \ "ok") == JBool(true), s"prepare failed: $prep")
    val handle = RemoteWire.str(prep, "handle").get
    assert((prep \ "ttl_ms") != JNothing)
    // execute twice with different bindings — one prepare, N executes
    assert(longResult(("op" -> "execute_prepared") ~ ("handle" -> handle) ~
      ("params" -> JArray(List(JInt(5))))) == Right(5L))
    assert(longResult(("op" -> "execute_prepared") ~ ("handle" -> handle) ~
      ("params" -> JArray(List(JInt(10))))) == Right(10L))
    assert(server.livePreparedCount == 1)
    // close releases the handle; execute after close fails loudly
    val (cl, _, s2) = call(("op" -> "close_prepared") ~ ("handle" -> handle))
    s2.close()
    assert((cl \ "ok") == JBool(true) && server.livePreparedCount == 0)
    val gone = longResult(("op" -> "execute_prepared") ~ ("handle" -> handle) ~
      ("params" -> JArray(List(JInt(5)))))
    assert(gone.isLeft && gone.swap.toOption.get.contains("gone"))
    // a statement the identity could never run fails AT PREPARE
    val (bad, _, s3) = call(("op" -> "prepare") ~ ("sql" -> "DROP TABLE r_nation"))
    s3.close()
    assert((bad \ "ok") == JBool(false))
    assert(RemoteWire.str(bad, "error").get.contains("permission denied"))
    // handles are identity-bound on CLOSE too: another user's close
    // must not destroy them (r11 review)
    val (p2, _, s4) = call(("op" -> "prepare") ~
      ("sql" -> "SELECT count(*) AS n FROM r_nation"))
    s4.close()
    val h2 = RemoteWire.str(p2, "handle").get
    val tok = server.issueToken("other_user")
    val sockO = new java.net.Socket("localhost", server.boundPort)
    try {
      val inO = new java.io.BufferedInputStream(sockO.getInputStream)
      val outO = new java.io.BufferedOutputStream(sockO.getOutputStream)
      RemoteWire.writeFrame(outO, ("op" -> "handshake") ~ ("token" -> tok))
      assert((RemoteWire.readFrame(inO) \ "ok") == JBool(true))
      RemoteWire.writeFrame(outO, ("op" -> "close_prepared") ~ ("handle" -> h2))
      val deny = RemoteWire.readFrame(inO)
      assert((deny \ "ok") == JBool(false) &&
        RemoteWire.str(deny, "error").get.contains("identity"))
    } finally sockO.close()
    // the owner still executes (the handle survived), then closes it
    assert(longResult(("op" -> "execute_prepared") ~ ("handle" -> h2) ~
      ("params" -> JArray(Nil))) == Right(25L))
    val (cl2, _, s5) = call(("op" -> "close_prepared") ~ ("handle" -> h2))
    s5.close()
    assert((cl2 \ "ok") == JBool(true))
  }

  test("prepare answers the analyzed result schema; per-identity cap (r12)") {
    import org.json4s._
    import org.json4s.JsonDSL._
    import graft.remote.RemoteWire
    def call(op: JValue): (JValue, java.io.InputStream, java.net.Socket) = {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      RemoteWire.writeFrame(out, ("op" -> "handshake") ~
        ("username" -> "remote_reader") ~ ("password" -> "wire-pw"))
      assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
      RemoteWire.writeFrame(out, op)
      (RemoteWire.readFrame(in), in, sock)
    }
    // the Flight CreatePreparedStatement contract: prepare answers the
    // RESULT SCHEMA without executing, so clients can plan decoding
    val (prep, _, s1) = call(("op" -> "prepare") ~
      ("sql" -> "SELECT n_nationkey, n_name FROM r_nation WHERE n_nationkey < $1"))
    s1.close()
    assert((prep \ "ok") == JBool(true), s"prepare failed: $prep")
    val h = RemoteWire.str(prep, "handle").get
    val fields = (prep \ "schema") match {
      case JArray(fs) => fs.map(f =>
        (RemoteWire.str(f, "name").get, RemoteWire.str(f, "type").get))
      case other => fail(s"prepare must answer a schema array: $other")
    }
    assert(fields == List("n_nationkey" -> "int", "n_name" -> "string"),
      s"analyzed schema: $fields")
    // ...and it matches what execute_prepared actually streams
    val (ex, in2, s2) = call(("op" -> "execute_prepared") ~ ("handle" -> h) ~
      ("params" -> JArray(List(JInt(5)))))
    assert((ex \ "ok") == JBool(true))
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in2, alloc)
    assert(reader.loadNextBatch())
    val streamed = reader.getVectorSchemaRoot.getSchema.getFields
    assert(streamed.size == 2 && streamed.get(0).getName == "n_nationkey" &&
      streamed.get(1).getName == "n_name",
      s"stream schema must match prepare's answer: $streamed")
    reader.close(); alloc.close(); s2.close()
    val (cl0, _, sc0) = call(("op" -> "close_prepared") ~ ("handle" -> h))
    sc0.close(); assert((cl0 \ "ok") == JBool(true))
    // DDL still fails AT prepare (schema path keeps the guards)
    val (bad, _, s3) = call(("op" -> "prepare") ~
      ("sql" -> "DROP TABLE r_nation"))
    s3.close()
    assert((bad \ "ok") == JBool(false) &&
      RemoteWire.str(bad, "error").get.contains("permission denied"))
    // the schema IS table metadata: preparing against a table this
    // identity has no SELECT grant on must deny, not leak columns
    val (leak, _, s3b) = call(("op" -> "prepare") ~
      ("sql" -> "SELECT * FROM r_lineitem WHERE l_orderkey < $1"))
    s3b.close()
    assert((leak \ "ok") == JBool(false), s"ungranted prepare must deny: $leak")
    assert(RemoteWire.str(leak, "error").get.contains("permission denied"))
    assert((leak \ "schema") == JNothing, "no schema may escape on deny")
    // per-identity cap: one user stops at 64 live handles with a named
    // error — the global 1024 stays for everyone together
    val handles = scala.collection.mutable.ArrayBuffer.empty[String]
    var denied: Option[String] = None
    var i = 0
    while (denied.isEmpty && i < 70) {
      val (p, _, s) = call(("op" -> "prepare") ~
        ("sql" -> s"SELECT count(*) AS n FROM r_nation WHERE n_nationkey < ${i % 7}"))
      s.close()
      if ((p \ "ok") == JBool(true)) handles += RemoteWire.str(p, "handle").get
      else denied = RemoteWire.str(p, "error")
      i += 1
    }
    assert(denied.exists(_.contains("max 64")),
      s"the 65th live prepare for one identity must fail: $denied")
    handles.foreach { hh =>
      val (_, _, s) = call(("op" -> "close_prepared") ~ ("handle" -> hh))
      s.close()
    }
    assert(server.livePreparedCount == 0)
  }

  test("DETACH cuts the mount; the server itself stays up") {
    engine.sql("DETACH wire")
    intercept[Exception] {
      engine.sql("SELECT count(*) FROM wire.public.r_nation").collect()
    }
    // still serving: a re-attach works
    engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS wire " +
      "WITH (username 'remote_reader', password 'wire-pw')")
    assert(engine.sql("SELECT count(*) FROM wire.public.r_nation")
      .collect()(0).getLong(0) == 25)
  }
}
