package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.remote.{RemoteServer, RemoteWire, WireTarget}

/** Round-10 remote-wire hardening: completion receipts (a truncated
  * stream can never pass as a short success), executor session-token
  * reuse (one PBKDF2 per attach, not per scan task), token TTL,
  * parallel scan streams, TLS, and same-peer JOIN pushdown. */
class Remote2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  val sf = "/root/testdata/sf0.001"

  private def servedWarehouse(): (String, RemoteServer) = {
    val wh = java.nio.file.Files.createTempDirectory("graft-r2-wh").toString
    val eng = GraftEngine(spark, wh)
    eng.sql(s"CREATE EXTERNAL TABLE j_nation STORED AS parquet LOCATION '$sf/nation.parquet'")
    eng.sql(s"CREATE EXTERNAL TABLE j_orders STORED AS parquet LOCATION '$sf/orders.parquet'")
    eng.sql(s"CREATE EXTERNAL TABLE j_customer STORED AS parquet LOCATION '$sf/customer.parquet'")
    // two tables sharing a HIDDEN column name ('note'): a join of them
    // must never merge, even when neither projects the collision
    eng.sql("CREATE TABLE j_dup1 AS SELECT n_nationkey AS id, n_name AS note FROM j_nation")
    eng.sql("CREATE TABLE j_dup2 AS SELECT n_nationkey AS cid, n_name AS note FROM j_nation")
    // a multi-commit managed table: file-granular split tickets carve
    // its current version's parquet files
    eng.sql("CREATE TABLE j_managed AS SELECT n_nationkey AS k, n_name AS v FROM j_nation")
    eng.sql("INSERT INTO j_managed SELECT n_nationkey + 100, n_name FROM j_nation")
    eng.sql("INSERT INTO j_managed SELECT n_nationkey + 200, n_name FROM j_nation")
    // a PARTITIONED multi-commit managed table: split tickets must
    // recover the dir-encoded partition column via per-commit basePath
    eng.sql("CREATE TABLE j_part PARTITIONED BY (p) AS " +
      "SELECT n_nationkey AS k, n_name AS v, n_nationkey % 3 AS p FROM j_nation")
    eng.sql("INSERT INTO j_part SELECT n_nationkey + 100, n_name, " +
      "n_nationkey % 3 FROM j_nation")
    eng.sql("CREATE USER joiner WITH PASSWORD 'join-pw'")
    eng.sql("CREATE ROLE join_readers")
    eng.sql("GRANT SELECT ON TABLE j_nation TO ROLE join_readers")
    eng.sql("GRANT SELECT ON TABLE j_orders TO ROLE join_readers")
    eng.sql("GRANT SELECT ON TABLE j_customer TO ROLE join_readers")
    eng.sql("GRANT SELECT ON TABLE j_dup1 TO ROLE join_readers")
    eng.sql("GRANT SELECT ON TABLE j_dup2 TO ROLE join_readers")
    eng.sql("GRANT SELECT ON TABLE j_managed TO ROLE join_readers")
    eng.sql("GRANT SELECT ON TABLE j_part TO ROLE join_readers")
    eng.sql("GRANT ROLE join_readers TO USER joiner")
    // a SECOND identity with the same grants: attachments under
    // different identities must never merge (r12)
    eng.sql("CREATE USER joiner2 WITH PASSWORD 'join-pw2'")
    eng.sql("GRANT ROLE join_readers TO USER joiner2")
    (wh, new RemoteServer(spark, wh))
  }

  lazy val (wh, server) = servedWarehouse()
  lazy val engine: GraftEngine = {
    val lw = java.nio.file.Files.createTempDirectory("graft-r2-local").toString
    GraftEngine(spark, lw)
  }

  private def attachMain(): Unit =
    if (graft.catalog.Attachments.get(spark, "jwire").isEmpty)
      engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS jwire " +
        "WITH (username 'joiner', password 'join-pw')")

  private def countOccurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  // ------------------------------------------------ completion receipt

  test("a clean Arrow EOS without a completion receipt fails the scan") {
    // fake server: valid handshake + scan header + a well-formed EMPTY
    // arrow stream WITH its EOS marker — but no receipt frame. Before
    // the receipt contract this read as a successful empty result.
    val srv = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      val sock = srv.accept()
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      import org.json4s.JsonDSL._
      RemoteWire.readFrame(in) // handshake
      RemoteWire.writeFrame(out, ("ok" -> true))
      RemoteWire.readFrame(in) // scan request
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)))
      RemoteWire.writeFrame(out,
        ("ok" -> true) ~ ("stream" -> true) ~ ("schema" -> schema.json))
      // empty single-column arrow stream, properly ended
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val aschema = new org.apache.arrow.vector.types.pojo.Schema(
        java.util.List.of(org.apache.arrow.vector.types.pojo.Field.nullable("x",
          new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true))))
      val root = org.apache.arrow.vector.VectorSchemaRoot.create(aschema, alloc)
      val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null,
        java.nio.channels.Channels.newChannel(out))
      w.start(); w.end()
      out.flush()
      sock.close(); root.close(); alloc.close()
    })
    t.setDaemon(true); t.start()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType)))
    val part = graft.remote.RemoteScanPartition(
      WireTarget("localhost", srv.getLocalPort, None),
      Map.empty, Map.empty, """{"op":"scan","table":"t"}""",
      emitColumns = true)
    val reader = new graft.remote.RemoteReaderFactory().createColumnarReader(part)
    val e = intercept[java.io.IOException] {
      while (reader.next()) ()
    }
    assert(e.getMessage.contains("completion receipt"),
      s"EOS without receipt must fail loudly, got: ${e.getMessage}")
    reader.close(); srv.close()
  }

  test("a receipt whose row count disagrees with the stream fails the scan") {
    // fake server: one-row arrow stream, clean EOS, then a receipt
    // claiming 2 rows — the cross-check must reject it
    val srv = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      val sock = srv.accept()
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      import org.json4s.JsonDSL._
      RemoteWire.readFrame(in)
      RemoteWire.writeFrame(out, ("ok" -> true))
      RemoteWire.readFrame(in)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)))
      RemoteWire.writeFrame(out,
        ("ok" -> true) ~ ("stream" -> true) ~ ("schema" -> schema.json))
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val aschema = new org.apache.arrow.vector.types.pojo.Schema(
        java.util.List.of(org.apache.arrow.vector.types.pojo.Field.nullable("x",
          new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true))))
      val root = org.apache.arrow.vector.VectorSchemaRoot.create(aschema, alloc)
      val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null,
        java.nio.channels.Channels.newChannel(out))
      w.start()
      root.allocateNew()
      root.getVector("x").asInstanceOf[org.apache.arrow.vector.BigIntVector]
        .setSafe(0, 42L)
      root.setRowCount(1)
      w.writeBatch()
      w.end()
      RemoteWire.writeFrame(out, ("ok" -> true) ~ ("rows" -> 2L)) // lies
      out.flush()
      sock.close(); root.close(); alloc.close()
    })
    t.setDaemon(true); t.start()
    val part = graft.remote.RemoteScanPartition(
      WireTarget("localhost", srv.getLocalPort, None),
      Map.empty, Map.empty, """{"op":"scan","table":"t"}""",
      emitColumns = true)
    val reader = new graft.remote.RemoteReaderFactory().createColumnarReader(part)
    val e = intercept[java.io.IOException] {
      while (reader.next()) ()
    }
    assert(e.getMessage.contains("row-count mismatch"),
      s"a lying receipt must fail the scan, got: ${e.getMessage}")
    reader.close(); srv.close()
  }

  test("a server-side failure mid-stream fails the scan, never a short success") {
    // external table whose file disappears after attach: the server's
    // feeding job throws, the EOS marker is never written, and the
    // client errors instead of returning zero rows
    val dir = java.nio.file.Files.createTempDirectory("graft-vanish")
    val fp = dir.resolve("part.parquet")
    spark.read.parquet(s"$sf/nation.parquet").coalesce(1)
      .write.mode("overwrite").parquet(fp.toString)
    val wh2 = java.nio.file.Files.createTempDirectory("graft-vanish-wh").toString
    val eng2 = GraftEngine(spark, wh2)
    eng2.sql(s"CREATE EXTERNAL TABLE vanish STORED AS parquet LOCATION '$fp'")
    val s2 = new RemoteServer(spark, wh2, allowAnonymous = true)
    try {
      engine.sql(s"ATTACH 'graft://localhost:${s2.boundPort}' AS vwire")
      // delete the data files under the table
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(fp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
      val e = intercept[Exception] {
        engine.sql("SELECT * FROM vwire.public.vanish").collect()
      }
      assert(e != null) // loud failure, not an empty result
      engine.sql("DETACH vwire")
    } finally s2.stop()
  }

  // ------------------------------------- token lifecycle + PBKDF2 diet

  test("executor scan tasks reuse the session token: one PBKDF2 total") {
    attachMain()
    val before = server.pbkdf2Count
    assert(before >= 1, "the attach handshake itself runs the KDF once")
    // several scans: every task handshakes with the cached token
    (1 to 3).foreach { _ =>
      engine.sql("SELECT count(*) FROM jwire.public.j_nation").collect()
    }
    assert(server.pbkdf2Count == before,
      "scan tasks must ride the session token, not re-run the KDF")
    assert(server.liveTokenCount <= 2,
      "token map must not grow with scan traffic")
    // and the partitions themselves carry no password
    val peer = new graft.remote.NetworkPeer("localhost", server.boundPort,
      graft.catalog.Attachments.Basic("joiner", "join-pw"))
    peer.listing() // handshake → session token cached
    val table = peer.loadTable(spark, "public", "j_nation")
      .asInstanceOf[graft.remote.RemoteTable]
    val scan = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of())).build()
    val parts = scan.toBatch.planInputPartitions()
    parts.foreach { p =>
      val sp = p.asInstanceOf[graft.remote.RemoteScanPartition]
      assert(sp.auth.contains("token") && !sp.auth.contains("password"),
        "primary auth must be the session token")
      assert(sp.fallbackAuth.contains("password"),
        "basic credentials ride only as the restart fallback")
    }
  }

  test("tokens expire: a TTL'd token is rejected and swept") {
    val whT = java.nio.file.Files.createTempDirectory("graft-ttl-wh").toString
    val engT = GraftEngine(spark, whT)
    engT.sql("CREATE USER ttl_user WITH PASSWORD 'ttl-pw'")
    val sT = new RemoteServer(spark, whT, tokenTtlMs = 150)
    try {
      val tok = sT.issueToken("ttl_user")
      assert(sT.liveTokenCount == 1)
      Thread.sleep(300)
      // expired: handshake rejected, entry swept
      val sock = new java.net.Socket("localhost", sT.boundPort)
      try {
        import org.json4s._
        import org.json4s.JsonDSL._
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        RemoteWire.writeFrame(out, ("op" -> "handshake") ~ ("token" -> tok))
        val resp = RemoteWire.readFrame(
          new java.io.BufferedInputStream(sock.getInputStream))
        assert((resp \ "ok") == JBool(false))
        assert(RemoteWire.str(resp, "error").get.contains("expired"))
      } finally sock.close()
      assert(sT.liveTokenCount == 0, "expired tokens must be swept")
    } finally sT.stop()
  }

  // ------------------------------------------- parallel scan streams

  test("scan_parallelism fans one scan over N disjoint streams, union bit-equal") {
    engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS jpar " +
      "WITH (username 'joiner', password 'join-pw', scan_parallelism '3')")
    val df = engine.sql(
      "SELECT o_orderkey, o_totalprice FROM jpar.public.j_orders")
    assert(df.rdd.getNumPartitions == 3,
      "a plain scan must fan out over the requested streams")
    val viaSplit = df.collect().map(_.toString).sorted.toSeq
    val local = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_totalprice")
      .collect().map(_.toString).sorted.toSeq
    assert(viaSplit == local, "split union must be bit-equal to the table")
    // pushed aggregate: complete only as a single stream — no split
    val agg = engine.sql(
      "SELECT o_orderstatus, count(*) FROM jpar.public.j_orders GROUP BY 1")
    assert(agg.rdd.getNumPartitions == 1,
      "aggregate pushdown must stay single-stream")
    // pushed limit: single stream too
    val lim = engine.sql("SELECT o_orderkey FROM jpar.public.j_orders LIMIT 5")
    assert(lim.rdd.getNumPartitions == 1)
    assert(lim.count() == 5)
    // MANAGED tables split at FILE granularity: each ticket reads only
    // its files (N streams ≈ one scan of server work), union bit-equal
    val before = server.fileSplitCount
    val man = engine.sql("SELECT k, v FROM jpar.public.j_managed")
    assert(man.rdd.getNumPartitions == 3)
    val viaTickets = man.collect().map(_.toString).sorted.toSeq
    attachMain()
    val whole = engine.sql("SELECT k, v FROM jwire.public.j_managed")
      .collect().map(_.toString).sorted.toSeq
    assert(viaTickets == whole && viaTickets.size == 75)
    assert(server.fileSplitCount > before,
      "managed-table tickets must take the file-split path")
    // PARTITIONED managed tables split at file granularity too (r11):
    // per-commit-dir basePath reads recover the dir-encoded partition
    // column, union bit-equal to the whole table
    val beforeP = server.fileSplitCount
    val pt = engine.sql("SELECT k, v, p FROM jpar.public.j_part")
    assert(pt.rdd.getNumPartitions == 3)
    val viaP = pt.collect().map(_.toString).sorted.toSeq
    attachMain()
    val wholeP = engine.sql("SELECT k, v, p FROM jwire.public.j_part")
      .collect().map(_.toString).sorted.toSeq
    assert(viaP == wholeP && viaP.size == 50,
      s"partitioned split union must carry the partition column (${viaP.size})")
    assert(viaP.exists(_.contains("2")), "partition values must survive")
    assert(server.fileSplitCount > beforeP,
      "partitioned-table tickets must take the file-split path")
    engine.sql("DETACH jpar")
  }

  test("version-pinned tickets survive a mid-scan commit; a vacuumed pin fails loudly (r10)") {
    import org.json4s._
    import org.json4s.JsonDSL._
    // a dedicated peer so the mid-scan INSERT can't disturb the shared
    // fixture
    val whP = java.nio.file.Files.createTempDirectory("graft-pin-wh").toString
    val engP = GraftEngine(spark, whP)
    engP.sql(s"CREATE EXTERNAL TABLE pin_src STORED AS parquet LOCATION '$sf/nation.parquet'")
    engP.sql("CREATE TABLE pin_t AS SELECT n_nationkey AS k, n_name AS v FROM pin_src")
    engP.sql("INSERT INTO pin_t SELECT n_nationkey + 100, n_name FROM pin_src")
    val sP = new RemoteServer(spark, whP, allowAnonymous = true)
    try {
      def scanTicket(version: Long, part: Int, parts: Int): Either[String, Long] = {
        val sock = new java.net.Socket("localhost", sP.boundPort)
        try {
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          RemoteWire.writeFrame(out, ("op" -> "handshake"))
          assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
          RemoteWire.writeFrame(out, ("op" -> "scan") ~ ("table" -> "pin_t") ~
            ("version" -> version) ~ ("part" -> part) ~ ("parts" -> parts) ~
            ("columns" -> JArray(List(JString("k")))))
          val resp = RemoteWire.readFrame(in)
          if ((resp \ "ok") != JBool(true))
            return Left(RemoteWire.str(resp, "error").getOrElse("unknown"))
          val alloc = new org.apache.arrow.memory.RootAllocator()
          val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
          var n = 0L
          while (reader.loadNextBatch()) n += reader.getVectorSchemaRoot.getRowCount
          reader.close(); alloc.close()
          Right(n)
        } finally sock.close()
      }
      val pinned = graft.catalog.TableVersions.latest(whP, "pin_t").get.version
      // redeem ticket 0, COMMIT, then redeem tickets 1..2 of the SAME
      // pin: the union must be exactly the pinned version's 50 rows —
      // the mid-scan commit shifts nothing
      val t0 = scanTicket(pinned, 0, 3).toOption.get
      engP.sql("INSERT INTO pin_t SELECT n_nationkey + 200, n_name FROM pin_src")
      val t1 = scanTicket(pinned, 1, 3).toOption.get
      val t2 = scanTicket(pinned, 2, 3).toOption.get
      assert(t0 + t1 + t2 == 50L,
        s"pinned tickets must union to the pinned version: $t0 + $t1 + $t2")
      // and the new current version reads 75 through its own pin
      val v2 = graft.catalog.TableVersions.latest(whP, "pin_t").get.version
      val u = (0 until 3).map(p => scanTicket(v2, p, 3).toOption.get).sum
      assert(u == 75L)
      // a VACUUMed pin fails loudly instead of serving wrong files
      engP.sql("VACUUM pin_t RETAIN 1 VERSIONS")
      val gone = scanTicket(pinned, 0, 3)
      assert(gone.isLeft && gone.swap.toOption.get.contains("gone"),
        s"a vacuumed pin must error: $gone")
    } finally sP.stop()
  }

  test("external tables pin a file-list snapshot: a file added mid-scan is invisible (r11)") {
    import org.json4s._
    import org.json4s.JsonDSL._
    // an external DIRECTORY of several parquet files the server can
    // split at file granularity
    val dir = java.nio.file.Files.createTempDirectory("graft-ext-snap").toString
    spark.read.parquet(s"$sf/nation.parquet").repartition(4)
      .write.mode("overwrite").parquet(dir)
    val whE = java.nio.file.Files.createTempDirectory("graft-snap-wh").toString
    val engE = GraftEngine(spark, whE)
    engE.sql(s"CREATE EXTERNAL TABLE ext_t STORED AS parquet LOCATION '$dir'")
    val sE = new RemoteServer(spark, whE, allowAnonymous = true)
    try {
      def withConn[A](f: (java.io.BufferedInputStream,
          java.io.BufferedOutputStream) => A): A = {
        val sock = new java.net.Socket("localhost", sE.boundPort)
        try {
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          RemoteWire.writeFrame(out, ("op" -> "handshake"))
          assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
          f(in, out)
        } finally sock.close()
      }
      def snapshotId(): String = withConn { (in, out) =>
        RemoteWire.writeFrame(out,
          ("op" -> "table_version") ~ ("table" -> "ext_t"))
        val resp = RemoteWire.readFrame(in)
        assert((resp \ "ok") == JBool(true))
        assert((resp \ "version") == JNothing,
          "an external table has no commit-log version")
        RemoteWire.str(resp, "snapshot").getOrElse(
          fail(s"external parquet table must answer a snapshot id: $resp"))
      }
      def ticket(snap: String, part: Int, parts: Int): Either[String, Long] =
        withConn { (in, out) =>
          RemoteWire.writeFrame(out, ("op" -> "scan") ~ ("table" -> "ext_t") ~
            ("snapshot" -> snap) ~ ("part" -> part) ~ ("parts" -> parts) ~
            ("columns" -> JArray(List(JString("n_nationkey")))))
          val resp = RemoteWire.readFrame(in)
          if ((resp \ "ok") != JBool(true))
            Left(RemoteWire.str(resp, "error").getOrElse("unknown"))
          else {
            val alloc = new org.apache.arrow.memory.RootAllocator()
            val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
            var n = 0L
            while (reader.loadNextBatch()) n += reader.getVectorSchemaRoot.getRowCount
            reader.close(); alloc.close()
            Right(n)
          }
        }
      val snap = snapshotId()
      val before = sE.fileSplitCount
      // redeem ticket 0, ADD A FILE to the directory, then redeem the
      // rest of the SAME snapshot: the union must equal the pinned
      // listing's 25 rows — the new file is invisible to every ticket
      val t0 = ticket(snap, 0, 3).toOption.get
      spark.read.parquet(s"$sf/nation.parquet")
        .withColumn("n_nationkey", col("n_nationkey") + lit(100))
        .coalesce(1).write.mode("append").parquet(dir)
      val t1 = ticket(snap, 1, 3).toOption.get
      val t2 = ticket(snap, 2, 3).toOption.get
      assert(t0 + t1 + t2 == 25L,
        s"pinned snapshot tickets must union to the plan-time listing: $t0+$t1+$t2")
      assert(sE.fileSplitCount >= before + 3,
        "external snapshot tickets must take the file-split path")
      // a FRESH pin sees the appended file
      val snap2 = snapshotId()
      assert(snap2 != snap)
      val u = (0 until 3).map(p => ticket(snap2, p, 3).toOption.get).sum
      assert(u == 50L, s"a fresh snapshot must see the new file: $u")
      // a foreign/expired snapshot id fails loudly, never serves live
      val bad = ticket("no-such-snapshot", 0, 3)
      assert(bad.isLeft && bad.swap.toOption.get.contains("gone"),
        s"an unknown snapshot must error: $bad")
    } finally sE.stop()
  }

  test("BUCKETED (and partitioned+bucketed) managed tables split via file-list snapshots (r11)") {
    val whB = java.nio.file.Files.createTempDirectory("graft-bkt-wh").toString
    val engB = GraftEngine(spark, whB)
    engB.sql(s"CREATE EXTERNAL TABLE bkt_src STORED AS parquet LOCATION '$sf/nation.parquet'")
    engB.sql("CREATE TABLE bkt_t CLUSTERED BY (k) INTO 4 BUCKETS AS " +
      "SELECT n_nationkey AS k, n_name AS v FROM bkt_src")
    engB.sql("CREATE TABLE pbkt_t PARTITIONED BY (p) CLUSTERED BY (k) INTO 2 BUCKETS AS " +
      "SELECT n_nationkey AS k, n_name AS v, n_nationkey % 3 AS p FROM bkt_src")
    val sB = new RemoteServer(spark, whB, allowAnonymous = true)
    try {
      val lw = java.nio.file.Files.createTempDirectory("graft-bkt-local").toString
      val engL = GraftEngine(spark, lw)
      engL.sql(s"ATTACH 'graft://localhost:${sB.boundPort}' AS bsplit " +
        "WITH (scan_parallelism '3')")
      val before = sB.fileSplitCount
      // bucketed: plain file subset (bucket ids live in file names,
      // nothing dir-encoded) — union bit-equal
      val bt = engL.sql("SELECT k, v FROM bsplit.public.bkt_t")
      assert(bt.rdd.getNumPartitions == 3)
      assert(bt.collect().map(_.toString).sorted.toSeq ==
        spark.read.parquet(s"$sf/nation.parquet")
          .selectExpr("n_nationkey AS k", "n_name AS v")
          .collect().map(_.toString).sorted.toSeq)
      // partitioned+bucketed: basePath recovers the partition column
      val pbt = engL.sql("SELECT k, v, p FROM bsplit.public.pbkt_t")
      val viaPbt = pbt.collect().map(_.toString).sorted.toSeq
      assert(viaPbt.size == 25 && viaPbt.exists(_.endsWith(",2]")),
        s"partition values must survive the bucketed split (${viaPbt.take(2)})")
      assert(sB.fileSplitCount > before,
        "bucketed tickets must take the file-split path")
      engL.sql("DETACH bsplit")
    } finally sB.stop()
  }

  test("snapshot hygiene: staged files excluded; DDL shape swap fails loudly (r11 review)") {
    import org.json4s._
    import org.json4s.JsonDSL._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-hyg").toString
    spark.read.parquet(s"$sf/nation.parquet").coalesce(2)
      .write.mode("overwrite").parquet(dir)
    // a staged in-flight write must never enter a pinned listing
    val tmp = java.nio.file.Paths.get(dir, "_temporary", "0")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.copy(
      java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .filter(_.toString.endsWith(".parquet")).findFirst().get(),
      tmp.resolve("part-staged.parquet"))
    val whS = java.nio.file.Files.createTempDirectory("graft-hyg-wh").toString
    val engS = GraftEngine(spark, whS)
    engS.sql(s"CREATE EXTERNAL TABLE hyg_t STORED AS parquet LOCATION '$dir'")
    val sS = new RemoteServer(spark, whS, allowAnonymous = true)
    try {
      def withConn[A](f: (java.io.BufferedInputStream,
          java.io.BufferedOutputStream) => A): A = {
        val sock = new java.net.Socket("localhost", sS.boundPort)
        try {
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          RemoteWire.writeFrame(out, ("op" -> "handshake"))
          assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
          f(in, out)
        } finally sock.close()
      }
      def snapshotId(): String = withConn { (in, out) =>
        RemoteWire.writeFrame(out,
          ("op" -> "table_version") ~ ("table" -> "hyg_t"))
        RemoteWire.str(RemoteWire.readFrame(in), "snapshot").get
      }
      def ticketCount(snap: String, part: Int, parts: Int): Either[String, Long] =
        withConn { (in, out) =>
          RemoteWire.writeFrame(out, ("op" -> "scan") ~ ("table" -> "hyg_t") ~
            ("snapshot" -> snap) ~ ("part" -> part) ~ ("parts" -> parts) ~
            ("columns" -> JArray(List(JString("n_nationkey")))))
          val resp = RemoteWire.readFrame(in)
          if ((resp \ "ok") != JBool(true))
            Left(RemoteWire.str(resp, "error").getOrElse("unknown"))
          else {
            val alloc = new org.apache.arrow.memory.RootAllocator()
            val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
            var n = 0L
            while (reader.loadNextBatch()) n += reader.getVectorSchemaRoot.getRowCount
            reader.close(); alloc.close()
            Right(n)
          }
        }
      val snap = snapshotId()
      // the staged copy is invisible: union = exactly the committed 25
      val u = (0 until 2).map(p => ticketCount(snap, p, 2).toOption.get).sum
      assert(u == 25L, s"staged _temporary files must not be pinned: $u")
      // DDL swap mid-scan: drop + recreate under another shape — the
      // old snapshot must fail loudly, never serve the old files
      engS.sql("DROP TABLE hyg_t")
      engS.sql("CREATE TABLE hyg_t CLUSTERED BY (k) INTO 2 BUCKETS AS " +
        s"SELECT n_nationkey AS k FROM parquet.`$sf/nation.parquet`")
      val swapped = ticketCount(snap, 0, 2)
      assert(swapped.isLeft && swapped.swap.toOption.get.contains("shape"),
        s"a shape-swapped snapshot must error: $swapped")
    } finally sS.stop()
  }

  test("hive-partitioned EXTERNAL tables split at file granularity with basePath (r11)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hive-ext").toString
    spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey AS k", "n_name AS v", "n_nationkey % 3 AS p")
      .write.partitionBy("p").mode("overwrite").parquet(dir)
    val whH = java.nio.file.Files.createTempDirectory("graft-hive-wh").toString
    val engH = GraftEngine(spark, whH)
    engH.sql("CREATE EXTERNAL TABLE hive_t STORED AS parquet " +
      s"LOCATION '$dir' OPTIONS (hive_partitioned 'true')")
    val sH = new RemoteServer(spark, whH, allowAnonymous = true)
    try {
      val lw = java.nio.file.Files.createTempDirectory("graft-hive-local").toString
      val engL = GraftEngine(spark, lw)
      engL.sql(s"ATTACH 'graft://localhost:${sH.boundPort}' AS hsplit " +
        "WITH (scan_parallelism '3')")
      val before = sH.fileSplitCount
      val df = engL.sql("SELECT k, v, p FROM hsplit.public.hive_t")
      assert(df.rdd.getNumPartitions == 3)
      val viaSplit = df.collect().map(_.toString).sorted.toSeq
      val local = spark.read.parquet(dir).selectExpr("k", "v", "p")
        .collect().map(_.toString).sorted.toSeq
      assert(viaSplit == local && viaSplit.size == 25,
        "hive-external split union must carry the dir-encoded partition column")
      assert(sH.fileSplitCount >= before + 3,
        "hive-external tickets must take the file-split path")
      engL.sql("DETACH hsplit")
    } finally sH.stop()
  }

  // --------------------------------------------------------------- TLS

  test("tls: handshake over TLS works; plaintext client is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tls")
    val ks = dir.resolve("server.p12").toString
    val cert = dir.resolve("server.crt").toString
    val ts = dir.resolve("trust.p12").toString
    def keytool(args: String*): Unit = {
      val pb = new ProcessBuilder((Seq("keytool") ++ args): _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val outText = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"keytool failed: $outText")
    }
    keytool("-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "30", "-keystore", ks,
      "-storetype", "PKCS12", "-storepass", "changeit",
      "-dname", "CN=localhost", "-ext", "SAN=dns:localhost")
    keytool("-exportcert", "-alias", "graft", "-keystore", ks,
      "-storetype", "PKCS12", "-storepass", "changeit", "-file", cert)
    keytool("-importcert", "-alias", "graft", "-file", cert,
      "-keystore", ts, "-storetype", "PKCS12", "-storepass", "changeit",
      "-noprompt")
    val whS = java.nio.file.Files.createTempDirectory("graft-tls-wh").toString
    val engS = GraftEngine(spark, whS)
    engS.sql(s"CREATE EXTERNAL TABLE tls_region STORED AS parquet LOCATION '$sf/region.parquet'")
    val sTls = new RemoteServer(spark, whS, allowAnonymous = true,
      tlsKeystore = Some((ks, "changeit")))
    try {
      engine.sql(s"ATTACH 'graft://localhost:${sTls.boundPort}' AS tlswire " +
        s"WITH (tls 'true', truststore '$ts', truststore_password 'changeit')")
      assert(engine.sql("SELECT count(*) FROM tlswire.public.tls_region")
        .collect()(0).getLong(0) == 5)
      engine.sql("DETACH tlswire")
      // a plaintext client against the TLS server must fail, not hang
      // or silently succeed
      val e = intercept[Exception] {
        engine.sql(s"ATTACH 'graft://localhost:${sTls.boundPort}' AS plainbad")
      }
      assert(e != null)
    } finally sTls.stop()
  }

  // -------------------------------------- same-peer JOIN pushdown

  test("same-peer equi-join runs ON the peer: one RemoteScan, join output crosses") {
    attachMain()
    val df = engine.sql(
      """SELECT c_name, o_orderkey, o_totalprice
         FROM jwire.public.j_orders JOIN jwire.public.j_customer
           ON o_custkey = c_custkey
         WHERE o_totalprice > 150000.0""")
    val lplan = df.queryExecution.optimizedPlan.toString
    assert(countOccurrences(lplan, "remote(") == 1,
      s"the join must collapse to ONE remote relation:\n$lplan")
    assert(lplan.contains("⋈"), s"relation must show the join:\n$lplan")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no client-side join may remain:\n$plan")
    val viaWire = df.collect().map(_.toString).sorted.toSeq
    val local = {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .where("o_totalprice > 150000.0")
        .selectExpr("c_name", "o_orderkey", "o_totalprice")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(viaWire == local && viaWire.nonEmpty)
  }

  test("aggregate above a pushed join pushes too: one row per group crosses") {
    attachMain()
    val df = engine.sql(
      """SELECT c_mktsegment, count(*) AS n, sum(o_totalprice) AS total
         FROM jwire.public.j_orders JOIN jwire.public.j_customer
           ON o_custkey = c_custkey
         GROUP BY c_mktsegment""")
    val lplan = df.queryExecution.optimizedPlan.toString
    assert(countOccurrences(lplan, "remote(") == 1, s"one relation:\n$lplan")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"the aggregate must push into the joined scan:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown must drop the client aggregate:\n$plan")
    val viaWire = df.collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2))))
      .sortBy(_._1).toSeq
    val local = {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(org.apache.spark.sql.functions.count("*").as("n"),
          org.apache.spark.sql.functions.sum("o_totalprice").as("t"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2))))
        .sortBy(_._1).toSeq
    }
    assert(viaWire == local && viaWire.nonEmpty)
  }

  test("left join pushes; a right-side filter makes it bail to two scans") {
    attachMain()
    val lj = engine.sql(
      """SELECT c_name, o_orderkey
         FROM jwire.public.j_customer LEFT JOIN jwire.public.j_orders
           ON c_custkey = o_custkey""")
    val ljPlan = lj.queryExecution.optimizedPlan.toString
    assert(countOccurrences(ljPlan, "RelationV2") == 1 && ljPlan.contains("⋈"),
      s"left join must push as one relation:\n$ljPlan")
    val viaWire = lj.collect().map(_.toString).sorted.toSeq
    val local = {
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .selectExpr("c_name", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(viaWire == local && viaWire.nonEmpty)
    // a filter ABOVE the left join commutes (post-join placement is
    // its original placement): still merges, and values match
    val above = engine.sql(
      """SELECT c_name, o_orderkey
         FROM jwire.public.j_customer LEFT JOIN jwire.public.j_orders
           ON c_custkey = o_custkey
         WHERE o_totalprice > 100000.0 OR o_totalprice IS NULL""")
    assert(above.queryExecution.optimizedPlan.toString.contains("⋈"))
    val aboveWire = above.collect().map(_.toString).sorted.toSeq
    val aboveLocal = {
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .where("o_totalprice > 100000.0 OR o_totalprice IS NULL")
        .selectExpr("c_name", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(aboveWire == aboveLocal && aboveWire.nonEmpty)
    // a right-side RESIDUAL predicate BELOW a LEFT join (inexpressible
    // on the wire, not commutable past the join): bail — two scans,
    // client-side join, still correct
    val bail = engine.sql(
      """SELECT c_name, o_orderkey
         FROM jwire.public.j_customer LEFT JOIN
           (SELECT * FROM jwire.public.j_orders WHERE o_orderpriority RLIKE 'URGENT$') o
           ON c_custkey = o_custkey""")
    val bailPlan = bail.queryExecution.optimizedPlan.toString
    assert(countOccurrences(bailPlan, "RelationV2") == 2 && !bailPlan.contains("⋈"),
      s"right-side residual predicate must keep the join client-side:\n$bailPlan")
    val bailWire = bail.collect().map(_.toString).sorted.toSeq
    val bailLocal = {
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet").where("o_orderpriority RLIKE 'URGENT$'")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .selectExpr("c_name", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(bailWire == bailLocal && bailWire.nonEmpty)
  }

  test("three-way same-peer join chain folds into ONE remote scan (r10)") {
    attachMain()
    val df = engine.sql(
      """SELECT n_name, c_name, o_orderkey
         FROM jwire.public.j_orders
         JOIN jwire.public.j_customer ON o_custkey = c_custkey
         JOIN jwire.public.j_nation ON c_nationkey = n_nationkey
         WHERE o_totalprice > 200000.0""")
    val lplan = df.queryExecution.optimizedPlan.toString
    assert(countOccurrences(lplan, "RelationV2") == 1 &&
      countOccurrences(lplan, "⋈") == 2,
      s"three tables must fold into one chained relation:\n$lplan")
    val viaWire = df.collect().map(_.toString).sorted.toSeq
    val local = {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val n = spark.read.parquet(s"$sf/nation.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .where("o_totalprice > 200000.0")
        .selectExpr("n_name", "c_name", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(viaWire == local && viaWire.nonEmpty)
    // and an aggregate above the chain still pushes: one row per
    // nation crosses the wire for a 3-table join
    val agg = engine.sql(
      """SELECT n_name, count(*) AS n
         FROM jwire.public.j_orders
         JOIN jwire.public.j_customer ON o_custkey = c_custkey
         JOIN jwire.public.j_nation ON c_nationkey = n_nationkey
         GROUP BY n_name""")
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("PushedAggregation") && !aggPlan.contains("HashAggregate"),
      s"aggregate must push into the chained join scan:\n$aggPlan")
    val aggWire = agg.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val aggLocal = {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val n = spark.read.parquet(s"$sf/nation.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(aggWire == aggLocal && aggWire.nonEmpty)
  }

  test("residual filter on a pruned column still merges and binds (r10 review fix)") {
    attachMain()
    // RLIKE is not wire-expressible → residual filter on a column the
    // projection drops; the merged relation must WIDEN to carry it
    val df = engine.sql(
      """SELECT o_orderkey, c_name
         FROM jwire.public.j_orders JOIN jwire.public.j_customer
           ON o_custkey = c_custkey
         WHERE o_orderpriority RLIKE 'URGENT$'""")
    assert(df.queryExecution.optimizedPlan.toString.contains("⋈"),
      "the join must still merge with a widened output")
    val viaWire = df.collect().map(_.toString).sorted.toSeq
    val local = {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .where("o_orderpriority RLIKE 'URGENT$'")
        .selectExpr("o_orderkey", "c_name")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(viaWire == local && viaWire.nonEmpty)
  }

  test("hidden column-name collisions and self-joins never merge (r10 review fix)") {
    attachMain()
    // j_dup1/j_dup2 both carry 'note'; neither projects it — the
    // server would join the FULL tables, so the rule must bail
    val dup = engine.sql(
      """SELECT id, cid FROM jwire.public.j_dup1 JOIN jwire.public.j_dup2
           ON id = cid""")
    val dupPlan = dup.queryExecution.optimizedPlan.toString
    assert(!dupPlan.contains("⋈"),
      s"hidden name collision must keep the join client-side:\n$dupPlan")
    assert(dup.count() == 25)
    // same-peer self-join: every name collides — client-side, correct
    val self = engine.sql(
      """SELECT a.o_orderkey FROM jwire.public.j_orders a
         JOIN jwire.public.j_orders b ON a.o_orderkey = b.o_orderkey""")
    assert(!self.queryExecution.optimizedPlan.toString.contains("⋈"))
    assert(self.count() ==
      spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("bushy same-peer shape (A⋈B)⋈(C⋈D) collapses into ONE remote scan (r11)") {
    attachMain()
    val df = engine.sql(
      """SELECT c_name, o_orderkey, n_name, note
         FROM (SELECT c_custkey, c_nationkey, c_name, o_orderkey
               FROM jwire.public.j_customer
               JOIN jwire.public.j_orders ON c_custkey = o_custkey) co
         JOIN (SELECT n_nationkey, n_name, note
               FROM jwire.public.j_nation
               JOIN jwire.public.j_dup1 ON n_nationkey = id) nd
           ON c_nationkey = n_nationkey""")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(countOccurrences(plan, "RelationV2") == 1 &&
      countOccurrences(plan, "⋈") == 3,
      s"four tables must fold into one chained relation:\n$plan")
    val viaWire = df.collect().map(_.toString).sorted.toSeq
    val local = {
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val n = spark.read.parquet(s"$sf/nation.parquet")
      val d = n.select(col("n_nationkey").as("id"), col("n_name").as("note"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(n.join(d, n("n_nationkey") === d("id")),
          c("c_nationkey") === n("n_nationkey"))
        .selectExpr("c_name", "o_orderkey", "n_name", "note")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(viaWire == local && viaWire.nonEmpty,
      s"bushy wire result must match local (${viaWire.size}/${local.size})")
    // a FILTERED right chain still merges: the chain's accumulated
    // wire filters re-apply to the final joined frame (exact for the
    // inner top join), so the filtered-bushy result matches local
    val filtered = engine.sql(
      """SELECT c_name, n_name, note
         FROM (SELECT c_custkey, c_nationkey, c_name, o_orderkey
               FROM jwire.public.j_customer
               JOIN jwire.public.j_orders ON c_custkey = o_custkey) co
         JOIN (SELECT n_nationkey, n_name, note
               FROM jwire.public.j_nation
               JOIN jwire.public.j_dup1 ON n_nationkey = id
               WHERE id < 10) nd
           ON c_nationkey = n_nationkey
         WHERE o_orderkey < 3000""")
    val fPlan = filtered.queryExecution.optimizedPlan.toString
    assert(countOccurrences(fPlan, "RelationV2") == 1,
      s"a filtered right chain must still merge:\n$fPlan")
    val fLocal = {
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val n = spark.read.parquet(s"$sf/nation.parquet")
      val d = n.select(col("n_nationkey").as("id"), col("n_name").as("note"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(n.join(d, n("n_nationkey") === d("id")).where(d("id") < 10),
          c("c_nationkey") === n("n_nationkey"))
        .where(o("o_orderkey") < 3000)
        .selectExpr("c_name", "n_name", "note")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(filtered.collect().map(_.toString).sorted.toSeq == fLocal &&
      fLocal.nonEmpty, "filtered bushy result must match local")
    // a LEFT OUTER top over a chained right must NOT merge the chain
    // (null-extension does not commute with re-sequencing): partial
    // merge only, never a wrong answer
    val outer = engine.sql(
      """SELECT c_name, n_name, note
         FROM jwire.public.j_customer
         LEFT JOIN (SELECT n_nationkey, n_name, note
                    FROM jwire.public.j_nation
                    JOIN jwire.public.j_dup1 ON n_nationkey = id) nd
           ON c_nationkey = n_nationkey""")
    val outerPlan = outer.queryExecution.optimizedPlan.toString
    assert(countOccurrences(outerPlan, "RelationV2") == 2,
      s"left-outer over a chained right must stay two scans:\n$outerPlan")
    val outerLocal = {
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val n = spark.read.parquet(s"$sf/nation.parquet")
      val d = n.select(col("n_nationkey").as("id"), col("n_name").as("note"))
      c.join(n.join(d, n("n_nationkey") === d("id")),
          c("c_nationkey") === n("n_nationkey"), "left_outer")
        .selectExpr("c_name", "n_name", "note")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(outer.collect().map(_.toString).sorted.toSeq == outerLocal)
  }

  test("joins across attachments with DIFFERENT credentials never merge") {
    attachMain()
    // same server attached twice, but under a DIFFERENT credential
    // object (bearer token vs basic): the rule keys on (target,
    // credential), so this stays two scans — the server would
    // otherwise authorize both tables under one identity's grants
    val tok = server.issueToken("joiner")
    engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS jother " +
      s"WITH (token '$tok')")
    val df = engine.sql(
      """SELECT c_name, o_orderkey
         FROM jwire.public.j_orders JOIN jother.public.j_customer
           ON o_custkey = c_custkey""")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(countOccurrences(plan, "RelationV2") == 2 && !plan.contains("⋈"),
      s"different credentials must not merge into one scan:\n$plan")
    assert(df.count() > 0)
    engine.sql("DETACH jother")
  }

  test("two attachments of ONE peer under ONE identity merge to one scan (r12)") {
    attachMain()
    // ATTACH a; ATTACH b of the same physical peer with the SAME basic
    // credential: the same-peer rule keys on (target, credential) — not
    // the attachment instance — so the cross-mount join folds to ONE
    // remote scan (the reference's federation rule keys on the source)
    if (graft.catalog.Attachments.get(spark, "jwire2").isEmpty)
      engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS jwire2 " +
        "WITH (username 'joiner', password 'join-pw')")
    val df = engine.sql(
      """SELECT c_name, o_orderkey, o_totalprice
         FROM jwire.public.j_orders JOIN jwire2.public.j_customer
           ON o_custkey = c_custkey
         WHERE o_totalprice > 150000.0""")
    val lplan = df.queryExecution.optimizedPlan.toString
    assert(countOccurrences(lplan, "remote(") == 1,
      s"same peer + same credential must merge across attachments:\n$lplan")
    val viaWire = df.collect().map(_.toString).sorted.toSeq
    val local = {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .where("o_totalprice > 150000.0")
        .selectExpr("c_name", "o_orderkey", "o_totalprice")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(viaWire == local && viaWire.nonEmpty)
    // a DIFFERENT user's attachment (even with identical grants) is a
    // different credential: no merge
    if (graft.catalog.Attachments.get(spark, "jwire3").isEmpty)
      engine.sql(s"ATTACH 'graft://localhost:${server.boundPort}' AS jwire3 " +
        "WITH (username 'joiner2', password 'join-pw2')")
    val df2 = engine.sql(
      """SELECT c_name, o_orderkey
         FROM jwire.public.j_orders JOIN jwire3.public.j_customer
           ON o_custkey = c_custkey""")
    val plan2 = df2.queryExecution.optimizedPlan.toString
    assert(countOccurrences(plan2, "RelationV2") == 2 && !plan2.contains("⋈"),
      s"different users must not merge:\n$plan2")
    assert(df2.count() > 0)
    engine.sql("DETACH jwire2")
    engine.sql("DETACH jwire3")
  }

  test("scan snapshots: identical lists reuse one id; redemptions refresh the TTL (r12)") {
    import org.json4s._
    import org.json4s.JsonDSL._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-ttl").toString
    spark.read.parquet(s"$sf/nation.parquet").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val whR = java.nio.file.Files.createTempDirectory("graft-snapttl-wh").toString
    val engR = GraftEngine(spark, whR)
    engR.sql(s"CREATE EXTERNAL TABLE snap_t STORED AS parquet LOCATION '$dir'")
    // TTL 1600 with 900 ms redemption steps: a ~700 ms margin per step
    // — Thread.sleep overshoot under host load flaked the old 800/500
    // (300 ms margin) configuration
    val sR = new RemoteServer(spark, whR, allowAnonymous = true, tokenTtlMs = 1600)
    try {
      def withConn[A](f: (java.io.BufferedInputStream,
          java.io.BufferedOutputStream) => A): A = {
        val sock = new java.net.Socket("localhost", sR.boundPort)
        try {
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          RemoteWire.writeFrame(out, ("op" -> "handshake"))
          assert((RemoteWire.readFrame(in) \ "ok") == JBool(true))
          f(in, out)
        } finally sock.close()
      }
      def snapshotId(): String = withConn { (in, out) =>
        RemoteWire.writeFrame(out,
          ("op" -> "table_version") ~ ("table" -> "snap_t"))
        val resp = RemoteWire.readFrame(in)
        assert((resp \ "ok") == JBool(true))
        RemoteWire.str(resp, "snapshot").getOrElse(
          fail(s"external parquet table must answer a snapshot id: $resp"))
      }
      def ticket(snap: String, part: Int, parts: Int): Either[String, Long] =
        withConn { (in, out) =>
          RemoteWire.writeFrame(out, ("op" -> "scan") ~ ("table" -> "snap_t") ~
            ("snapshot" -> snap) ~ ("part" -> part) ~ ("parts" -> parts) ~
            ("columns" -> JArray(List(JString("n_nationkey")))))
          val resp = RemoteWire.readFrame(in)
          if ((resp \ "ok") != JBool(true))
            Left(RemoteWire.str(resp, "error").getOrElse("unknown"))
          else {
            val alloc = new org.apache.arrow.memory.RootAllocator()
            val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
            var n = 0L
            while (reader.loadNextBatch()) n += reader.getVectorSchemaRoot.getRowCount
            reader.close(); alloc.close()
            Right(n)
          }
        }
      // an identical live file list REUSES the snapshot (a planning
      // loop must not accumulate server heap)
      val a = snapshotId()
      assert(snapshotId() == a, "identical file lists must reuse the live snapshot")
      assert(sR.liveSnapshotCount == 1)
      // redemptions refresh the TTL: 3 × 900 ms of redemptions outlive
      // the 1600 ms deadline a never-redeemed snapshot dies at
      Thread.sleep(900); val r1 = ticket(a, 0, 2)
      assert(r1.isRight, s"first redemption: $r1")
      Thread.sleep(900); assert(ticket(a, 1, 2).isRight,
        "1800 ms in: alive only because the first redemption refreshed")
      Thread.sleep(900); assert(ticket(a, 0, 2).isRight,
        "2700 ms in: every redemption extends the window")
      // an ABANDONED snapshot still sweeps at its own deadline: change
      // the list to mint a fresh id, never redeem it
      spark.read.parquet(s"$sf/nation.parquet").coalesce(1)
        .write.mode("append").parquet(dir)
      val b = snapshotId()
      assert(b != a, "a changed file list is a new snapshot")
      Thread.sleep(2000)
      val dead = ticket(b, 0, 2)
      assert(dead.isLeft && dead.swap.toOption.get.contains("gone"),
        s"an unredeemed snapshot must expire at its deadline: $dead")
    } finally sR.stop()
  }
}
