package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.nd.{NdDataset, NdVariable}
import graft.sources.icechunk.{IcechunkSource, IcechunkStore}
import graft.sources.icechunk.IcechunkStore.Version

/** read_icechunk: versioned Zarr with branch/tag/snapshot selection
  * (semantics per beacon-icechunk/src/{repository,table_function}.rs). */
class IcechunkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def grid(scale: Double): NdDataset =
    NdDataset(Seq("y" -> 4, "x" -> 6), Seq(
      NdVariable("y", Seq("y"), Array(0.0, 1.0, 2.0, 3.0)),
      NdVariable("x", Seq("x"), Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)),
      NdVariable("v", Seq("y", "x"), Array.tabulate(24)(_ * scale))))

  test("flatbuffers wire format: minimal table matches the hand-computed byte layout") {
    import graft.sources.icechunk.FlatBuf
    val b = new FlatBuf.Builder
    b.startTable(); b.slotI32(0, 42); val t = b.endTable()
    val bytes = b.finish(t)
    // hand-derived from the published wire spec: [root uoffset=12][pad]
    // [vtable: size=6, table_size=8, slot0@+4][table: soffset=6][field: 42]
    assert(bytes.toSeq == Seq[Byte](0x0C, 0, 0, 0, 0, 0, 6, 0, 8, 0, 4, 0,
      6, 0, 0, 0, 0x2A, 0, 0, 0))
    val rt = FlatBuf.root(bytes)
    assert(rt.i32(0) == 42)
    assert(rt.i32(1, -7) == -7) // absent slot falls back to the default
  }

  test("flatbuffers: strings, vectors, structs-of-tables, i64 slots round-trip") {
    import graft.sources.icechunk.FlatBuf
    val b = new FlatBuf.Builder
    val inner = (1 to 3).map { i =>
      val s = b.string(s"node-$i")
      b.startTable(); b.slotUOffset(0, s); b.slotI64(1, i * 1000000007L); b.endTable()
    }
    val vec = b.offsetVector(inner)
    val name = b.string("räksmörgås") // multi-byte UTF-8
    val payload = b.byteVector(Array[Byte](9, 8, 7))
    b.startTable()
    b.slotUOffset(0, name)
    b.slotUOffset(1, vec)
    b.slotUOffset(2, payload)
    b.slotF64(3, math.Pi)
    b.slotBool(4, true)
    val root = b.endTable()
    val t = FlatBuf.root(b.finish(root))
    assert(t.str(0).contains("räksmörgås"))
    val v = t.vector(1).get
    assert(v.length == 3)
    assert((0 until 3).map(i => v.tableAt(i).str(0).get) ==
      Seq("node-1", "node-2", "node-3"))
    assert(v.tableAt(2).i64(1) == 3 * 1000000007L)
    assert(t.vector(2).get.bytes.toSeq == Seq[Byte](9, 8, 7))
    assert(t.f64(3) == math.Pi)
    assert(t.bool(4))
    assert(t.str(9).isEmpty && t.vector(9).isEmpty) // out-of-vtable slots
  }

  test("icechunk payloads: zstd+flatbuffers snapshot/manifest round-trip; JSON sniffs as legacy") {
    import graft.sources.icechunk.IcechunkFb
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val snap = JObject(
      "id" -> JString("SNAP0123456789ABCDEF"),
      "parent_id" -> JNull,
      "message" -> JString("first commit"),
      "attributes" -> JObject("title" -> JString("demo")),
      "nodes" -> JArray(List(JObject(
        "name" -> JString("v"),
        "manifest" -> JString("MANI0123456789ABCDEF"),
        "zarr" -> JObject("zarr_format" -> JInt(3), "shape" -> JArray(List(JInt(4))))))))
    val enc = IcechunkFb.encodeSnapshot(snap)
    assert(IcechunkFb.isZstd(enc), "snapshot payload must be a zstd frame")
    val dec = IcechunkFb.decodeSnapshot(enc)
    assert((dec \ "id") == JString("SNAP0123456789ABCDEF"))
    assert((dec \ "parent_id") == JNull)
    assert((dec \ "message") == JString("first commit"))
    assert((dec \ "attributes" \ "title") == JString("demo"))
    assert((dec \ "nodes" \\ "name") == JString("v"))
    assert((dec \ "nodes")(0) \ "zarr" \ "zarr_format" == JInt(3))
    val mf = JObject("id" -> JString("M1"), "chunks" -> JObject(
      "v" -> JObject(
        "0.0" -> JObject("id" -> JString("C1"), "offset" -> JLong(0L), "length" -> JLong(64L)),
        "0.1" -> JObject("id" -> JString("C2"), "offset" -> JLong(64L), "length" -> JLong(64L)))))
    val mdec = IcechunkFb.decodeManifest(IcechunkFb.encodeManifest(mf))
    assert((mdec \ "chunks" \ "v" \ "0.1" \ "offset") == JLong(64L))
    assert((mdec \ "chunks" \ "v" \ "0.0" \ "length") == JLong(64L))
    // legacy JSON payloads (round ≤6 repos) still parse via sniffing
    val legacy = JsonMethods.compact(JsonMethods.render(snap)).getBytes("UTF-8")
    assert((IcechunkFb.decodeSnapshot(legacy) \ "id") == JString("SNAP0123456789ABCDEF"))
  }

  test("icechunk payloads: foreign flatbuffers layouts reject loudly") {
    import graft.sources.icechunk.{FlatBuf, IcechunkFb}
    // a structurally valid flatbuffer with a DIFFERENT schema identity —
    // what a repo written by the real icechunk library looks like to
    // this codec (its slot numbering is unknown here, so decoding it
    // must stop at the identifier gate, never field-walk)
    def foreign(ident: String): Array[Byte] = {
      val b = new FlatBuf.Builder
      val s = b.string("not-a-graft-snapshot")
      b.startTable(); b.slotUOffset(0, s); val root = b.endTable()
      com.github.luben.zstd.Zstd.compress(b.finish(root, ident), 3)
    }
    val e1 = intercept[IllegalArgumentException](
      IcechunkFb.decodeSnapshot(foreign("ICEx")))
    assert(e1.getMessage.contains("foreign layout") &&
      e1.getMessage.contains("'ICEx'") && e1.getMessage.contains("'GFS1'"),
      s"message must name observed and expected identifiers: ${e1.getMessage}")
    // identifier-less buffers (finish without ident) reject too
    def identless(): Array[Byte] = {
      val b = new FlatBuf.Builder
      val s = b.string("x")
      b.startTable(); b.slotUOffset(0, s); val root = b.endTable()
      com.github.luben.zstd.Zstd.compress(b.finish(root), 3)
    }
    val e2 = intercept[IllegalArgumentException](
      IcechunkFb.decodeManifest(identless()))
    assert(e2.getMessage.contains("expected 'GFM1'"))
    // a snapshot fed to the manifest decoder is also a schema mismatch
    val snapBytes = IcechunkFb.encodeSnapshot(
      org.json4s.JObject("id" -> org.json4s.JString("S"),
        "nodes" -> org.json4s.JArray(Nil)))
    val e3 = intercept[IllegalArgumentException](
      IcechunkFb.decodeManifest(snapBytes))
    assert(e3.getMessage.contains("'GFS1'") && e3.getMessage.contains("'GFM1'"))
  }

  test("icechunk: branch tip moves with commits; snapshot/tag stay fixed") {
    val root = java.nio.file.Files.createTempDirectory("graft-icechunk")
    val s1 = IcechunkStore.Writer.commit(root, grid(1.0), message = "v1")
    IcechunkStore.Writer.tag(root, "first", s1)
    val s2 = IcechunkStore.Writer.commit(root, grid(10.0), message = "v2")
    assert(s1 != s2)
    // resolution: main → s2, tag/snapshot → s1
    assert(IcechunkStore.resolve(root.toString, Version()) == s2)
    assert(IcechunkStore.resolve(root.toString, Version(tag = Some("first"))) == s1)
    assert(IcechunkStore.resolve(root.toString, Version(snapshot = Some(s1))) == s1)
    // parent chain records history
    assert(IcechunkStore.openCached(root.toString, Version()).parentId.contains(s1))
    // reads: tip sees v2 data, the tag still serves v1 after the commit
    def sumV(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum("v")).collect()(0).getDouble(0)
    val tip = IcechunkSource.read(spark, root.toString)
    val tagged = IcechunkSource.read(spark, root.toString, tag = Some("first"))
    assert(sumV(tip) == (0 until 24).map(_ * 10.0).sum)
    assert(sumV(tagged) == (0 until 24).map(_ * 1.0).sum)
    assert(tip.count() == 24 && tagged.count() == 24)
  }

  test("icechunk: chunked commits reassemble exactly; chunk = partition; edge chunks pad") {
    val root = java.nio.file.Files.createTempDirectory("graft-icechunk")
    // 4×6 grid in 3×4 chunks → 2×2 chunk grid with padded edges
    IcechunkStore.Writer.commit(root, grid(1.0),
      chunkSizes = Map("y" -> 3, "x" -> 4))
    val repo = IcechunkStore.openCached(root.toString, Version())
    assert(graft.sources.icechunk.IcechunkScanPlanner.partitions(repo, None).size == 4)
    val got = IcechunkSource.read(spark, root.toString)
      .orderBy("y", "x").select("v").collect().map(_.getDouble(0))
    assert(got.toSeq == (0 until 24).map(_.toDouble))
  }

  test("icechunk: two version selectors are an error; a plain dir is not a repository") {
    intercept[IllegalArgumentException] {
      Version(branch = Some("main"), snapshot = Some("X"))
    }
    assert(!IcechunkStore.isRepository(
      java.nio.file.Files.createTempDirectory("notrepo").toString))
    // tags are immutable
    val root = java.nio.file.Files.createTempDirectory("graft-icechunk")
    val s1 = IcechunkStore.Writer.commit(root, grid(1.0))
    IcechunkStore.Writer.tag(root, "t", s1)
    intercept[IllegalArgumentException](IcechunkStore.Writer.tag(root, "t", s1))
  }

  test("icechunk: branch generation filenames order newest-first") {
    import IcechunkStore.{seqGen, seqName}
    val names = (0L to 40L).map(seqName)
    assert(names.distinct.size == names.size)
    assert(names.zipWithIndex.forall { case (n, g) => seqGen(n) == g })
    // lexicographic sort puts the HIGHEST generation first
    assert(seqGen(names.sorted.head) == 40L)
  }

  test("icechunk: reachable through DSL and SQL statement") {
    val root = java.nio.file.Files.createTempDirectory("graft-icechunk")
    IcechunkStore.Writer.commit(root, grid(2.0))
    val viaDsl = graft.dsl.JsonQuery.compile(spark,
      s"""{"select": ["y", "x", "v"], "filter": {"column": "v", "gt": 40.0},
           "from": {"icechunk": {"paths": ["$root"]}}}""")
    assert(viaDsl.count() == 3) // 21*2, 22*2, 23*2 > 40
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val eng = GraftEngine(spark, wh)
    eng.sql(s"CREATE EXTERNAL TABLE ick STORED AS ICECHUNK LOCATION '$root'")
    assert(spark.table("ick").count() == 24)
  }
}
