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
