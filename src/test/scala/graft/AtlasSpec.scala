package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.nd.{NdDataset, NdVariable}
import graft.sources.atlas.{AtlasScanPlanner, AtlasSource, AtlasSpec => Spec, AtlasStore}

/** read_atlas: chunked array store with named datasets, rank-0 attribute
  * columns, supercast collection union and stored-statistics dataset
  * pruning (semantics per beacon-arrow-atlas/src/reader.rs — including
  * its test_support fixtures, rebuilt here with our writer since the
  * reference ships no on-disk atlas fixture). */
class AtlasSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def freshStore(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-atlas")

  /** reader.rs build_two_dataset_store: winter{temperature[4], cycle[4]
    * fill=-1; season, year} + summer{temperature[3]; season} */
  private def buildTwoDatasetStore(root: java.nio.file.Path): Unit = {
    AtlasStore.Writer.writeDataset(root, "winter",
      NdDataset(Seq("obs" -> 4), Seq(
        NdVariable("temperature", Seq("obs"), Array(1.0, 2.0, 3.0, 4.0)),
        NdVariable("cycle", Seq("obs"), Array(10.0, 20.0, -1.0, 40.0),
          attrs = Map("_FillValue" -> "-1.0", "units" -> "count")))),
      attrs = Map("season" -> "winter", "year" -> "2024"))
    AtlasStore.Writer.writeDataset(root, "summer",
      NdDataset(Seq("obs" -> 3), Seq(
        NdVariable("temperature", Seq("obs"), Array(20.0, 21.0, 22.0)))),
      attrs = Map("season" -> "summer"))
  }

  test("atlas: arrays, rank-0 attributes and per-array attrs become columns") {
    val root = freshStore()
    buildTwoDatasetStore(root)
    val winter = AtlasSource.read(spark, root.toString, Some("winter"))
    // _FillValue rides as an attribute column — the engine-wide ND
    // convention (same as the zarr/netcdf flatten surface)
    assert(winter.schema.fieldNames.toSet ==
      Set("temperature", "cycle", "cycle.units", "cycle._FillValue", "season", "year"))
    val rows = winter.orderBy("temperature").collect()
    def at(r: org.apache.spark.sql.Row, c: String) = r.get(r.fieldIndex(c))
    assert(rows.map(at(_, "temperature")).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    // fill value -1 decodes to NULL through the shared CF path
    assert(rows.map(at(_, "cycle")).toSeq == Seq(10.0, 20.0, null, 40.0))
    assert(rows.forall(at(_, "season") == "winter"))
    assert(rows.forall(at(_, "year") == "2024"))
    assert(rows.forall(at(_, "cycle.units") == "count"))
  }

  test("atlas: whole-store scan is the supercast union of datasets") {
    val root = freshStore()
    buildTwoDatasetStore(root)
    val all = AtlasSource.read(spark, root.toString)
    assert(all.count() == 7) // winter 4 + summer 3
    // summer lacks cycle and year: null-filled
    val summerRows = all.filter(col("season") === "summer").collect()
    assert(summerRows.length == 3)
    assert(summerRows.forall(r => r.isNullAt(r.fieldIndex("cycle"))))
    assert(summerRows.forall(r => r.isNullAt(r.fieldIndex("year"))))
  }

  test("atlas: stored statistics prune whole datasets (reader.rs build_ranged_store)") {
    val root = freshStore()
    // dataset d_i covers temperature [10i, 10i+3]
    (0 until 5).foreach { i =>
      AtlasStore.Writer.writeDataset(root, s"d$i",
        NdDataset(Seq("obs" -> 4), Seq(
          NdVariable("temperature", Seq("obs"),
            Array.tabulate(4)(j => 10.0 * i + j)))))
    }
    // planner: temperature > 31 can only match d3 (30..33) and d4 (40..43)
    val gt31 = Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThan("temperature", 31.0))
    assert(AtlasScanPlanner.partitions(Spec(root.toString, "d0", None), gt31).isEmpty)
    assert(AtlasScanPlanner.partitions(Spec(root.toString, "d2", None), gt31).isEmpty)
    assert(AtlasScanPlanner.partitions(Spec(root.toString, "d3", None), gt31).nonEmpty)
    assert(AtlasScanPlanner.partitions(Spec(root.toString, "d4", None), gt31).nonEmpty)
    // end-to-end: pruned datasets open no chunk files, answer still right
    AtlasStore.chunkReads.set(0)
    val got = AtlasSource.read(spark, root.toString)
      .filter(col("temperature") > 31.0)
      .select("temperature").collect().map(_.getDouble(0)).sorted
    assert(got.toSeq == Seq(32.0, 33.0, 40.0, 41.0, 42.0, 43.0))
    // only d3 + d4 scan (1 array × 1 chunk each); d0-d2 never open data
    assert(AtlasStore.chunkReads.get() <= 2,
      s"pruned datasets opened chunks: ${AtlasStore.chunkReads.get()} reads")
    // fail-open: a filter on a column with no statistics keeps everything
    val unknown = Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThan("nope", 0.0))
    assert(AtlasScanPlanner.partitions(Spec(root.toString, "d0", None), unknown).nonEmpty)
  }

  test("atlas: multi-dim chunked arrays reassemble exactly; chunk = partition") {
    val root = freshStore()
    // 4×6 grid in 2×3 chunks → 4 chunk files, 4 partitions
    val data = Array.tabulate(24)(_.toDouble)
    AtlasStore.Writer.writeDataset(root, "grid",
      NdDataset(Seq("y" -> 4, "x" -> 6), Seq(
        NdVariable("v", Seq("y", "x"), data),
        NdVariable("y", Seq("y"), Array(0.0, 1.0, 2.0, 3.0)),
        NdVariable("x", Seq("x"), Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)))),
      chunkSizes = Map("y" -> 2, "x" -> 3))
    val parts = AtlasScanPlanner.partitions(Spec(root.toString, "grid", None), Array.empty)
    assert(parts.size == 4)
    val df = AtlasSource.read(spark, root.toString, Some("grid"))
    val got = df.orderBy("y", "x").select("v").collect().map(_.getDouble(0))
    assert(got.toSeq == data.toSeq)
    // projection that skips v never opens v's chunks
    AtlasStore.chunkReads.set(0)
    assert(df.select("y").distinct().count() == 4)
    assert(AtlasStore.chunkReads.get() <= 8, "column pruning failed to skip array chunks")
  }

  test("atlas: coordinate predicates prune chunk regions within a dataset") {
    val root = freshStore()
    // y is a 1-D coordinate (named like its dim), 16 cells in 4 chunks
    AtlasStore.Writer.writeDataset(root, "grid",
      NdDataset(Seq("y" -> 16, "x" -> 2), Seq(
        NdVariable("y", Seq("y"), Array.tabulate(16)(_.toDouble)),
        NdVariable("v", Seq("y", "x"), Array.tabulate(32)(_.toDouble)))),
      chunkSizes = Map("y" -> 4, "x" -> 2))
    val all = AtlasScanPlanner.partitions(Spec(root.toString, "grid", None), Array.empty)
    assert(all.size == 4)
    // y >= 12 can only live in the last y-chunk
    val pruned = AtlasScanPlanner.partitions(Spec(root.toString, "grid", None),
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("y", 12.0)))
    assert(pruned.size == 1, s"expected 1 region after coord pruning")
    // and the pruned scan still answers correctly end-to-end
    val got = AtlasSource.read(spark, root.toString, Some("grid"))
      .filter(col("y") >= 12.0).count()
    assert(got == 8) // 4 rows of y × 2 of x
  }

  test("atlas: string arrays round-trip with nulls") {
    val root = freshStore()
    AtlasStore.Writer.writeDataset(root, "s",
      NdDataset(Seq("obs" -> 3), Seq(
        NdVariable("name", Seq("obs"), null, sdata = Array("a", null, "c")),
        NdVariable("k", Seq("obs"), Array(1.0, 2.0, 3.0)))))
    val rows = AtlasSource.read(spark, root.toString, Some("s"))
      .orderBy("k").select("name").collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ==
      Seq("a", null, "c"))
  }
}
