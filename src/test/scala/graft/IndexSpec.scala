package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CREATE INDEX family (reference managed-tables.md §CREATE INDEX):
  * btree / bitmap / inverted structures, the SHOW/DROP statements, and
  * the optimizer rule that shrinks scan file lists — correctness AND
  * plan shape (scanned-file counts) are pinned. */
class IndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  lazy val wh: String = java.nio.file.Files.createTempDirectory("graft-idx-wh").toString
  lazy val engine: GraftEngine = GraftEngine(spark, wh)

  /** leaf files actually planned for the query's scan */
  private def scannedFiles(sql: String): Int = {
    val scans = engine.sql(sql).queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }
    assert(scans.nonEmpty, "expected a file scan in the plan")
    scans.sum
  }

  private def count(sql: String): Long =
    engine.sql(sql).collect()(0).getLong(0)

  test("build: 8-file table, one index of each kind") {
    // 8 exact files (CTAS + 7 single-file appends): file i holds ids
    // [1000i, 1000(i+1)), cat = i, text tokens distinct per file
    def slice(i: Int) = spark.range(i * 1000L, (i + 1) * 1000L).select(
      col("id"),
      lit(i).as("cat"),
      lit(s"alpha beta tok$i").as("text")).coalesce(1)
    engine.catalog.createManagedTable("idx_t", slice(0))
    (1 until 8).foreach(i => engine.catalog.insertInto("idx_t", slice(i)))
    engine.sql("CREATE INDEX ON idx_t (id) USING btree")
    engine.sql("CREATE INDEX cat_idx ON idx_t (cat) USING bitmap")
    engine.sql("CREATE INDEX txt_idx ON idx_t (text) USING inverted")
    val shown = engine.sql("SHOW INDEXES ON idx_t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(shown == Set(
      ("id_idx", "id", "btree"),
      ("cat_idx", "cat", "bitmap"),
      ("txt_idx", "text", "inverted")))
  }

  test("btree prunes ranges; results identical") {
    assert(count("SELECT count(*) FROM idx_t WHERE id < 1000") == 1000L)
    assert(scannedFiles("SELECT * FROM idx_t WHERE id < 1000") == 1)
    assert(scannedFiles("SELECT * FROM idx_t WHERE id >= 6000") == 2)
    assert(count("SELECT count(*) FROM idx_t WHERE id BETWEEN 2500 AND 3499") == 1000L)
    assert(scannedFiles("SELECT * FROM idx_t WHERE id BETWEEN 2500 AND 3499") == 2)
  }

  test("bitmap prunes equality; inverted prunes contains/LIKE") {
    assert(count("SELECT count(*) FROM idx_t WHERE cat = 3") == 1000L)
    assert(scannedFiles("SELECT * FROM idx_t WHERE cat = 3") == 1)
    assert(count("SELECT count(*) FROM idx_t WHERE text LIKE '%tok5%'") == 1000L)
    assert(scannedFiles("SELECT * FROM idx_t WHERE text LIKE '%tok5%'") == 1)
    assert(scannedFiles("SELECT * FROM idx_t WHERE contains(text, 'tok7')") == 1)
    // every file holds 'alpha' — nothing prunes, nothing breaks
    assert(scannedFiles("SELECT * FROM idx_t WHERE text LIKE '%alpha%'") == 8)
    // non-token-shaped pattern: conservatively unpruned
    assert(scannedFiles("SELECT * FROM idx_t WHERE text LIKE '%alpha beta%'") == 8)
  }

  test("conjunctions combine indexes; untouched filters never over-prune") {
    assert(count("SELECT count(*) FROM idx_t WHERE id < 2000 AND cat = 0") == 1000L)
    assert(scannedFiles("SELECT * FROM idx_t WHERE id < 2000 AND cat = 0") == 1)
    // OR is not a conjunct — no pruning, correct rows
    assert(count("SELECT count(*) FROM idx_t WHERE id < 500 OR cat = 7") == 1500L)
    assert(scannedFiles("SELECT * FROM idx_t WHERE id < 500 OR cat = 7") == 8)
  }

  test("stale index is conservative: un-indexed files always survive") {
    engine.sql("INSERT INTO idx_t SELECT id + 8000, 99, 'omega tok99' FROM idx_t WHERE id < 100")
    // new file is unknown to every index: kept by all of them
    assert(count("SELECT count(*) FROM idx_t WHERE cat = 99") == 100L)
    assert(count("SELECT count(*) FROM idx_t WHERE id >= 8000") == 100L)
    assert(count("SELECT count(*) FROM idx_t WHERE text LIKE '%tok99%'") == 100L)
    // old files still prune; the unknown file rides along
    assert(scannedFiles("SELECT * FROM idx_t WHERE cat = 3") == 2)
    // rebuild restores exact pruning
    engine.sql("CREATE INDEX cat_idx ON idx_t (cat) USING bitmap")
    assert(scannedFiles("SELECT * FROM idx_t WHERE cat = 3") == 1)
    assert(scannedFiles("SELECT * FROM idx_t WHERE cat = 99") == 1)
  }

  test("restart: persisted index definitions prune in a fresh engine") {
    val e2 = GraftEngine(spark, wh)
    e2.restore()
    val scans = e2.sql("SELECT * FROM idx_t WHERE cat = 99")
      .queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.relation.location.inputFiles.length
      }.sum
    assert(scans == 1)
    assert(e2.sql("SELECT count(*) FROM idx_t WHERE cat = 99").collect()(0).getLong(0) == 100L)
  }

  test("DROP INDEX removes pruning for that column only") {
    engine.sql("DROP INDEX id_idx ON idx_t")
    assert(engine.sql("SHOW INDEXES ON idx_t").count() == 2)
    assert(scannedFiles("SELECT * FROM idx_t WHERE id < 1000") == 9)
    assert(count("SELECT count(*) FROM idx_t WHERE id < 1000") == 1000L)
    assert(scannedFiles("SELECT * FROM idx_t WHERE cat = 3") == 1)
  }

  test("glob-defined EXTERNAL tables prune too (multi-root scan resolution)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-ext")
    (0 until 6).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).selectExpr("id AS v")
        .coalesce(1).write.parquet(s"$dir/f$i")
    }
    // flatten the part files into one glob-addressable directory
    val flat = java.nio.file.Files.createDirectory(dir.resolve("flat"))
    (0 until 6).foreach { i =>
      val part = new java.io.File(s"$dir/f$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, flat.resolve(s"g$i.parquet"))
    }
    engine.sql(s"CREATE EXTERNAL TABLE idx_ext STORED AS parquet LOCATION '$flat/*.parquet'")
    engine.sql("CREATE INDEX ON idx_ext (v) USING btree")
    assert(count("SELECT count(*) FROM idx_ext WHERE v < 100") == 100L)
    assert(scannedFiles("SELECT * FROM idx_ext WHERE v < 100") == 1)
    assert(scannedFiles("SELECT * FROM idx_ext WHERE v >= 400") == 2)
  }

  test("in-place overwrite: mismatched (size, mtime) vetoes pruning (ADVICE r8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-ow")
    def writeFile(lo: Long, hi: Long, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-idx-ow-tmp")
      spark.range(lo, hi).selectExpr("id AS v").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, dir.resolve(name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeFile(0, 100, "a.parquet")
    writeFile(100, 200, "b.parquet")
    writeFile(200, 300, "c.parquet")
    engine.sql(s"CREATE EXTERNAL TABLE idx_ow STORED AS parquet LOCATION '$dir/*.parquet'")
    engine.sql("CREATE INDEX ON idx_ow (v) USING btree")
    assert(scannedFiles("SELECT * FROM idx_ow WHERE v >= 200") == 1)
    // overwrite a.parquet IN PLACE: same path, new range [200, 300)
    writeFile(200, 300, "a.parquet")
    spark.catalog.refreshTable("idx_ow") // standard Spark contract after external rewrite
    // the index's record for a.parquet says [0,100) — without the
    // (size, mtime) validity check it would be wrongly pruned here
    assert(count("SELECT count(*) FROM idx_ow WHERE v >= 200") == 200L)
    assert(scannedFiles("SELECT * FROM idx_ow WHERE v >= 200") == 2)
    // untouched files still prune (c drops); the rewritten file is
    // permanently unknown until rebuild, so it rides along with b
    assert(scannedFiles("SELECT * FROM idx_ow WHERE v BETWEEN 100 AND 199") == 2)
    // rebuild restores exact pruning over the new contents
    engine.sql("CREATE INDEX v_idx ON idx_ow (v) USING btree")
    assert(scannedFiles("SELECT * FROM idx_ow WHERE v BETWEEN 100 AND 199") == 1)
    assert(scannedFiles("SELECT * FROM idx_ow WHERE v >= 200") == 2)
  }

  test("identical predicates memoize the distributed verdict (r8)") {
    import graft.plans.IndexPruneRule
    def plan(sql: String): Unit = { engine.sql(sql).queryExecution.optimizedPlan; () }
    plan("SELECT * FROM idx_t WHERE cat = 5") // first sight may compute
    val warm = IndexPruneRule.verdictComputations.get
    plan("SELECT * FROM idx_t WHERE cat = 5")
    plan("SELECT * FROM idx_t WHERE cat = 5")
    assert(IndexPruneRule.verdictComputations.get == warm,
      "re-planning an identical predicate must not re-run the verdict job")
    // the cached verdict still prunes to one file
    assert(scannedFiles("SELECT * FROM idx_t WHERE cat = 5") == 1)
    // a plan with two eligible Filter nodes on the same predicate
    // computes at most once
    val b2 = IndexPruneRule.verdictComputations.get
    plan("SELECT * FROM idx_t WHERE cat = 6 UNION ALL SELECT * FROM idx_t WHERE cat = 6")
    assert(IndexPruneRule.verdictComputations.get <= b2 + 1)
    // a genuinely new predicate does compute
    val b3 = IndexPruneRule.verdictComputations.get
    plan("SELECT * FROM idx_t WHERE cat = 7")
    assert(IndexPruneRule.verdictComputations.get == b3 + 1)
  }

  test("token_match exact probe is range-bounded over sorted postings (r8)") {
    def slice(i: Int) = spark.range(0, 100)
      .selectExpr(s"id + ${i * 100} AS n")
      .selectExpr("n AS id", "format_string('w%03d', n) AS words").coalesce(1)
    engine.catalog.createManagedTable("idx_inv", slice(0))
    (1 until 4).foreach(i => engine.catalog.insertInto("idx_inv", slice(i)))
    engine.sql("CREATE INDEX ON idx_inv (words) USING inverted")
    // whole-token match: exact semantics, prunes to the one file
    assert(count("SELECT count(*) FROM idx_inv WHERE token_match(words, 'w250')") == 1L)
    assert(scannedFiles("SELECT * FROM idx_inv WHERE token_match(words, 'w250')") == 1)
    // and it never matches substrings (unlike contains)
    assert(count("SELECT count(*) FROM idx_inv WHERE token_match(words, 'w25')") == 0L)
    assert(count("SELECT count(*) FROM idx_inv WHERE contains(words, 'w25')") == 10L)
    assert(scannedFiles("SELECT * FROM idx_inv WHERE contains(words, 'w25')") == 1)
    // bounded-read contract: the exact probe consults only the postings
    // part-files whose token range covers the term
    val dir = engine.catalog.indexDataDir("idx_inv", "words_idx")
    val (cands, total) = graft.catalog.Indexes.invertedProbeFootprint(spark, dir, "w250")
    assert(total >= 2 && cands.length < total,
      s"expected a bounded probe, got ${cands.length} of $total postings parts")
  }

  test("bitmap refuses high-cardinality columns, loudly") {
    val wide = spark.range(0, 20000).select(col("id"), col("id").cast("string").as("s"))
    engine.catalog.createManagedTable("idx_wide", wide.repartition(2))
    val e = intercept[IllegalArgumentException] {
      engine.sql("CREATE INDEX ON idx_wide (s) USING bitmap")
    }
    assert(e.getMessage.contains("btree"))
  }
}
