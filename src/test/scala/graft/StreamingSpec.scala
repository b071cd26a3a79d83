package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming operators driven synchronously: a parquet drop of the
  * events table plays through file-source streams into memory sinks,
  * and the windowed results must equal the equivalent batch query. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  lazy val streamDir: String = {
    // stage the events table as the stream input (ts normalized to µs)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts over the stream equal the batch aggregation") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val agg = EventStreams.windowedCounts(stream, "1 day", "1 day")
    val q = EventStreams.runToMemory(spark, agg, "win_counts")
    try {
      val streamed = spark.table("win_counts")
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("event_type"), col("n"))
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment joins a broadcast dimension with no stream shuffle") {
    import spark.implicits._
    val dim = Seq(("click", "interaction"), ("view", "interaction"),
      ("purchase", "conversion")).toDF("etype", "category")
    val stream = EventStreams.readEventStream(spark, streamDir)
    val enriched = EventStreams.enrich(stream, dim, "event_type", "etype")
      .groupBy($"category").agg(count(lit(1)).as("n"))
    val q = enriched.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("enriched").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
      val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
        .join(broadcast(dim), $"event_type" === $"etype", "left")
        .groupBy($"category").agg(count(lit(1)).as("n"))
        .collect().map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
      assert(got == batch)
      assert(got.contains("conversion") && got.contains("NULL")) // signup/error unmatched
    } finally q.stop()
  }

  test("sliding windows produce overlapping buckets") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(spark,
      EventStreams.slidingRate(stream, "2 days", "1 day", "1 day"), "slide_rate")
    try {
      val n = spark.table("slide_rate").count()
      val days = spark.table("slide_rate")
        .select(countDistinct(col("window_start"))).collect()(0).getLong(0)
      assert(n == days)
      assert(n > 1)
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicate keys within the watermark") {
    // duplicate the drop: every event appears twice in the stream input
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream").toString
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir)
    val deduped = EventStreams.dedupStream(stream, Seq("event_id"), "1 day")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000)
      val got = spark.table("dedup_out").count()
      assert(got == ev.count(), s"expected ${ev.count()} unique events, got $got")
    } finally q.stop()
  }

  test("streaming doc dedup maintains keeper/copy-count state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-docdedup-stream").toString
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "alpha"), (3L, "gamma"))
      .toDF("doc_id", "text")
    // several files + maxFilesPerTrigger=1 → the copies of "alpha" can
    // arrive in different micro-batches; state must carry across them
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val agg = EventStreams.streamingDocDedup(stream, "text", "doc_id")
    val q = EventStreams.runToMemory(spark, agg, "docdedup_out")
    try {
      val got = spark.table("docdedup_out")
        .select("digest", "keeper_doc_id", "n_copies").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = docs.groupBy(md5($"text".cast("binary")).as("digest"))
        .agg(min($"doc_id").as("k"), count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"streamed state != batch replay: $got vs $want")
      assert(got.exists(_._3 == 2L), "a duplicated text counts both copies")
    } finally q.stop()
  }

  test("streaming near-dup candidates are micro-batch-split invariant (r9)") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (0L, base),                       // original
      (1L, base),                       // exact copy → n_eq = 8
      (2L, base + " tail1 tail2"),      // near copy → high overlap
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")   // unrelated
    ).toDF("doc_id", "text")
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    def run(nFiles: Int, trigger: Int): Set[(Long, Long, Int)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-neardup-stream").toString
      docs.repartition(nFiles).write.mode("overwrite").parquet(dir)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", trigger).parquet(dir)
      val cands = EventStreams.streamingNearDupCandidates(stream, "text", "doc_id")
      val qn = s"neardup_out_${nFiles}_$trigger"
      val q = EventStreams.runToMemory(spark, cands, qn,
        mode = org.apache.spark.sql.streaming.OutputMode.Append())
      try spark.table(qn).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      finally q.stop()
    }
    val oneShot = run(1, 4)     // everything in one micro-batch
    val split = run(4, 1)       // one file per micro-batch
    assert(oneShot == split,
      s"candidate set must not depend on the trigger split: $oneShot vs $split")
    // the exact copy collides in every band with all components equal
    assert(oneShot.contains((0L, 1L, 8)))
    // the near copy shares most shingles with both originals
    assert(oneShot.exists(p => p._1 == 0L && p._2 == 2L))
    // the unrelated doc collides with nobody
    assert(!oneShot.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("streaming hash near-dup matches the batch banding and is split invariant (r10)") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructType}
    // 64-bit sketches: 2 is hamming-2 from 1; 3 shares no band with 1
    val rows = Seq(
      (1L, 0x1234567890abcdefL),
      (2L, 0x1234567890abcdefL ^ 0x40002L), // bands 2,3 still match
      (3L, 0x0f0f0f0f0f0f0f0fL))
    val df = rows.toDF("media_id", "image_hash")
    val schema = new StructType().add("media_id", LongType).add("image_hash", LongType)
    def run(nFiles: Int, trigger: Int): Set[(Long, Long, Int)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-hashdup-stream").toString
      df.repartition(nFiles).write.mode("overwrite").parquet(dir)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", trigger).parquet(dir)
      val cands = EventStreams.streamingHashNearDup(stream, "media_id", "image_hash")
      val qn = s"hashdup_out_${nFiles}_$trigger"
      val q = EventStreams.runToMemory(spark, cands, qn,
        mode = org.apache.spark.sql.streaming.OutputMode.Append())
      try spark.table(qn).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      finally q.stop()
    }
    val oneShot = run(1, 3)
    val split = run(3, 1)
    assert(oneShot == split,
      s"candidates must not depend on the trigger split: $oneShot vs $split")
    assert(oneShot.contains((1L, 2L, 2)), s"the hamming-2 pair must surface: $oneShot")
    // verdict = stateless filter over the sink, equal to the batch op
    val batch = graft.operators.Dedup.hashCandidates(
        df, "media_id", "image_hash", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(oneShot.filter(_._3 <= 3) == batch,
      s"streaming verdicts must equal the batch banding: $oneShot vs $batch")
  }

  test("stream-stream joinWithin: cross-batch matches emit once; out-of-bound pairs never join") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val views = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = EventStreams.joinWithin(
      views.toDF().toDF("view_id", "view_ts", "user_id"), "view_ts",
      buys.toDF().toDF("buy_id", "buy_ts", "buy_user"), "buy_ts",
      "user_id", "buy_user", within = "1 HOUR", watermark = "1 day")
    val q = joined.select("view_id", "buy_id").writeStream
      .outputMode("append").format("memory").queryName("sj_out").start()
    try {
      // batch 1: a view, no purchase yet
      views.addData((10L, ts(0), 1L))
      q.processAllAvailable()
      assert(spark.table("sj_out").count() == 0)
      // batch 2: in-bound purchase (same user, +30 min) joins the
      // STORED view; a purchase BEFORE the view and one past the hour
      // never join; a different user never joins
      buys.addData((20L, ts(1800), 1L), (21L, ts(-10), 1L),
        (22L, ts(3601), 1L), (23L, ts(1800), 2L))
      q.processAllAvailable()
      val got = spark.table("sj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((10L, 20L)), s"unexpected join output: $got")
      // batch 3: reprocessing adds nothing — each match emits once
      views.addData((11L, ts(7200), 9L))
      q.processAllAvailable()
      assert(spark.table("sj_out").count() == 1)
    } finally q.stop()
  }

  test("gap sessionization: a later-batch event past the gap closes the session") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 60000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
      // batch 1: user 1 has two events 10s apart (one session)
      input.addData(
        EventStreams.Event(1, ts(0), 1L, "click", 1.0),
        EventStreams.Event(2, ts(10), 1L, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0, "session still open")
      // batch 2: an event 10 minutes later closes the first session
      input.addData(EventStreams.Event(3, ts(600), 1L, "click", 5.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
      assert(closed.length == 1)
      assert(closed(0).getAs[Int]("n_events") == 2)
      assert(closed(0).getAs[Double]("total_value") == 3.0)
      assert(closed(0).getAs[java.sql.Timestamp]("session_end") == ts(10))
    } finally q.stop()
  }
}
