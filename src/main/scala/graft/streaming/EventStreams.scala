package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming operators over an event stream — capability the
  * reference engine does not have at all (SURVEY §2.12: no watermarks,
  * no stream windows, no stateful ops); this module is part of the
  * engine's beyond-reference surface, built Spark-first:
  * `readStream → transforms → writeStream`, watermarked event-time
  * windows, and `flatMapGroupsWithState` sessionization.
  *
  * Scale notes: every operator here is keyed-state streaming — state
  * lives in the state store partitioned by key, so a 1000-executor
  * cluster shards sessions/windows horizontally; watermarks bound state
  * size by evicting windows/sessions older than the lateness horizon.
  */
object EventStreams {

  /** The events schema as the stream sees it (ts normalized to µs). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet drops. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window counts/sums per event type with a lateness
    * watermark: the canonical streaming aggregation. */
  def windowedCounts(
      events: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming deduplication — the stream-native half of the dedup
    * family ([[graft.operators.Dedup]]): exact duplicate suppression on
    * a key (e.g. content fingerprint) with watermark-bounded state, so
    * a continuous ingestion pipeline holds per-key state only for the
    * lateness horizon instead of forever — the property that keeps a
    * 100 TB/day ingest's state store bounded. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming exact-dedup of a continuous document ingest: running
    * (keeper, copy-count) state per content digest, maintained
    * incrementally across micro-batches — the streaming half of
    * [[graft.operators.Dedup]]'s exact dedup, same canonical-keeper
    * contract (min id). Unlike `dropDuplicates` (whose surviving row
    * depends on arrival order) the min-aggregation is deterministic
    * under any micro-batch split, so the result is oracle-replayable.
    * State is one small row per DISTINCT digest (16-byte key + two
    * counters) — the same footprint the batch dedup's shuffle carries,
    * held in the state store instead. */
  def streamingDocDedup(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("digest"))
      .agg(min(col(idCol)).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Streaming crawl frontier — the continuous-crawl twin of the batch
    * frontier round (outlinks → normalize → url_filter → robots →
    * dedup → visited anti-join): each arriving PAGE contributes its
    * resolved outlinks; candidates normalize, pass the scheme/blocklist
    * gate and per-host robots politeness (stream-static left join —
    * the robots table is per-host, tiny, broadcastable), then enter
    * the frontier's SEEN state (streaming dedup on the normalized URL
    * — a crawler's seen-set is intentionally unbounded: every distinct
    * URL is emitted exactly ONCE across all micro-batches, whatever
    * the trigger split), and finally drop URLs already in the static
    * `visited` table (stream-static left_anti). Output = the NEW
    * frontier, one row per never-seen fetchable URL, in Append mode. */
  def streamingFrontier(pages: DataFrame, urlCol: String, htmlCol: String,
      robots: DataFrame, visited: DataFrame,
      blockHosts: Seq[String] = Nil, agent: String = "*"): DataFrame = {
    import graft.operators.{Robots, TextOps}
    val links = pages
      .select(explode(TextOps.htmlLinks(col(htmlCol), col(urlCol))).as("raw"))
      .select(TextOps.urlNormalize(col("raw")).as("url"))
      .filter(TextOps.urlPass(col("url"), blockHosts = blockHosts))
    // r18 (VERDICT r17 next-round #4): a stream-static join re-executes
    // its static subtree EVERY micro-batch — here that was a full scan +
    // url-normalize of the visited table per trigger. Materializing the
    // projected static side once pins a snapshot for the query's
    // lifetime (the intended visited-set semantics: a crawl round works
    // against the visited set as of round start) and each batch's
    // anti-join probes the materialized rows instead of recomputing the
    // subtree. Result-identical over a static table.
    val visitedOnce =
      if (visited.isStreaming) visited.select(col("url"))
      else graft.operators.Materialize.checkpoint(visited.select(col("url")))
    Robots.filterFrontier(links, "url", robots, "host", "body", agent)
      .dropDuplicates("url")
      .join(visitedOnce, Seq("url"), "left_anti")
  }

  /** Streaming NEAR-duplicate candidates over a continuous document
    * ingest — the streaming twin of [[graft.operators.Dedup]]'s
    * MinHash+LSH path, same signature family (3-shingles, k md5
    * minhashes, k/bands-row bands): each arriving document's band
    * keys route it to keyed buckets; per-bucket state holds the
    * (id, signature) rows seen so far, and every arrival emits one
    * candidate row per stored neighbor with the EXACT count of equal
    * signature components (threshold downstream — the verdict is a
    * stateless aggregate over this candidate stream).
    *
    * Micro-batch-split invariant: a pair (a, b) is emitted exactly
    * once per shared bucket, when the later of the two processes —
    * whether the earlier one sits in state or earlier in the same
    * batch — so any trigger split yields the same DISTINCT pair set.
    * State per bucket is capped at `maxBucket` rows (the streaming
    * twin of the batch hot-bucket cap: a boilerplate band key would
    * otherwise accumulate unbounded state AND quadratic emission);
    * docs arriving after a bucket is full miss candidates from that
    * bucket only — the same approximation the batch cap makes. */
  def streamingNearDupCandidates(docs: DataFrame, textCol: String,
      idCol: String, shingleN: Int = 3, k: Int = 8, bands: Int = 4,
      maxBucket: Int = 1024): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val sigs = graft.operators.Dedup.minhashSignatures(
      docs, textCol, idCol, shingleN, k)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat((b * rows until (b + 1) * rows).map(j => col(s"mh$j")): _*).as("key"))
    }
    val exploded = sigs
      .select(col(idCol).cast("long").as("doc_id"),
        array((0 until k).map(j => col(s"mh$j")): _*).as("sig"),
        explode(array(bandCols: _*)).as("bk"))
      .select(
        concat(col("bk.band").cast("string"), lit("|"), col("bk.key")).as("bucket"),
        col("doc_id"), col("sig"))
      .as[(String, Long, Seq[String])]
    exploded.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Seq[String])], (Long, Long, Int)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[List[(Long, Seq[String])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          // id order inside the batch keeps emission deterministic
          it.toSeq.sortBy(_._2).foreach { case (_, id, sig) =>
            if (!seen.exists(_._1 == id)) {
              seen.foreach { case (oid, osig) =>
                var nEq = 0
                var j = 0
                while (j < sig.length) {
                  if (sig(j) == osig(j)) nEq += 1
                  j += 1
                }
                out += (if (oid < id) (oid, id, nEq) else (id, oid, nEq))
              }
              if (seen.size < maxBucket) seen = (id, sig) :: seen
            }
          }
          state.update(seen)
          out.iterator
      }
      .toDF("a_doc_id", "b_doc_id", "n_eq")
  }

  /** Streaming 64-bit-sketch near-dup — the streaming twin of
    * [[graft.operators.Dedup.hashCandidates]] (image dHash / simhash):
    * each arrival routes to its four 16-bit band buckets; per-bucket
    * state holds the (id, hash) rows seen so far (capped at
    * `maxBucket`), and the arrival emits one candidate per stored
    * neighbor with the EXACT Hamming distance — so the downstream
    * verdict (`dist ≤ k` after a cross-bucket distinct) is a
    * stateless filter over the sink, equal to the batch banding while
    * no bucket hits the cap. The cap is an APPROXIMATION with
    * different semantics from the batch one (same stance as
    * [[streamingNearDupCandidates]]): the batch cap drops a hot
    * bucket entirely, the streaming cap keeps its first `maxBucket`
    * arrivals and keeps matching against them — so past the cap the
    * two paths diverge and emission is no longer split-order
    * independent. Below the cap, emission is micro-batch-split
    * invariant: a pair's candidate row is produced exactly when the
    * later id arrives, whatever batch that is. */
  def streamingHashNearDup(hashes: DataFrame, idCol: String,
      hashCol: String, maxBucket: Int = 1024): DataFrame = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val exploded = hashes
      .select(col(idCol).cast("long").as("id"), col(hashCol).cast("long").as("h"))
      .select(col("id"), col("h"),
        explode(array((0 until 4).map(b =>
          concat(lit(s"$b|"),
            shiftright(col("h"), b * 16).bitwiseAND(0xFFFFL).cast("string"))): _*))
          .as("bucket"))
      .as[(Long, Long, String)]
    exploded.groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, Int)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          // id order inside the batch keeps emission deterministic
          it.toSeq.sortBy(_._1).foreach { case (id, h, _) =>
            if (!seen.exists(_._1 == id)) {
              seen.foreach { case (oid, oh) =>
                val d = java.lang.Long.bitCount(h ^ oh)
                out += (if (oid < id) (oid, id, d) else (id, oid, d))
              }
              if (seen.size < maxBucket) seen = (id, h) :: seen
            }
          }
          state.update(seen)
          out.iterator
      }
      .toDF("a_id", "b_id", "dist")
  }

  /** Sliding-window event rate. */
  def slidingRate(events: DataFrame, window: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Stream-stream inner join within a time bound: right-side rows
    * match a left row iff keys are equal and the right event time falls
    * in [left time, left time + `within`]. BOTH sides carry a watermark
    * and the join condition bounds the time skew, so the state store
    * evicts rows once the other side's watermark passes their horizon —
    * the invariant that keeps a continuous 100 TB/day double-ingest's
    * state finite. Inner-join emission is a set (each match emitted
    * exactly once, whichever micro-batch completes it), so the result
    * is trigger-split invariant as long as the watermark delay covers
    * the replay disorder. */
  def joinWithin(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      leftKey: String, rightKey: String,
      within: String, watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within"),
      "inner")
  }

  /** Stream-static enrichment: join each event against a (small)
    * dimension table. The static side is broadcast so the stream never
    * shuffles — the standard dimension-join shape for a continuous
    * ingest (at 100 TB/day the stream side must stay map-only; a big
    * static side would instead pre-bucket both sides). */
  def enrich(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events(eventKey) === dim(dimKey), "left")

  // --------------------------------------------------- sessionization

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** epoch µs of a timestamp — `getTime` alone is millis and would
    * silently truncate sub-ms gaps (the batch twin
    * [[graft.operators.Sessions]] works in exact µs) */
  private def tsToUs(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def usToTs(u: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization with explicit state: a session closes
    * when a later event for the same user arrives more than `gapMs`
    * after the previous one. Custom state machine via
    * flatMapGroupsWithState — the pattern the reference has no
    * equivalent for. State tracks exact epoch µs, so emitted session
    * bounds carry the events' full timestamp precision and the batch
    * oracle ([[graft.operators.Sessions.gapSessions]]) replays them
    * byte-for-byte.
    *
    * `idleFlush = true` additionally registers a processing-time
    * timeout per user so sessions of users that go silent still emit;
    * leave it off for replay/backfill runs (a timeout-bearing query
    * schedules continuous micro-batches, so drain-style drivers like
    * processAllAvailable never settle). */
  def sessionize(events: Dataset[Event], gapMs: Long,
      idleFlush: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    val timeoutConf =
      if (idleFlush) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, usToTs(s.start),
              usToTs(s.last), s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(e => tsToUs(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = tsToUs(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, usToTs(s.start),
                    usToTs(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (idleFlush) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Run a streaming aggregation to completion over the data already in
    * `dir` (test/batch-replay harness: memory sink + processAllAvailable). */
  def runToMemory(spark: SparkSession, streamed: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    val q = streamed.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** [[runToMemory]] with the state-store partition count right-sized
    * for a SHORT streaming query (r16, generalizing the r15
    * q_stream_join fix): state partitioning locks in at query start
    * from the session conf, and every micro-batch commits EVERY
    * store — at gate scale 32 partitions × a few triggers is hundreds
    * of store commits for a few thousand rows, which IS the cost
    * (measured in BENCH_stream_state.json: the 10× join runs 12.8 s at
    * 4 partitions vs 64.5 s at 32 — commit totals 11 s vs 1343 s). At
    * the 100 TB design point the same knob simply stays high; output
    * rows are partitioning-invariant either way. */
  def runToMemorySized(spark: SparkSession, streamed: DataFrame,
      queryName: String, mode: OutputMode = OutputMode.Complete(),
      stateParts: Int = 4): StreamingQuery = {
    // the query runs under a CLONED session (ADVICE r16): newSession()
    // isolates SQL conf, so the right-sized shuffle-partition setting
    // never leaks to concurrent work sharing the caller's SparkSession
    // (the r16 set-and-restore mutated it for the whole run). The plan
    // rebinds through the ofRows bridge; the memory sink registers its
    // view in the CLONE's temp catalog, so the result — bounded and
    // already driver-resident by the sink's own contract — is mirrored
    // back under the same name, keeping the consumer contract
    // (spark.table(queryName)) unchanged.
    val s2 = graft.GraftSession.configure(spark.newSession())
    s2.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
    val rebound = org.apache.spark.sql.graft.RelationBridge.ofRows(
      s2, streamed.queryExecution.logical)
    val q = runToMemory(s2, rebound, queryName, mode)
    val result = s2.table(queryName)
    spark.createDataFrame(result.collectAsList(), result.schema)
      .createOrReplaceTempView(queryName)
    q
  }
}
