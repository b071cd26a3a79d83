package graft.catalog

import java.lang.ref.WeakReference
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import java.util.concurrent.locks.ReentrantLock

import org.apache.spark.sql.DataFrame

/** Background crawler triggers — the scheduling half of the reference's
  * crawler manager (beacon-core/src/crawler/manager.rs): persisted
  * crawlers run on a timer when a `schedule` WITH option is present;
  * scheduled and manual (`RUN CRAWLER name`) triggers of the same
  * crawler are SERIALIZED by a per-crawler run lock so they never race
  * (manager.rs:44 `run_lock`); an `event_driven` crawler with no
  * explicit schedule falls back to the default poll interval so it is
  * not silently inert (manager.rs `apply_event_driven_fallback`,
  * default 900 s — beacon-common/src/crawler_config.rs:26); the first
  * immediate tick is consumed so a freshly created crawler does not
  * fire instantly (manager.rs `spawn_scheduled`: `ticker.tick()` before
  * the loop); background tasks hold only a weak reference to the
  * catalog, so a collected catalog cancels its triggers rather than
  * pinning it (manager.rs:4 "Background tasks hold a Weak").
  *
  * Timer tasks share one daemon thread: a crawl pass is a Spark job and
  * the engine serializes per-crawler anyway, so a wider pool would only
  * let DIFFERENT crawlers overlap — acceptable to lose; re-listing a
  * prefix is cheap relative to interval granularity.
  */
object CrawlerScheduler {

  /** WITH keys consumed by scheduling, not by the crawl pass itself
    * (the reference's CONTROL_KEYS split, crawler/definition.rs:24). */
  val ControlKeys: Set[String] = Set("schedule", "event_driven")

  private val pool = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-crawler-scheduler")
    t.setDaemon(true)
    t
  }

  private final class Entry(@volatile var catalog: WeakReference[GraftCatalog]) {
    val runLock = new ReentrantLock()
    val passes = new AtomicLong(0)
    private val active = new AtomicInteger(0)
    @volatile var maxActive = 0
    @volatile var task: ScheduledFuture[_] = null
    @volatile var scheduleSecs: Option[Long] = None

    def enter(): Unit = {
      val a = active.incrementAndGet()
      if (a > maxActive) maxActive = a
    }
    def exit(): Unit = active.decrementAndGet()
  }

  private val entries = new ConcurrentHashMap[String, Entry]()

  private def key(warehouse: String, name: String) = s"$warehouse\u0000$name"

  private def entry(catalog: GraftCatalog, name: String): Entry = {
    val e = entries.computeIfAbsent(key(catalog.warehouse, name),
      _ => new Entry(new WeakReference(catalog)))
    if (e.catalog.get() == null) e.catalog = new WeakReference(catalog)
    e
  }

  /** `'30s' | '5m' | '2h' | '1d' | '45'` (bare = seconds) → seconds.
    * The reference's parse_duration_secs (crawler/definition.rs:156). */
  def parseSchedule(v: String): Long = {
    val t = v.trim.toLowerCase
    require(t.nonEmpty, "empty schedule")
    val (num, mult) = t.last match {
      case 's' => (t.dropRight(1), 1L)
      case 'm' => (t.dropRight(1), 60L)
      case 'h' => (t.dropRight(1), 3600L)
      case 'd' => (t.dropRight(1), 86400L)
      case _   => (t, 1L)
    }
    val n = try num.trim.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"invalid schedule '$v' (use e.g. '30s', '5m', '2h')")
    }
    require(n > 0, s"schedule '$v' must be positive")
    n * mult
  }

  /** Effective poll interval: explicit `schedule`, else the
    * event-driven fallback, else none (on-demand only). */
  def effectiveScheduleSecs(catalog: GraftCatalog,
      options: Map[String, String]): Option[Long] = {
    val explicit = options.get("schedule").map(parseSchedule)
    val eventDriven = options.get("event_driven").exists(_.trim.toBoolean)
    explicit.orElse(if (eventDriven) Some(defaultIntervalSecs(catalog)) else None)
  }

  private def defaultIntervalSecs(catalog: GraftCatalog): Long =
    catalog.spark.conf.getOption("graft.crawler.default_interval_secs")
      .map(_.toLong).getOrElse(900L)

  private def schedulingEnabled(catalog: GraftCatalog): Boolean =
    catalog.spark.conf.getOption("graft.crawler.scheduling.enabled")
      .forall(_.toBoolean)

  /** (Re)start a crawler's trigger: cancel any prior task, then — when
    * the subsystem is enabled and a schedule applies — arm a
    * fixed-delay timer whose first firing is one full period out. */
  def start(catalog: GraftCatalog, name: String,
      options: Map[String, String]): Unit = {
    val e = entry(catalog, name)
    val secs = effectiveScheduleSecs(catalog, options) // validates eagerly
    synchronized {
      if (e.task != null) { e.task.cancel(false); e.task = null }
      e.scheduleSecs = secs
      if (schedulingEnabled(catalog)) secs.foreach { s =>
        val k = key(catalog.warehouse, name)
        val millis = math.max(1L, s * 1000L)
        e.task = pool.scheduleWithFixedDelay(
          () => tick(k, name), millis, millis, TimeUnit.MILLISECONDS)
      }
    }
  }

  /** One scheduled firing: resolve the catalog through the weak edge
    * (cancelling the timer if it was collected or the definition is
    * gone) and run the pass serialized with manual triggers. Errors are
    * swallowed so one failed listing doesn't kill the timer. */
  private def tick(k: String, name: String): Unit = {
    val e = entries.get(k)
    if (e == null) return
    val cat = e.catalog.get()
    if (cat == null || !cat.crawlers().exists(_.name == name)) {
      synchronized { if (e.task != null) { e.task.cancel(false); e.task = null } }
      return
    }
    try runSerialized(cat, name)
    catch { case _: Throwable => () }
  }

  /** Run one pass under the crawler's run lock — the path BOTH manual
    * `RUN CRAWLER name` and the timer go through, so triggers never
    * overlap. Returns the registration report. */
  def runSerialized(catalog: GraftCatalog, name: String): DataFrame = {
    val d = catalog.crawlerDef(name)
    val e = entry(catalog, name)
    e.runLock.lock()
    try {
      e.enter()
      try {
        val out = Crawler.run(catalog.spark, catalog, d.paths.head,
          d.options -- ControlKeys)
        e.passes.incrementAndGet()
        out
      } finally e.exit()
    } finally e.runLock.unlock()
  }

  /** Stop triggers (DROP CRAWLER / replaced definition). */
  def stop(warehouse: String, name: String): Unit = synchronized {
    val e = entries.remove(key(warehouse, name))
    if (e != null && e.task != null) e.task.cancel(false)
  }

  // ---- observability (SHOW CRAWLERS + specs)

  def scheduleOf(warehouse: String, name: String): Option[Long] =
    Option(entries.get(key(warehouse, name))).flatMap(_.scheduleSecs)

  def completedPasses(warehouse: String, name: String): Long =
    Option(entries.get(key(warehouse, name))).map(_.passes.get).getOrElse(0L)

  /** High-water mark of concurrently executing passes — the no-race
    * pin: must never exceed 1. */
  def maxConcurrent(warehouse: String, name: String): Int =
    Option(entries.get(key(warehouse, name))).map(_.maxActive).getOrElse(0)
}
