package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime registry of shared, pinned intermediate frames —
  * the batch-side twin of the streaming standing registries
  * (IvfPqServeStream & co. persist a frozen index once and serve from
  * it; this memo does the same for expensive intermediates that many
  * registered BATCH queries re-derive).
  *
  * Motivation (round-16 verdict item 2): the co-purchase graph family
  * (x136/x152/x156/x157/x165) each rebuilt the same
  * `DISTINCT (orderkey, partkey)` self-join pair frame — ~5 rebuilds of
  * the suite's single most expensive intermediate per full pass — and
  * the near-dup family (x33/x56/x90/x91/x104/x107) each rebuilt the
  * same shingle-block pair join. The 100-TB-real shape is an edge/pair
  * table built ONCE and served to every consumer, exactly like a
  * production feature store or the reference's materialized gold
  * tables. Query semantics are unchanged — every consumer reads the
  * same rows it used to derive — so the DuckDB oracles keep their CTE
  * text and the hashes are unaffected.
  *
  * Memory posture: entries are [[graft.plans.Pin.pin]]-materialized
  * once per (session, data dir, key) and live for the session. Only
  * SUB-CORPUS-BOUNDED frames belong here (the round-16 x201 lesson:
  * corpus-token-sized pinned state × hours of same-JVM queries = old-gen
  * pressure that a solo A/B cannot see). The registered frames obey
  * that rule by construction: co-purchase pairs are Σ c(k,2) over
  * per-order item counts (TPC-H bounds k at 7 — ~1.2M rows at sf0.1),
  * and threshold-0.5 near-dup pairs are the near-duplicate EDGE LIST
  * (vastly smaller than the corpus whenever dedup is worth running).
  * Measured pinned sizes per registry are tabulated in SCALE.md
  * ("Registry memory accounting").
  *
  * Lifetime (round-17 verdict item 3): entries for STOPPED sessions
  * are purged on every registry access — a long-lived multi-session
  * embedding that stops sessions no longer accumulates their
  * driver-side plan objects for the JVM lifetime (the pinned executor
  * blocks die with the stopped context regardless; the leak was the
  * driver-side handles). Weak keys were considered and rejected: the
  * memoized DataFrames strongly reference their SparkSession, so a
  * WeakHashMap's own values would keep every key reachable — the weak
  * form never collects. Entries are NOT invalidated by rewriting the
  * files under `dir` within a session — the registry serves the
  * session-lifetime snapshot by design (same contract as the
  * streaming frozen indexes); regenerate data in a fresh session.
  */
object Registries {

  /** Build memo for one frame: the lazy val runs the (Spark-job-sized)
    * build under the holder's own monitor, NEVER under a
    * ConcurrentHashMap bin lock — see [[frame]]. */
  private final class Holder(build: () => DataFrame) {
    lazy val get: DataFrame = build()
  }

  private val cache =
    new ConcurrentHashMap[(SparkSession, String, String), Holder]()

  /** Memoized pinned frame: built + materialized on first access for a
    * given (session, dir, key), served from the pin afterwards.
    * `build` must be a pure function of the tables under `dir` — the
    * key namespace is flat, so include every semantic parameter
    * (threshold, column set) in `key`.
    *
    * Concurrency shape (round-17 advice): the build must NOT run
    * inside `computeIfAbsent`'s mapping function — registry builders
    * legitimately call [[frame]] for their base frames (the serving
    * layouts derive from `coPurchasePairs`), and CHM forbids a mapping
    * function touching other bins (IllegalStateException "Recursive
    * update" when the outer and inner keys land in the same bin),
    * while a Spark-job-sized build under a bin lock would block
    * unrelated same-bin lookups. So: race a cheap empty Holder in with
    * get/putIfAbsent, then run the build under the WINNING holder's
    * lazy-val monitor — each frame still builds exactly once, nested
    * registry lookups recurse freely, and no Spark job ever runs under
    * a map lock. (Cyclic registry dependencies would deadlock two
    * holders — the builders form a DAG by construction.) */
  def frame(spark: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame = {
    purgeStopped()
    val k = (spark, dir, key)
    var h = cache.get(k)
    if (h == null) {
      val fresh = new Holder(() => graft.plans.Pin.pin(build))
      val prior = cache.putIfAbsent(k, fresh)
      h = if (prior == null) fresh else prior
    }
    h.get
  }

  /** Drop entries whose session satisfies `p` — the eviction sweep,
    * parameterized so RegistriesSpec can drive it deterministically
    * (a local-mode test cannot stop the shared SparkContext without
    * killing every other suite). */
  private[graft] def purgeWhere(p: SparkSession => Boolean): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (p(it.next()._1)) it.remove()
  }

  /** The driver-path sweep: a stopped context means the pinned blocks
    * are already gone; the entry is a dead driver-side handle. */
  private def purgeStopped(): Unit =
    purgeWhere(_.sparkContext.isStopped)

  /** Entry count (RegistriesSpec's eviction probe). */
  private[graft] def size: Int = cache.size

  /** Test hook: drop every entry (e.g. between pin-posture phases in
    * PinSpec-style suites). Never called on the driver path. */
  private[graft] def clear(): Unit = cache.clear()
}
