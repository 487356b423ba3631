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
  * pressure that a solo A/B cannot see). The two registered frames obey
  * that rule by construction: co-purchase pairs are Σ c(k,2) over
  * per-order item counts (TPC-H bounds k at 7 — ~1.2M rows at sf0.1),
  * and threshold-0.5 near-dup pairs are the near-duplicate EDGE LIST
  * (vastly smaller than the corpus whenever dedup is worth running).
  */
object Registries {

  private val cache =
    new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Memoized pinned frame: built + materialized on first access for a
    * given (session, dir, key), served from the pin afterwards.
    * `build` must be a pure function of the tables under `dir` — the
    * key namespace is flat, so include every semantic parameter
    * (threshold, column set) in `key`. */
  def frame(spark: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark, dir, key),
      _ => graft.plans.Pin.pin(build))

  /** Test hook: drop every entry (e.g. between pin-posture phases in
    * PinSpec-style suites). Never called on the driver path. */
  private[graft] def clear(): Unit = cache.clear()
}
