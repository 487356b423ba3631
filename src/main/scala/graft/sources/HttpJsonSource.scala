package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Retrying JSON-over-HTTP ingestion — the S4 bronze boundary the
  * weekly pipeline crosses before anything else runs (reference:
  * dags/spurs_historic_games.py:138 `@retry(wait_exponential(
  * multiplier=1, min=4, max=10), stop=stop_after_attempt(5))` and the
  * post-success rate-limit pause at :125 `time.sleep(3)`).
  *
  * The retry loop is plain JDK HTTP (no extra dependency), with the
  * tenacity wait law replayed exactly: wait before attempt n+1 is
  * clamp(multiplier·2ⁿ, min, max) — tenacity raises exp_base to the
  * attempt number itself. Sleeping is injectable so specs
  * assert the schedule instead of waiting it out.
  *
  * Two shapes:
  *  - [[readJson]] — one endpoint, driver-side fetch, parsed EXACTLY
  *    like the fixture path (`multiLine` semantics: the body is one
  *    JSON document, a top-level array becomes one row per element).
  *    This is the reference's per-season loop boundary.
  *  - [[fetchJson]] — many endpoints fetched inside `mapPartitions`,
  *    one task per URL slice, each with its own retry loop: the
  *    100 TB-ingest form where thousands of shard URLs spread across
  *    executors and a flaky shard retries alone without failing the
  *    stage.
  */
object HttpJsonSource {

  /** tenacity `wait_exponential(multiplier, min, max)` in ms: the wait
    * AFTER attempt `attempt` (1-based) = clamp(multiplier·2^attempt,
    * min, max) — tenacity's wait_exponential raises exp_base to
    * `attempt_number` itself (not attempt_number−1), so the schedule for
    * (1, min=4, max=10) is 4s, 4s, 8s, 10s, 10s, … */
  private[sources] def backoffMs(attempt: Int, multiplierMs: Long,
      minMs: Long, maxMs: Long): Long =
    math.min(math.max(multiplierMs << math.min(attempt, 40), minMs), maxMs)

  /** Fetch one URL with up to `maxAttempts` attempts; non-2xx and I/O
    * errors both back off and retry. A SUCCESSFUL fetch is followed by
    * the rate-limit pause (the reference sleeps after every API hit to
    * dodge the NBA API limiter, not only on failure). Returns
    * (body, attempts used). */
  def fetchWithRetry(
      url: String,
      maxAttempts: Int = 5,
      multiplierMs: Long = 1000,
      minMs: Long = 4000,
      maxMs: Long = 10000,
      rateLimitMs: Long = 3000,
      sleeper: Long => Unit = Thread.sleep): (String, Int) = {
    require(maxAttempts >= 1, s"need at least one attempt, got $maxAttempts")
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val conn = java.net.URI.create(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(30000)
        try {
          val code = conn.getResponseCode
          if (code >= 200 && code < 300) {
            val body = scala.io.Source
              .fromInputStream(conn.getInputStream, "UTF-8").mkString
            if (rateLimitMs > 0) sleeper(rateLimitMs)
            return (body, attempt)
          } else throw new java.io.IOException(s"HTTP $code from $url")
        } finally conn.disconnect()
      } catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          if (attempt < maxAttempts)
            sleeper(backoffMs(attempt, multiplierMs, minMs, maxMs))
      }
    }
    throw new java.io.IOException(
      s"fetch failed after $maxAttempts attempts: $url", last)
  }

  /** One endpoint → bronze frame, parsed exactly as
    * `spark.read.option("multiLine", true).json(file)` parses the
    * fixture twin — so the HTTP and fixture bronze paths are
    * interchangeable row-for-row (HttpJsonSourceSpec pins it). */
  def readJson(
      spark: SparkSession,
      url: String,
      maxAttempts: Int = 5,
      multiplierMs: Long = 1000,
      minMs: Long = 4000,
      maxMs: Long = 10000,
      rateLimitMs: Long = 3000,
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val (body, _) = fetchWithRetry(url, maxAttempts, multiplierMs, minMs,
      maxMs, rateLimitMs, sleeper)
    import spark.implicits._
    spark.read.json(spark.createDataset(Seq(body)))
  }

  /** Distributed fetch: (url, attempts, body) per input URL, fetched
    * inside the tasks so a many-shard ingest spreads across executors
    * and each flaky URL retries alone. Executors sleep for real —
    * backoff inside a task holds one core, which is the intended
    * pacing behavior for a rate-limited upstream. Parse the `body`
    * column downstream with `spark.read.json` or `from_json` against
    * an explicit schema. */
  def fetchJson(
      spark: SparkSession,
      urls: Seq[String],
      maxAttempts: Int = 5,
      multiplierMs: Long = 1000,
      minMs: Long = 4000,
      maxMs: Long = 10000,
      rateLimitMs: Long = 3000): DataFrame = {
    import spark.implicits._
    val slices = math.max(1, math.min(urls.size, 32))
    spark.createDataset(urls).repartition(slices)
      .mapPartitions { it =>
        it.map { u =>
          val (body, attempts) = fetchWithRetry(u, maxAttempts,
            multiplierMs, minMs, maxMs, rateLimitMs)
          (u, attempts, body)
        }
      }
      .toDF("url", "attempts", "body")
  }
}
