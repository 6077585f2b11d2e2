package graft.sources

import org.apache.spark.sql.Dataset

/** Distributed fetch stage — the Spark re-expression of the
  * reference's scrape/download workers (web_scrape.py:78-111
  * `multiprocess_downloads`: 3-worker pool, per-worker batch;
  * web_scrape.py:149-178 `download_differentials`: @retry(tries=2) +
  * download validation).
  *
  * Spark-first form: the worker pool IS the executor fleet — keys are
  * partitioned and each partition runs a polite sequential fetch loop
  * with bounded retries and per-partition rate limiting. No driver
  * loop; scaling from 3 workers to 1000 executors is `repartition(n)`.
  *
  * The fetcher is injected (`String => Array[Byte]`, must be
  * serializable; throw to signal failure). This container has no
  * network egress, so production HTTP lives behind that function —
  * specs use deterministic fakes. Results are data, not exceptions:
  * the failure ledger stays in the DataFrame world (the reference logs
  * and drops failures — here they remain queryable, feeding the retry
  * ledger A15).
  */
object ScrapeOps {

  case class FetchResult(
      key: String,
      payload: Array[Byte],
      ok: Boolean,
      attempts: Int,
      error: String)

  /** Fetch every key, at most `maxAttempts` tries each, sleeping
    * `delayMs` between consecutive requests in a partition (the
    * politeness budget per executor slot). */
  def fetchAll(
      keys: Dataset[String],
      fetcher: String => Array[Byte],
      maxAttempts: Int = 3,
      delayMs: Long = 0L): Dataset[FetchResult] = {
    import keys.sparkSession.implicits._
    keys.mapPartitions { it =>
      // Politeness budget: at most one request per delayMs per executor
      // slot, across ALL requests in the partition — first attempts
      // included. A fleet-wide budget is then delayMs / numPartitions.
      var lastRequestAt = Long.MinValue
      def politeWait(): Unit = if (delayMs > 0) {
        val wakeAt = lastRequestAt + delayMs
        val now = System.currentTimeMillis()
        if (wakeAt > now) Thread.sleep(wakeAt - now)
        lastRequestAt = System.currentTimeMillis()
      }
      it.map { key =>
        var attempt = 0
        var result: FetchResult = null
        while (result == null || (!result.ok && attempt < maxAttempts)) {
          attempt += 1
          politeWait()
          result =
            try FetchResult(key, fetcher(key), ok = true, attempt, null)
            catch {
              case e: Exception =>
                FetchResult(key, Array.emptyByteArray, ok = false, attempt,
                  s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
        }
        result
      }
    }
  }
}
