package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** HTTP/HTML ingestion pattern (SURVEY S11; reference
  * `src/utils/lib.ts:31-73`: proxied fetch with retry(3), 429
  * backoff-and-retry, 404 -> null, then HTML parse).
  *
  * The engine-side shape: a DataFrame of URLs mapped through a
  * per-partition fetch kernel with bounded retries. The transport is
  * injectable — the zero-egress environment (and unit tests) supply a
  * fake; production supplies a real HTTP client. Fetch results land as
  * nullable body + status so downstream relational logic handles
  * failures declaratively (the reference's null-on-404).
  *
  * Scale posture: fetching is a narrow map stage; per-partition
  * clients amortize connection setup; retries are local to the task so
  * a hot partition doesn't stall the stage.
  */
object Http {

  case class FetchResult(url: String, status: Int, body: Option[String], attempts: Int)

  /** Retrying fetch kernel (reference semantics: up to `maxAttempts`;
    * 429 retries, 404 returns empty body without retrying, other
    * non-2xx retried then surfaced).
    */
  def fetchWithRetry(fetch: String => (Int, String), url: String,
                     maxAttempts: Int = 3): FetchResult = {
    var attempt = 0
    var last: (Int, String) = (0, "")
    while (attempt < maxAttempts) {
      attempt += 1
      last = try fetch(url) catch { case e: Throwable => (-1, e.getMessage) }
      last._1 match {
        case s if s >= 200 && s < 300 => return FetchResult(url, s, Some(last._2), attempt)
        case 404 => return FetchResult(url, 404, None, attempt) // no retry (lib.ts 404 path)
        case _ => () // 429 / 5xx / transport error: retry (lib.ts retry path)
      }
    }
    FetchResult(url, last._1, None, attempt)
  }

  /** Map a URL column through the fetch kernel, one client per
    * partition (`fetchFactory` is created executor-side).
    */
  def fetchAll(urls: Dataset[String],
               fetchFactory: () => String => (Int, String),
               maxAttempts: Int = 3): Dataset[FetchResult] = {
    import urls.sparkSession.implicits._
    urls.mapPartitions { it =>
      val fetch = fetchFactory()
      it.map(u => fetchWithRetry(fetch, u, maxAttempts))
    }
  }
}
