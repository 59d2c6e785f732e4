package graft.gtfs

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Duration, ZoneOffset, ZonedDateTime}

/** Bronze ingest: HTTP REST poller + ingest-date-partitioned raw JSON
  * file sink. Reference: /root/reference/gtfsdataingestor.py and the
  * poll loop at main.py:37-46.
  *
  * Ingest is deliberately NOT a Spark job — the reference runs it as
  * a plain driver-side process (SURVEY.md §3.2), and at 1 request /
  * 15 s there is nothing to distribute. The Spark engine picks the
  * files up via `SilverTransform.readBronze` (batch) or
  * `streaming.Streams` (readStream on the same directory layout).
  *
  * @param fetch   transport function (url → body); injectable so unit
  *                tests run without network. Production default uses
  *                java.net.http.HttpClient with a 10 s timeout
  *                (gtfsdataingestor.py:45).
  */
final class Ingest(
    baseUrl: String,
    resourceId: String,
    apiKey: String,
    savePath: String,
    fetch: Option[String => FetchResult] = None,
    sleepMs: Long => Unit = Thread.sleep,
    clock: () => ZonedDateTime = () => ZonedDateTime.now(ZoneOffset.UTC)) {

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** Retryable statuses per the reference's urllib3 Retry config
    * (gtfsdataingestor.py:20-28). */
  private val RetryStatuses = Set(429, 500, 502, 503, 504)
  private val MaxRetries = 3
  private val BackoffFactorSec = 1.0

  /** GET base_url?resource_id=…&apikey=…&type=1 (S1,
    * gtfsdataingestor.py:32-54). Returns None on failure after
    * retries, mirroring the reference's `return None`. */
  def fetchPositions(): Option[String] = {
    val url =
      s"$baseUrl?resource_id=$resourceId&apikey=$apiKey&type=1"
    val doFetch: String => FetchResult = fetch.getOrElse(httpGet)
    var attempt = 0
    while (attempt <= MaxRetries) {
      doFetch(url) match {
        case FetchResult(200, body) => return Some(body)
        case FetchResult(status, _) if RetryStatuses(status) && attempt < MaxRetries =>
          // backoff factor 1 → 1s, 2s, 4s (S2)
          sleepMs((BackoffFactorSec * math.pow(2, attempt) * 1000).toLong)
          attempt += 1
        case _ => return None
      }
    }
    None
  }

  private def httpGet(url: String): FetchResult =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(10)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      FetchResult(resp.statusCode(), resp.body())
    } catch {
      case _: Exception => FetchResult(-1, "")
    }

  /** Raw JSON sink: `<save>/WAW/year=%Y/month=%m/day=%d/
    * WAW_%Y%m%d_%H%M%S.json`, UTC clock (S3,
    * gtfsdataingestor.py:57-67). Returns the written path. */
  def writeRaw(body: String): Path = {
    val now = clock()
    val dir = Paths.get(savePath, "WAW",
      f"year=${now.getYear}%04d", f"month=${now.getMonthValue}%02d",
      f"day=${now.getDayOfMonth}%02d")
    Files.createDirectories(dir)
    val stamp = now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    val file = dir.resolve(s"WAW_$stamp.json")
    Files.write(file, body.getBytes(StandardCharsets.UTF_8))
    file
  }

  /** Poll loop (S4, main.py:39-46): `iterations` polls spaced
    * `intervalSec` apart. Returns number of successful polls. */
  def run(iterations: Int = 49, intervalSec: Int = 15): Int = {
    var ok = 0
    var i = 0
    while (i < iterations) {
      fetchPositions().foreach { body => writeRaw(body); ok += 1 }
      i += 1
      if (i < iterations) sleepMs(intervalSec * 1000L)
    }
    ok
  }
}

final case class FetchResult(status: Int, body: String)
