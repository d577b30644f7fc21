package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** E — stage raw source payloads into a landing directory.
  *
  * Reference behavior (src/extract/main.py:22-55): GET an HTTP API,
  * serialize the whole JSON payload, write it as ONE atomic blob named
  * `data_%Y%m%d_%H%M%S.json` (S1–S3 in SURVEY.md §2.1).
  *
  * Engine stance:
  *  - the fetch is injectable (`fetch: () => String`) — the build env
  *    has zero egress, and at scale the fetch belongs either on the
  *    driver (one small API call, as the reference does) or sharded
  *    across executors via `spark.range(n).mapPartitions` when the
  *    source supports keyed/paged pulls;
  *  - the landing write preserves the reference's single-blob batch
  *    semantics (one file per batch, wall-clock-stamped name) so the
  *    load side can treat each file as one micro-batch (S4).
  */
object Extract {

  private val stamp = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
    .withZone(ZoneOffset.UTC)

  /** Batch filename for a given instant — `data_<ts>.json`, the
    * reference's partition-id convention (src/extract/main.py:36-37). */
  def batchName(at: Instant): String = s"data_${stamp.format(at)}.json"

  /** Fetch one payload and land it as a single atomic blob (write to
    * temp + rename, the same commit pattern Spark's sinks use).
    * Returns the landed file name. */
  def land(fetch: () => String, landingDir: String,
           at: Instant = Instant.now()): String = {
    val payload = fetch()
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    val name = batchName(at)
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    name
  }

  /** Driver-side HTTP fetch for a real deployment (reference S1).
    * Unused in tests — the build environment has no egress. */
  def httpFetch(url: String): () => String = () => {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} from $url")
    resp.body()
  }
}
