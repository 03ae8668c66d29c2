package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP delivery for subscription forwarding — the Spark-native analog of
  * InfluxDB's subscriber service, which the reference relies on after
  * replicating the CREATE SUBSCRIPTION statement to every node
  * (`/root/reference/service/routing.go:101-126`): each write under the
  * subscribed db.rp is POSTed as line protocol to the destination's
  * InfluxDB-compatible `/write` endpoint.
  *
  * Plain JDK HttpClient — the forward is a driver-side side effect of the
  * ingest statement (batches are small relative to the data path, which
  * stays distributed); failures are spooled by the Engine and replayed,
  * the hinted-handoff pattern the reference uses for replica writes.
  */
object SubscriptionHttp {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5))
    .build()

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")

  /** POST a line-protocol batch to `dest/write?db=&rp=&precision=ns`.
    * True on any 2xx; false on non-2xx, timeout, or connection failure
    * (the caller decides whether to spool). */
  def post(dest: String, db: String, rp: String, body: String): Boolean =
    try {
      val uri = URI.create(
        s"${dest.stripSuffix("/")}/write?db=${enc(db)}&rp=${enc(rp)}&precision=ns")
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofSeconds(10))
        .header("Content-Type", "text/plain; charset=utf-8")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode() / 100 == 2
    } catch { case _: Exception => false }
}
