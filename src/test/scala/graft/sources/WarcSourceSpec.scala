package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** WARC reader contracts on synthesized shards: record walking,
  * per-record-gzip-member shards, HTTP header stripping, non-response
  * skipping, malformed-record resync, body truncation, and the
  * end-to-end WARC → pages → extraction path.
  */
class WarcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: Path = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test-warc")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("graft_warc_spec")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (dir != null) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  private def record(wtype: String, url: String, payload: Array[Byte],
                     date: String = "2024-01-02T03:04:05Z",
                     contentLength: Option[Long] = None): Array[Byte] = {
    val head =
      s"""WARC/1.0\r
         |WARC-Type: $wtype\r
         |WARC-Target-URI: <$url>\r
         |WARC-Date: $date\r
         |Content-Length: ${contentLength.getOrElse(payload.length.toLong)}\r
         |\r
         |""".stripMargin
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def httpPayload(body: String, contentType: String = "text/html"): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\nServer: x\r\n\r\n" + body).getBytes(UTF_8)

  private def gz(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(out)
    g.write(b); g.close()
    out.toByteArray
  }

  private def write(name: String, parts: Array[Byte]*): String = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    val p = dir.resolve(name)
    Files.write(p, out.toByteArray)
    p.toString
  }

  test("uncompressed shard: responses parsed, requests/warcinfo skipped, HTTP headers stripped") {
    val path = write("plain.warc",
      record("warcinfo", "urn:x", "software: test".getBytes(UTF_8)),
      record("request", "http://a.example/", "GET / HTTP/1.1\r\n\r\n".getBytes(UTF_8)),
      record("response", "http://a.example/", httpPayload("<html>A</html>")),
      record("response", "http://b.example/", httpPayload("<html>B</html>", "text/plain")))
    val rs = WarcSource.responses(spark, path).collect().sortBy(_.url)
    assert(rs.length == 2)
    assert(rs(0).url == "http://a.example/")
    assert(new String(rs(0).body, UTF_8) == "<html>A</html>")
    assert(rs(0).contentType == "text/html")
    assert(rs(0).warcTs == "2024-01-02T03:04:05Z")
    assert(rs(1).contentType == "text/plain")
  }

  test("concatenated per-record gzip members parse identically to the plain shard") {
    val recs = Seq(
      record("response", "http://a.example/", httpPayload("<html>A</html>")),
      record("response", "http://b.example/", httpPayload("<html>B</html>")))
    val path = write("members.warc.gz", recs.map(gz): _*)
    val rs = WarcSource.responses(spark, path).collect().sortBy(_.url)
    assert(rs.map(_.url).toSeq == Seq("http://a.example/", "http://b.example/"))
    assert(rs.forall(r => new String(r.body, UTF_8).startsWith("<html>")))
  }

  test("malformed record resyncs at the next WARC/ marker; bodies cap at maxBody") {
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <http://bad.example/>\r\nContent-Length: nope\r\n\r\ngarbage".getBytes(UTF_8)
    val path = write("resync.warc",
      bad,
      "\r\n\r\n".getBytes(UTF_8),
      record("response", "http://good.example/", httpPayload("X" * 100)))
    val rs = WarcSource.responses(spark, path, maxBody = 64).collect()
    assert(rs.map(_.url).toSeq == Seq("http://good.example/"))
    // 64-byte cap spans the HTTP headers too, so the kept body is what
    // remains of the cap after header stripping
    assert(rs.head.body.length <= 64)
  }

  test("WARC shard feeds extraction end-to-end") {
    val rdf =
      """<html><body>
        |<script type="application/rdf+xml"><rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="http://ex.example/">
        |<rdf:Description rdf:about="http://ex.example/thing"><ex:name>Thing</ex:name></rdf:Description>
        |</rdf:RDF></script>
        |</body></html>""".stripMargin
    val path = write("extract.warc",
      record("response", "http://page.example/x", httpPayload(rdf)))
    val pages = WarcSource.pages(spark, path)
    assert(pages.head().warc_ts.toInstant.toString == "2024-01-02T03:04:05Z")
    val triples = graft.pipeline.Extract.run(pages).flatMap(_.triple)(
      org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow]).collect()
    assert(triples.exists(t =>
      t.subj == "http://ex.example/thing" && t.pred == "http://ex.example/name" && t.obj == "Thing"),
      triples.mkString("\n"))
  }
}
