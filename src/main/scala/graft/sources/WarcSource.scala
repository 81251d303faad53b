package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader — the ingestion format of real
  * web crawls (Common Crawl ships ~1 GB WARC shards). Reads a
  * directory/glob of `.warc` / `.warc.gz` files into one row per
  * `response` record: (url, warc_ts, content_type, body), ready to
  * feed [[graft.pipeline.Extract]].
  *
  * Format essentials handled here:
  *   - record = `WARC/1.x` version line + CRLF headers + blank line +
  *     exactly `Content-Length` payload bytes + CRLF CRLF separator
  *   - response payloads are full HTTP responses — the HTTP status
  *     line/headers are stripped at the first blank line and the
  *     entity body is what ships (chunked transfer encoding is
  *     dechunked by the crawler before archiving, per the CC layout)
  *   - `.warc.gz` is a CONCATENATION of per-record gzip members;
  *     `GZIPInputStream` walks members transparently, so one stream
  *     pass covers both the per-record-member and whole-file layouts
  *   - malformed records resync by scanning for the next `WARC/`
  *     marker — one bad record never poisons a 1 GB shard
  *
  * Scale shape: parallelism is FILE-level (Spark's binaryFile source,
  * one task per shard) — exactly how production crawl pipelines
  * process Common Crawl, whose ~1 GB shard size IS the work unit; a
  * 100 TB crawl is ~100k shards → ~100k tasks, no intra-file split
  * needed (and none is possible for concatenated-gzip members without
  * a side index). Records stream through a bounded buffer; only one
  * record's payload is resident per task at a time, and bodies larger
  * than `maxBody` are truncated (crawler-side caps make these rare).
  */
object WarcSource {

  /** One parsed WARC response record. */
  final case class WarcRecord(
      file: String,
      url: String,
      warcTs: String,      // WARC-Date as written (ISO-8601)
      contentType: String, // HTTP Content-Type, "" when absent
      body: Array[Byte])

  /** Read every `response` record under `pathGlob`. */
  def responses(spark: SparkSession, pathGlob: String,
                maxBody: Int = 8 * 1024 * 1024): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseAll(path, bytes, maxBody) }
  }

  /** Adapter to the extraction pipeline's [[graft.pipeline.Page]]
    * shape — a WARC shard glob becomes extraction input directly:
    * `Extract.run(WarcSource.pages(spark, glob))`.
    */
  def pages(spark: SparkSession, pathGlob: String): Dataset[graft.pipeline.Page] = {
    import spark.implicits._
    responses(spark, pathGlob).map { r =>
      val ts = try java.sql.Timestamp.from(java.time.Instant.parse(r.warcTs))
        catch { case _: Exception => new java.sql.Timestamp(0L) }
      graft.pipeline.Page(r.url, ts, r.body, "", "")
    }
  }

  /** Write records as a WARC shard — the sink direction, and the
    * fixture generator for the registry/bench path. `perRecordGzip`
    * writes the Common-Crawl layout (one gzip member per record).
    */
  def writeShardFile(path: String,
                     records: Iterator[(String, java.sql.Timestamp, Array[Byte])],
                     perRecordGzip: Boolean = true): Unit = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path), 64 * 1024)
    try records.foreach { case (url, ts, html) =>
      val payload = new ByteArrayOutputStream()
      payload.write("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".getBytes("US-ASCII"))
      payload.write(html)
      val p = payload.toByteArray
      val head =
        s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$url>\r\n" +
          s"WARC-Date: ${ts.toInstant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString}\r\n" +
          s"Content-Length: ${p.length}\r\n\r\n"
      val rec = new ByteArrayOutputStream()
      rec.write(head.getBytes("US-ASCII"))
      rec.write(p)
      rec.write("\r\n\r\n".getBytes("US-ASCII"))
      if (perRecordGzip) {
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(rec.toByteArray)
        g.finish() // member boundary; the underlying stream stays open
      } else out.write(rec.toByteArray)
    } finally out.close()
  }

  /** Parse one shard's bytes (gzip-sniffed) into response records. */
  private[sources] def parseAll(file: String, bytes: Array[Byte],
                                maxBody: Int): Iterator[WarcRecord] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new BufferedInputStream(new GZIPInputStream(raw), 64 * 1024)
      else new BufferedInputStream(raw, 64 * 1024)
    new RecordIterator(file, in, maxBody)
  }

  /** Streaming record walker: reads header block → Content-Length
    * payload → separator; on any malformed header it scans forward to
    * the next `WARC/` line and resumes.
    */
  private final class RecordIterator(file: String, in: InputStream, maxBody: Int)
      extends Iterator[WarcRecord] {
    private var nextRec: WarcRecord = _
    private var done = false

    private def readLine(): String = {
      // CRLF-terminated header line; EOF mid-line returns what's there
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      if (c < 0) throw new EOFException
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      sb.toString
    }

    private def advance(): Unit = {
      nextRec = null
      try {
        while (nextRec == null) {
          // resync: skip until a WARC/ version line
          var line = readLine()
          while (!line.startsWith("WARC/")) line = readLine()
          // header block
          var url = ""; var ts = ""; var wtype = ""; var clen = -1L
          line = readLine()
          while (line.nonEmpty) {
            val i = line.indexOf(':')
            if (i > 0) {
              val k = line.substring(0, i).trim.toLowerCase
              val v = line.substring(i + 1).trim
              k match {
                case "warc-type" => wtype = v
                case "warc-target-uri" => url = stripAngles(v)
                case "warc-date" => ts = v
                case "content-length" =>
                  clen = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ =>
              }
            }
            line = readLine()
          }
          if (clen < 0) {
            // malformed: loop resyncs at the next WARC/ marker
          } else if (wtype.equalsIgnoreCase("response") && url.nonEmpty) {
            val payload = readFully(clen)
            nextRec = WarcRecord(file, url, ts, httpContentType(payload),
              httpBody(payload))
          } else {
            skipFully(clen) // request/metadata/warcinfo records
          }
        }
      } catch { case _: EOFException => done = true }
    }

    private def readFully(n: Long): Array[Byte] = {
      val keep = math.min(n, maxBody.toLong).toInt
      val buf = new Array[Byte](keep)
      var off = 0
      while (off < keep) {
        val r = in.read(buf, off, keep - off)
        if (r < 0) throw new EOFException
        off += r
      }
      skipFully(n - keep)
      buf
    }

    private def skipFully(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val r = in.skip(left)
        if (r <= 0) { if (in.read() < 0) throw new EOFException else left -= 1 }
        else left -= r
      }
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }

    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }

  private def stripAngles(s: String): String =
    if (s.length >= 2 && s.charAt(0) == '<' && s.charAt(s.length - 1) == '>')
      s.substring(1, s.length - 1)
    else s

  /** The HTTP entity body of a response payload: bytes after the first
    * CRLF CRLF (or LF LF); payloads with no header block (non-HTTP
    * resource records) pass through whole.
    */
  private[sources] def httpBody(payload: Array[Byte]): Array[Byte] = {
    if (!looksHttp(payload)) return payload
    val i = blankLineEnd(payload)
    if (i < 0) Array.emptyByteArray
    else java.util.Arrays.copyOfRange(payload, i, payload.length)
  }

  /** The Content-Type header of a response payload, "" when absent. */
  private[sources] def httpContentType(payload: Array[Byte]): String = {
    if (!looksHttp(payload)) return ""
    val end = blankLineEnd(payload)
    val headText = new String(payload, 0, if (end < 0) payload.length else end, "ISO-8859-1")
    headText.split("\n").iterator.map(_.trim)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim)
      .getOrElse("")
  }

  private def looksHttp(p: Array[Byte]): Boolean =
    p.length >= 5 && p(0) == 'H' && p(1) == 'T' && p(2) == 'T' && p(3) == 'P' && p(4) == '/'

  /** Index just past the first blank line (CRLFCRLF or LFLF), -1 if none. */
  private def blankLineEnd(p: Array[Byte]): Int = {
    var i = 0
    while (i + 1 < p.length) {
      if (p(i) == '\n') {
        if (p(i + 1) == '\n') return i + 2
        if (i + 2 < p.length && p(i + 1) == '\r' && p(i + 2) == '\n') return i + 3
      }
      i += 1
    }
    -1
  }
}
