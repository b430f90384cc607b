package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException}
import java.util.zip.GZIPInputStream

/** One raw WARC/1.0 record: the envelope headers the corpus surfaces
  * care about plus the UNDECODED payload octets. [[Wet]] decodes the
  * payload as UTF-8 text (the WET conversion format IS plain text);
  * [[Warc]] parses it as an HTTP response message (status line,
  * headers, charset-aware HTML body). */
private[sources] final case class RawWarcRecord(
    file: String,
    recordIdx: Long,
    warcType: String,
    targetUri: String,
    warcDate: String,
    contentType: String,
    contentLength: Long,
    body: Array[Byte])

/** The Content-Length-driven WARC/1.0 record walker shared by the WET
  * and raw-WARC readers (the envelope grammar is identical; only the
  * payload interpretation differs). Never scans for separators —
  * bodies legally contain blank lines and even "WARC/1.0" — and
  * decompresses incrementally off the in-memory compressed bytes;
  * multi-member gzip streams (the per-record-gzipped WARC layout)
  * decode transparently.
  *
  * Lenient where the wild demands it (case-insensitive header names,
  * unknown headers ignored, missing optional headers default empty),
  * loud where silence would corrupt a corpus (malformed magic or
  * Content-Length fails the task with file + record index). The
  * gzip stream holds a NATIVE Inflater: it is closed on clean EOF, on
  * every failure path, and — inside a task — unconditionally at task
  * completion, so abandoned iterators (pushed-down limit/take, task
  * kill) cannot leak it (ADVICE r11). */
private[sources] object WarcWalker {

  def records(file: String, gz: Array[Byte]): Iterator[RawWarcRecord] = {
    val in = new BufferedInputStream(
      new GZIPInputStream(new ByteArrayInputStream(gz)), 1 << 16)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
    new Iterator[RawWarcRecord] {
      private var idx = 0L
      private var nextRec: RawWarcRecord = null
      private var done = false

      private def readLine(): String = {
        // Header NAMES are ASCII per spec, but VALUES may carry UTF-8
        // (IRIs in WARC-Target-URI): accumulate bytes and decode as
        // UTF-8 — a char-per-byte decode would mojibake the URI and
        // silently change the hash-fallback doc_id and any re-write.
        val buf = new java.io.ByteArrayOutputStream(64)
        var b = in.read()
        if (b < 0) return null
        while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
        var s = new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
        if (s.endsWith("\r")) s = s.substring(0, s.length - 1)
        s
      }

      private def readFully(buf: Array[Byte]): Unit = {
        var off = 0
        while (off < buf.length) {
          val r = in.read(buf, off, buf.length - off)
          if (r < 0) throw new EOFException(
            s"$file record $idx: body truncated at $off/${buf.length} bytes")
          off += r
        }
      }

      private def advance(): Unit = {
        if (done || nextRec != null) return
        try doAdvance()
        catch {
          // Malformed-shard failures must not leak the native
          // inflater while the exception unwinds the task.
          case e: Throwable =>
            done = true
            try in.close() catch { case _: Throwable => () }
            throw e
        }
      }

      private def doAdvance(): Unit = {
        // Skip inter-record blank lines; EOF here is a clean end.
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) { done = true; in.close(); return }
        require(line.startsWith("WARC/"),
          s"$file record $idx: expected WARC/ magic, got '$line'")
        var wtype = ""
        var uri = ""
        var date = ""
        var ctype = ""
        var len = -1L
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val colon = h.indexOf(':')
          if (colon > 0) {
            val k = h.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
            val v = h.substring(colon + 1).trim
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-type" => ctype = v
              case "content-length" =>
                len = try v.toLong catch {
                  case _: NumberFormatException => throw new
                      IllegalArgumentException(
                        s"$file record $idx: malformed Content-Length '$v'")
                }
              case _ => // unknown headers are legal; ignore
            }
          }
          h = readLine()
        }
        require(h != null,
          s"$file record $idx: EOF inside the header block")
        require(len >= 0,
          s"$file record $idx: missing Content-Length")
        require(len <= Int.MaxValue - 16,
          s"$file record $idx: Content-Length $len exceeds the 2 GB " +
            "single-record bound")
        val body = new Array[Byte](len.toInt)
        readFully(body)
        nextRec = RawWarcRecord(file, idx, wtype, uri, date, ctype, len, body)
        idx += 1
      }

      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): RawWarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }
  }
}
