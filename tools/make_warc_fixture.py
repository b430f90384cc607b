#!/usr/bin/env python3
"""Generate src/test/resources/fixture.warc.gz — the in-repo binary
fixture that pins the raw-WARC (HTML response) wire format for
WarcSpec, the way fixture.warc.wet.gz pins the WET format.

Adversarial coverage: warcinfo + request records (skipped by the docs
view), chunked transfer coding (with a chunk extension), gzip content
coding, ISO-8859-1 charset, a 404, a non-HTML content type, HTML with
script/style/comment traps, a quoted '>' attribute, entities, a bare
'<' in text, an embedded "WARC/1.0" body line, and multibyte UTF-8
with an astral-plane emoji. Two gzip members (the reader must decode
concatenated members). Deterministic output (gzip mtime=0).
"""
import gzip
import io
import os
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "src", "test", "resources", "fixture.warc.gz")


def warc_record(wtype, uri, date, payload, content_type="application/http; msgtype=response"):
    head = "WARC/1.0\r\n"
    head += f"WARC-Type: {wtype}\r\n"
    if uri:
        head += f"WARC-Target-URI: {uri}\r\n"
    head += f"WARC-Date: {date}\r\n"
    head += f"Content-Type: {content_type}\r\n"
    head += f"Content-Length: {len(payload)}\r\n\r\n"
    return head.encode("utf-8") + payload + b"\r\n\r\n"


def http(status_line, headers, body):
    h = status_line + "\r\n"
    for k, v in headers:
        h += f"{k}: {v}\r\n"
    h += "\r\n"
    return h.encode("iso-8859-1") + body


HTML1 = """<!DOCTYPE html>
<html><head><title>Fixture Page 1</title>
<script type="text/javascript">var s = "</div> fake close"; // WARC/1.0 inside script</script>
<style>p { color: red; }</style>
</head>
<body>
<!-- comment with <p>tags</p> inside -->
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<div class="content" data-x="a > b">
<p>This paragraph is the real content of the fixture page, long enough to survive the ten word minimum, with an entity &amp; a numeric &#233; and 1 &lt; 2 math.</p>
<p>Short para.</p>
</div>
<p>
WARC/1.0
looks like a record boundary but is body text, padded past ten words.
</p>
<footer><a href="/terms">Terms</a></footer>
</body></html>"""

HTML2_LATIN1 = ("<html><body><p>Caf\xe9 au lait paragraphs need at least "
                "ten words to survive extraction thresholds.</p>"
                "</body></html>")

HTML3_CHUNKED = ("<html><body><p>Chunked transfer coding delivered this "
                 "paragraph with more than ten words total, and 3 < 4 "
                 "stays literal text.</p></body></html>")

HTML4_GZIP = ("<html><body><p>Gzip content coding delivered this paragraph "
              "of exactly eleven words total.</p></body></html>")

HTML8_UTF8 = ("<html><body><p>深度学習 multibyte paragraph "
              "with emoji \U0001F600 needs ten or more words to be kept."
              "</p></body></html>")

HTML10_DEFLATE_ZLIB = ("<html><body><p>Zlib wrapped deflate content "
                       "coding delivered this paragraph of exactly "
                       "twelve words.</p></body></html>")

HTML11_DEFLATE_RAW = ("<html><body><p>Raw deflate content coding from a "
                      "noncompliant server still delivered this twelve "
                      "word paragraph.</p></body></html>")


def raw_deflate(data: bytes) -> bytes:
    c = zlib.compressobj(wbits=-15)  # negative wbits = no zlib header
    return c.compress(data) + c.flush()


def chunk(body: bytes) -> bytes:
    # Three chunks, one with a chunk extension; terminating 0-chunk.
    out = b""
    cuts = [len(body) // 3, 2 * len(body) // 3, len(body)]
    prev = 0
    for i, c in enumerate(cuts):
        piece = body[prev:c]
        ext = ";ext=1" if i == 1 else ""
        out += f"{len(piece):x}{ext}\r\n".encode() + piece + b"\r\n"
        prev = c
    out += b"0\r\n\r\n"
    return out


def gz_bytes(data: bytes) -> bytes:
    bio = io.BytesIO()
    with gzip.GzipFile(fileobj=bio, mode="wb", mtime=0) as g:
        g.write(data)
    return bio.getvalue()


records_a = [
    warc_record("warcinfo", "", "2026-08-15T00:00:00Z",
                b"software: graft-fixture\r\n",
                content_type="application/warc-fields"),
    warc_record("response", "http://fixture.test/html/201",
                "2026-08-15T01:00:01Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "text/html; charset=UTF-8"),
                      ("Server", "fixture")],
                     HTML1.encode("utf-8"))),
    warc_record("response", "http://fixture.test/html/202",
                "2026-08-15T01:00:02Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", 'text/html; charset="ISO-8859-1"')],
                     HTML2_LATIN1.encode("iso-8859-1"))),
    warc_record("response", "http://fixture.test/html/203",
                "2026-08-15T01:00:03Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "text/html"),
                      ("Transfer-Encoding", "chunked")],
                     chunk(HTML3_CHUNKED.encode("utf-8")))),
    warc_record("response", "http://fixture.test/html/204",
                "2026-08-15T01:00:04Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "text/html; charset=utf-8"),
                      ("Content-Encoding", "gzip")],
                     gz_bytes(HTML4_GZIP.encode("utf-8")))),
]

records_b = [
    warc_record("response", "http://fixture.test/html/205",
                "2026-08-15T01:00:05Z",
                http("HTTP/1.1 404 Not Found",
                     [("Content-Type", "text/html")],
                     b"<html><body><p>Not found page body that is "
                     b"definitely longer than ten words of text.</p>"
                     b"</body></html>")),
    warc_record("response", "http://fixture.test/files/206",
                "2026-08-15T01:00:06Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "application/pdf")],
                     b"%PDF-1.4 \x00\x01\x02 binary junk")),
    warc_record("request", "http://fixture.test/html/201",
                "2026-08-15T01:00:07Z",
                b"GET /html/201 HTTP/1.1\r\nHost: fixture.test\r\n\r\n",
                content_type="application/http; msgtype=request"),
    warc_record("response", "http://fixture.test/html/208",
                "2026-08-15T01:00:08Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "text/html; charset=UTF-8")],
                     HTML8_UTF8.encode("utf-8"))),
    # Legal-but-unsupported content coding: must parse leniently
    # (status kept, html empty, content_encoding = 'br'), never kill
    # the shard task.
    warc_record("response", "http://fixture.test/html/209",
                "2026-08-15T01:00:09Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "text/html"),
                      ("Content-Encoding", "br")],
                     b"\x1b\x03\x00fake brotli bytes")),
    # Deflate content coding, spec-compliant variant: zlib-wrapped
    # (RFC 1950) per RFC 9110.
    warc_record("response", "http://fixture.test/html/210",
                "2026-08-15T01:00:10Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "text/html; charset=utf-8"),
                      ("Content-Encoding", "deflate")],
                     zlib.compress(HTML10_DEFLATE_ZLIB.encode("utf-8")))),
    # Deflate content coding, wild-server variant: raw DEFLATE
    # (RFC 1951, no zlib header) under the same coding name — the
    # documented server ambiguity the reader must fall back on.
    warc_record("response", "http://fixture.test/html/211",
                "2026-08-15T01:00:11Z",
                http("HTTP/1.1 200 OK",
                     [("Content-Type", "text/html; charset=utf-8"),
                      ("Content-Encoding", "deflate")],
                     raw_deflate(HTML11_DEFLATE_RAW.encode("utf-8")))),
]

# Two gzip members: the reader must consume concatenated members.
data = gz_bytes(b"".join(records_a)) + gz_bytes(b"".join(records_b))
with open(OUT, "wb") as f:
    f.write(data)
print(f"wrote {OUT} ({len(data)} bytes, {len(records_a) + len(records_b)} records)")
