"""WARC (ISO 28500) ingestion — the Common-Crawl container format.

The north-star table is "Common-Crawl-style web pages (url, warc_ts,
html, text, lang)"; this module is its front door: raw ``.warc`` /
``.warc.gz`` files → that exact relation. Spark shape:

- ``binaryFile`` source: ONE task per WARC file. Crawl archives ship as
  ~1 GB files in the thousands-per-crawl, so file-level parallelism is the
  natural unit (records inside a per-record-gzip file are not split-safe
  at arbitrary byte offsets — member boundaries are only discoverable by
  scanning, which is exactly what the per-file task does).
- ``mapInPandas`` record parser: pure stdlib (zlib for per-record gzip
  members via ``unused_data`` chaining), Arrow-batched out, schema
  declared up front. Response records yield (url, warc_ts, http_status,
  content_type, html bytes); other record types are skipped.
- Malformed records follow the corpus reader's corrupt-record discipline:
  per-record errors are captured into an ``error`` column (one corrupt
  record among 10^12 must not kill the ingest), never silently dropped.

Downstream: ``.withColumn("text", extract_text("html"))`` + ``langid``
produce the full pages shape, and ``validate_corpus`` consumes it as-is.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "warc_file string, record_offset long, url string, warc_ts string, "
    "http_status int, content_type string, html binary, error string"
)


def _gunzip_members(payload: bytes) -> bytes:
    """Concatenated-gzip-member decompression (per-record gzip WARCs):
    stdlib ``gzip.decompress`` already handles multi-member streams, but
    chaining decompressobj via ``unused_data`` tolerates trailing junk
    after the last member (truncated uploads) instead of raising."""
    out, rest = bytearray(), payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.extend(d.decompress(rest))
            out.extend(d.flush())
        except zlib.error:
            break  # truncated member: keep what decoded
        if not d.eof:
            break
        rest = d.unused_data
    return bytes(out)


def _parse_warc_buffer(buf: bytes):
    """Yield (offset, headers: dict, block: bytes) per WARC record, or
    (offset, None, error_str) for records that fail to parse. Tolerant of
    both \\r\\n and \\n header line endings."""
    pos, n = 0, len(buf)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and buf[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        start = pos
        if not buf.startswith(b"WARC/", pos):
            yield start, None, "missing WARC/ version line"
            return  # cannot resync without a record length
        # bound the separator search to a header-sized window: an UNbounded
        # find for the terminator the file does NOT use (\n\n in a CRLF
        # archive, \r\n\r\n in an LF one) scans to the END OF THE BUFFER on
        # every record — O(records x archive_bytes), 94% of parse time on a
        # 1.5k-record archive. Headers are tiny; the pathological >64 KiB
        # header falls back to the original unbounded search, so selection
        # semantics are unchanged.
        win = pos + 65536
        hdr_end = buf.find(b"\r\n\r\n", pos, win)
        alt_end = buf.find(b"\n\n", pos, win)
        found = [x for x in (hdr_end, alt_end) if x != -1]
        # redo unbounded when nothing was found in the window OR the best
        # in-window hit sits close enough to the boundary that the OTHER
        # separator could straddle it unseen — keeps selection identical
        # to the unbounded searches in every case
        if win < n and (not found or min(found) >= win - 4):
            hdr_end = buf.find(b"\r\n\r\n", pos)
            alt_end = buf.find(b"\n\n", pos)
        if hdr_end == -1 or (alt_end != -1 and alt_end < hdr_end):
            hdr_end, sep = alt_end, 2
        else:
            sep = 4
        if hdr_end == -1:
            yield start, None, "truncated WARC header"
            return
        headers = {}
        for line in buf[pos:hdr_end].splitlines()[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            # missing, non-numeric, or negative (a negative slice would walk
            # the parse position BACKWARDS into the header — code-review r4)
            yield start, None, "missing/invalid Content-Length"
            return
        body_start = hdr_end + sep
        block = buf[body_start : body_start + length]
        if len(block) < length:
            # truncated final record: an error row, not a silent half-page
            # passed downstream as complete (code-review r4)
            yield start, None, (
                f"truncated record: {len(block)} of {length} body bytes"
            )
            return
        yield start, headers, block
        pos = body_start + length


def _split_http(block: bytes):
    """HTTP response payload → (status, content_type, body). The header/
    body boundary is the EARLIEST of \r\n\r\n and \n\n — search order
    alone would split LF-terminated headers at a CRLF pair deep inside the
    body (code-review r4)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    crlf = block.find(b"\r\n\r\n")
    lf = block.find(b"\n\n")
    if crlf == -1 and lf == -1:
        return None, None, block
    if crlf != -1 and (lf == -1 or crlf < lf):
        i, sep = crlf, 4
    else:
        i, sep = lf, 2
    head, body = block[:i], block[i + sep:]
    parts = head.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    # the PAGE's media type lives in the HTTP head — the WARC envelope
    # Content-Type is the constant 'application/http; msgtype=response'
    # (code-review r4)
    ctype = None
    for line in head.splitlines()[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
            break
    return status, ctype, body


def iter_warc_records(path: str, payload: bytes):
    """Response records of one WARC file as dict rows (WARC_SCHEMA keys)."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    for off, headers, block in _parse_warc_buffer(payload):
        if headers is None:
            yield {
                "warc_file": path, "record_offset": off, "url": None,
                "warc_ts": None, "http_status": None, "content_type": None,
                "html": None, "error": block,  # block carries the error str
            }
            continue
        if headers.get("warc-type") != "response":
            continue  # request/metadata/warcinfo records carry no page
        status, ctype, body = _split_http(block)
        yield {
            "warc_file": path,
            "record_offset": off,
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "http_status": status,
            "content_type": ctype,
            "html": body,
            "error": None,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` files → one row per
    response record (WARC_SCHEMA). One task per file; per-record parse
    errors land in the ``error`` column."""
    import pandas as pd

    loaded = spark.read.format("binaryFile").load(path)
    # binaryFile packs small archives together (maxPartitionBytes +
    # openCostInBytes), which serializes the parse: a 32-archive test
    # fixture lands in ~2 scan partitions. When the whole input is small,
    # rebalance one archive per task — a few MB of shuffle buys full-width
    # parse parallelism. Scale-adaptive (guide §2.5 input skew): listing
    # metadata only (no content read) decides, and big crawls (total over
    # ~1 GiB — already enough native splits) keep the no-shuffle path.
    meta = loaded.select("path", "length").agg(
        F.count(F.lit(1)).alias("n"), F.sum("length").alias("bytes")
    ).first()
    files = loaded.select("path", "content")
    n_files = int(meta["n"] or 0)
    total = int(meta["bytes"] or 0)
    par = spark.sparkContext.defaultParallelism
    if 0 < n_files and total <= 1 << 30 and n_files > 1:
        files = files.repartition(min(n_files, par))

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["warc_file", "record_offset", "url", "warc_ts",
                "http_status", "content_type", "html", "error"]
        empty = True
        for pdf in batches:
            # one yielded frame PER ARCHIVE: accumulating a whole Arrow
            # batch of ~1 GB decompressed archives in one list would scale
            # peak memory with the batch's file count (code-review r4)
            for p, content in zip(pdf["path"], pdf["content"]):
                rows = list(iter_warc_records(p, bytes(content)))
                if rows:
                    empty = False
                    yield pd.DataFrame(rows, columns=cols)
        if empty:
            yield pd.DataFrame({c: [] for c in cols})

    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_to_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → the north-star pages relation (url, warc_ts timestamp,
    html binary, text, lang) — good response records only, text via the
    byte-identical ``extract_text`` kernel, lang via ``langid``."""
    from ..functions.extract import extract_text
    from ..functions.text import langid

    recs = read_warc(spark, path).where(
        F.col("error").isNull()
        & F.col("url").isNotNull()
        # only html-ish payloads reach extract_text — a crawl also carries
        # images/PDFs whose bytes are not text (content_type now holds the
        # HTTP media type; records without one pass through)
        & (F.col("content_type").isNull()
           | F.col("content_type").contains("html"))
    )
    return recs.select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        "html",
        extract_text(F.col("html")).alias("text"),
    ).withColumn("lang", langid(F.col("text")))
