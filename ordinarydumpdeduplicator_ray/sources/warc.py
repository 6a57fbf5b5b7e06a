"""Pure-stdlib WARC (ISO 28500) pages source/sink.

Common Crawl ships as WARC, so a Common-Crawl-style engine reads the
container natively alongside Parquet/JSONL/CSV. Parquet remains the
scale format (column/row-group pruning at the read — a WARC read
necessarily streams every record byte); a pipeline that loops over the
same corpus should convert once.

Reader shape: ``ray.data.read_binary_files`` over the shard directory
(one task per shard, bytes zero-copy into the object store) -> one
vectorized record walk per shard emitting ``(url, warc_ts, html,
text=None)`` pages rows — the html payload then flows through the SAME
``extract_batch`` kernel as every other source. ``response`` records
are parsed (HTTP head split off at the first CRLFCRLF); ``warcinfo`` /
``request`` / ``metadata`` records are skipped per spec. Writer shape:
one ``.warc`` file per block (the resumable-output shape, never one
giant file).

The reference ingests only a filesystem walk (``Common/FsUtils.cs:
8-27``); alternate container formats are north-rule surface.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import ray.data

_CRLF2 = b"\r\n\r\n"
_WARC_TS_FMT = "%Y-%m-%dT%H:%M:%SZ"


class BadWarcRecord(ValueError):
    """Structurally invalid WARC data (missing version line /
    Content-Length)."""


def _parse_warc_ts(s: str) -> int | None:
    """WARC-Date -> epoch microseconds (None if unparseable). WARC 1.1
    permits fractional seconds ('...T12:00:00.123Z') — accepted and
    carried at microsecond precision."""
    import calendar
    import time as _time

    s = s.strip()
    frac_us = 0
    if "." in s and s.endswith("Z"):
        base, frac = s[:-1].split(".", 1)
        if frac.isdigit():
            frac_us = int((frac + "000000")[:6])
            s = base + "Z"
    try:
        return calendar.timegm(
            _time.strptime(s, _WARC_TS_FMT)
        ) * 1_000_000 + frac_us
    except ValueError:
        return None


def parse_warc_bytes(blob: bytes) -> list[tuple[str, int | None, bytes]]:
    """One WARC file's bytes -> [(url, warc_ts_us, http_body)] for every
    ``response`` record. Walks records by Content-Length (never by
    scanning payloads for separators — payloads may contain CRLFCRLF).
    Corrupt trailing partial records raise ``BadWarcRecord``."""
    out: list[tuple[str, int | None, bytes]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate inter-record padding newlines
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = blob.find(_CRLF2, pos)
        if head_end < 0:
            raise BadWarcRecord("truncated record header")
        head = blob[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise BadWarcRecord(f"bad version line {lines[0]!r}")
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError) as e:
            raise BadWarcRecord("missing/bad Content-Length") from e
        body_start = head_end + len(_CRLF2)
        if body_start + clen > n:
            raise BadWarcRecord("truncated record body")
        payload = blob[body_start : body_start + clen]
        pos = body_start + clen
        if hdrs.get("warc-type") == "response":
            url = hdrs.get("warc-target-uri", "")
            ts = _parse_warc_ts(hdrs.get("warc-date", ""))
            # split the HTTP response head off the body
            sep = payload.find(_CRLF2)
            body = payload[sep + len(_CRLF2):] if sep >= 0 else payload
            out.append((url, ts, body))
    return out


def build_warc_bytes(
    rows: list[tuple[str, int | None, bytes]],
    content_type: str = "text/html",
) -> bytes:
    """[(url, warc_ts_us, html_body)] -> one WARC file's bytes
    (response records wrapping an HTTP/1.1 200 payload)."""
    import time as _time

    chunks: list[bytes] = []
    for url, ts_us, body in rows:
        body = body or b""
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        date = _time.strftime(
            _WARC_TS_FMT, _time.gmtime((ts_us or 0) / 1_000_000)
        )
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, url)}>\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        chunks.append(head + http + b"\r\n\r\n")
    return b"".join(chunks)


def write_pages_warc(
    ds: ray.data.Dataset, out_dir: str, batch_size: int = 1024
) -> int:
    """Write a pages Dataset (url, warc_ts?, html or text) as sharded
    ``.warc`` files — one file per batch, written worker-side; returns
    the number of records written. Rows with neither html nor text are
    skipped (nothing to wrap). ``batch_size`` bounds the per-file byte
    volume (batch x payload bytes must fit a worker's heap — size it
    down for full-page html payloads, the multimodal batch discipline)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        import calendar

        urls = t["url"].to_pylist()
        ts = (
            t["warc_ts"].cast(pa.timestamp("us")).to_pylist()
            if "warc_ts" in t.column_names else [None] * len(t)
        )
        htmls = t["html"].to_pylist() if "html" in t.column_names \
            else [None] * len(t)
        texts = t["text"].to_pylist() if "text" in t.column_names \
            else [None] * len(t)
        rows = []
        for u, s, h, x in zip(urls, ts, htmls, texts):
            body = h if h is not None else (
                x.encode("utf-8") if x is not None else None
            )
            if body is None:
                continue
            if s is None:
                us = None
            elif hasattr(s, "timetuple"):
                # timegm, not datetime.timestamp(): Arrow gives naive
                # UTC datetimes and .timestamp() would re-interpret
                # them in the box's local timezone
                us = calendar.timegm(s.timetuple()) * 1_000_000 + s.microsecond
            else:
                us = int(s)
            rows.append((u, us, body))
        if rows:
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.warc")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(build_warc_bytes(rows))
            os.rename(tmp, path)
        return pa.table({"n": pa.array([len(rows)], type=pa.int64())})

    parts = ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=batch_size
    ).take_all()
    return int(sum(p["n"] for p in parts))


def read_pages_warc(path: str) -> ray.data.Dataset:
    """Read a ``.warc`` shard directory (or single file) into the pages
    schema (url, warc_ts, html, text=None) — one parse task per shard
    via ``read_binary_files``."""
    files = ray.data.read_binary_files(path)

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int | None] = []
        bodies: list[bytes] = []
        for blob in t["bytes"].to_pylist():
            for url, ts, body in parse_warc_bytes(blob):
                urls.append(url)
                tss.append(ts)
                bodies.append(body)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(bodies, type=pa.binary()),
            "text": pa.nulls(len(urls), type=pa.string()),
        })

    return files.map_batches(parse, batch_format="pyarrow")
