"""WARC container ingestion: Common Crawl's native on-disk format.

A production crawl corpus arrives as WARC files (ISO 28500), not parquet;
the first stage of a real pipeline is splitting those containers into
records. This module provides:

* :func:`split_warc` — pure-Python record splitter for one container's
  bytes (spec-correct framing: header block terminated by CRLFCRLF, body
  of exactly ``Content-Length`` bytes, records separated by two CRLFs —
  NEVER by scanning the body for separators, which corrupts payloads that
  contain them). Gzipped containers (``.warc.gz`` — Common Crawl's actual
  shipping layout: ONE gzip member per record, concatenated) are detected
  by magic and decompressed member-by-member with the same good-prefix
  contract: a corrupt member yields every record before it plus the error.
* :func:`warc_records` — the distributed operator: a DataFrame of
  ``(path, content binary)`` rows (``spark.read.format("binaryFile")``
  shape) → one row per WARC record ``(path, rec_type, url, warc_ts,
  payload, ok)``. A malformed container yields its good prefix plus ONE
  ``ok=false`` row carrying the error — corrupt crawl files never kill
  the job (the same crash-tolerance contract as multimodal decode).
* :func:`render_warc` — the deterministic inverse, for fixtures and
  round-trip tests.

Scale shape: WARC containers are independently splittable only at record
boundaries, so the unit of parallelism is the FILE (Common Crawl ships
~1 GB containers by the hundred thousand — file-level parallelism is the
natural one). The splitter runs as Arrow-batched ``mapInPandas`` —
per-container Python, zero per-record overhead beyond the byte scan, the
same pattern as the multimodal codecs; payload bytes flow through Arrow
untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RECORD_SCHEMA = (
    "path string, rec_type string, url string, warc_ts string, "
    "payload binary, ok boolean, error string"
)


def render_warc(records: list[tuple[str, str, str, bytes]]) -> bytes:
    """Render ``(rec_type, url, warc_ts, payload)`` tuples into one WARC
    container (the deterministic inverse of :func:`split_warc`)."""
    out = []
    for rec_type, url, ts, payload in records:
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(payload)}\r\n"
        ).encode("utf-8")
        out.append(head + b"\r\n" + payload + b"\r\n\r\n")
    return b"".join(out)


def render_warc_gz(records: list[tuple[str, str, str, bytes]]) -> bytes:
    """Render records as a ``.warc.gz`` container in Common Crawl's layout:
    one gzip member per record, members concatenated — each record stays
    independently decompressible (what makes the format streamable/seekable
    via the columnar index)."""
    import gzip

    return b"".join(
        gzip.compress(render_warc([rec]), mtime=0) for rec in records
    )


def _gzip_members(buf: bytes):
    """Decompress a concatenated-gzip-member stream one member at a time.
    Returns ``(members, error)`` — on a corrupt/truncated member the good
    prefix is returned with the error. Operates on a memoryview so large
    containers are never re-sliced per member."""
    import zlib

    members: list[bytes] = []
    mv = memoryview(buf)
    i, n = 0, len(buf)
    while i < n:
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        try:
            chunk = d.decompress(mv[i:]) + d.flush()
        except zlib.error as e:
            return members, f"corrupt gzip member at byte {i}: {e}"
        if not d.eof:
            return members, f"truncated gzip member at byte {i}"
        members.append(chunk)
        consumed = (n - i) - len(d.unused_data)
        if consumed <= 0:  # defensive: eof implies progress, but never loop
            return members, f"gzip member made no progress at byte {i}"
        i += consumed
    return members, None


def split_warc(buf: bytes) -> tuple[list[tuple[str, str, str, bytes]], str | None]:
    """Split one container's bytes into ``(rec_type, url, warc_ts,
    payload)`` records. Returns ``(records, error)`` — error is None for a
    clean container, else a message describing where parsing stopped (the
    good prefix is still returned). A gzipped container (magic 1f 8b) is
    split into gzip members first; each member's records parse with the
    same framing rules, and the first bad member OR bad record inside a
    member ends the good prefix."""
    if buf[:2] == b"\x1f\x8b":
        members, gerr = _gzip_members(buf)
        recs: list[tuple[str, str, str, bytes]] = []
        for m, member in enumerate(members):
            mrecs, merr = split_warc(member)
            recs.extend(mrecs)
            if merr is not None:
                return recs, f"gzip member {m}: {merr}"
        return recs, gerr
    recs = []
    i, n = 0, len(buf)
    while i < n:
        j = buf.find(b"\r\n\r\n", i)
        if j < 0:
            if buf[i:].strip():
                return recs, f"truncated header block at byte {i}"
            return recs, None  # trailing padding only
        head = buf[i:j].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            return recs, f"bad record magic at byte {i}: {lines[0][:40]!r}"
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            return recs, f"missing/invalid Content-Length at byte {i}"
        body = buf[j + 4 : j + 4 + clen]
        if len(body) != clen:
            return recs, f"truncated body at byte {j + 4} (want {clen})"
        recs.append(
            (
                fields.get("warc-type", ""),
                fields.get("warc-target-uri", ""),
                fields.get("warc-date", ""),
                body,
            )
        )
        i = j + 4 + clen
        while buf[i : i + 2] == b"\r\n":  # record separator CRLFs
            i += 2
    return recs, None


def warc_records(
    files: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Distributed WARC split: ``(path, content)`` container rows → one row
    per record, plus one ``ok=false`` row per malformed container."""
    import pandas as pd

    from sparkrdf.session import ensure_pyfiles

    ensure_pyfiles(files.sparkSession)

    def gen(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                recs, err = split_warc(bytes(content))
                for rec_type, url, ts, payload in recs:
                    rows.append((path, rec_type, url, ts, payload, True, None))
                if err is not None:
                    rows.append((path, None, None, None, None, False, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "rec_type", "url", "warc_ts", "payload", "ok", "error"
                ],
            )

    return files.select(path_col, content_col).mapInPandas(gen, RECORD_SCHEMA)


HTTP_SCHEMA = (
    "url string, status int, content_type string, body binary, ok boolean, "
    "error string"
)


def split_http(payload: bytes) -> tuple[int, str, bytes]:
    """Split one HTTP/1.x response message into (status, content_type,
    body). Raises ValueError on a non-HTTP payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("no header/body separator")
    head = payload[:sep].decode("utf-8", "replace")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    if not parts[0].startswith("HTTP/") or len(parts) < 2:
        raise ValueError(f"bad status line {lines[0][:40]!r}")
    status = int(parts[1])
    ctype = ""
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, payload[sep + 4 :]


def http_responses(
    records: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """WARC response records → HTTP messages split into ``(url, status,
    content_type, body, ok)`` — the stage between :func:`warc_records` and
    text extraction (Common Crawl response payloads ARE raw HTTP). A
    malformed payload yields one ``ok=false`` row with the error; the good
    rows are unaffected (the same crash-tolerance contract as the
    container split). Arrow-batched mapInPandas, body bytes untouched.
    """
    import pandas as pd

    from sparkrdf.session import ensure_pyfiles

    ensure_pyfiles(records.sparkSession)

    def gen(batches):
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                try:
                    status, ctype, body = split_http(bytes(payload))
                    rows.append((url, status, ctype, body, True, None))
                except (ValueError, IndexError) as e:
                    rows.append((url, None, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["url", "status", "content_type", "body", "ok", "error"],
            )

    return records.select(url_col, payload_col).mapInPandas(gen, HTTP_SCHEMA)
