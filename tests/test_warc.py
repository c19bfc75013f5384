"""WARC container split (sparkrdf/warc.py) — framing, round-trip,
corrupt-container tolerance."""

from sparkrdf.warc import render_warc, split_warc, warc_records


def _recs():
    return [
        ("response", "http://a", "2025-01-01T00:00:00Z", b"hello"),
        # payload CONTAINS the record separator — Content-Length framing
        # must carry it through intact (a find()-based splitter would not)
        ("response", "http://b", "2025-01-01T00:00:01Z", b"x\r\n\r\nWARC/1.0 fake"),
        ("metadata", "http://c", "2025-01-01T00:00:02Z", b""),
    ]


def test_split_round_trip():
    recs, err = split_warc(render_warc(_recs()))
    assert err is None
    assert recs == _recs()


def test_split_truncated_body_returns_prefix_and_error():
    buf = render_warc(_recs())
    recs, err = split_warc(buf[:-12])  # chop into the last record
    assert [r[1] for r in recs] == ["http://a", "http://b"]
    assert err and "truncated" in err


def test_split_bad_magic():
    recs, err = split_warc(b"HTTP/1.1 200 OK\r\n\r\nbody")
    assert recs == [] and "bad record magic" in err


def test_warc_records_distributed(spark):
    good = render_warc(_recs())
    bad = good[: len(good) - 12]
    df = spark.createDataFrame(
        [("f1.warc", good), ("f2.warc", bad)], "path string, content binary"
    )
    out = warc_records(df).collect()
    ok = [(r.path, r.url, bytes(r.payload)) for r in out if r.ok]
    assert ("f1.warc", "http://b", b"x\r\n\r\nWARC/1.0 fake") in ok
    assert len([r for r in ok if r[0] == "f1.warc"]) == 3
    assert len([r for r in ok if r[0] == "f2.warc"]) == 2
    errs = [r for r in out if not r.ok]
    assert len(errs) == 1 and errs[0].path == "f2.warc" and "truncated" in errs[0].error


def test_gzip_member_round_trip():
    from sparkrdf.warc import render_warc_gz

    buf = render_warc_gz(_recs())
    assert buf[:2] == b"\x1f\x8b"
    # Common Crawl layout: one independently-decompressible member per record
    from sparkrdf.warc import _gzip_members

    members, gerr = _gzip_members(buf)
    assert gerr is None and len(members) == len(_recs())
    assert [split_warc(m)[0] for m in members] == [[r] for r in _recs()]
    recs, err = split_warc(buf)
    assert err is None and recs == _recs()


def test_gzip_corrupt_member_returns_prefix_and_error():
    from sparkrdf.warc import render_warc_gz

    buf = render_warc_gz(_recs())
    # flip bytes inside the LAST member's deflate stream
    bad = buf[:-8] + b"\x00" * 8
    recs, err = split_warc(bad)
    assert [r[1] for r in recs] == ["http://a", "http://b"]
    assert err and "gzip member" in err


def test_gzip_truncated_member():
    from sparkrdf.warc import render_warc_gz

    buf = render_warc_gz(_recs()[:1])
    recs, err = split_warc(buf[: len(buf) // 2])
    assert recs == [] and err and "gzip member" in err


def test_warc_records_gz_distributed(spark):
    from sparkrdf.warc import render_warc_gz

    df = spark.createDataFrame(
        [("f1.warc.gz", render_warc_gz(_recs())), ("f2.warc", render_warc(_recs()))],
        "path string, content binary",
    )
    out = warc_records(df).collect()
    assert all(r.ok for r in out)
    # same records out of the gz and plain containers
    by_path = {}
    for r in out:
        by_path.setdefault(r.path, set()).add((r.rec_type, r.url, bytes(r.payload)))
    assert by_path["f1.warc.gz"] == by_path["f2.warc"]
    assert len(by_path["f1.warc.gz"]) == 3


def test_split_http_and_distributed(spark):
    from sparkrdf.warc import http_responses, split_http

    msg = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"X-Other: y\r\n\r\n<html>hi \r\n\r\n body</html>"
    )
    status, ctype, body = split_http(msg)
    assert (status, ctype) == (200, "text/html; charset=utf-8")
    assert body == b"<html>hi \r\n\r\n body</html>"  # separators in body survive

    df = spark.createDataFrame(
        [("u1", msg), ("u2", b"not http at all")], "url string, payload binary"
    )
    rows = {r.url: r for r in http_responses(df).collect()}
    assert rows["u1"].ok and rows["u1"].status == 200
    assert not rows["u2"].ok and "separator" in rows["u2"].error
