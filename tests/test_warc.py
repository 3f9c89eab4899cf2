"""WARC source (sources/warc.py): public-format parsing, gzip shards,
fail-loud structure checks, Spark integration."""

from __future__ import annotations

import gzip

import pytest

from hbase_observer_es_spark.sources.warc import (
    http_payload_body,
    parse_warc_bytes,
    read_warc,
    warc_to_parquet,
)


from .warc_fixtures import warc_record as _record  # noqa: E402


_HTML = b"<html><body>hello \xe6\x97\xa5\xe6\x9c\xac</body></html>"
_HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _HTML


def _shard() -> bytes:
    return (
        _record("warcinfo", b"software: test\r\n", rid="id:0")
        + _record("request", b"GET / HTTP/1.1\r\n", uri="http://x.example/", rid="id:1")
        + _record("response", _HTTP, uri="http://x.example/", rid="id:2")
    )


def test_parse_warc_bytes_roundtrips_records():
    recs = list(parse_warc_bytes(_shard()))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
    assert recs[2]["target_uri"] == "http://x.example/"
    assert recs[2]["payload"] == _HTTP  # byte-exact block
    assert http_payload_body(recs[2]["payload"]) == _HTML
    assert http_payload_body(b"no http here") == b"no http here"


@pytest.mark.parametrize(
    "mutilate,msg",
    [
        (lambda b: b[10:], "version line"),
        (lambda b: b.replace(b"Content-Length", b"Content-Lengt"), "Content-Length"),
        (lambda b: b[:-6], "separator|truncated"),
        (lambda b: b.replace(b"WARC-Type: warcinfo", b"WARC-Type warcinfo"), "malformed header"),
    ],
)
def test_structural_violations_fail_loudly(mutilate, msg):
    with pytest.raises(ValueError, match=msg):
        list(parse_warc_bytes(mutilate(_shard()), "t.warc"))


def test_read_warc_plain_and_gzip_shards(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_shard())
    # multi-member gzip: each record its own member (the Common Crawl layout)
    members = b"".join(
        gzip.compress(_record("response", _HTTP, uri=f"http://m{i}/", rid=f"id:m{i}"))
        for i in range(2)
    )
    (tmp_path / "b.warc.gz").write_bytes(members)
    (tmp_path / "noise.txt").write_text("not a shard")

    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 5  # 3 from a.warc + 2 from b.warc.gz
    by_id = {r.record_id: r for r in rows}
    assert bytes(by_id["id:2"].payload) == _HTTP
    assert by_id["id:m1"].target_uri == "http://m1/"
    assert all(r.path.endswith((".warc", ".warc.gz")) for r in rows)


def test_warc_to_parquet_landing(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_shard())
    pq = str(tmp_path / "_landed")
    warc_to_parquet(spark, str(tmp_path), pq)
    back = spark.read.parquet(pq)
    assert back.count() == 3
    resp = back.filter("warc_type = 'response'").first()
    assert bytes(resp.payload) == _HTTP


def test_truncated_shard_kills_the_job(spark, tmp_path):
    (tmp_path / "bad.warc").write_bytes(_shard()[:-20])
    with pytest.raises(Exception, match="truncated|separator"):
        read_warc(spark, str(tmp_path)).collect()


def test_corrupt_header_bytes_keep_origin_context():
    """Review finding r9: a corrupt byte in a header name or a non-numeric
    Content-Length must raise the documented ValueError naming origin and
    offset — not a bare UnicodeDecodeError / int() error."""
    bad_name = _shard().replace(b"WARC-Type", b"WARC-T\xffpe", 1)
    with pytest.raises(ValueError, match=r"t\.warc.*non-ASCII header"):
        list(parse_warc_bytes(bad_name, "t.warc"))
    bad_len = _shard().replace(b"Content-Length: 16", b"Content-Length: 1x", 1)
    with pytest.raises(ValueError, match=r"t\.warc.*non-numeric Content-Length"):
        list(parse_warc_bytes(bad_len, "t.warc"))
