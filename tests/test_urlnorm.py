"""URL canonicalization (operators/urlnorm.py): RFC 3986 §6 rules, edge
cases, idempotency property, and the column form."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.urlnorm import canonical_url, canonical_url_udf


def test_scheme_and_host_lowercase():
    assert canonical_url("HTTP://WWW.Example.COM/Path") == "http://www.example.com/Path"


def test_default_ports_dropped_nondefault_kept():
    assert canonical_url("http://x.example:80/a") == "http://x.example/a"
    assert canonical_url("https://x.example:443/a") == "https://x.example/a"
    assert canonical_url("http://x.example:8080/a") == "http://x.example:8080/a"
    assert canonical_url("https://x.example:80/a") == "https://x.example:80/a"


def test_unreserved_escapes_decode_others_uppercase():
    assert canonical_url("http://x.example/%7Euser/%61") == "http://x.example/~user/a"
    assert canonical_url("http://x.example/a%2fb") == "http://x.example/a%2Fb"
    # malformed escape survives as data
    assert canonical_url("http://x.example/100%") == "http://x.example/100%"


def test_dot_segments_removed():
    assert canonical_url("http://x.example/a/b/../c/./d") == "http://x.example/a/c/d"
    assert canonical_url("http://x.example/../a") == "http://x.example/a"
    assert canonical_url("http://x.example/a/..") == "http://x.example/"


def test_empty_path_becomes_root_and_fragment_drops():
    assert canonical_url("http://x.example") == "http://x.example/"
    assert canonical_url("http://x.example#frag") == "http://x.example/"
    assert canonical_url("http://x.example/a?q=1#frag") == "http://x.example/a?q=1"


def test_query_preserved_verbatim_order():
    # parameter sorting would CHANGE meaning on some sites — never done
    assert canonical_url("http://x.example/a?b=2&a=1") == "http://x.example/a?b=2&a=1"


def test_userinfo_preserved():
    assert canonical_url("http://u:p@X.Example:80/") == "http://u:p@x.example/"


def test_ipv6_host_keeps_brackets():
    # urlsplit strips the brackets from .hostname; the rebuild must restore
    # them or the address degenerates into host+junk-port (review finding)
    assert canonical_url("http://[2001:DB8::1]/x") == "http://[2001:db8::1]/x"
    assert canonical_url("http://[2001:db8::1]:8080/x") == "http://[2001:db8::1]:8080/x"
    assert canonical_url("http://[2001:db8::1]:80/x") == "http://[2001:db8::1]/x"
    once = canonical_url("HTTP://[2001:DB8::1]/a/../b")
    assert once == "http://[2001:db8::1]/b"
    assert canonical_url(once) == once


def test_malformed_escape_with_sign_is_data():
    # int('+f', 16) parses — but '%+f' is NOT an escape (review finding)
    assert canonical_url("http://x.example/%+f") == "http://x.example/%+f"
    assert canonical_url("http://x.example/% 9") == "http://x.example/% 9"


_urlish = st.builds(
    lambda scheme, host, port, path, query, frag: (
        f"{scheme}://{host}{port}{path}{query}{frag}"
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    host=st.sampled_from(["a.example", "WWW.B.Example", "x-y.z", "[2001:DB8::1]"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(
        ["", "/", "/a/b", "/a/../b", "/%7Ea", "/a%2Fb", "/./x", "/100%"]
    ),
    query=st.sampled_from(["", "?a=1&b=2", "?z=%61"]),
    frag=st.sampled_from(["", "#f", "#a/b"]),
)


@given(url=_urlish)
@settings(max_examples=300, deadline=None)
def test_canonicalization_is_idempotent(url):
    once = canonical_url(url)
    assert canonical_url(once) == once
    assert "#" not in once


def test_column_form(spark):
    df = spark.createDataFrame(
        [("HTTP://X.Example:80/a/../b%61?q=1#f",), (None,)], "u string"
    )
    got = [r.c for r in df.select(canonical_url_udf(df.u).alias("c")).collect()]
    assert got == ["http://x.example/ba?q=1", None]
