"""URL canonicalization (RFC 3986 §6 syntax-based normalization) — the
identity function for URL-level dedup and clean crawl-graph keys.

Two URLs that differ only in case of scheme/host, default ports, percent-
encoding of unreserved characters, hex-digit case, or dot-segments refer
to the same resource BY SPECIFICATION — normalizing them is lossless.
Anything beyond that (sorting query parameters, stripping tracking params,
https-upgrading) changes meaning for some sites and is deliberately NOT
done here; a pipeline wanting those heuristics layers them on top.

Rules applied (all from the RFC, all semantics-preserving):

* scheme and host lowercase; default ports dropped (http:80, https:443);
* percent-escapes of UNRESERVED characters (ALPHA / DIGIT / ``-._~``)
  decode; all remaining escapes get uppercase hex digits;
* dot-segments (``.``/``..``) removed with the RFC's own algorithm;
* an empty path on an authority URL becomes ``/``;
* the fragment is dropped (client-side only, never sent to the server).

Pure and idempotent (property-tested); the column form is an Arrow-batched
UDF — URL canonicalization is string-only, map-only work.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORT = {"http": "80", "https": "443"}


def _norm_escapes(s: str) -> str:
    """Decode %XX of unreserved chars; uppercase hex of the rest; leave
    malformed escapes untouched (a lone ``%`` is data, not an escape)."""
    out = []
    i = 0
    n = len(s)
    hexdigits = "0123456789abcdefABCDEF"
    while i < n:
        c = s[i]
        if c == "%" and i + 3 <= n:
            hexpart = s[i + 1 : i + 3]
            # both chars must BE hex digits — int(x, 16) also accepts
            # signs/whitespace ('%+f'), which are data, not an escape
            if not (hexpart[0] in hexdigits and hexpart[1] in hexdigits):
                out.append(c)
                i += 1
                continue
            val = int(hexpart, 16)
            ch = chr(val)
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hexpart.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, verbatim algorithm."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            cut = inp.find("/", 1)
            if cut < 0:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:cut])
                inp = inp[cut:]
    return "".join(out)


def canonical_url(url: str) -> str:
    """The RFC 3986 §6 canonical form of ``url`` (module docstring).
    Idempotent; a string that does not parse as a URL comes back with only
    the fragment stripped."""
    try:
        sp = urlsplit(url)
    except ValueError:
        return url.split("#", 1)[0]
    scheme = sp.scheme.lower()
    netloc = sp.netloc
    if sp.hostname is not None:
        host = _norm_escapes(sp.hostname)  # hostname is lowercased by urlsplit
        if ":" in host:
            host = f"[{host}]"  # IPv6 literal: urlsplit strips the brackets
        port = None
        try:
            port = sp.port
        except ValueError:
            pass
        userinfo = ""
        if sp.username is not None:
            userinfo = sp.username
            if sp.password is not None:
                userinfo += ":" + sp.password
            userinfo += "@"
        netloc = userinfo + host
        if port is not None and str(port) != _DEFAULT_PORT.get(scheme):
            netloc += f":{port}"
    path = _remove_dot_segments(_norm_escapes(sp.path))
    if netloc and not path:
        path = "/"
    query = _norm_escapes(sp.query)
    return urlunsplit((scheme, netloc, path, query, ""))


def canonical_url_udf(url: Column) -> Column:
    """Arrow-batched column form of ``canonical_url`` (NULL in, NULL out)."""

    @F.pandas_udf(T.StringType())
    def _canon(s):
        return s.map(lambda u: None if u is None else canonical_url(u))

    return _canon(url)
