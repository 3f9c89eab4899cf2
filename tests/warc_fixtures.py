"""Shared WARC/HTTP fixture builders — ONE place that knows the record
framing, so a format change (WARC/1.1, new mandatory header) is fixed once
instead of drifting across suites (round-10 review finding)."""

from __future__ import annotations


def http_response(body: bytes, ctype: bytes = b"text/html", extra: bytes = b"") -> bytes:
    """One HTTP/1.1 response message; ``extra`` appends raw header lines
    (each must end with CRLF)."""
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n" + extra + b"\r\n" + body
    )


def warc_record(rtype: str, payload: bytes, uri: str = "", rid: str = "id:1") -> bytes:
    """One WARC/1.0 record with the mandatory headers and the two-CRLF
    inter-record separator."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: 2024-01-01T00:00:00Z",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri:
        headers.insert(2, b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"
