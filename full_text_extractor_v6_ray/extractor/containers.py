"""Container payloads: gzip members and WARC records (S7 router breadth).

Common-Crawl-style corpora frequently carry pages still wrapped in their
capture container: a gzip member (one record of a .warc.gz), or raw
WARC records (warcinfo/request records skipped, first content record
wins) whose block is an HTTP response. Both unwrap in-process and
re-enter the sniff->route->extract pipeline (bounded depth), so a
`documents` table mixing raw HTML, gzip members and WARC records
extracts uniformly.

Safety: gzip inflation is bounded (decompression-bomb guard) and every
parse error degrades to None — the caller's never-raise contract holds.
"""

from __future__ import annotations

import zlib


def gzip_inner(payload: bytes, max_bytes: int) -> bytes | None:
    """First gzip member, inflated, or None; ValueError when the inflated
    size exceeds ``max_bytes`` (bomb guard — never inflate unbounded)."""
    try:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(payload, max_bytes + 1)
    except Exception:
        return None
    if len(out) > max_bytes:
        raise ValueError("gzip_too_large")
    return out or None


_MAX_WARC_RECORDS = 64


def warc_inner(payload: bytes) -> bytes | None:
    """Content block of the first CONTENT record (``response`` /
    ``resource`` / ``conversion``) — real .warc payloads lead with a
    ``warcinfo`` record and interleave ``request``/``metadata`` records,
    which are skipped by their ``Content-Length`` (record iteration is
    bounded). For ``application/http; msgtype=response`` blocks, the HTTP
    entity body (status line + headers stripped). None when no content
    record is found or the payload is malformed."""
    pos = 0
    for _ in range(_MAX_WARC_RECORDS):
        if not payload.startswith(b"WARC/", pos):
            return None
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return None
        headers: dict[bytes, bytes] = {}
        for line in payload[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        wtype = headers.get(b"warc-type", b"")
        body = payload[head_end + 4:]
        try:
            n = int(headers.get(b"content-length", b""))
        except ValueError:
            n = -1   # no/invalid length: rest of payload, last record
        if n >= 0:
            body = body[:n]
        if wtype in (b"response", b"resource", b"conversion"):
            ctype = headers.get(b"content-type", b"")
            if ctype.split(b";")[0].strip() == b"application/http":
                http_end = body.find(b"\r\n\r\n")
                if http_end < 0:
                    return None
                body = body[http_end + 4:]
            return body or None
        if n < 0:
            return None   # non-content record without a length: can't skip
        # skip this record's block + the \r\n\r\n record separator
        pos = head_end + 4 + n
        if payload.startswith(b"\r\n\r\n", pos):
            pos += 4
        elif payload.startswith(b"\r\n", pos):
            pos += 2
    return None
