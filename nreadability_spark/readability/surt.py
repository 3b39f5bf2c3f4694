"""SURT (Sort-friendly URI Reordering Transform) canonicalization.

The key format of web-archive URL indexes (Common Crawl's CDX index,
OpenWayback, pywb): the host is reversed into big-endian order
(``org,example,www)/path``) so one host's pages — and one registered
domain's subdomains — sort adjacently, turning host/domain lookups into
range scans. This module implements the de-facto canonicalization the
CC index applies before SURTing:

* scheme dropped; host lowercased; leading ``www.`` stripped;
* default ports stripped (80/443), other ports kept;
* percent-encodings of unreserved characters decoded, others kept
  (uppercased hex) so equivalent encodings collide;
* path lowercased with ``/.`` and ``/..`` segments resolved; trailing
  slash dropped (except the root);
* query keys/values sorted (stable) so parameter order doesn't split
  one resource across keys; empty query dropped; fragment dropped.

Pure function over a url string; never raises (unparseable input falls
back to a best-effort key so an index row is never lost).
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?")
_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                  "abcdefghijklmnopqrstuvwxyz0123456789-._~")


def _decode_unreserved_lower(s: str) -> str:
    """%XX of unreserved chars -> literal (then lowercased); other
    escapes keep uppercase hex; bare '%' passes through. Decoding
    happens BEFORE lowercasing so '/%41' and '/A' both canonicalize to
    '/a' — equivalent encodings of the same resource must collide."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 3 <= n \
                and re.match(r"%[0-9A-Fa-f]{2}", s[i:i + 3]):
            ch = chr(int(s[i + 1:i + 3], 16))
            if ch in _UNRESERVED:
                out.append(ch.lower())
            else:
                out.append("%" + s[i + 1:i + 3].upper())
            i += 3
        else:
            out.append(c.lower())
            i += 1
    return "".join(out)


def _resolve_dots(path: str) -> str:
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    return "/".join(segs)


def canonicalize(url: str) -> tuple[str, str, str]:
    """(host, path, query) after canonicalization; ('', url, '') when no
    host can be found."""
    u = (url or "").strip()
    u = _SCHEME_RE.sub("", u, count=1)
    u = u.split("#", 1)[0]
    # query starts at the first '?' no matter what follows it — split it
    # off BEFORE partitioning on '/' so slashes inside the query can't
    # be mistaken for the path ('example.com?a=1/b' has path '/').
    pre_q, _, query = u.partition("?")
    hostport, sep, rest = pre_q.partition("/")
    path = "/" + rest if sep else "/"
    if "@" in hostport:
        hostport = hostport.rsplit("@", 1)[1]
    host = hostport.lower()
    if host.endswith(":80") or host.endswith(":443"):
        host = host.rsplit(":", 1)[0]
    if host.startswith("www.") and len(host) > 4:
        host = host[4:]
    host = host.strip(".")
    if not host or not re.match(r"^[a-z0-9.:\[\]_-]+$", host):
        return "", (url or "").lower(), ""
    path = _decode_unreserved_lower(path)
    path = _resolve_dots(path)
    if path.endswith("/") and len(path) > 1:
        path = path[:-1]
    if not path:
        path = "/"
    if query:
        parts = sorted(_decode_unreserved_lower(query).split("&"))
        query = "&".join(p for p in parts if p)
    return host, path, query


def surt_key(url: str) -> str:
    """The sortable index key: ``tld,domain,sub)/path?k=v``."""
    host, path, query = canonicalize(url)
    if not host:
        return ")" + path  # hostless fallback: sorts into its own range
    # IPs/ports keep their order; domain names reverse label order
    hp = host.rsplit(":", 1)
    labels = hp[0].split(".")
    if all(lb.isdigit() for lb in labels) and len(labels) == 4:
        key_host = hp[0]
    else:
        key_host = ",".join(reversed(labels))
    if len(hp) == 2:
        key_host += ":" + hp[1]
    out = key_host + ")" + path
    if query:
        out += "?" + query
    return out
