"""System.Uri-compatible URL parsing/resolution.

Python's ``urljoin`` diverges from ``System.Uri`` on several cases the
reference's test matrix pins down (/root/reference
Carbon.Readability.Tests/NReadabilityTranscoderTests.cs:675-714), so this is
a small from-scratch resolver:

* an absolute base requires a scheme, and http/https/ftp additionally
  require an authority introduced by ``//`` (``http:immortal.pl`` is
  invalid);
* resolution output is the *unescaped* combined string
  (``Uri.OriginalString``): spaces and friends are preserved verbatim;
* dot-segments are collapsed;
* a relative url of just ``?query`` is attached to the base's path
  (scheme://host + absolute path + query), per ResolveElementUrl
  (ReadabilityTranscoder.cs:1571-1575).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Optional

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")
_AUTHORITY_SCHEMES = {"http", "https", "ftp"}


class ParsedUri:
    __slots__ = ("scheme", "authority", "host", "path", "query", "fragment")

    def __init__(self, scheme, authority, host, path, query, fragment):
        self.scheme = scheme
        self.authority = authority
        self.host = host
        self.path = path
        self.query = query
        self.fragment = fragment

    @property
    def absolute_path(self) -> str:
        return self.path if self.path else "/"


@lru_cache(maxsize=4096)
def try_parse_absolute(url: str) -> Optional[ParsedUri]:
    """Parse ``url`` as an absolute URI; None when System.Uri would refuse.

    Pure function over an effectively-immutable result (no caller writes
    ParsedUri fields), so it memoizes: pages on the same host re-parse
    the same base/nav URLs for every anchor of every document."""
    if url is None:
        return None
    url = url.strip()
    m = _SCHEME_RE.match(url)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = url[m.end():]
    authority = ""
    host = ""
    if rest.startswith("//"):
        rest = rest[2:]
        end = len(rest)
        for i, ch in enumerate(rest):
            if ch in "/?#":
                end = i
                break
        authority = rest[:end]
        rest = rest[end:]
        hostport = authority.rsplit("@", 1)[-1]
        host = hostport.rsplit(":", 1)[0] if re.search(r":\d*$", hostport) \
            else hostport
        host = host.lower()
        if scheme in _AUTHORITY_SCHEMES and not host:
            return None
    elif scheme in _AUTHORITY_SCHEMES:
        # http/https/ftp demand an authority ("http:immortal.pl" is invalid)
        return None
    path, query, fragment = rest, "", ""
    if "#" in path:
        path, fragment = path.split("#", 1)
    if "?" in path:
        path, query = path.split("?", 1)
    if authority and path and not path.startswith("/"):
        return None
    return ParsedUri(scheme, authority, host, path, query, fragment)


def _remove_dot_segments(path: str) -> str:
    if "." not in path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")):
        out.append("")
    return "/".join(out)


def resolve(base: ParsedUri, rel: str) -> str:
    """Combine like ``new Uri(baseUri, rel).OriginalString`` (unescaped)."""
    if rel is None:
        rel = ""
    abs_rel = try_parse_absolute(rel)
    if abs_rel is not None:
        return rel
    prefix = f"{base.scheme}://{base.authority}"
    if rel.startswith("//"):
        return f"{base.scheme}:{rel}"
    if rel.startswith("/"):
        return prefix + _remove_dot_segments(rel)
    if rel == "":
        result = prefix + base.absolute_path
        if base.query:
            result += "?" + base.query
        return result
    if rel.startswith("?"):
        return prefix + base.absolute_path + rel
    if rel.startswith("#"):
        result = prefix + base.absolute_path
        if base.query:
            result += "?" + base.query
        return result + rel
    # merge with the base path minus its last segment
    base_path = base.absolute_path
    slash = base_path.rfind("/")
    merged = base_path[:slash + 1] + rel
    return prefix + _remove_dot_segments(merged)


def resolve_element_url(url: str, article_url: str,
                        mailto_re=re.compile(r"^\s*mailto\s*:",
                                             re.IGNORECASE)) -> str:
    """ResolveElementUrl parity (ReadabilityTranscoder.cs:1554-1583)."""
    if mailto_re.match(url):
        return url
    base = try_parse_absolute(article_url)
    if base is None:
        return url
    if url.startswith("?"):
        return f"{base.scheme}://{base.host}{base.absolute_path}{url}"
    return resolve(base, url)
