"""Byte-to-text decoding for raw page payloads.

Mirrors the reference's stream-input behavior (Sgml/SgmlParser.cs:19-115
``HtmlStream.AutoDetectEncoding``): BOM sniffing first, then a meta
charset declaration probed in the ASCII-superset prefix, finally UTF-8
with replacement (what ``File.ReadAllText`` effectively does for the
fixture corpus).
"""

from __future__ import annotations

import codecs
import re

_BOMS = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)"""
    rb"""|content\s*=\s*["'][^"']*charset=([A-Za-z0-9_\-]+))""",
    re.IGNORECASE)

# frequent web aliases Python spells differently
_ALIASES = {
    "windows-1252": "cp1252", "win-1252": "cp1252", "x-sjis": "shift_jis",
    "iso-8859-1": "latin-1", "us-ascii": "ascii", "unicode": "utf-16",
}


def decode_html_bytes(payload: bytes) -> str:
    """Decode raw page bytes: BOM, then <meta charset>, then UTF-8 with
    replacement. Never raises."""
    if not payload:
        return ""
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            try:
                return payload[len(bom):].decode(enc, errors="replace")
            except LookupError:  # pragma: no cover
                break
    m = _META_CHARSET_RE.search(payload[:4096])
    if m:
        name = (m.group(1) or m.group(2)).decode("ascii", "ignore").lower()
        name = _ALIASES.get(name, name)
        if name not in ("utf-8", "utf8"):
            try:
                return payload.decode(name, errors="replace")
            except LookupError:
                pass
    return payload.decode("utf-8", errors="replace")
