"""Byte-decoding (BOM / meta charset sniff) tests."""

import codecs

from nreadability_spark.readability.encoding import decode_html_bytes


def test_utf8_plain():
    assert decode_html_bytes("żółć".encode("utf-8")) == "żółć"


def test_utf8_bom():
    payload = codecs.BOM_UTF8 + "x<html></html>".encode("utf-8")
    assert decode_html_bytes(payload) == "x<html></html>"


def test_utf16_le_bom():
    payload = codecs.BOM_UTF16_LE + "<html><p>tekst ż</p></html>" \
        .encode("utf-16-le")
    assert decode_html_bytes(payload) == "<html><p>tekst ż</p></html>"


def test_meta_charset_cp1252():
    html = (b'<html><head><meta charset="windows-1252"></head>'
            b"<body>caf\xe9 \x93quoted\x94</body></html>")
    decoded = decode_html_bytes(html)
    assert "café" in decoded
    assert "“quoted”" in decoded


def test_meta_http_equiv_charset():
    html = (b'<html><head><meta http-equiv="Content-Type" '
            b'content="text/html; charset=iso-8859-2"></head>'
            b"<body>\xb1\xe6</body></html>")
    decoded = decode_html_bytes(html)
    assert "ąć" in decoded


def test_invalid_utf8_fallback_replaces():
    assert "�" in decode_html_bytes(b"<p>bad \x92 byte</p>")


def test_unknown_charset_falls_back():
    html = b'<meta charset="not-a-real-charset"><p>ok</p>'
    assert "ok" in decode_html_bytes(html)


def test_empty():
    assert decode_html_bytes(b"") == ""
