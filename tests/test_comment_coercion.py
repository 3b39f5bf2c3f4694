"""P4 comment coercion parity (Sgml/SgmlReader.cs:1773-1813 ParseComment):
inner ``--`` runs collapse to ``-`` eating the preceding character; a
trailing ``-`` gets a space appended; the consumed span is still everything
up to the first ``-->``."""

import pytest

from nreadability_spark.readability import build_document
from nreadability_spark.readability.dom import Comment, Text
from nreadability_spark.readability.parser import _coerce_comment
from nreadability_spark.readability.transcoder import _try_parse_int32


@pytest.mark.parametrize("raw, coerced", [
    (" a -- b ", " a- b "),       # inner run eats the char before it
    ("a--", "- "),                # run at end -> '-', then trailing pad
    ("--x", "-x"),                # run at start keeps one '-'
    ("a---b", "-b"),              # longer runs are consumed whole
    ("ok comment", "ok comment"),  # well-formed value untouched
    ("-", "- "),                  # lone trailing dash padded
    ("", ""),
    ("a-b-c", "a-b-c"),           # single dashes untouched
])
def test_coerce_comment_matches_reference(raw, coerced):
    assert _coerce_comment(raw) == coerced


def _comments(document):
    return [n.value for n in document.descendant_nodes()
            if isinstance(n, Comment)]


def test_parsed_comment_values_are_coerced():
    doc = build_document(
        "<html><body><!-- a -- b --><p>x</p></body></html>")
    assert _comments(doc) == [" a- b "]


def test_comment_consumption_still_scans_to_first_close():
    # 'c' sits between a bare '>' and the real '-->': it must stay inside
    # the comment, and only 'after' is document text
    doc = build_document(
        "<html><body><!-- a -- b > c --><p>after</p></body></html>")
    texts = [n.value for n in doc.descendant_nodes()
             if isinstance(n, Text)]
    assert texts == ["after"]
    assert _comments(doc) == [" a- b > c "]


def test_coerced_comment_serializes_as_valid_xml():
    doc = build_document("<html><body><!--x----></body></html>")
    s = doc.to_string()
    # no '--' may survive inside the serialized comment
    inner = s.split("<!--", 1)[1].split("-->", 1)[0]
    assert "--" not in inner


@pytest.mark.parametrize("html, attrs", [
    # a stray quote at attribute-name position must consume the quoted
    # literal (reference ParseStartTag: ch is '=' OR a quote) — this input
    # previously never advanced the scan position (infinite loop)
    ("<p class='x<div class='sidebar'>", None),
    ("<a 'lonely quote'>x</a>", {}),
    # a quote directly after a name carries the value, no '=' needed
    ("<a name'v'>x</a>", {"name": "v"}),
    ("<div class='x' 'y' id='z'>t</div>", {"class": "x", "id": "z"}),
    ('<a "">x</a>', {}),
    ("<a ''''>x</a>", {}),
])
def test_stray_quotes_in_tags_terminate(html, attrs):
    from nreadability_spark.readability.dom import Element
    doc = build_document(html)  # must not hang
    if attrs is not None:
        el = next(e for e in doc.root.descendants()
                  if isinstance(e, Element) and e.tag in ("a", "div"))
        assert el.attrs == attrs


@pytest.mark.parametrize("text, expected", [
    ("7", 7), (" 7 ", 7), ("+3", 3), ("-2", -2),
    ("\t12\r\n", 12),
    ("1_0", None),            # Python int() quirk the reference rejects
    ("٣", None),              # unicode digits rejected
    ("3 ", None),        # nbsp is not int.TryParse whitespace
    (" 7 ", None),  # unicode line separators rejected
    ("e3", None), ("", None), ("- 3", None),
    ("2147483647", 2147483647), ("2147483648", None),
    ("-2147483648", -2147483648), ("-2147483649", None),
])
def test_try_parse_int32_is_strict(text, expected):
    assert _try_parse_int32(text) == expected
