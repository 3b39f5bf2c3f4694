"""Ported DomExtensionsTests + EnumerableExtensionsTests
(/root/reference Carbon.Readability.Tests/DomExtensionsTests.cs,
EnumerableExtensionsTests.cs)."""

import pytest

from nreadability_spark.readability.dom import Element, Text
from nreadability_spark.readability.transcoder import (_single_or_none,
                                                       set_inner_html)


def make_div(attrs=None):
    el = Element("div")
    if attrs:
        el.attrs.update(attrs)
    return el


# --- GetAttributesString -------------------------------------------------------

def test_attributes_string_null_separator_raises():
    with pytest.raises((TypeError, AttributeError)):
        make_div({"a": "x"}).get_attributes_string(None)


def test_attributes_string_empty():
    assert make_div().get_attributes_string("|") == ""


def test_attributes_string_single():
    assert make_div({"attr1": "val1"}).get_attributes_string("|") == "val1"


def test_attributes_string_multiple():
    el = make_div({"attr1": "val1", "attr2": "val2"})
    assert el.get_attributes_string("|") == "val1|val2"


def test_attributes_string_skips_empty_values():
    el = make_div({"attr1": "", "attr2": "val2"})
    assert el.get_attributes_string("|") == "val2"


# --- GetInnerHtml / SetInnerHtml ------------------------------------------------

def test_get_inner_html_text_multiline():
    el = make_div()
    el.add(Text("text1\ntext2"))
    # parsed newlines are normalized; the writer emits CRLF (.NET parity)
    assert el.get_inner_html() == "text1\r\ntext2"


def test_get_inner_html_html():
    el = make_div()
    el.add(Text("text1"))
    p = Element("p")
    p.add(Text("text2"))
    el.add(p)
    el.add(Text("text3"))
    assert el.get_inner_html() == "text1<p>text2</p>text3"


def test_set_inner_html_text():
    el = make_div()
    set_inner_html(el, "text")
    assert el.get_inner_html() == "text"


def test_set_inner_html_text_multiline():
    el = make_div()
    set_inner_html(el, "\r\ntext1\r\ntext\r\n")
    assert el.get_inner_html() == "\r\ntext1\r\ntext\r\n"


def test_set_inner_html_html():
    el = make_div()
    set_inner_html(el, "text1<p>text2</p>text3")
    assert el.get_inner_html() == "text1<p>text2</p>text3"


def test_set_inner_html_html_multiline():
    el = make_div()
    set_inner_html(el, "\r\ntext1\r\n<p>\r\ntext2\r\n</p>\r\ntext3\r\n")
    assert el.get_inner_html() == \
        "\r\ntext1\r\n<p>\r\ntext2\r\n</p>\r\ntext3\r\n"


def test_set_inner_html_entity_amp():
    el = make_div()
    set_inner_html(el, "&amp;")
    assert "&" in el.get_inner_html()


def test_set_inner_html_entity_raquo():
    el = make_div()
    set_inner_html(el, "&raquo;")
    assert "»" in el.get_inner_html()


# --- SingleOrNone ----------------------------------------------------------------

def test_single_or_none_empty():
    assert _single_or_none([]) is None


def test_single_or_none_one():
    assert _single_or_none(["a"]) == "a"


def test_single_or_none_many():
    assert _single_or_none(["a", "b"]) is None
