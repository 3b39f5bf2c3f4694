"""Ported SgmlDomBuilderTests / SgmlDomSerializerTests / HtmlUtilsTests /
DomExtensions behaviors."""

from nreadability_spark.readability import build_document, serialize_document
from nreadability_spark.readability.parser import remove_script_tags


def count_substring_ci(s, sub):
    return s.lower().count(sub.lower())


def test_build_dom_expands_entities():
    document = build_document("<html><head></head><body>&raquo;</body></html>")
    assert "»" in document.to_string()


def test_builder_single_root_with_bom_and_doctype():
    html = ('﻿<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 '
            'Transitional//EN" '
            '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">\n'
            '<html xmlns="http://www.w3.org/1999/xhtml" dir="ltr" '
            'lang="pl-PL">\n<head>\n'
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=UTF-8" />\n'
            "<title>Jak zwiększyć</title>\n"
            "<script type='text/javascript'>var x = 1 < 2;</script>\n"
            "</head>\n<body>Some body</body></html>")
    document = build_document(html)
    serialized = serialize_document(document)
    assert count_substring_ci(serialized, "<html") == 1


def test_builder_invalid_entity_does_not_throw():
    document = build_document("<p>&#</p>")
    serialize_document(document)


def test_serializer_removes_viewport_meta():
    html = ('<html><head><meta name="viewport" content="width=1100" />'
            "</head><body></body></html>")
    document = build_document(html)
    serialized = serialize_document(document, pretty_print=True)
    assert count_substring_ci(serialized, '<meta name="viewport"') == 0


def test_serializer_generator_meta_kept_once():
    html = ('<html><head><meta name="generator" value="WordPress"'
            "</head><body></body></html>")
    document = build_document(html)
    serialized = serialize_document(document)
    assert count_substring_ci(serialized, '<meta name="generator"') == 1


def test_serializer_removes_content_type_meta():
    html = ('<html><head><meta http-equiv="Content-Type" value="UTF-8"'
            "</head><body></body></html>")
    document = build_document(html)
    serialized = serialize_document(document)
    assert count_substring_ci(serialized, '<meta http-equiv="Content-Type"') == 0


# --- HtmlUtils.RemoveScriptTags ----------------------------------------------

def test_remove_script_tags_simple():
    assert remove_script_tags("a<script>x</script>b") == "ab"


def test_remove_script_tags_unterminated():
    assert remove_script_tags("a<script>x") == "a"


def test_remove_script_tags_multiple():
    s = "a<script>x</script>b<script src='y'>z</script>c"
    assert remove_script_tags(s) == "abc"


def test_remove_script_tags_none():
    assert remove_script_tags("abc") == "abc"


def test_remove_script_tags_case_insensitive():
    assert remove_script_tags("a<SCRIPT>x</ScRiPt>b") == "ab"


# --- parser recovery behaviors ------------------------------------------------

def test_tag_soup_paragraph_siblings():
    document = build_document("<body><p>a one<p>b two</body>")
    body = document.root.get_elements_by_tag_name("body")[0]
    assert [e.tag for e in body.elements()] == ["p", "p"]


def test_list_item_auto_close():
    document = build_document("<ul><li>one<li>two<li>three</ul>")
    ul = document.get_elements_by_tag_name("ul")[0]
    assert [e.tag for e in ul.elements()] == ["li", "li", "li"]
    assert [e.value for e in ul.elements()] == ["one", "two", "three"]


def test_unmatched_end_tag_dropped():
    document = build_document("<div>a</span>b</div>")
    div = document.get_elements_by_tag_name("div")[0]
    assert div.value == "ab"


def test_duplicate_attributes_ignored():
    document = build_document('<div id="a" id="b">x</div>')
    assert document.get_elements_by_tag_name("div")[0].get_id() == "a"


def test_valueless_attribute_gets_own_name():
    document = build_document("<input disabled>")
    el = document.get_elements_by_tag_name("input")[0]
    assert el.get_attribute("disabled") == "disabled"


def test_script_cdata_not_parsed():
    document = build_document(
        "<body><script>if (a < b) { x(); }</script><p>text here now</p></body>")
    assert len(document.get_elements_by_tag_name("p")) == 1


def test_windows_1252_charref_mapping():
    document = build_document("<body><p>a&#146;b &#8217;c</p></body>")
    p = document.get_elements_by_tag_name("p")[0]
    assert p.value == "a’b ’c"


def test_undefined_entity_kept_literal():
    document = build_document("<body><p>x &foobarbaz; y</p></body>")
    p = document.get_elements_by_tag_name("p")[0]
    assert "&foobarbaz;" in p.value


def test_whitespace_only_text_dropped():
    document = build_document("<div>  \n  <p>text content</p>  \n  </div>")
    div = document.get_elements_by_tag_name("div")[0]
    assert len(div.nodes()) == 1


def test_tail_after_html_close_trimmed():
    document = build_document(
        "<html><body><p>content here</p></body></html><script>junk(</script>")
    assert len(document.get_elements_by_tag_name("script")) == 0


def test_empty_document():
    document = build_document("   ")
    assert document.root is None


def test_serializer_empty_element_spacing():
    document = build_document('<div><br><img src="x"></div>')
    s = document.to_string()
    assert "<br />" in s
    assert '<img src="x" />' in s


def test_serializer_escapes():
    document = build_document("<div>a &amp; b &lt; c</div>")
    s = document.to_string()
    assert "a &amp; b &lt; c" in s
