"""PrettyPrint fidelity: the indenting writer must follow the .NET
XmlWriter algorithm (referencesource XmlEncodedRawTextWriterIndent) that
XDocument.ToString(SaveOptions.None) uses — the reference's PrettyPrint
path (SgmlDomSerializer.cs:69). Expected strings below are derived from
that algorithm's semantics: per-scope mixed-content suppression with the
flag pushed/popped (not inherited), CRLF newlines, 2-space indent, no
leading newline before the first write."""

import pytest

from nreadability_spark.readability import build_document
from nreadability_spark.readability.dom import (Comment, Element, Text,
                                                _PrettyWriter)


def pretty(html: str) -> str:
    doc = build_document(f"<html><body>{html}</body></html>")
    return doc.root.get_elements_by_tag_name("body")[0] \
        .to_string(pretty=True)


@pytest.mark.parametrize("html, expected", [
    # element-only content: every child on its own indented line
    ("<a><b><c/></b></a>",
     "<body>\r\n  <a>\r\n    <b>\r\n      <c />\r\n    </b>\r\n  </a>"
     "\r\n</body>"),
    # text-only child stays inline inside its own element
    ("<a><b>t</b><c/></a>",
     "<body>\r\n  <a>\r\n    <b>t</b>\r\n    <c />\r\n  </a>\r\n</body>"),
    # text AFTER an element: the earlier child was indented, but once the
    # scope turns mixed nothing else (incl. the end tag) is indented
    ("<a><b/>t<c/></a>",
     "<body>\r\n  <a>\r\n    <b />t<c /></a>\r\n</body>"),
    # a child scope of a mixed element starts un-mixed: indentation
    # resumes inside it
    ("<div>text<p><b/></p></div>",
     "<body>\r\n  <div>text<p>\r\n      <b />\r\n    </p></div>\r\n</body>"),
    # text-leading mixed content: everything inline
    ("<div>text<p/>tail</div>",
     "<body>\r\n  <div>text<p />tail</div>\r\n</body>"),
])
def test_indent_rules(html, expected):
    assert pretty(html) == expected


def test_document_level_siblings_crlf_separated():
    w = _PrettyWriter()
    a = Element("a")
    a.add(Element("b"))
    w.write(Comment(" c "), 0)
    w.write(a, 0)
    assert "".join(w.out) == "<!-- c -->\r\n<a>\r\n  <b />\r\n</a>"


def test_cdata_marks_scope_mixed():
    d = Element("div")
    d.add(Element("p"))
    d.add(Text("x", is_cdata=True))
    assert d.to_string(pretty=True) == "<div>\r\n  <p /><![CDATA[x]]></div>"


def test_comment_is_indented_but_not_mixing():
    d = Element("div")
    d.add(Comment("c"))
    d.add(Element("p"))
    assert d.to_string(pretty=True) == \
        "<div>\r\n  <!--c-->\r\n  <p />\r\n</div>"


def test_no_leading_newline_on_single_node():
    e = Element("a")
    assert e.to_string(pretty=True) == "<a />"
