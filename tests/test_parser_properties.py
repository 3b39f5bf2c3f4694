"""Property-based robustness: the parser/transcoder must never crash on
arbitrary input, must be deterministic, and serialization must re-parse."""

from hypothesis import given, settings, strategies as st

from nreadability_spark.readability import build_document, transcode
from nreadability_spark.readability.parser import ParseError, expand_entities

# fragments that stress the tokenizer's recovery paths
_frag = st.sampled_from([
    "<div>", "</div>", "<p class='x", "<!-- c --", "<![CDATA[x",
    "<script>if(a<b)", "</script>", "&amp;", "&#x41;", "&#999999999;",
    "&bogus;", "<", ">", "<%asp%>", "<?pi?>", "<!DOCTYPE html>",
    "<a href=#>", "text, with commas. ", "<td>", "<tr>", "<table>",
    "<li>item", " ", "�", "<b><i>nest", "<IMG SRC=x>",
    "<input disabled>", "<x:y>", "<1invalid>", "<div a=1 a=2>", "]]>",
    "--><p>more words here to score, maybe. ",
])
soup = st.lists(_frag, min_size=0, max_size=40).map("".join)
junk = st.text(min_size=0, max_size=200)


@given(st.one_of(soup, junk))
@settings(max_examples=150, deadline=None)
def test_parser_never_crashes_and_is_deterministic(html):
    try:
        a = build_document(html)
    except ParseError:
        return  # only the CDATA EndOfFile path may raise (triggers retry)
    b = build_document(html)
    assert a.to_string() == b.to_string()


@given(soup)
@settings(max_examples=80, deadline=None)
def test_serialized_output_reparses(html):
    try:
        doc = build_document(html)
    except ParseError:
        return
    s = doc.to_string()
    doc2 = build_document(s)
    # serialize(parse(serialize(x))) is a fixpoint
    assert doc2.to_string() == build_document(doc2.to_string()).to_string()


@given(st.one_of(soup, junk))
@settings(max_examples=100, deadline=None)
def test_transcode_total_on_nonempty(html):
    if not html.strip().strip("﻿"):
        return
    r1 = transcode(html, "http://example.org/articles/1")
    r2 = transcode(html, "http://example.org/articles/1")
    assert r1.content == r2.content
    assert r1.title == r2.title
    assert r1.next_page_url == r2.next_page_url


@given(junk)
@settings(max_examples=100, deadline=None)
def test_expand_entities_total(s):
    assert expand_entities(s) == expand_entities(s)
