"""Transcode-level assertions ported from the reference test suite:
URL resolution matrix, transformers, titles, meta handling, empty article.
(Tests/NReadabilityTranscoderTests.cs:675-974)."""

import pytest

from nreadability_spark.readability import transcode
from nreadability_spark.readability.transcoder import Transcoder

DUMMY_PARAGRAPHS = (
    "<p>Lorem ipsum dolor et amet. Lorem ipsum dolor et amet. Lorem ipsum "
    "dolor et amet. Lorem ipsum dolor et amet.</p>" * 5
)


def wrap(middle):
    return f"<html><body>{DUMMY_PARAGRAPHS}{middle}{DUMMY_PARAGRAPHS}</body></html>"


IMAGE_URL_CASES = [
    ("http://example.com/image.jpg", "http://immortal.pl/doc.html",
     "http://example.com/image.jpg"),
    ("https://example.com/image.jpg", "http://immortal.pl",
     "https://example.com/image.jpg"),
    ("ftp://example.com/image.jpg", "http://immortal.pl/doc.html",
     "ftp://example.com/image.jpg"),
    ("A(*Sf6as7f 9A*(659A^SF 6987aSF", "http://immortal.pl/",
     "http://immortal.pl/A(*Sf6as7f 9A*(659A^SF 6987aSF"),
    ("file:///C:/Users/Administrator/image.jpg",
     "http://immortal.pl/index.html",
     "file:///C:/Users/Administrator/image.jpg"),
    ("image.png", "p//immortal.pl/", "image.png"),
    ("image.png", "AS&F*(^ASF", "image.png"),
    ("image.jpg", "http://immortal.pl", "http://immortal.pl/image.jpg"),
    ("image.jpg", "http://immortal.pl/index.html",
     "http://immortal.pl/image.jpg"),
    ("/image.jpg", "http://immortal.pl", "http://immortal.pl/image.jpg"),
    ("/image.jpg", "http://immortal.pl/", "http://immortal.pl/image.jpg"),
    ("static/gfx/image.gif", "http://immortal.pl",
     "http://immortal.pl/static/gfx/image.gif"),
    ("static/gfx/image.gif", "http://immortal.pl/",
     "http://immortal.pl/static/gfx/image.gif"),
    ("/static/gfx/image.gif", "http://immortal.pl",
     "http://immortal.pl/static/gfx/image.gif"),
    ("/static/gfx/image.gif", "http://immortal.pl/",
     "http://immortal.pl/static/gfx/image.gif"),
    ("/static/gfx/image.gif", "http://immortal.pl/article/doc.html",
     "http://immortal.pl/static/gfx/image.gif"),
    ("static/gfx/image.gif", "http://immortal.pl/article",
     "http://immortal.pl/static/gfx/image.gif"),
    ("static/gfx/image.gif", "http://immortal.pl/article/",
     "http://immortal.pl/article/static/gfx/image.gif"),
    ("/static/gfx/image.gif",
     "http://immortal.pl/article/doc.html?someParam=1",
     "http://immortal.pl/static/gfx/image.gif"),
    ("image.png", "http://immortal.pl/article/doc.html",
     "http://immortal.pl/article/image.png"),
    ("/image.png", "http://immortal.pl/article/doc.html",
     "http://immortal.pl/image.png"),
    ("image.png", "http://immortal.pl/article/doc.html?someKey=some/Value?aksd",
     "http://immortal.pl/article/image.png"),
    ("/image.png", "http://immortal.pl/article/doc.html?someKey=some/Value?aksd",
     "http://immortal.pl/image.png"),
    ("image.png", "immortal.pl/article/doc.html?someKey=some/Value?aksd",
     "image.png"),
    ("image.png", "htt//immortal.pl/arti", "image.png"),
    ("image.png", "http:immortal.pl", "image.png"),
    ("image.png", "/immortal.pl", "image.png"),
]


@pytest.mark.parametrize("src,url,expected", IMAGE_URL_CASES)
def test_replacing_image_urls(src, url, expected):
    html = wrap(f'<p><img src="{src}" /></p>')
    result = transcode(html, url)
    assert result.content_extracted
    assert f'src="{expected}"' in result.content, (
        f"src={src} base={url} expected={expected}")


def test_replacing_link_urls():
    html = wrap('<p><a href="/wiki/article1">link</a></p>')
    result = transcode(html, "http://wikipedia.org/wiki/baseArticle")
    assert result.content_extracted
    assert 'href="http://wikipedia.org/wiki/article1"' in result.content


def test_replacing_query_string_link_urls():
    html = wrap('<p><a href="?hello">link</a></p>')
    result = transcode(html, "http://wikipedia.org/wiki/baseArticle")
    assert result.content_extracted
    assert 'href="http://wikipedia.org/wiki/baseArticle?hello"' in result.content

    result = transcode(html, "http://wikipedia.org/wiki/baseArticle?goodbye")
    assert result.content_extracted
    assert 'href="http://wikipedia.org/wiki/baseArticle?hello"' in result.content


def test_empty_article():
    result = transcode("<html><body></body></html>",
                       "http://wikipedia.org/wiki/baseArticle")
    assert not result.content_extracted


def test_mobile_headers():
    result = transcode(f"<html><body>{DUMMY_PARAGRAPHS}</body></html>",
                       "http://wikipedia.org/wiki/baseArticle")
    assert result.content_extracted


def test_meta_viewport_removed():
    meta = '<meta name="viewport" content="width=1000" />'
    html = (f"<html><head>{meta}</head><body>{DUMMY_PARAGRAPHS}</body></html>")
    result = transcode(html, "http://wikipedia.org/wiki/baseArticle")
    assert result.content_extracted
    assert meta not in result.content
    assert 'name="viewport"' not in result.content


def test_image_source_transformer():
    original = "http://example.com/some_image.jpg"
    expected = "http://imageresizer.com/u=" + original

    t = Transcoder()
    t.image_source_transformer = \
        lambda value, el: ("http://imageresizer.com/u=" + value, "origsrc")
    html = wrap(f'<p><img src="{original}" /></p>')
    result = t.transcode(html, "http://immortal.pl/")
    assert result.content_extracted
    assert f'src="{expected}"' in result.content
    assert f'origsrc="{original}"' in result.content


def test_anchor_href_transformer():
    original = "http://example.com/some_article.html"
    expected = "http://redirector.com/u=" + original

    t = Transcoder()
    t.anchor_href_transformer = \
        lambda value, el: ("http://redirector.com/u=" + value, "orighref")
    html = wrap(f'<p><a href="{original}">Some article</a></p>')
    result = t.transcode(html, "http://immortal.pl/")
    assert result.content_extracted
    assert f'href="{expected}"' in result.content
    assert f'orighref="{original}"' in result.content


# --- titles -------------------------------------------------------------------

def test_title_from_title_tag():
    expected = "Some title ąęłóżźńć"
    html = (f"<html><head><title>{expected}</title></head>"
            "<body></body></html>")
    result = transcode(html)
    assert result.title == expected


def test_title_from_body_h1():
    expected = "Some title ąęłóżźńć"
    html = (f'<html><body><div id="main"><h1>{expected}</h1>'
            f"{DUMMY_PARAGRAPHS}</div></body></html>")
    result = transcode(html)
    assert result.title == expected


def test_title_from_body_h2():
    expected = "Some title ąęłóżźńć"
    html = (f'<html><body><div id="main"><h2>{expected}</h2>'
            f"{DUMMY_PARAGRAPHS}</div></body></html>")
    result = transcode(html)
    assert result.title == expected


def test_title_whitespace_cleanup():
    expected = "Гостиница - Ги де Мопассан"
    title = "Гостиница\n-  \r Ги  \t  де \n\n \r Мопассан \r\n"
    html = (f"<html><head><title>{title}</title></head><body></body></html>")
    result = transcode(html)
    assert result.title == expected
