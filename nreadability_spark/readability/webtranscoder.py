"""Multi-page article stitching (W1), single-document side.

Parity target: ReadabilityWebTranscoder (/root/reference
Carbon.Readability/ReadabilityWebTranscoder.cs:136-270). The fetcher is a
plain callable ``url -> html | None`` (the IUrlFetcher seam); at dataset
scale the same stitching runs as an iterative DataFrame self-join in
``nreadability_spark.spark.stitch``.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from . import parser
from .dom import Element
from .transcoder import (TranscodeResult, Transcoder, serialize_document,
                         set_inner_html)

MAX_PAGES = 30
PAGE_ID_PREFIX = "readability-page-"


def default_page_separator(page_number: int) -> str:
    return (f"<p class='page-separator' title='Page {page_number}'>"
            "&sect;</p>")


def _first_child_element(el: Element, tag: str) -> Optional[Element]:
    for child in el.elements():
        if child.tag == tag:
            return child
    return None


class WebTranscoder:
    """Fetches an article page chain and stitches the extracted pages."""

    def __init__(self, transcoder: Optional[Transcoder] = None,
                 fetcher: Optional[Callable[[str], Optional[str]]] = None,
                 page_separator_builder=default_page_separator):
        self._transcoder = transcoder or Transcoder()
        self._fetcher = fetcher
        self._page_separator_builder = page_separator_builder
        self._parsed_pages: list[str] = []
        self._cur_page_num = 0

    def transcode(self, url: str, pretty_print: bool = False) -> TranscodeResult:
        self._cur_page_num = 1
        self._parsed_pages = [re.sub(r"\/$", "", url)]

        html_content = self._fetcher(url)
        if not html_content:
            return TranscodeResult(False, None, None, None)

        document, extracted, title, next_page, _text = \
            self._transcoder.transcode_to_xml(html_content, url)

        if next_page is not None:
            self._append_next_page(document, next_page)

        if self._cur_page_num > 1:
            inner = document.get_element_by_id("readInner")
            if inner is not None:
                container = _first_child_element(inner, "div")
                if container is not None:
                    container.set_id(PAGE_ID_PREFIX + "1")
                    container.set_class("page")

        content = serialize_document(document, pretty_print=pretty_print)
        return TranscodeResult(extracted, content, title, None)

    def _append_next_page(self, document, url: str) -> None:
        self._cur_page_num += 1
        content_div = document.get_element_by_id("readInner")
        if content_div is None:
            return

        if self._cur_page_num > MAX_PAGES:
            fragment = ("<div style='text-align: center'><a href='" + url
                        + "'>View Next Page</a></div>")
            tmp = parser.build_document(fragment)
            if tmp.root is not None:
                div = _first_child_element(tmp.root, "div")
                if div is not None:
                    div.remove() if div.parent is not None else None
                    content_div.add(div)
            return

        next_content = self._fetcher(url)
        if not next_content:
            return

        next_doc, _extracted, _title, next_page_link, _text = \
            self._transcoder.transcode_to_xml(next_content, url)

        next_inner = next_doc.get_element_by_id("readInner")
        if next_inner is None:
            return
        header = _first_child_element(next_inner, "h1")
        if header is not None:
            header.remove()

        # anti-duplicate: if the previous content already contains the new
        # page's first sizeable paragraph, skip the page
        paras = next_inner.get_elements_by_tag_name("p")
        first_p = paras[0] if paras else None
        if first_p is not None and len(first_p.get_inner_html()) > 100:
            existing = content_div.value
            inner_text = first_p.value
            if (existing and inner_text
                    and inner_text.lower() in existing.lower()):
                self._parsed_pages.append(url)
                return

        next_div = Element("div")
        if self._page_separator_builder is not None:
            set_inner_html(next_div,
                           self._page_separator_builder(self._cur_page_num))
        next_div.set_id(PAGE_ID_PREFIX + str(self._cur_page_num))
        next_div.set_class("page")
        next_div.add(next_inner.nodes())
        content_div.add(next_div)
        self._parsed_pages.append(url)

        if next_page_link and next_page_link not in self._parsed_pages:
            self._append_next_page(document, next_page_link)
