"""SGML-tolerant HTML parser producing a :mod:`dom` tree.

A from-scratch Python tokenizer + tree builder reproducing the tag-soup
recovery semantics of the reference's SgmlReader configuration
(CaseFolding.ToLower, DocType=HTML, WhitespaceHandling.None; see
/root/reference Carbon.Readability/SgmlDomBuilder.cs:88-114 and
Sgml/SgmlReader.cs -- behaviors catalogued in SURVEY.md §2.P):

P1   NUL bytes -> space
P2   char entities with Windows-1252 mapping of U+0080-U+009F
P3   named entities from the HTML 4.01 set; undefined kept literal
P6   DOCTYPE parsed and stripped
P7   PIs kept except the xml declaration
P8   ASP <% ... %> blocks -> CDATA
P9   lenient attribute scanning (unquoted values, valueless attr=name,
     duplicate attrs ignored, junk tokens skipped)
P10  '<' + non-letter -> literal text
P11  unmatched end tags dropped; matching end tag closes intermediates
P12  DTD-driven auto-close (never closes BODY-under-root or the root;
     required end tags block auto-close; unknown tags allowed anywhere)
P14  EMPTY content models self-close
P15  CDATA elements (script/style) read raw until the matching end tag;
     a missing end tag raises ParseError("EndOfFile") which triggers the
     script-strip retry (SgmlDomBuilder.cs:66-83)
P16  simulated <html> root when the first content isn't <html>
P17  a second root-level element terminates the parse
P18  EOF closes all open elements
P19  whitespace-only text nodes dropped
"""

from __future__ import annotations

import html.entities
import re

from . import dtd
from .dom import Comment, Document, Element, ProcessingInstruction, Text

# Windows-1252 mapping for U+0080..U+009F numeric character references
# (the IE/Netscape compatibility hack).
_CTRL_MAP = [
    8364, 129, 8218, 402, 8222, 8230, 8224, 8225, 710, 8240, 352, 8249, 338,
    141, 381, 143, 144, 8216, 8217, 8220, 8221, 8226, 8211, 8212, 732, 8482,
    353, 8250, 339, 157, 382, 376,
]

# HTML 4.01 named entity table (name -> codepoint), from the Python stdlib.
_ENTITIES = html.entities.name2codepoint


class ParseError(Exception):
    pass


def _expand_char_entity(s: str, i: int) -> tuple[str, int]:
    """Expand ``&#...`` starting after the ``#`` at index ``i``.

    Returns (expansion, next_index). The terminator is consumed only when
    it is ``;``.
    """
    v = 0
    n = len(s)
    if i < n and s[i] in "xX":
        i += 1
        seen = False
        while i < n:
            c = s[i]
            if "0" <= c <= "9":
                v = v * 16 + (ord(c) - 48)
            elif "a" <= c <= "f":
                v = v * 16 + (ord(c) - 87)
            elif "A" <= c <= "F":
                v = v * 16 + (ord(c) - 55)
            else:
                break
            seen = True
            i += 1
    else:
        seen = False
        while i < n and "0" <= s[i] <= "9":
            v = v * 10 + (ord(s[i]) - 48)
            seen = True
            i += 1
    if i < n and s[i] == ";":
        i += 1
    if not seen:
        return "", i
    if 0x80 <= v <= 0x9F:
        return chr(_CTRL_MAP[v - 0x80]), i
    try:
        return chr(v), i
    except ValueError:
        return "", i


def expand_entities(s: str) -> str:
    """Expand entities in a text run / attribute value (P2, P3)."""
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        amp = s.find("&", i)
        if amp == -1:
            out.append(s[i:])
            break
        if amp > i:
            out.append(s[i:amp])
        i = amp + 1
        if i >= n:
            out.append("&")
            break
        if s[i] == "#":
            exp, j = _expand_char_entity(s, i + 1)
            if exp == "" and j == i + 1:
                out.append("&#")
                i += 1
            else:
                out.append(exp)
                i = j
            continue
        # scan a name: letters/_/- plus digits after the first char
        j = i
        while j < n and (s[j].isalpha() or s[j] in "_-" or
                         (j > i and s[j].isdigit())):
            j += 1
        name = s[i:j]
        cp = _ENTITIES.get(name) if name else None
        if cp is not None:
            out.append(chr(cp))
            # quirk parity: the char terminating a defined entity is
            # consumed unless it is '&' (or end of run)
            if j < n and s[j] == ";":
                j += 1
            elif j < n and s[j] != "&":
                j += 1
            i = j
        else:
            out.append("&")
            out.append(name)
            if j < n and s[j] != "&":
                out.append(s[j])
                j += 1
            i = j
    return "".join(out)


_ATTR_NAME_END = set(" \t\n\r\f=/><'\"")
_TAG_NAME_END = set(" \t\n\r\f/><")

# clean start tag: name chars are the complement of _TAG_NAME_END
# ('\r' is already normalized to '\n' by the tokenizer), zero or more
# `name="value"` attributes whose names are ASCII identifiers (always
# valid per _ATTR_NAME_RE) with no whitespace around '=', whitespace,
# then an optional IMMEDIATE '/' before '>'. Anything outside this
# shape (junk tokens, unquoted/single-quoted values, ws around '=',
# exotic names) falls back to the character scanner.
_CLEAN_START_RE = re.compile(
    r"<([^ \t\n\f/><]+)"
    r"((?:[ \t\n\f]+[A-Za-z][A-Za-z0-9_.:\-]*=\"[^\"]*\")*)"
    r"[ \t\n\f]*(/?)>")
_CLEAN_ATTR_RE = re.compile(r"([A-Za-z][A-Za-z0-9_.:\-]*)=\"([^\"]*)\"")

_ATTR_NAME_RE = re.compile(r"(?:[^\W\d]|:)[\w.:\-]*\Z")


def _valid_attr_name(name: str) -> bool:
    return _ATTR_NAME_RE.match(name) is not None


def _valid_tag_name(name: str) -> bool:
    if not name:
        return False
    c0 = name[0]
    return c0.isalpha() or c0 in "_:"


def _coerce_comment(value: str) -> str:
    """P4: make a malformed comment value XML-valid the way the reference
    does (Sgml/SgmlReader.cs:1773-1813 ParseComment): each inner ``--`` run
    collapses to a single ``-`` *and eats the character before the run*
    (when there is one); a trailing ``-`` gets a space appended."""
    i = value.find("--")
    while i >= 0:
        j = i + 2
        while j < len(value) and value[j] == "-":
            j += 1
        if i > 0:
            value = value[:i - 1] + "-" + value[j:]
        else:
            value = "-" + value[j:]
        i = value.find("--")
    if value and value[-1] == "-":
        value += " "
    return value


class _StartTag:
    __slots__ = ("name", "attrs", "self_closed")

    def __init__(self, name: str, attrs: dict[str, str], self_closed: bool):
        self.name = name
        self.attrs = attrs
        self.self_closed = self_closed


class _Tokenizer:
    """Yields (kind, payload) events over raw HTML."""

    def __init__(self, s: str):
        # P1 NUL->space and XML newline normalization; guarded so clean
        # fragments (the common set_inner_html round-trip case) avoid the
        # full-string copies
        if "\x00" in s:
            s = s.replace("\x00", " ")
        if "\r" in s:
            s = s.replace("\r\n", "\n").replace("\r", "\n")
        self.s = s
        self.i = 0
        self.n = len(s)
        self._low: str | None = None  # lazily lowercased copy (CDATA scans)

    @property
    def low(self) -> str:
        if self._low is None:
            self._low = self.s.lower()
        return self._low

    def tokens(self):
        s, n = self.s, self.n
        while self.i < n:
            lt = s.find("<", self.i)
            if lt == -1:
                text = s[self.i:]
                self.i = n
                if text:
                    yield ("text", text)
                break
            if lt > self.i:
                yield ("text", s[self.i:lt])
            self.i = lt
            nxt = s[lt + 1] if lt + 1 < n else ""
            if nxt == "/":
                yield from self._end_tag()
            elif nxt == "!":
                yield from self._markup_decl()
            elif nxt == "?":
                yield from self._pi()
            elif nxt == "%":
                yield from self._asp_block()
            elif nxt.isalpha() or nxt in "_:":
                yield from self._start_tag()
            else:
                # P10: '<' + non-letter -> literal text
                self.i = lt + 1
                yield ("text", "<")

    # -- individual constructs --------------------------------------------

    def _end_tag(self):
        s, n = self.s, self.n
        j = self.i + 2
        k = j
        while k < n and s[k] not in _TAG_NAME_END:
            k += 1
        name = s[j:k]
        if not name.islower():
            name = name.lower()
        gt = s.find(">", k)
        self.i = n if gt == -1 else gt + 1
        if name:
            yield ("end", name)

    def _markup_decl(self):
        s, n = self.s, self.n
        i = self.i
        if s.startswith("<!--", i):
            end = s.find("-->", i + 4)
            if end == -1:
                value = s[i + 4:]
                self.i = n
            else:
                value = s[i + 4:end]
                self.i = end + 3
            yield ("comment", _coerce_comment(value))
            return
        if s.startswith("<![CDATA[", i):
            end = s.find("]]>", i + 9)
            if end == -1:
                value = s[i + 9:]
                self.i = n
            else:
                value = s[i + 9:end]
                self.i = end + 3
            yield ("cdata", value)
            return
        if s.startswith("<![", i):
            # downlevel conditional block: skipped (P5)
            gt = s.find(">", i + 3)
            self.i = n if gt == -1 else gt + 1
            return
        if s[i + 2:i + 9].lower() == "doctype":
            # DOCTYPE stripped (P6); handle an internal subset
            j = i + 9
            depth = 0
            while j < n:
                c = s[j]
                if c == "[":
                    depth += 1
                elif c == "]":
                    depth -= 1
                elif c == ">" and depth <= 0:
                    break
                j += 1
            self.i = j + 1 if j < n else n
            return
        # other declarations: skip to '>'
        gt = s.find(">", i + 2)
        self.i = n if gt == -1 else gt + 1
        return
        yield  # pragma: no cover - make this a generator

    def _pi(self):
        s, n = self.s, self.n
        i = self.i
        end = s.find("?>", i + 2)
        if end == -1:
            gt = s.find(">", i + 2)
            body = s[i + 2:(n if gt == -1 else gt)]
            self.i = n if gt == -1 else gt + 1
        else:
            body = s[i + 2:end]
            self.i = end + 2
        body = body.strip()
        if not body:
            return
        parts = body.split(None, 1)
        target = parts[0]
        data = parts[1] if len(parts) > 1 else ""
        if target.lower() != "xml":  # the xml declaration is dropped (P7)
            yield ("pi", (target, data))

    def _asp_block(self):
        s, n = self.s, self.n
        i = self.i
        end = s.find("%>", i + 2)
        if end == -1:
            value = s[i + 2:]
            self.i = n
        else:
            value = s[i + 2:end]
            self.i = end + 2
        yield ("cdata", value)

    def _start_tag(self):
        s, n = self.s, self.n
        # fast path for the dominant clean shapes `<name>`, `<name k="v"
        # k2="v2">`, `<name />`: one regex match instead of the
        # per-character attribute scanner. The pattern mirrors the loop
        # exactly for the shapes it accepts (names stop at the same char
        # sets, first duplicate attribute wins, entity expansion only
        # when '&' present, '/' must sit DIRECTLY before '>' — the loop
        # treats `/ >` as NOT self-closed and that shape fails this
        # match); anything else falls through to the full scanner below.
        m = _CLEAN_START_RE.match(s, self.i)
        if m is not None:
            name = m.group(1)
            if not name.islower():
                name = name.lower()
            attrs = None
            blob = m.group(2)
            if blob:
                attrs = {}
                for am in _CLEAN_ATTR_RE.finditer(blob):
                    aname = am.group(1)
                    if not aname.islower():
                        aname = aname.lower()
                    if aname not in attrs:
                        value = am.group(2)
                        attrs[aname] = expand_entities(value) \
                            if "&" in value else value
            self.i = m.end()
            yield from self._finish_start(name, attrs, bool(m.group(3)))
            return
        j = self.i + 1
        k = j
        while k < n and s[k] not in _TAG_NAME_END:
            k += 1
        name = s[j:k]
        if not name.islower():
            name = name.lower()
        attrs: dict[str, str] | None = None  # lazily created
        self_closed = False
        i = k
        while i < n:
            c = s[i]
            if c in " \t\n\r\f":
                i += 1
                continue
            if c in ",=:;":  # junk tokens between attributes (P9)
                i += 1
                continue
            if c == ">":
                i += 1
                break
            if c == "<":
                # unterminated tag: close it here, reprocess '<'
                break
            if c == "/":
                if i + 1 < n and s[i + 1] == ">":
                    self_closed = True
                    i += 2
                    break
                i += 1
                continue
            # attribute name
            a = i
            while i < n and s[i] not in _ATTR_NAME_END:
                i += 1
            aname = s[a:i]
            if not aname.islower():
                aname = aname.lower()
            # skip ws before possible '='
            while i < n and s[i] in " \t\n\r\f":
                i += 1
            value = None
            if i < n and (s[i] == "=" or s[i] in "\"'"):
                # the reference also accepts a bare quoted literal with no
                # '=' (SgmlReader.cs ParseStartTag: ch is '=' OR a quote):
                # it scans the literal as the value — critically, this also
                # consumes a stray quote at attribute-NAME position (empty
                # aname), which otherwise never advances (hang)
                if s[i] == "=":
                    i += 1
                    while i < n and s[i] in " \t\n\r\f":
                        i += 1
                if i < n and s[i] in "\"'":
                    q = s[i]
                    i += 1
                    v = i
                    qi = s.find(q, i)
                    if qi == -1:
                        value = s[v:]
                        i = n
                    else:
                        value = s[v:qi]
                        i = qi + 1
                else:
                    v = i
                    while i < n and s[i] not in " \t\n\r\f>":
                        i += 1
                    value = s[v:i]
            else:
                value = aname  # valueless attribute: value = its own name
            if (attrs is None or aname not in attrs) \
                    and _valid_attr_name(aname):
                if attrs is None:
                    attrs = {}
                attrs[aname] = expand_entities(value) if "&" in value \
                    else value
        else:
            i = n
        self.i = i
        yield from self._finish_start(name, attrs, self_closed)

    def _finish_start(self, name, attrs, self_closed):
        if not _valid_tag_name(name):
            # P13: invalid element name re-emitted as text
            yield ("text", "<" + name + ">")
            return
        if dtd.is_cdata_element(name) and not self_closed:
            yield ("start", _StartTag(name, attrs, True))
            yield from self._cdata_content(name)
        else:
            yield ("start", _StartTag(name, attrs, self_closed))

    def _cdata_content(self, name: str):
        """Raw text until the matching end tag (P15)."""
        s, n = self.s, self.n
        i = self.i
        needle = "</" + name
        low = self.low
        while True:
            j = low.find(needle, i)
            if j == -1:
                raise ParseError(
                    f"EndOfFile reached while scanning CDATA content of "
                    f"<{name}>")
            after = j + len(needle)
            if after < n and s[after] not in " \t\n\r\f>/":
                i = after
                continue
            raw = s[i:j]
            gt = s.find(">", after)
            self.i = n if gt == -1 else gt + 1
            if "<![CDATA[" in raw or "]]>" in raw:
                # nested CDATA markers are stripped (P15); also keeps the
                # serialized form re-parseable
                raw = raw.replace("<![CDATA[", "").replace("]]>", "")
            if raw:
                yield ("rawtext", (name, raw))
            return


class _TreeBuilder:
    def __init__(self) -> None:
        self.doc = Document()
        self.stack: list[Element] = []
        self.root_closed = False
        self.stopped = False

    # -- stack helpers ------------------------------------------------------

    def _current(self) -> Element | None:
        return self.stack[-1] if self.stack else None

    def _append(self, node) -> None:
        cur = self._current()
        if cur is not None:
            node.parent = cur
            cur.children.append(node)
        else:
            self.doc.add(node)

    def _ensure_root(self) -> None:
        """P16: simulated <html> root for content outside any root."""
        if not self.stack and not self.root_closed:
            root = Element("html")
            self.doc.add(root)
            self.stack.append(root)

    # -- event handlers -------------------------------------------------------

    def text(self, value: str, is_cdata: bool = False) -> None:
        if self.stopped or self.root_closed:
            return
        if not is_cdata:
            value = expand_entities(value)
            if not value.strip():
                return  # P19: whitespace-only text dropped
        self._ensure_root()
        self._append(Text(value, is_cdata))

    def comment(self, value: str) -> None:
        if self.stopped:
            return
        if not self.stack:
            self.doc.add(Comment(value))
        else:
            self._append(Comment(value))

    def pi(self, target: str, data: str) -> None:
        if self.stopped:
            return
        self._append(ProcessingInstruction(target, data))

    def start(self, tok: _StartTag) -> None:
        if self.stopped:
            return
        name = tok.name
        if not self.stack:
            if self.root_closed:
                # P17: a second root-level element terminates the parse
                self.stopped = True
                return
            if name == "html":
                root = Element("html")
                if tok.attrs is not None:
                    root.attrs = tok.attrs
                self.doc.add(root)
                self.stack.append(root)
                return
            self._ensure_root()
        self._auto_close(name)
        el = Element(name)
        if tok.attrs is not None:
            el.attrs = tok.attrs
        self._append(el)
        if not (tok.self_closed or dtd.is_empty_element(name)):
            self.stack.append(el)

    def rawtext(self, name: str, raw: str) -> None:
        # CDATA content belongs to the most recent element of that name
        if self.stopped:
            return
        cur = self._current()
        target = None
        if cur is not None and cur.children:
            last = cur.children[-1]
            if isinstance(last, Element) and last.tag == name:
                target = last
        if target is None:
            target = cur
        if target is not None:
            node = Text(raw, is_cdata=True)
            node.parent = target
            target.children.append(node)

    def end(self, name: str) -> None:
        if self.stopped:
            return
        # P11: find the matching open element; unmatched end tags dropped
        for idx in range(len(self.stack) - 1, -1, -1):
            if self.stack[idx].tag == name:
                del self.stack[idx:]
                if idx == 0:
                    self.root_closed = True
                return

    def finish(self) -> Document:
        self.stack.clear()  # P18
        return self.doc

    # -- auto-close (P12; mirrors SgmlReader.ValidateContent) ----------------

    def _auto_close(self, name: str) -> None:
        if not dtd.is_known(name):
            return  # unknown tags allowed anywhere
        stack = self.stack
        top = len(stack) - 1
        i = top
        while i >= 0:
            n = stack[i]
            if i == 0:
                break  # never pop the root
            if i == 1 and n.tag == "body":
                break  # never auto-close BODY directly under the root
            if not dtd.is_known(n.tag):
                break  # unknown open element: allow the content
            if dtd.can_contain(n.tag, name):
                break
            if not dtd.end_tag_optional(n.tag):
                break  # required end tag blocks auto-close
            i -= 1
        if i < top:
            del stack[i + 1:]


def parse_fragment(html_content: str) -> Document:
    """One parse pass (no tail-trim, no retry)."""
    builder = _TreeBuilder()
    tokenizer = _Tokenizer(html_content)
    for kind, payload in tokenizer.tokens():
        if kind == "text":
            builder.text(payload)
        elif kind == "start":
            builder.start(payload)
        elif kind == "end":
            builder.end(payload)
        elif kind == "comment":
            builder.comment(payload)
        elif kind == "cdata":
            builder.text(payload, is_cdata=True)
        elif kind == "rawtext":
            builder.rawtext(*payload)
        elif kind == "pi":
            builder.pi(*payload)
        if builder.stopped:
            break
    return builder.finish()


def remove_script_tags(html_content: str) -> str:
    """Iteratively drop <script>...</script> spans (HtmlUtils parity)."""
    low = html_content.lower()
    out = []
    i = 0
    while True:
        j = low.find("<script", i)
        if j == -1:
            out.append(html_content[i:])
            break
        out.append(html_content[i:j])
        k = low.find("</script>", j)
        if k == -1:
            break
        i = k + len("</script>")
    return "".join(out)


def build_document(html_content: str) -> Document:
    """Full BuildDocument pipeline (SgmlDomBuilder.cs:42-86 parity):
    tail-trim after the last ``</html>``, parse, and on an EndOfFile CDATA
    failure retry with script tags stripped."""
    if html_content:
        # the encoding sniffer consumes a BOM before parsing (P20)
        html_content = html_content.lstrip("﻿")
    if not html_content or not html_content.strip():
        return Document()
    idx = html_content.rfind("</html")
    if idx != -1:
        rel = html_content.find(">", idx)
        if rel != -1:
            html_content = html_content[:rel + 1]
    try:
        return parse_fragment(html_content)
    except ParseError as exc:
        if "EndOfFile" not in str(exc):
            raise
        return parse_fragment(remove_script_tags(html_content))
