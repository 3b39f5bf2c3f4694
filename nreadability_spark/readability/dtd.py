"""HTML 4.01 (loose) content-model tables driving tag-soup recovery.

The tables below are hand-derived from the public HTML 4.01 Transitional DTD
(https://www.w3.org/TR/html401/sgml/loosedtd.html), with the same loosenings
the reference applies (table sections additionally admit %flow so stray
content inside tables survives; see /root/reference Sgml/Html.dtd:1311-1320
for the behavior being matched -- the code here is an original Python design).

Semantics matched (reference: Sgml/SgmlReader.cs:2496-2585 ``ValidateContent``):
  * an *unknown* element is allowed anywhere and blocks auto-close when on
    the open stack;
  * a known element not allowed in the current context auto-closes open
    ancestors until one can contain it, but never closes BODY (at stack
    depth 2), never the root, and never an element whose end tag is
    required;
  * EMPTY elements are implicitly self-closing;
  * ``can_contain`` recurses through members whose *start* tag is optional
    (HTML/HEAD/BODY/TBODY), mirroring Group.CanContain
    (Sgml/SgmlParser.cs:1118-1160).
"""

from __future__ import annotations

# -- element classes ---------------------------------------------------------

FONTSTYLE = {"tt", "i", "b", "u", "s", "strike", "big", "small"}
PHRASE = {"em", "strong", "dfn", "code", "samp", "kbd", "var", "cite",
          "abbr", "acronym"}
SPECIAL = {"a", "img", "applet", "object", "font", "basefont", "br",
           "script", "map", "q", "sub", "sup", "span", "bdo", "iframe"}
FORMCTRL = {"input", "select", "textarea", "label", "button"}
INLINE = FONTSTYLE | PHRASE | SPECIAL | FORMCTRL | {"#pcdata"}

HEADING = {"h1", "h2", "h3", "h4", "h5", "h6"}
LISTS = {"ul", "ol", "dir", "menu"}
BLOCK = ({"p", "pre", "dl", "div", "center", "noscript", "noframes",
          "blockquote", "form", "isindex", "hr", "table", "fieldset",
          "address"} | HEADING | LISTS)
FLOW = BLOCK | INLINE

HEAD_MISC = {"script", "style", "meta", "link", "object"}

# Elements whose declared content is EMPTY (self-closing).
EMPTY_ELEMENTS = {"basefont", "br", "area", "link", "img", "param", "hr",
                  "input", "col", "isindex", "base", "meta", "frame"}

# Elements whose declared content is CDATA: raw text until the matching
# close tag (entities NOT expanded, child tags NOT parsed).
CDATA_ELEMENTS = {"script", "style"}

# RCDATA-ish (#PCDATA only): tags inside are not parsed as structure by the
# reference either, but entities ARE expanded.  We treat them as plain
# containers; their content models below already restrict children.
END_TAG_OPTIONAL = {"body", "colgroup", "dd", "dt", "head", "html", "li",
                    "option", "p", "tbody", "td", "tfoot", "th", "thead",
                    "tr"} | EMPTY_ELEMENTS
START_TAG_OPTIONAL = {"html", "head", "body", "tbody"}

# Content model: element -> (allowed_children, inclusions, exclusions).
# Sets name the *directly declared* members; can_contain() adds the
# optional-start-tag recursion.
_INLINE_MODEL = INLINE
_FLOW_MODEL = FLOW

CONTENT_MODEL: dict[str, set[str]] = {
    # inline containers
    **{t: _INLINE_MODEL for t in FONTSTYLE | PHRASE | {"sub", "sup", "span",
                                                       "bdo", "font", "q",
                                                       "label", "legend",
                                                       "caption"}},
    "a": _INLINE_MODEL,
    "address": INLINE | {"p"},
    "p": _INLINE_MODEL,
    **{h: _INLINE_MODEL for h in HEADING},
    "pre": _INLINE_MODEL,
    "dt": _INLINE_MODEL,
    # flow containers
    **{t: _FLOW_MODEL for t in ("div", "center", "blockquote", "dd", "li",
                                "ins", "del", "iframe", "noscript",
                                "noframes", "th", "td", "button")},
    "body": _FLOW_MODEL,
    "form": _FLOW_MODEL,
    "object": FLOW | {"param"},
    "applet": FLOW | {"param"},
    "map": BLOCK | {"area"},
    "fieldset": FLOW | {"legend", "#pcdata"},
    "dl": {"dt", "dd"},
    "ol": {"li"},
    "ul": {"li"},
    "dir": {"li"},
    "menu": {"li"},
    "select": {"optgroup", "option"},
    "optgroup": {"option"},
    "option": {"#pcdata"},
    "textarea": {"#pcdata"},
    "table": {"caption", "col", "colgroup", "thead", "tfoot", "tbody"},
    "thead": {"tr"} | FLOW,
    "tfoot": {"tr"} | FLOW,
    "tbody": {"tr"} | FLOW,
    "colgroup": {"col"} | FLOW,
    "tr": {"th", "td"} | FLOW,
    "frameset": {"frameset", "frame", "noframes"},
    "head": {"title", "isindex", "base"},
    "title": {"#pcdata"},
    "style": {"#pcdata"},
    "script": {"#pcdata"},
    "html": {"head", "body", "frameset"},
}

INCLUSIONS: dict[str, set[str]] = {
    "body": {"ins", "del"},
    "head": set(HEAD_MISC),
}

EXCLUSIONS: dict[str, set[str]] = {
    "a": {"a"},
    "pre": {"img", "object", "applet", "big", "small", "sub", "sup", "font",
            "basefont"},
    "form": {"form"},
    "label": {"label"},
    "button": FORMCTRL | {"form", "isindex", "fieldset", "iframe"},
    "dir": set(BLOCK),
    "menu": set(BLOCK),
    "title": set(HEAD_MISC),
}

KNOWN_ELEMENTS = (set(CONTENT_MODEL) | EMPTY_ELEMENTS |
                  {"area", "param", "col", "base", "meta", "link", "img",
                   "br", "hr", "input", "basefont", "frame", "caption",
                   "isindex", "legend"})


def is_known(tag: str) -> bool:
    return tag in KNOWN_ELEMENTS


def is_empty_element(tag: str) -> bool:
    return tag in EMPTY_ELEMENTS


def is_cdata_element(tag: str) -> bool:
    return tag in CDATA_ELEMENTS


def end_tag_optional(tag: str) -> bool:
    return tag in END_TAG_OPTIONAL


def _declared_can_contain(parent: str, child: str) -> bool:
    excl = EXCLUSIONS.get(parent)
    if excl and child in excl:
        return False
    incl = INCLUSIONS.get(parent)
    if incl and child in incl:
        return True
    return child in CONTENT_MODEL.get(parent, set())


def _can_contain_uncached(parent: str, child: str,
                          _seen: frozenset = frozenset()) -> bool:
    if parent in EMPTY_ELEMENTS:
        return False
    if not is_known(parent) or not is_known(child):
        return True
    if _declared_can_contain(parent, child):
        return True
    excl = EXCLUSIONS.get(parent)
    if excl and child in excl:
        return False
    for member in CONTENT_MODEL.get(parent, set()):
        if member in START_TAG_OPTIONAL and member not in _seen:
            if _can_contain_uncached(member, child, _seen | {member, parent}):
                return True
    return False


# Precomputed known-pair matrix: the auto-close check runs per start tag.
_CAN_CONTAIN: dict[str, frozenset] = {
    p: frozenset(c for c in KNOWN_ELEMENTS if _can_contain_uncached(p, c))
    for p in KNOWN_ELEMENTS
}


def can_contain(parent: str, child: str) -> bool:
    """Whether ``parent`` may directly contain ``child``.

    Mirrors ElementDecl.CanContain + Group.CanContain: direct membership,
    then recursion through declared members whose start tag is optional.
    Unknown parents or children are allowed anywhere.
    """
    allowed = _CAN_CONTAIN.get(parent)
    if allowed is None:
        return True  # unknown parent
    if child in allowed:
        return True
    return child not in KNOWN_ELEMENTS  # unknown child allowed anywhere
