"""PDF text extraction kernel: writer/extractor round trips, hand-built
documents, malformed-input salvage, and the never-raises contract."""

import zlib

import pytest

from nreadability_spark.readability.pdf import (PdfText, build_pdf,
                                                extract_pdf_text)

PAGES = [["hello world", "line two (with parens)", "back\\slash end"],
         ["page 2 first", "page 2 second"]]
WANT = ["\n".join(p) for p in PAGES]


@pytest.mark.parametrize("layout,predictor", [("classic", False),
                                              ("objstm", False),
                                              ("objstm", True)])
@pytest.mark.parametrize("style", [0, 1, 2])
@pytest.mark.parametrize("compress", [True, False])
def test_round_trip_all_styles(style, compress, layout, predictor):
    r = extract_pdf_text(build_pdf(PAGES, compress=compress, style=style,
                                   layout=layout, predictor=predictor))
    assert r.ok and r.error is None
    assert r.pages == WANT
    assert r.text == "\f".join(WANT)


def test_objstm_resolution_is_via_xref_stream_not_salvage():
    """An intact 1.5 file must resolve its page dicts through the xref
    stream's type-2 entries (the salvage scan stays unused)."""
    from nreadability_spark.readability.pdf import _Doc
    doc = _Doc(build_pdf(PAGES, layout="objstm"))
    assert doc.compressed  # type-2 entries parsed
    root = doc.resolve(doc.trailer.get("Root"))
    assert isinstance(root, dict) and root.get("Type") == "/Catalog"
    assert doc._objstm_map is None  # salvage never triggered


def test_objstm_damage_classes_salvaged():
    """1.5-layout damage: a lost startxref tail and a byte-shifting
    /Length corruption must both recover the full text through the
    ObjStm salvage scan."""
    pdf = build_pdf(PAGES, layout="objstm")
    trunc = extract_pdf_text(pdf[:pdf.rfind(b"xref")])
    assert trunc.ok and trunc.pages == WANT
    bad = extract_pdf_text(pdf.replace(b"/Length ", b"/Length 9", 1))
    assert bad.ok and bad.pages == WANT


def test_fuzz_mutated_objstm_pdf_never_raises():
    from hypothesis import given, settings, strategies as st
    base = build_pdf(PAGES, layout="objstm", predictor=True)

    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=0, max_value=len(base) - 1),
           st.integers(min_value=0, max_value=255),
           st.integers(min_value=0, max_value=len(base)))
    def run(pos, val, cut):
        data = bytearray(base)
        data[pos] = val
        r = extract_pdf_text(bytes(data[:cut]))
        assert isinstance(r, PdfText)
    run()


def _minimal_pdf(content: bytes, length=None, compress=False) -> bytes:
    """Hand-rolled single-page PDF with full control over /Length."""
    if compress:
        content = zlib.compress(content)
    n = len(content) if length is None else length
    filt = b" /Filter /FlateDecode" if compress else b""
    out = bytearray(b"%PDF-1.4\n")
    offs = {}

    def emit(num, body):
        offs[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    emit(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    emit(4, b"<< /Length %d%s >>\nstream\n" % (n, filt)
         + content + b"\nendstream")
    xref = len(out)
    out.extend(b"xref\n0 5\n0000000000 65535 f \n")
    for k in range(1, 5):
        out.extend(b"%010d 00000 n \n" % offs[k])
    out.extend(b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n"
               b"%%%%EOF\n" % xref)
    return bytes(out)


def test_hand_built_operators_exact():
    """Tj / TJ / ' / \" / Td / TD / T* / Tm line semantics."""
    content = (b"BT (a) Tj ( b) Tj T* (second) Tj "
               b"0 -13 TD (third) Tj 5 0 Td ( same line) Tj "
               b"[( arr) -120 (ay)] TJ (fourth) ' "
               b"2 2 (fifth) \" 1 0 0 1 72 600 Tm (sixth) Tj ET")
    r = extract_pdf_text(_minimal_pdf(content))
    assert r.ok
    assert r.pages == ["a b\nsecond\nthird same line array\nfourth\n"
                       "fifth\nsixth"]


def test_string_escapes_and_hex():
    content = (br"BT (oct \101\102\103) Tj T* "
               br"(esc \(paren\) \\ tab\there) Tj T* "
               b"(nested (parens) kept) Tj T* "
               b"<48656C6C6F> Tj ET")
    r = extract_pdf_text(_minimal_pdf(content))
    assert r.ok
    assert r.pages == ["oct ABC\nesc (paren) \\ tab\there\n"
                       "nested (parens) kept\nHello"]


def test_flate_stream_and_indirect_length():
    r = extract_pdf_text(_minimal_pdf(b"BT (zipped) Tj ET", compress=True))
    assert r.ok and r.pages == ["zipped"]


def test_truncated_xref_salvaged():
    pdf = build_pdf(PAGES)
    trunc = pdf[:pdf.rfind(b"xref")]
    r = extract_pdf_text(trunc)
    assert r.ok and r.pages == WANT


def test_bad_stream_length_salvaged():
    # claimed length overruns the file AND shifts every later offset
    pdf = build_pdf(PAGES)
    bad = pdf.replace(b"/Length ", b"/Length 9", 1)
    r = extract_pdf_text(bad)
    assert r.ok and r.pages == WANT
    # hand-built variant: /Length far past EOF
    r2 = extract_pdf_text(_minimal_pdf(b"BT (x) Tj ET", length=10_000))
    assert r2.ok and r2.pages == ["x"]


def test_garbage_inputs_never_raise():
    for data in (b"", b"%PDF-1.4\nnothing here", b"\x00\xff" * 64,
                 b"%PDF-1.4\n1 0 obj\n<< /unterminated",
                 build_pdf(PAGES)[:40]):
        r = extract_pdf_text(data)
        assert isinstance(r, PdfText)
        assert r.ok is False and r.pages == []


def test_page_order_many_pages():
    pages = [[f"page {k} line {j}" for j in range(3)] for k in range(9)]
    r = extract_pdf_text(build_pdf(pages))
    assert r.ok and r.pages == ["\n".join(p) for p in pages]


def test_cyclic_page_tree_terminates():
    out = bytearray(b"%PDF-1.4\n")
    offs = {}

    def emit(num, body):
        offs[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    # Pages node whose kid list contains itself
    emit(2, b"<< /Type /Pages /Kids [2 0 R 3 0 R] /Count 1 >>")
    emit(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    emit(4, b"<< /Length 13 >>\nstream\nBT (ok) Tj ET\nendstream")
    xref = len(out)
    out.extend(b"xref\n0 5\n0000000000 65535 f \n")
    for k in range(1, 5):
        out.extend(b"%010d 00000 n \n" % offs[k])
    out.extend(b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n"
               b"%%%%EOF\n" % xref)
    r = extract_pdf_text(bytes(out))
    assert r.ok and r.pages == ["ok"]


def test_fuzz_never_raises():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=2048))
    def run(data):
        r = extract_pdf_text(data)
        assert isinstance(r, PdfText)
    run()


def test_fuzz_mutated_real_pdf_never_raises():
    """Flip bytes inside an otherwise-valid PDF — the harder fuzz."""
    from hypothesis import given, settings, strategies as st
    base = build_pdf(PAGES)

    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=0, max_value=len(base) - 1),
           st.integers(min_value=0, max_value=255),
           st.integers(min_value=0, max_value=len(base)))
    def run(pos, val, cut):
        data = bytearray(base)
        data[pos] = val
        r = extract_pdf_text(bytes(data[:cut]))
        assert isinstance(r, PdfText)
    run()


def test_build_doc_pdf_damage_classes():
    from nreadability_spark.spark.multimodal import build_doc_pdf
    text = "alpha beta gamma delta " * 40
    # 89-divisible: header stub -> unrecoverable (89 odd -> objstm)
    r = extract_pdf_text(build_doc_pdf(89, text))
    assert not r.ok
    # truncated tail -> salvaged: 53 is odd (objstm layout), 106 is
    # even (classic layout) — both damage x layout combinations recover
    clean = extract_pdf_text(build_doc_pdf(54, text))
    assert clean.ok
    for did in (53, 106):
        trunc = extract_pdf_text(build_doc_pdf(did, text))
        assert trunc.ok and trunc.text, did
    # corrupt length -> salvaged (71 objstm, 142 classic)
    for did in (71, 142):
        badlen = extract_pdf_text(build_doc_pdf(did, text))
        assert badlen.ok and badlen.text, did


@pytest.mark.parametrize("layout", ["classic", "objstm"])
@pytest.mark.parametrize("compress", [True, False])
def test_cid_font_round_trip(layout, compress):
    """Identity-H two-byte codes must decode through the ToUnicode
    CMap — a latin-1 read of the raw codes yields garbage, so matching
    text proves the CMap path ran."""
    r = extract_pdf_text(build_pdf(PAGES, compress=compress,
                                   layout=layout, cid=True))
    assert r.ok and r.pages == WANT


def test_cid_unmapped_codes_surface_as_replacement():
    pdf = build_pdf([["abc"]], cid=True, compress=False)
    bad = pdf.replace(b"<0120> <01ff> <0020>", b"<0120> <0161> <0020>")
    r = extract_pdf_text(bad)
    assert r.ok and r.pages == ["a��"]


def test_mixed_simple_and_cid_fonts_switch_via_tf():
    """Tf mid-page must switch decoders: /F1 simple latin-1, /F2 CID."""
    import zlib as _z
    from nreadability_spark.readability.pdf import (_cid_hex,
                                                    _tounicode_cmap)
    cmap = _tounicode_cmap()
    content = (b"BT /F1 11 Tf (plain line) Tj T* "
               b"/F2 11 Tf <" + _cid_hex("cid line") + b"> Tj T* "
               b"/F1 11 Tf (plain again) Tj ET")
    out = bytearray(b"%PDF-1.4\n")
    offs = {}

    def emit(num, body):
        offs[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>")
    # Resources live on the PARENT node: inheritance must find them
    emit(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    emit(4, b"<< /Length %d >>\nstream\n" % len(content)
         + content + b"\nendstream")
    emit(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    emit(6, b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
            b"/ToUnicode 7 0 R >>")
    emit(7, b"<< /Length %d >>\nstream\n" % len(cmap)
         + cmap + b"\nendstream")
    xref = len(out)
    out.extend(b"xref\n0 8\n0000000000 65535 f \n")
    for k in range(1, 8):
        out.extend(b"%010d 00000 n \n" % offs[k])
    out.extend(b"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n%d\n"
               b"%%%%EOF\n" % xref)
    r = extract_pdf_text(bytes(out))
    assert r.ok
    assert r.pages == ["plain line\ncid line\nplain again"]


def test_tounicode_cmap_parser_forms():
    from nreadability_spark.readability.pdf import parse_tounicode
    cmap = (b"2 beginbfchar\n<0041> <0058>\n<0042> <00590059>\n"
            b"endbfchar\n"
            b"1 beginbfrange\n<0050> <0052> [<0061> <0062> <0063>]\n"
            b"endbfrange\n"
            b"1 beginbfrange\n<0100> <0102> <0030>\nendbfrange\n")
    m = parse_tounicode(cmap)
    assert m[0x41] == "X" and m[0x42] == "YY"          # bfchar, multi
    assert (m[0x50], m[0x51], m[0x52]) == ("a", "b", "c")  # array form
    assert (m[0x100], m[0x101], m[0x102]) == ("0", "1", "2")  # inc form
    assert parse_tounicode(b"\x00garbage[[") == {}


def test_build_doc_pdf_cid_class_round_trips():
    from nreadability_spark.spark.multimodal import build_doc_pdf
    text = "alpha beta gamma delta " * 30
    r = extract_pdf_text(build_doc_pdf(7, text))   # 7 % 5 == 2 -> CID
    r2 = extract_pdf_text(build_doc_pdf(12, text))  # 12 % 5 == 2 -> CID
    assert r.ok and r2.ok and r.text and "�" not in r.text
