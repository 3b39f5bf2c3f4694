"""Minimal deterministic PDF text extraction (and a tiny writer).

The north rule names "PDF/layout parse" as part of the extraction scope
(BASELINE.json:14); the C# reference has no PDF path, so this module is
a from-scratch minimal PDF content-stream text extractor rather than a
port. Structure layer: classic xref tables AND PDF 1.5 cross-reference
streams (/W field widths, /Index subsections, PNG Up/Sub/Average/Paeth
and TIFF predictors), object streams (/ObjStm — where modern crawl
PDFs keep their page dicts), hybrid-reference files (/XRefStm), with a
validated-offset object-scan fallback (plus ObjStm member salvage) for
truncated or byte-shifted files. Stream layer: Flate/ASCIIHex decode.
Text layer: page-tree traversal with cycle guard and a BT/ET text-run
tokenizer covering Tj / TJ / ' / " with literal (escapes, octal,
nested parens) and hex strings; composite (CID) fonts decode through
their /ToUnicode CMap (bfchar + bfrange, both destination forms; Tf
switches the active map, /Resources inherited through the page tree;
unmapped codes surface as U+FFFD instead of disappearing). Layout is
reduced to a deterministic line model: Td/TD with a vertical move, T*,
Tm, ' and ET start a new line; everything shown in between
concatenates.

Encryption: the standard security handler with an EMPTY user password
— the common crawled-PDF case (files open in any viewer yet carry
/Encrypt) — for RC4-40 (V1/R2), RC4-128 (V2/R3), and AES-128-CBC via
the /AESV2 crypt filter (V4/R4), per the public PDF 1.7 spec
algorithms 2/3/4/5 (7.6.3). Streams are decrypted (content, ObjStm,
ToUnicode — everything text extraction reads); strings are not (no
text ever comes from document strings here). Wrong passwords,
unsupported handlers (V5/AESV3, non-/Standard), and truncated crypt
payloads yield ``ok=False`` with an ``encrypted: ...`` error — never
an exception. Filters: Flate/ASCIIHex/LZW.

Scope (documented limitations, deliberate for a minimal extractor):
CID fonts WITHOUT a ToUnicode CMap yield raw code bytes (nothing maps
them to text without embedded-font glyph analysis), no non-empty
passwords, no AESV3/256, no DCT (images). ``extract_pdf_text`` NEVER
raises on malformed input — corrupt files yield fewer pages and
``ok=False`` when nothing could be recovered, mirroring the html
parser's parse-never-raises contract.

``build_pdf`` is the deterministic writer used to synthesize the test
corpus; writer and parser share no structural code paths, so
round-tripping is a genuine check. The ONLY shared pieces are the
cipher primitives (crypto.py) and the security-handler key-derivation
helpers below — both anchored outside the round trip by spec
known-answer tests (a shared derivation bug cannot hide behind a
passing round trip the way a shared serializer bug could, because the
KATs pin the primitives and tests/test_pdf_crypto.py re-derives one
fixed case step by step).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

_WS = b"\x00\t\n\x0c\r "
_MAX_OBJ_DEPTH = 60
_MAX_PAGES = 50_000


class _PdfErr(Exception):
    pass


class _Ref(int):
    """Indirect object reference (object number; generations ignored)."""


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"[\x00\t\n\x0c\r ]+\d+[\x00\t\n\x0c\r ]+R(?![0-9A-Za-z])")
_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")
_OBJ_HDR_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj")
_SCAN_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj\b")
_STARTXREF_RE = re.compile(rb"startxref[\x00\t\n\x0c\r ]+(\d+)")
_XREF_SUB_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]*")
_XREF_ENT_RE = re.compile(rb"(\d{10})[\x00\t\n\x0c\r ]+(\d{5})[\x00\t\n\x0c\r ]+([nf])")
_OP_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


def _skip_ws(d: bytes, i: int) -> int:
    n = len(d)
    while i < n:
        c = d[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = d.find(b"\n", i)
            i = n if j == -1 else j + 1
        else:
            break
    return i


def _parse_lit_string(d: bytes, i: int) -> tuple[bytes, int]:
    """d[i] == '(' — literal string with escapes and nested parens."""
    i += 1
    depth = 1
    out = bytearray()
    n = len(d)
    esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
    while i < n:
        c = d[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = d[i]
            if e in esc:
                out.append(esc[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif e == 0x0D:  # line continuation \CR[LF]
                i += 1
                if i < n and d[i] == 0x0A:
                    i += 1
            elif e == 0x0A:
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                v = 0
                k = 0
                while k < 3 and i < n and 0x30 <= d[i] <= 0x37:
                    v = v * 8 + (d[i] - 0x30)
                    i += 1
                    k += 1
                out.append(v & 0xFF)
            else:  # unknown escape: the char stands for itself
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise _PdfErr("unterminated literal string")


def _parse_hex_string(d: bytes, i: int) -> tuple[bytes, int]:
    """d[i] == '<' (and not '<<')."""
    j = d.find(b">", i + 1)
    if j == -1:
        raise _PdfErr("unterminated hex string")
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", d[i + 1:j])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), j + 1


def _parse_obj(d: bytes, i: int, depth: int = 0):
    if depth > _MAX_OBJ_DEPTH:
        raise _PdfErr("object nesting too deep")
    i = _skip_ws(d, i)
    if i >= len(d):
        raise _PdfErr("eof in object")
    c = d[i]
    if d.startswith(b"<<", i):
        i += 2
        out: dict = {}
        while True:
            i = _skip_ws(d, i)
            if d.startswith(b">>", i):
                return out, i + 2
            m = _NAME_RE.match(d, i)
            if not m:
                raise _PdfErr("dict key is not a name")
            key = m.group(1).decode("latin-1")
            val, i = _parse_obj(d, m.end(), depth + 1)
            out[key] = val
    if c == 0x3C:  # <
        return _parse_hex_string(d, i)
    if c == 0x28:  # (
        return _parse_lit_string(d, i)
    if c == 0x2F:  # /name
        m = _NAME_RE.match(d, i)
        return "/" + m.group(1).decode("latin-1"), m.end()
    if c == 0x5B:  # [
        i += 1
        arr = []
        while True:
            i = _skip_ws(d, i)
            if i < len(d) and d[i] == 0x5D:
                return arr, i + 1
            val, i = _parse_obj(d, i, depth + 1)
            arr.append(val)
    if c in b"+-.0123456789":
        m = _NUM_RE.match(d, i)
        if not m:
            raise _PdfErr("bad number")
        tok = m.group(0)
        j = m.end()
        if b"." not in tok:
            r = _REF_RE.match(d, j)
            if r:
                return _Ref(int(tok)), r.end()
            return int(tok), j
        return float(tok), j
    if d.startswith(b"true", i):
        return True, i + 4
    if d.startswith(b"false", i):
        return False, i + 5
    if d.startswith(b"null", i):
        return None, i + 4
    raise _PdfErr(f"unexpected byte {c:#x}")


# --- document structure ---------------------------------------------------------


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """/LZWDecode: variable-width (9-12 bit) MSB-first LZW with the
    PDF/TIFF EarlyChange convention (code width grows one code early by
    default). Tolerant: corrupt codes end the stream with whatever
    decoded cleanly — never raises."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    width, acc, nbits = 9, 0, 0
    for byte in data:
        acc = ((acc << 8) | byte) & 0xFFFFFFFF
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                del table[258:]
                width, prev = 9, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= 256:
                    return bytes(out)
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return bytes(out)
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZW encoder matching ``_lzw_decode`` (writer-side; leading clear
    code, EOD terminator, table reset before overflow)."""
    codes: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    acc, nbits = 0, 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    w = b""
    for b in data:
        wb = w + bytes([b])
        if wb in codes:
            w = wb
            continue
        emit(codes[w])
        codes[wb] = nxt
        nxt += 1
        # the decoder's table lags the encoder's by one entry (it can
        # only append after seeing the NEXT code), hence the -1 here
        # against the decoder's ``len(table) + early`` check
        if nxt + early - 1 >= (1 << width):
            if width < 12:
                width += 1
            elif nxt >= 4096 - early:  # table full: reset
                emit(256)
                codes = {bytes([i]): i for i in range(256)}
                nxt, width = 258, 9
        w = bytes([b])
    if w:
        emit(codes[w])
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- standard security handler (PDF 1.7 spec 7.6.3) ---------------------------

_CRYPT_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def _std_key(password: bytes, o: bytes, p: int, id0: bytes, r: int,
             n: int, encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: file encryption key from the (padded) user
    password, /O, /P (as signed little-endian int32), and the first
    file identifier; R>=3 re-digests the first ``n`` bytes 50 times."""
    import hashlib
    h = hashlib.md5()
    h.update((password + _CRYPT_PAD)[:32])
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _std_owner_value(n: int, r: int) -> bytes:
    """Algorithm 3 for EMPTY owner and user passwords: the /O entry.
    (Unlike Algorithm 2, the 50-fold re-digest here runs over the full
    16-byte output.)"""
    import hashlib

    from .crypto import rc4
    h = hashlib.md5(_CRYPT_PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rk = h[:n]
    o = rc4(rk, _CRYPT_PAD)
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rk), o)
    return o


def _std_user_value(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R=2) / 5 (R>=3): the /U entry for ``key``. Only the
    first 16 bytes are significant for R>=3; the tail is zero-filled."""
    import hashlib

    from .crypto import rc4
    if r == 2:
        return rc4(key, _CRYPT_PAD)
    x = hashlib.md5(_CRYPT_PAD + id0).digest()
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + bytes(16)


def _object_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key (the AES variant appends 'sAlT')."""
    import hashlib
    h = hashlib.md5(key + num.to_bytes(3, "little")
                    + (gen & 0xFFFF).to_bytes(2, "little")
                    + (b"sAlT" if aes else b""))
    return h.digest()[:min(len(key) + 5, 16)]


class _Doc:
    """Lazy object store over the raw bytes: a (validated) xref map with
    an object-scan fallback built on first miss — truncated trailers,
    stale offsets after byte-shifting edits, and xref-stream files all
    degrade to the scan instead of failing."""

    def __init__(self, data: bytes):
        self.data = data
        self.xref: dict[int, int] = {}
        # objnum -> (objstm_num, index): PDF 1.5 compressed objects
        self.compressed: dict[int, tuple[int, int]] = {}
        self.trailer: dict = {}
        self._scan: dict[int, int] | None = None
        self._cache: dict[int, tuple] = {}
        self._objstm_cache: dict[int, dict] = {}
        self._objstm_map: dict[int, tuple[int, int]] | None = None
        self._objstm_building = False
        self._font_cache: dict[int, dict | None] = {}
        # crypt state: None until _setup_encryption proves the file is
        # encrypted AND the empty user password opens it
        self._crypt: dict | None = None
        self._crypt_error: str | None = None
        self._encrypt_num: int | None = None
        try:
            self._parse_xref_chain()
        except _PdfErr:
            self.xref = {}
        try:
            self._setup_encryption()
        except Exception:  # malformed /Encrypt: fail closed, not loud
            self._crypt, self._crypt_error = None, \
                "encrypted: handler failure"

    def _setup_encryption(self) -> None:
        """Standard-security-handler setup (spec 7.6.3): derive the file
        key for the EMPTY user password and verify it against /U. Any
        unsupported or failed case sets ``_crypt_error`` (surfaced as
        ok=False) and leaves streams untouched."""
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is None:
            return
        if isinstance(enc_ref, _Ref):
            self._encrypt_num = int(enc_ref)
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            self._crypt_error = "encrypted: unreadable /Encrypt"
            return
        filt = self.resolve(enc.get("Filter"))
        v = self.resolve(enc.get("V")) or 0
        r = self.resolve(enc.get("R")) or 2
        if filt != "/Standard" or v not in (1, 2, 4) or r not in (2, 3, 4):
            self._crypt_error = "encrypted: unsupported handler"
            return
        o = self.resolve(enc.get("O"))
        u = self.resolve(enc.get("U"))
        p = self.resolve(enc.get("P"))
        if not (isinstance(o, bytes) and isinstance(u, bytes)
                and isinstance(p, int)):
            self._crypt_error = "encrypted: malformed /Encrypt"
            return
        length = self.resolve(enc.get("Length"))
        n = length // 8 if isinstance(length, int) \
            and 40 <= length <= 128 and length % 8 == 0 else 5
        if r == 2:
            n = 5  # V1/R2 is always 40-bit
        aes = False
        if v == 4:
            stmf = self.resolve(enc.get("StmF")) or "/Identity"
            if stmf == "/Identity":
                return  # streams are not encrypted
            cf = self.resolve(enc.get("CF"))
            cfd = self.resolve(cf.get(stmf.lstrip("/"))) \
                if isinstance(cf, dict) else None
            cfm = self.resolve(cfd.get("CFM")) \
                if isinstance(cfd, dict) else None
            if cfm == "/AESV2":
                aes, n = True, 16
            elif cfm != "/V2":
                self._crypt_error = "encrypted: unsupported crypt filter"
                return
        em = self.resolve(enc.get("EncryptMetadata"))
        em = em if isinstance(em, bool) else True
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0] if isinstance(ids, list) and ids \
            and isinstance(ids[0], bytes) else b""
        key = _std_key(b"", o, p, id0, r, n, em)
        if _std_user_value(key, id0, r)[:16] != u[:16]:
            self._crypt_error = "encrypted: password required"
            return
        self._crypt = {"key": key, "aes": aes}

    def _decrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        c = self._crypt
        okey = _object_key(c["key"], num, gen, c["aes"])
        if c["aes"]:
            from .crypto import aes_cbc_decrypt
            return aes_cbc_decrypt(okey, data)
        from .crypto import rc4
        return rc4(okey, data)

    def _parse_xref_chain(self) -> None:
        last = None
        for m in _STARTXREF_RE.finditer(self.data[-2048:]):
            last = m
        if last is None:
            raise _PdfErr("no startxref")
        pos = int(last.group(1))
        seen: set[int] = set()
        while 0 <= pos < len(self.data) and pos not in seen:
            seen.add(pos)
            i = _skip_ws(self.data, pos)
            if self.data.startswith(b"xref", i):
                pos = self._parse_classic_section(i + 4)
            else:
                pos = self._parse_xref_stream(i)

    def _parse_classic_section(self, i: int) -> int:
        """Classic ``xref`` table at ``i``; returns /Prev or -1."""
        while True:
            i = _skip_ws(self.data, i)
            if self.data.startswith(b"trailer", i):
                tr, i = _parse_obj(self.data, i + 7)
                if not isinstance(tr, dict):
                    return -1
                for k, v in tr.items():
                    self.trailer.setdefault(k, v)
                # hybrid-reference file: the real entries for
                # compressed objects live in a parallel xref stream
                xs = tr.get("XRefStm")
                if isinstance(xs, int) and 0 <= xs < len(self.data):
                    try:
                        self._parse_xref_stream(
                            _skip_ws(self.data, xs))
                    except _PdfErr:
                        pass
                prev = tr.get("Prev")
                return prev if isinstance(prev, int) else -1
            m = _XREF_SUB_RE.match(self.data, i)
            if not m:
                raise _PdfErr("bad xref subsection")
            start, count = int(m.group(1)), int(m.group(2))
            i = m.end()
            for k in range(count):
                e = _XREF_ENT_RE.match(self.data, _skip_ws(self.data, i))
                if not e:
                    raise _PdfErr("bad xref entry")
                if e.group(3) == b"n":
                    # chain runs newest-first: keep the first
                    # (newest) offset seen per object
                    self.xref.setdefault(start + k, int(e.group(1)))
                i = e.end()

    def _parse_xref_stream(self, i: int) -> int:
        """PDF 1.5 cross-reference STREAM at ``i`` (``N g obj`` with a
        /Type /XRef Flate stream; /W field widths, /Index subsections,
        optional PNG predictor). Populates xref + compressed maps and
        the trailer fields carried by the stream dict; returns /Prev."""
        m = _OBJ_HDR_RE.match(self.data, i)
        if not m:
            raise _PdfErr("bad xref stream offset")
        num = int(m.group(1))
        obj, raw = self.get(num)
        if not isinstance(obj, dict) or raw is None \
                or obj.get("Type") != "/XRef":
            raise _PdfErr("not an xref stream")
        data = _decode_stream(self, obj, raw)
        w = obj.get("W")
        if not (isinstance(w, list) and len(w) >= 3
                and all(isinstance(x, int) for x in w)):
            raise _PdfErr("bad /W")
        w0, w1, w2 = w[0], w[1], w[2]
        roww = w0 + w1 + w2
        if roww <= 0:
            raise _PdfErr("zero-width xref rows")
        size = obj.get("Size") if isinstance(obj.get("Size"), int) else 0
        index = obj.get("Index")
        if not isinstance(index, list) or len(index) % 2:
            index = [0, size]
        for k, v in obj.items():
            if k not in ("W", "Index", "Filter", "DecodeParms", "Length",
                         "Type", "Size"):
                self.trailer.setdefault(k, v)
        pos = 0
        for s in range(0, len(index) - 1, 2):
            start, count = index[s], index[s + 1]
            if not (isinstance(start, int) and isinstance(count, int)):
                continue
            for k in range(count):
                if pos + roww > len(data):
                    break
                row = data[pos:pos + roww]
                pos += roww
                t = int.from_bytes(row[:w0], "big") if w0 else 1
                f1 = int.from_bytes(row[w0:w0 + w1], "big")
                f2 = int.from_bytes(row[w0 + w1:], "big")
                objnum = start + k
                if t == 1:
                    self.xref.setdefault(objnum, f1)
                elif t == 2:
                    self.compressed.setdefault(objnum, (f1, f2))
        prev = obj.get("Prev")
        return prev if isinstance(prev, int) else -1

    def scan_offsets(self) -> dict[int, int]:
        if self._scan is None:
            scan: dict[int, int] = {}
            for m in _SCAN_RE.finditer(self.data):
                # the LAST occurrence wins (incremental updates append)
                scan[int(m.group(1))] = m.start()
            self._scan = scan
        return self._scan

    def _header_at(self, num: int, off) :
        if not isinstance(off, int) or not 0 <= off < len(self.data):
            return None
        i = _skip_ws(self.data, off)
        m = _OBJ_HDR_RE.match(self.data, i)
        if m and int(m.group(1)) == num:
            return m
        return None

    def _objstm_member(self, stm_num: int, num: int, _depth: int = 0):
        """Parse object ``num`` out of object stream ``stm_num``
        (/Type /ObjStm: N header pairs of "objnum offset", bodies after
        /First). Members are cached per stream; returns None on any
        damage."""
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num].get(num)
        self._objstm_cache[stm_num] = {}
        sdict, raw = self.get(stm_num, _depth + 1)
        if not isinstance(sdict, dict) or raw is None:
            return None
        data = _decode_stream(self, sdict, raw)
        first = sdict.get("First")
        count = sdict.get("N")
        if not (isinstance(first, int) and isinstance(count, int)
                and 0 <= first <= len(data)):
            return None
        pairs = re.findall(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)",
                           data[:first])[:count]
        members: dict[int, object] = {}
        for onum_b, off_b in pairs:
            onum, off = int(onum_b), int(off_b)
            try:
                obj, _i = _parse_obj(data, first + off)
            except _PdfErr:
                continue
            members[onum] = obj
        self._objstm_cache[stm_num] = members
        return members.get(num)

    def objstm_members(self) -> dict[int, tuple[int, int]]:
        """Salvage map for files whose xref is gone: every member of
        every /Type /ObjStm object reachable through the raw scan.
        Built lazily once; the guard flag keeps the build's own get()
        calls from re-entering."""
        if self._objstm_map is not None or self._objstm_building:
            return self._objstm_map or {}
        self._objstm_building = True
        try:
            found: dict[int, tuple[int, int]] = {}
            for stm_num in sorted(self.scan_offsets()):
                obj, raw = self.get(stm_num)
                if not isinstance(obj, dict) or raw is None \
                        or obj.get("Type") != "/ObjStm":
                    continue
                self._objstm_member(stm_num, -1)  # populate the cache
                for onum in self._objstm_cache.get(stm_num, {}):
                    idx = found.get(onum)
                    if idx is None:
                        found[onum] = (stm_num, 0)
            self._objstm_map = found
        finally:
            self._objstm_building = False
        return self._objstm_map

    def get(self, num: int, _depth: int = 0):
        """(object, stream_bytes|None) for object ``num``; (None, None)
        when unrecoverable."""
        if num in self._cache:
            return self._cache[num]
        if _depth > 4:
            return None, None
        m = self._header_at(num, self.xref.get(num))
        if m is None:
            m = self._header_at(num, self.scan_offsets().get(num))
        if m is None:
            # PDF 1.5 compressed object: via the xref-stream map, else
            # (broken xref) via the scanned-ObjStm salvage map
            loc = self.compressed.get(num)
            if loc is None and not self._objstm_building:
                loc = self.objstm_members().get(num)
            if loc is not None and loc[0] != num:
                obj = self._objstm_member(loc[0], num, _depth)
                if obj is not None:
                    self._cache[num] = (obj, None)
                    return obj, None
            self._cache[num] = (None, None)
            return None, None
        d = self.data
        try:
            obj, i = _parse_obj(d, m.end())
        except _PdfErr:
            self._cache[num] = (None, None)
            return None, None
        raw = None
        i = _skip_ws(d, i)
        if d.startswith(b"stream", i):
            i += 6
            if d.startswith(b"\r\n", i):
                i += 2
            elif i < len(d) and d[i] in b"\r\n":
                i += 1
            length = obj.get("Length") if isinstance(obj, dict) else None
            if isinstance(length, _Ref):
                length = self.resolve(length, _depth + 1)
            if (isinstance(length, int) and not isinstance(length, bool)
                    and 0 <= length <= len(d) - i):
                j = _skip_ws(d, i + length)
                if d.startswith(b"endstream", j):
                    raw = d[i:i + length]
            if raw is None:
                # bad/indirect-broken /Length: scan for the terminator
                j = d.find(b"endstream", i)
                raw = d[i:j] if j != -1 else d[i:]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw[-1:] in (b"\r", b"\n"):
                    raw = raw[:-1]
        # per-object stream decryption — except cross-reference streams
        # (never encrypted per spec) and the /Encrypt dictionary itself.
        # Streams fetched during the xref-chain parse predate the crypt
        # setup, but those are exactly the exempt /XRef streams.
        if raw is not None and self._crypt is not None \
                and num != self._encrypt_num \
                and not (isinstance(obj, dict)
                         and obj.get("Type") == "/XRef"):
            raw = self._decrypt_stream(num, int(m.group(2)), raw)
        self._cache[num] = (obj, raw)
        return obj, raw

    def resolve(self, obj, _depth: int = 0):
        seen = 0
        while isinstance(obj, _Ref):
            obj = self.get(int(obj), _depth)[0]
            seen += 1
            if seen > 16:
                return None
        return obj


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row filters (None/Sub/Up/Average/Paeth) for 8-bit
    single-component rows — the predictor xref streams use."""
    if columns <= 0:
        return data
    out = bytearray()
    prev = bytearray(columns)
    rowlen = columns + 1
    for r in range(0, len(data) - rowlen + 1, rowlen):
        ft = data[r]
        row = bytearray(data[r + 1:r + 1 + columns])
        if ft == 1:  # Sub
            for x in range(1, columns):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ft == 2:  # Up
            for x in range(columns):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(columns):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(columns):
                a = row[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                row[x] = (row[x] + pr) & 0xFF
        out.extend(row)
        prev = row
    return bytes(out)


def _apply_predictor(doc: _Doc, parms, out: bytes) -> bytes:
    parms = doc.resolve(parms)
    if isinstance(parms, list):
        parms = next((doc.resolve(p) for p in parms
                      if isinstance(doc.resolve(p), dict)), None)
    if not isinstance(parms, dict):
        return out
    pred = doc.resolve(parms.get("Predictor"))
    cols = doc.resolve(parms.get("Columns"))
    cols = cols if isinstance(cols, int) and cols > 0 else 1
    if isinstance(pred, int) and pred >= 10:
        return _png_unpredict(out, cols)
    if pred == 2:  # TIFF horizontal differencing, 8-bit
        row = bytearray(out)
        for i in range(len(row)):
            if i % cols:
                row[i] = (row[i] + row[i - 1]) & 0xFF
        return bytes(row)
    return out


def _decode_stream(doc: _Doc, sdict, raw: bytes) -> bytes:
    filters = doc.resolve(sdict.get("Filter")) if isinstance(sdict, dict) \
        else None
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    out = raw
    for f in filters:
        f = doc.resolve(f)
        if f in ("/FlateDecode", "/Fl"):
            try:
                out = zlib.decompress(out)
            except zlib.error:
                # tolerate trailing garbage / truncation: best effort
                d = zlib.decompressobj()
                try:
                    out = d.decompress(out)
                except zlib.error:
                    return b""
        elif f in ("/ASCIIHexDecode", "/AHx"):
            digits = re.sub(rb"[^0-9A-Fa-f]", b"",
                            out.split(b">", 1)[0])
            if len(digits) % 2:
                digits += b"0"
            out = bytes.fromhex(digits.decode("ascii"))
        elif f in ("/LZWDecode", "/LZW"):
            parms = doc.resolve(sdict.get("DecodeParms"))
            early = parms.get("EarlyChange") \
                if isinstance(parms, dict) else 1
            early = doc.resolve(early)
            out = _lzw_decode(out, 1 if early not in (0, 1) else early)
        else:
            return b""  # unsupported filter: no text from this stream
    return _apply_predictor(doc, sdict.get("DecodeParms"), out)


def _walk_pages(doc: _Doc, node, visited: set[int], out: list[dict],
                depth: int = 0) -> None:
    if depth > 64 or len(out) >= _MAX_PAGES:
        return
    if isinstance(node, _Ref):
        if int(node) in visited:
            return
        visited.add(int(node))
        node = doc.resolve(node)
    if not isinstance(node, dict):
        return
    kids = doc.resolve(node.get("Kids"))
    if isinstance(kids, list):
        for kid in kids:
            _walk_pages(doc, kid, visited, out, depth + 1)
        return
    if node.get("Type") in ("/Page", None) and "Contents" in node:
        out.append(node)


# --- content-stream text tokenizer ----------------------------------------------


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFRANGE_ROW_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])")


def _utf16be(hexs: bytes) -> str:
    if len(hexs) % 2:
        hexs += b"0"
    raw = bytes.fromhex(hexs.decode("ascii"))
    if len(raw) % 2:
        raw += b"\x00"
    return raw.decode("utf-16-be", errors="replace")


def parse_tounicode(data: bytes) -> dict[int, str]:
    """/ToUnicode CMap -> {code: unicode string}: bfchar pairs and
    bfrange triples (incrementing-destination and array forms). Codes
    are taken at face value (Identity-H two-byte CIDs and one-byte
    simple-font codes alike); never raises."""
    out: dict[int, str] = {}
    try:
        for m in _BFCHAR_RE.finditer(data):
            pairs = _HEX_RE.findall(m.group(1))
            for src, dst in zip(pairs[0::2], pairs[1::2]):
                out[int(src, 16)] = _utf16be(dst)
        for m in _BFRANGE_RE.finditer(data):
            for lo_h, hi_h, dst in _BFRANGE_ROW_RE.findall(m.group(1)):
                lo, hi = int(lo_h, 16), int(hi_h, 16)
                if hi < lo or hi - lo > 0x10000:
                    continue
                if dst.startswith(b"["):
                    dsts = _HEX_RE.findall(dst)
                    for k, d in enumerate(dsts[:hi - lo + 1]):
                        out[lo + k] = _utf16be(d)
                else:
                    base = _utf16be(dst[1:-1])
                    if not base:
                        continue
                    head, last = base[:-1], ord(base[-1])
                    for k in range(hi - lo + 1):
                        out[lo + k] = head + chr(last + k)
    except Exception:
        pass
    return out


def _inherited(doc: _Doc, page: dict, key: str):
    """Page-tree attribute inheritance (/Resources may live on an
    ancestor /Pages node)."""
    node = page
    seen = 0
    while isinstance(node, dict) and seen <= 32:
        if key in node:
            return doc.resolve(node[key])
        node = doc.resolve(node.get("Parent"))
        seen += 1
    return None


def _page_fonts(doc: _Doc, page: dict) -> dict[str, dict | None]:
    """{'/F1': cmap-or-None}: a font with a /ToUnicode CMap decodes
    through it (composite/CID fonts); others decode latin-1."""
    res = _inherited(doc, page, "Resources")
    fonts = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
    out: dict[str, dict | None] = {}
    if not isinstance(fonts, dict):
        return out
    for name, fref in fonts.items():
        cmap = None
        if isinstance(fref, _Ref):
            key = int(fref)
            if key in doc._font_cache:
                out["/" + name] = doc._font_cache[key]
                continue
        fdict = doc.resolve(fref)
        if isinstance(fdict, dict):
            tu = fdict.get("ToUnicode")
            if isinstance(tu, _Ref):
                sdict, raw = doc.get(int(tu))
                if raw is not None:
                    cmap = parse_tounicode(
                        _decode_stream(doc, sdict, raw)) or None
        if isinstance(fref, _Ref):
            doc._font_cache[int(fref)] = cmap
        out["/" + name] = cmap
    return out


def _page_text(doc: _Doc, page: dict) -> str:
    """Decode the page's content stream(s) — /Contents is a stream ref
    or an array of stream refs — and tokenize the text runs."""
    refs = page.get("Contents")
    if isinstance(refs, _Ref):
        resolved = doc.resolve(refs)
        refs = resolved if isinstance(resolved, list) else [refs]
    if not isinstance(refs, list):
        refs = []
    chunks: list[bytes] = []
    for r in refs:
        if not isinstance(r, _Ref):
            continue
        sdict, raw = doc.get(int(r))
        if raw is not None:
            chunks.append(_decode_stream(doc, sdict, raw))
    return _extract_text_runs(b"\n".join(chunks), _page_fonts(doc, page))


def _extract_text_runs(content: bytes,
                       fonts: dict[str, dict | None] | None = None) -> str:
    lines: list[str] = []
    buf: list[str] = []
    stack: list = []
    in_text = False
    cmap: dict | None = None  # active font's ToUnicode map (Tf-set)

    def flush() -> None:
        if buf:
            lines.append("".join(buf))
            buf.clear()

    def show(s) -> None:
        if not isinstance(s, bytes):
            return
        if cmap is None:
            buf.append(s.decode("latin-1"))
            return
        # composite font: two-byte big-endian codes through the CMap
        # (odd trailing byte dropped; unmapped codes -> U+FFFD so
        # missing glyph coverage is visible, not silently absent)
        buf.append("".join(
            cmap.get(int.from_bytes(s[k:k + 2], "big"), "�")
            for k in range(0, len(s) - 1, 2)))

    i, n = 0, len(content)
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i]
        if c in b"(<[/" or c in b"+-.0123456789":
            if content.startswith(b"<<", i):
                try:
                    obj, i = _parse_obj(content, i)
                except _PdfErr:
                    i += 2
                    continue
                stack.append(obj)
                continue
            try:
                obj, i = _parse_obj(content, i)
            except _PdfErr:
                i += 1
                continue
            stack.append(obj)
            continue
        if c in b")>]}":
            i += 1
            continue
        m = _OP_RE.match(content, i)
        if not m:
            i += 1
            continue
        op = m.group(0)
        i = m.end()
        if op == b"BT":
            in_text = True
        elif op == b"ET":
            flush()
            in_text = False
        elif op == b"Tf":
            # text-state op, legal outside BT/ET too
            if fonts and len(stack) >= 2 and isinstance(stack[-2], str):
                cmap = fonts.get(stack[-2])
        elif in_text:
            if op == b"Tj":
                if stack:
                    show(stack[-1])
            elif op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        show(el)
            elif op == b"'":
                flush()
                if stack:
                    show(stack[-1])
            elif op == b'"':
                flush()
                if stack:
                    show(stack[-1])
            elif op in (b"T*", b"Tm"):
                flush()
            elif op in (b"Td", b"TD"):
                ty = stack[-1] if stack else 0
                if isinstance(ty, (int, float)) and ty != 0:
                    flush()
        elif op == b"BI":
            # inline image: skip to EI so binary data can't fake tokens
            j = content.find(b"EI", i)
            i = n if j == -1 else j + 2
        stack.clear()  # operands never outlive their operator
    flush()
    return "\n".join(lines)


# --- public API -----------------------------------------------------------------


@dataclass
class PdfText:
    pages: list[str] = field(default_factory=list)
    ok: bool = False
    error: str | None = None

    @property
    def text(self) -> str:
        return "\f".join(self.pages)


def extract_pdf_text(data: bytes) -> PdfText:
    """Extract per-page text from a PDF. Never raises: malformed input
    yields whatever pages could be recovered (ok=False when none)."""
    try:
        doc = _Doc(bytes(data))
        if doc._crypt_error:
            return PdfText([], False, doc._crypt_error)
        root = doc.resolve(doc.trailer.get("Root"))
        pages_node = doc.resolve(root.get("Pages")) \
            if isinstance(root, dict) else None
        page_dicts: list[dict] = []
        if isinstance(pages_node, dict):
            _walk_pages(doc, pages_node, set(), page_dicts)
        if not page_dicts:
            # no usable trailer/catalog (truncated or rewritten file):
            # recover every /Type /Page object in object-number order —
            # direct objects first, then members of any object stream
            # the raw scan can reach (PDF 1.5 files keep page dicts
            # compressed inside /ObjStm, invisible to the scan itself)
            nums = sorted(set(doc.scan_offsets())
                          | set(doc.objstm_members()))
            for num in nums:
                obj, _raw = doc.get(num)
                if isinstance(obj, dict) and obj.get("Type") == "/Page" \
                        and "Contents" in obj:
                    page_dicts.append(obj)
                    if len(page_dicts) >= _MAX_PAGES:
                        break
        pages = []
        for p in page_dicts:
            try:
                pages.append(_page_text(doc, p))
            except (_PdfErr, RecursionError):
                pages.append("")
        if not page_dicts:
            return PdfText([], False, "no pages recovered")
        return PdfText(pages, True, None)
    except Exception as exc:  # parse-never-raises contract
        return PdfText([], False, f"{type(exc).__name__}: {exc}"[:200])


# --- deterministic writer (test-corpus synthesis) -------------------------------


def _esc_lit(s: str) -> bytes:
    b = s.encode("latin-1", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(") \
            .replace(b")", b"\\)")


_CID_SHIFT = 0x100  # writer's CID = codepoint + 0x100 (so a latin-1
#                     decode of the raw codes yields garbage — proof the
#                     extractor really went through the ToUnicode CMap)


def _cid_hex(line: str) -> bytes:
    return "".join(f"{(ord(c) + _CID_SHIFT) & 0xFFFF:04x}"
                   for c in line).encode("ascii")


def _tounicode_cmap() -> bytes:
    """ToUnicode CMap for the writer's Identity-H font: one bfrange
    covering printable latin-1 plus bfchar entries (both forms parsed)."""
    return (b"/CIDInit /ProcSet findresource begin\n"
            b"12 dict begin\nbegincmap\n"
            b"/CMapName /NRS-Identity-UCS def\n/CMapType 2 def\n"
            b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            b"2 beginbfchar\n"
            b"<0109> <0009>\n<010a> <000A>\n"
            b"endbfchar\n"
            b"1 beginbfrange\n"
            b"<0120> <01ff> <0020>\n"
            b"endbfrange\n"
            b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
            b"end\nend\n")


def _page_stream_bytes(lines: list[str], style: int,
                       cid: bool = False) -> bytes:
    """Content stream for one page. ``style`` varies the show operator
    so the corpus exercises every tokenizer path: 0 = Tj runs, 1 = TJ
    arrays with kerning numbers, 2 = hex strings + ' next-line shows.
    ``cid``: two-byte Identity-H codes in hex strings (decodable only
    through the font's ToUnicode CMap)."""
    parts = [b"BT\n/F1 11 Tf\n13 TL\n72 720 Td\n"]
    if cid:
        for idx, line in enumerate(lines):
            parts.append((b"T*\n" if idx else b"")
                         + b"<" + _cid_hex(line) + b"> Tj\n")
        parts.append(b"ET")
        return b"".join(parts)
    for idx, line in enumerate(lines):
        if style == 1:
            half = len(line) // 2
            a, b = _esc_lit(line[:half]), _esc_lit(line[half:])
            tj = b"[(" + a + b") -250 (" + b + b")] TJ\n"
            parts.append((b"T*\n" if idx else b"") + tj)
        elif style == 2:
            hx = line.encode("latin-1", "replace").hex().encode()
            if idx == 0:
                parts.append(b"<" + hx + b"> Tj\n")
            else:
                parts.append(b"<" + hx + b"> '\n")
        else:
            parts.append((b"T*\n" if idx else b"")
                         + b"(" + _esc_lit(line) + b") Tj\n")
    parts.append(b"ET")
    return b"".join(parts)


def build_pdf(pages: list[list[str]], compress: bool = True,
              style: int = 0, layout: str = "classic",
              predictor: bool = False, cid: bool = False,
              encrypt: str | None = None, lzw: bool = False) -> bytes:
    """Write a deterministic PDF; shares no structural code with the
    extractor (only the KAT-anchored cipher/key-derivation helpers).

    ``layout='classic'``: PDF 1.4 — direct objects, classic xref table,
    trailer. ``layout='objstm'``: PDF 1.5 — catalog/page-tree/page
    dicts compressed into a /Type /ObjStm object stream, cross-reference
    written as a /Type /XRef stream with W [1 2 2] type-1/type-2 rows
    (optionally behind the PNG Up predictor), no classic trailer — the
    modern layout real crawl PDFs use. Content streams stay direct in
    both layouts (streams cannot live inside an ObjStm).

    ``encrypt``: None | 'rc4-40' (V1/R2) | 'rc4-128' (V2/R3) |
    'aes-128' (V4/R4 /AESV2) — standard security handler, empty user
    and owner passwords, every stream except the xref stream encrypted
    with its per-object key (AES IVs derived deterministically so the
    corpus stays byte-stable). ``lzw``: content streams use /LZWDecode
    instead of /FlateDecode."""
    n_pages = max(len(pages), 1)
    pages = pages or [[""]]
    font_num = 2 + 2 * n_pages + 1
    tou_num = font_num + 1 if cid else None
    enc_num = ((tou_num or font_num) + 1) if encrypt else None
    ver = b"1.5" if layout == "objstm" else b"1.4"
    out = bytearray(b"%PDF-" + ver + b"\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    if encrypt:
        import hashlib as _hl
        r, v, n, aes = {"rc4-40": (2, 1, 5, False),
                        "rc4-128": (3, 2, 16, False),
                        "aes-128": (4, 4, 16, True)}[encrypt]
        p_perms = -44
        id0 = _hl.md5(b"nrs-pdf-id\x00" + repr(pages).encode()
                      + encrypt.encode()).digest()
        o_val = _std_owner_value(n, r)
        file_key = _std_key(b"", o_val, p_perms, id0, r, n, True)
        u_val = _std_user_value(file_key, id0, r)

        def enc_stream(num: int, data: bytes) -> bytes:
            okey = _object_key(file_key, num, 0, aes)
            if aes:
                from .crypto import aes_cbc_encrypt
                iv = _hl.md5(b"nrs-iv%d" % num).digest()
                return aes_cbc_encrypt(okey, iv, data)
            from .crypto import rc4
            return rc4(okey, data)

        cfpart = (" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                  " /StmF /StdCF /StrF /StdCF") if v == 4 else ""
        enc_body = (f"<< /Filter /Standard /V {v} /R {r} "
                    f"/Length {n * 8} /P {p_perms} "
                    f"/O <{o_val.hex()}> /U <{u_val.hex()}>"
                    f"{cfpart} >>").encode()
        id_part = f" /ID [<{id0.hex()}> <{id0.hex()}>]".encode()
        enc_ref_part = b" /Encrypt %d 0 R" % enc_num
    else:
        def enc_stream(num: int, data: bytes) -> bytes:  # noqa: ARG001
            return data

        id_part = enc_ref_part = b""

    def emit(num: int, body: bytes, stream: bytes | None = None) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    def content_obj(cnum: int, lines: list[str]) -> None:
        content = _page_stream_bytes(lines, style, cid=cid)
        if lzw:
            data = enc_stream(cnum, _lzw_encode(content))
            head = b"<< /Length %d /Filter /LZWDecode >>" % len(data)
        elif compress:
            data = enc_stream(cnum, zlib.compress(content, 6))
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = enc_stream(cnum, content)
            head = b"<< /Length %d >>" % len(data)
        emit(cnum, head, data)

    def emit_fonts() -> None:
        if not cid:
            emit(font_num, font)
            return
        emit(font_num,
             (f"<< /Type /Font /Subtype /Type0 /BaseFont /NRS-CID "
              f"/Encoding /Identity-H /ToUnicode {tou_num} 0 R "
              f"/DescendantFonts [<< /Type /Font "
              f"/Subtype /CIDFontType2 /BaseFont /NRS-CID "
              f"/CIDSystemInfo << /Registry (Adobe) "
              f"/Ordering (Identity) /Supplement 0 >> >>] >>").encode())
        cmap = _tounicode_cmap()
        if compress:
            z = enc_stream(tou_num, zlib.compress(cmap, 6))
            emit(tou_num, b"<< /Length %d /Filter /FlateDecode >>"
                 % len(z), z)
        else:
            z = enc_stream(tou_num, cmap)
            emit(tou_num, b"<< /Length %d >>" % len(z), z)

    kids = " ".join(f"{3 + 2 * k} 0 R" for k in range(n_pages))
    cat = b"<< /Type /Catalog /Pages 2 0 R >>"
    ptree = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
             ).encode()

    def page_dict(k: int) -> bytes:
        return (f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {4 + 2 * k} 0 R >>").encode()

    font = (b"<< /Type /Font /Subtype /Type1 "
            b"/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")

    last_direct = enc_num or (tou_num if cid else font_num)
    if layout != "objstm":
        emit(1, cat)
        emit(2, ptree)
        for k, lines in enumerate(pages):
            emit(3 + 2 * k, page_dict(k))
            content_obj(4 + 2 * k, lines)
        emit_fonts()
        if encrypt:
            emit(enc_num, enc_body)
        xref_pos = len(out)
        out.extend(b"xref\n0 %d\n" % (last_direct + 1))
        out.extend(b"0000000000 65535 f \n")
        for num in range(1, last_direct + 1):
            out.extend(b"%010d 00000 n \n" % offsets[num])
        out.extend(b"trailer\n<< /Size %d /Root 1 0 R%s%s >>\n"
                   b"startxref\n%d\n%%%%EOF\n"
                   % (last_direct + 1, enc_ref_part, id_part, xref_pos))
        return bytes(out)

    # --- objstm layout: dict objects packed into one object stream ----
    for k, lines in enumerate(pages):
        content_obj(4 + 2 * k, lines)
    emit_fonts()
    if encrypt:
        emit(enc_num, enc_body)
    members = [(1, cat), (2, ptree)] + \
        [(3 + 2 * k, page_dict(k)) for k in range(n_pages)]
    bodies = b" ".join(b for _n, b in members)
    head_pairs = []
    off = 0
    for n_, b in members:
        head_pairs.append(f"{n_} {off}".encode())
        off += len(b) + 1
    header = b" ".join(head_pairs) + b"\n"
    stm_payload = header + bodies
    stm_num = last_direct + 1
    xref_num = last_direct + 2
    zipped = enc_stream(stm_num, zlib.compress(stm_payload, 6))
    emit(stm_num, b"<< /Type /ObjStm /N %d /First %d /Length %d "
                  b"/Filter /FlateDecode >>"
         % (len(members), len(header), len(zipped)), zipped)
    # xref stream rows, W = [1 4 2] (4-byte offsets: a 2-byte field
    # would silently cap the file at 64 KiB), objects 0..xref_num.
    # The xref stream's own offset is where it is ABOUT to be emitted.
    xref_pos = len(out)
    offsets[xref_num] = xref_pos
    member_idx = {n: i for i, (n, _b) in enumerate(members)}
    rows = bytearray()
    for num in range(0, xref_num + 1):
        if num == 0:
            rows.extend(b"\x00" + (0).to_bytes(4, "big")
                        + (65535).to_bytes(2, "big"))
        elif num in member_idx:
            rows.extend(b"\x02" + stm_num.to_bytes(4, "big")
                        + member_idx[num].to_bytes(2, "big"))
        else:
            rows.extend(b"\x01" + offsets[num].to_bytes(4, "big")
                        + (0).to_bytes(2, "big"))
    parms = b""
    if predictor:
        cols = 7
        filtered = bytearray()
        prev = bytes(cols)
        for r in range(0, len(rows), cols):
            row = bytes(rows[r:r + cols])
            filtered.append(2)  # Up filter
            filtered.extend((row[x] - prev[x]) & 0xFF
                            for x in range(len(row)))
            prev = row
        rows = filtered
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
    zrows = zlib.compress(bytes(rows), 6)  # xref stream: never encrypted
    emit(xref_num, b"<< /Type /XRef /Size %d /W [1 4 2] "
                   b"/Index [0 %d] /Root 1 0 R%s%s /Length %d "
                   b"/Filter /FlateDecode%s >>"
         % (xref_num + 1, xref_num + 1, enc_ref_part, id_part,
            len(zrows), parms), zrows)
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)
