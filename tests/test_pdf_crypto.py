"""PDF standard-security-handler crypto: spec known-answer tests for the
cipher primitives (FIPS-197 C.1, RFC 6229, the classic RC4 vectors), a
step-by-step independent re-derivation of the PDF 1.7 7.6.3 key
algorithms, LZW codec behavior, and the encrypted-file round trip /
never-raises matrix.

The KATs matter because writer and parser share the cipher and
key-derivation helpers: a shared derivation bug would round-trip
cleanly, so correctness is anchored here, outside the round trip.
"""

import hashlib
import zlib

import pytest

from nreadability_spark.readability.crypto import (aes128_decrypt_block,
                                                   aes128_encrypt_block,
                                                   aes_cbc_decrypt,
                                                   aes_cbc_encrypt, rc4)
from nreadability_spark.readability.pdf import (_lzw_decode, _lzw_encode,
                                                _object_key, _std_key,
                                                _std_owner_value,
                                                _std_user_value, build_pdf,
                                                extract_pdf_text)

# --- cipher known-answer tests -------------------------------------------------


def test_aes128_fips197_appendix_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    plain = bytes.fromhex("00112233445566778899aabbccddeeff")
    cipher = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert aes128_encrypt_block(key, plain) == cipher
    assert aes128_decrypt_block(key, cipher) == plain


def test_rc4_classic_vectors():
    # the three canonical public test vectors
    assert rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
    assert rc4(b"Wiki", b"pedia") == bytes.fromhex("1021bf0420")
    assert rc4(b"Secret", b"Attack at dawn") == \
        bytes.fromhex("45a01f645fc35b383552544b9bf5")


def test_rc4_rfc6229_40bit_keystream():
    # RFC 6229, key length 40 bits, key 0x0102030405: keystream offset 0
    ks = rc4(bytes.fromhex("0102030405"), bytes(16))
    assert ks == bytes.fromhex("b2396305f03dc027ccc3524a0a1118a8")
    # and key length 64 bits, key 0x0102030405060708
    ks64 = rc4(bytes.fromhex("0102030405060708"), bytes(16))
    assert ks64 == bytes.fromhex("97ab8a1bf0afb96132f2f67258da15a8")


def test_rc4_is_an_involution():
    key, msg = b"any key", b"the quick brown fox" * 7
    assert rc4(key, rc4(key, msg)) == msg


def test_aes_cbc_roundtrip_and_layout():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    for n in (0, 1, 15, 16, 17, 100):
        msg = bytes((i * 7) & 0xFF for i in range(n))
        ct = aes_cbc_encrypt(key, iv, msg)
        assert ct[:16] == iv          # PDF /AESV2 layout: IV leads
        assert len(ct) % 16 == 0      # PKCS#7: always a padded block
        assert aes_cbc_decrypt(key, ct) == msg


def test_aes_cbc_decrypt_tolerant():
    key = bytes(16)
    assert aes_cbc_decrypt(key, b"") == b""
    assert aes_cbc_decrypt(key, b"short") == b""
    assert aes_cbc_decrypt(b"badlen", bytes(48)) == b""
    # ragged tail bytes are dropped, never raise
    ct = aes_cbc_encrypt(key, bytes(16), b"hello world padded")
    assert isinstance(aes_cbc_decrypt(key, ct + b"xyz"), bytes)


# --- PDF 1.7 7.6.3 key derivation, independently re-derived --------------------

# spec Table: the 32-byte padding string (PDF 1.7, 7.6.3.3)
_PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa0108"
    "2e2e00b6d0683e802f0ca9fe6453697a")


def test_pad_constant_matches_spec():
    from nreadability_spark.readability.pdf import _CRYPT_PAD
    assert _CRYPT_PAD == _PAD and len(_PAD) == 32


def test_std_key_rederivation_r3():
    """Algorithm 2, R3/128-bit, empty user password — recomputed inline
    step by step from the spec text."""
    o = bytes(range(32))
    id0 = b"0123456789abcdef"
    p = -44
    h = hashlib.md5()
    h.update(_PAD)                       # empty password -> pad alone
    h.update(o)
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:16]).digest()
    assert _std_key(b"", o, p, id0, r=3, n=16) == key[:16]


def test_std_owner_value_rederivation_r3():
    """Algorithm 3 with empty owner+user passwords, R3."""
    h = hashlib.md5(_PAD).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    rk = h[:16]
    o = rc4(rk, _PAD)
    for i in range(1, 20):
        o = rc4(bytes(b ^ i for b in rk), o)
    assert _std_owner_value(16, 3) == o


def test_std_user_value_rederivation():
    key = bytes(range(16))
    id0 = b"fedcba9876543210"
    # Algorithm 5 (R>=3)
    x = hashlib.md5(_PAD + id0).digest()
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    assert _std_user_value(key, id0, 3) == x + bytes(16)
    # Algorithm 4 (R2)
    assert _std_user_value(key[:5], id0, 2) == rc4(key[:5], _PAD)


def test_object_key_rederivation():
    key = bytes(range(16))
    want = hashlib.md5(key + (7).to_bytes(3, "little")
                       + (0).to_bytes(2, "little")).digest()[:16]
    assert _object_key(key, 7, 0, aes=False) == want
    want_aes = hashlib.md5(key + (7).to_bytes(3, "little")
                           + (0).to_bytes(2, "little")
                           + b"sAlT").digest()[:16]
    assert _object_key(key, 7, 0, aes=True) == want_aes
    # 40-bit key: object key is len(key)+5 = 10 bytes
    assert len(_object_key(bytes(5), 3, 0, aes=False)) == 10


# --- LZW codec -----------------------------------------------------------------


def test_lzw_roundtrip():
    for data in (b"", b"A", b"AAAAAAAA", b"TOBEORNOTTOBEORTOBEORNOT",
                 bytes(range(256)) * 4,
                 zlib.compress(b"x" * 1000)):  # high-entropy input
        assert _lzw_decode(_lzw_encode(data)) == data


def test_lzw_roundtrip_large_forces_width_growth_and_reset():
    # >4096 distinct phrases forces 9->12-bit growth and a table reset
    data = bytes((i * 251 + (i >> 8) * 17) & 0xFF for i in range(120_000))
    assert _lzw_decode(_lzw_encode(data)) == data


def test_lzw_decode_never_raises_on_garbage():
    for junk in (b"", b"\xff" * 40, bytes(range(256)),
                 _lzw_encode(b"hello world")[:-3]):
        assert isinstance(_lzw_decode(junk), bytes)


# --- encrypted-file round trip and never-raises --------------------------------

PAGES = [["hello crypt world", "line two"], ["second page"]]
WANT = ["hello crypt world\nline two", "second page"]


@pytest.mark.parametrize("layout", ["classic", "objstm"])
@pytest.mark.parametrize("enc", ["rc4-40", "rc4-128", "aes-128"])
@pytest.mark.parametrize("lzw", [False, True])
def test_encrypted_round_trip(layout, enc, lzw):
    r = extract_pdf_text(build_pdf(PAGES, layout=layout, encrypt=enc,
                                   lzw=lzw))
    assert r.ok and r.pages == WANT


@pytest.mark.parametrize("layout", ["classic", "objstm"])
def test_encrypted_cid_round_trip(layout):
    """ToUnicode CMap streams are themselves encrypted and must decode."""
    r = extract_pdf_text(build_pdf(PAGES, layout=layout, encrypt="aes-128",
                                   cid=True))
    assert r.ok and r.pages == WANT


def test_wrong_password_yields_ok_false():
    pdf = build_pdf(PAGES, layout="classic", encrypt="rc4-128")
    i = pdf.find(b"/U <")
    corrupt = pdf[:i + 5] + (b"0" if pdf[i + 5:i + 6] != b"0" else b"1") \
        + pdf[i + 6:]
    r = extract_pdf_text(corrupt)
    assert not r.ok and "password required" in (r.error or "")


def test_unsupported_handler_yields_ok_false():
    pdf = build_pdf(PAGES, layout="classic", encrypt="rc4-128")
    r = extract_pdf_text(pdf.replace(b"/V 2 /R 3", b"/V 5 /R 6"))
    assert not r.ok and "unsupported" in (r.error or "")


def test_truncated_encrypted_payload_never_raises():
    pdf = build_pdf(PAGES, layout="classic", encrypt="aes-128")
    for cut in (len(pdf) // 2, 200, 60):
        r = extract_pdf_text(pdf[:cut])
        assert isinstance(r.pages, list)  # never raises
    # surgically truncate the first content stream's crypt payload
    i = pdf.find(b"stream\n") + 7
    j = pdf.find(b"\nendstream", i)
    r = extract_pdf_text(pdf[:i + 8] + pdf[j:])
    assert isinstance(r.pages, list)


def test_classic_multi_entry_xref_parses_trailer():
    """Regression: classic xref entries are separated by ' \\n' the
    entry regex does not consume; the parser must skip it, or every
    multi-entry table falls back to the object scan and the trailer
    (with /Encrypt) is silently lost."""
    from nreadability_spark.readability.pdf import _Doc
    doc = _Doc(build_pdf(PAGES, layout="classic"))
    assert doc.xref and doc.trailer.get("Root") is not None


def test_fast_crypto_path_matches_pure_python(monkeypatch):
    """A/B lock: when the OpenSSL-backed fast path is available, its
    output is byte-identical to the pure-Python reference path for every
    key size the PDF handler produces (5/10/16-byte RC4 object keys,
    16-byte AES keys), including the tolerant-decrypt edge cases."""
    from nreadability_spark.readability import crypto as C
    if not C._FAST:
        pytest.skip("cryptography package not installed")
    msgs = [b"", b"x", b"sixteen byte msg", bytes(range(256)) * 3,
            b"tail" * 123]
    for klen in (5, 10, 16):
        key = bytes(range(1, klen + 1))
        for msg in msgs:
            fast = C.rc4(key, msg)
            monkeypatch.setattr(C, "_FAST", False)
            pure = C.rc4(key, msg)
            monkeypatch.setattr(C, "_FAST", True)
            assert fast == pure
    key, iv = bytes(range(16)), bytes(range(16, 32))
    for msg in msgs:
        enc_fast = C.aes_cbc_encrypt(key, iv, msg)
        dec_fast = C.aes_cbc_decrypt(key, enc_fast)
        ragged = C.aes_cbc_decrypt(key, enc_fast + b"xyz")
        monkeypatch.setattr(C, "_FAST", False)
        enc_pure = C.aes_cbc_encrypt(key, iv, msg)
        dec_pure = C.aes_cbc_decrypt(key, enc_pure)
        ragged_pure = C.aes_cbc_decrypt(key, enc_pure + b"xyz")
        monkeypatch.setattr(C, "_FAST", True)
        assert enc_fast == enc_pure
        assert dec_fast == dec_pure == msg
        assert ragged == ragged_pure
