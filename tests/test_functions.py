"""Scalar functions (M11-M18, M6) — reference-semantics pins."""

import pyarrow as pa
import pytest

from unravel_ray.functions import (
    aes_gcm_decrypt,
    aes_gcm_encrypt,
    derive_iv,
    docx_filename,
    is_pdf,
    is_pdf_column,
    parse_llm_json,
    sanitize_log,
    sanitize_log_column,
    split_tags,
    storage_key,
    truncate_text,
)


def test_truncate():
    assert truncate_text("abcdef", 3) == "abc"
    assert truncate_text("ab", 5) == "ab"
    assert truncate_text(None, 5) is None


def test_parse_llm_json_fenced():
    raw = '```json\n{"document_type": "invoice", "tags": ["a","b"], "confidence": 0.9}\n```'
    assert parse_llm_json(raw) == {
        "document_type": "invoice", "tags": ["a", "b"], "confidence": 0.9
    }


def test_parse_llm_json_defaults_on_garbage():
    for bad in (None, "", "not json", "```\n{broken\n```", "[1,2]"):
        assert parse_llm_json(bad) == {
            "document_type": "other", "tags": ["unclassified"], "confidence": 0.0
        }


def test_sanitize_log():
    assert sanitize_log("a b/c<script>") == "a_b_c_script"
    assert sanitize_log("__x__") == "x"
    # SanitizeLogging.java renders null as the literal string "null"
    assert sanitize_log(None) == "null"
    col = sanitize_log_column(pa.array(["a b/c", "ok-name.txt"]))
    assert col.to_pylist() == ["a_b_c", "ok-name.txt"]


def test_split_tags():
    assert split_tags("a, b ,, c ") == ["a", "b", "c"]
    assert split_tags("   ") == []
    assert split_tags(None) == []


def test_storage_key_deterministic_and_sanitized():
    k1 = storage_key("uploads", "my file (1).png", "doc-1")
    k2 = storage_key("uploads", "my file (1).png", "doc-1")
    assert k1 == k2
    assert k1.startswith("uploads/")
    assert k1.endswith(".png")
    assert "(" not in k1 and " " not in k1
    assert k1 != storage_key("uploads", "my file (1).png", "doc-2")


def test_docx_filename():
    assert docx_filename("scan.pdf") == "scan.docx"
    assert docx_filename("a.b.c.png") == "a.b.c.docx"
    assert docx_filename("noext") == "noext.docx"


def test_aes_gcm_roundtrip():
    key = bytes(range(32))
    iv = derive_iv("doc-1")
    ct, iv_b64 = aes_gcm_encrypt(b"secret payload", key, iv)
    assert ct != b"secret payload"
    assert aes_gcm_decrypt(ct, key, iv_b64) == b"secret payload"
    with pytest.raises(Exception):
        aes_gcm_decrypt(ct, bytes(32), iv_b64)


def test_is_pdf():
    assert is_pdf("application/pdf", None)
    assert is_pdf("APPLICATION/PDF", None)
    assert is_pdf(None, "https://x/y/report.PDF?sig=1")
    assert not is_pdf("image/png", "https://x/y/img.png")
    col = is_pdf_column(
        pa.array(["application/pdf", "image/png", None]),
        pa.array([None, "a/b.pdf?x=1", "c.txt"]),
    )
    assert col.to_pylist() == [True, True, False]


def test_parse_llm_json_hardening():
    from unravel_ray.functions import parse_llm_json

    # non-numeric confidence -> defaults, never raises
    assert parse_llm_json('{"confidence": "high"}') == {
        "document_type": "other", "tags": ["unclassified"], "confidence": 0.0
    }
    # string tags coerced to a list
    assert parse_llm_json('{"tags": "a, b"}')["tags"] == ["a", "b"]
    assert parse_llm_json('{"tags": [1, "x"]}')["tags"] == ["1", "x"]
    # MISSING confidence key on a valid object defaults to 0.5
    # (AiClassificationService.parseClassificationResponse); 0.0 is
    # reserved for the parse-failure path.
    assert parse_llm_json('{"document_type": "invoice"}')["confidence"] == 0.5
    assert parse_llm_json('{"confidence": 0}')["confidence"] == 0.0


def test_hash_strings_value_pure_and_layout_invariant():
    """The bucketing hash is a pure function of the VALUE: identical for
    equal strings regardless of array slicing, chunking, or offset width
    (string vs large_string) — the invariant hash_join's two sides rely
    on — and spreads real key populations across buckets."""
    import numpy as np
    import pyarrow as pa

    from unravel_ray.hashing import hash_strings

    a = pa.array(["hello", "", "world", None, "hello", "hell", "o" * 100_000])
    h = hash_strings(a)
    assert h[0] == h[4]          # equal values, equal hash
    assert h[1] == h[3]          # null hashes like empty (placement only)
    assert h[0] != h[5]          # prefix is not a collision
    assert (hash_strings(a.slice(2, 4)) == h[2:6]).all()
    assert (hash_strings(pa.chunked_array([["hello"], ["hell"]]))
            == [h[0], h[5]]).all()
    assert (hash_strings(a.cast(pa.large_string())) == h).all()
    assert (hash_strings(a.cast(pa.binary())) == h).all()

    keys = pa.array([f"key_{i}" for i in range(20_000)])
    hv = hash_strings(keys)
    assert len(set(hv.tolist())) == 20_000  # no collisions on a real keyset
    counts = np.bincount((hv % np.uint64(64)).astype(np.int64), minlength=64)
    assert counts.min() > 150  # ~312 expected; no starved bucket


def test_hash_strings_chunked_long_text_path():
    """Long-text columns trip the bounded-scratch row-slicing path
    (ADVICE r4); hashes must be identical to the one-pass kernel,
    including when a single row exceeds the chunk budget."""
    import pyarrow as pa

    from unravel_ray import hashing

    vals = ["x" * 5_000, "short", None, "y" * 12_000, "", "z" * 7_000,
            "mid" * 100]
    a = pa.array(vals)
    one_pass = hashing.hash_strings(a)
    orig = hashing._CHUNK_BYTES
    try:
        hashing._CHUNK_BYTES = 4_096  # forces slicing; row 3 alone exceeds it
        sliced = hashing.hash_strings(a)
    finally:
        hashing._CHUNK_BYTES = orig
    assert (sliced == one_pass).all()
