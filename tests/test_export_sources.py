"""Export rendering (S9/M9 consumer) + sinks/set-ops (S7, D3, D4, J3)."""

import pyarrow as pa

import ray.data

from unravel_ray.export import export_documents, render_spans
from unravel_ray.sources import (
    apply_tombstones,
    move_documents,
    point_lookup,
    search_projection,
)

SPANS = [
    {"kind": "heading", "text": "Title", "media_ref": None, "offset": 0},
    {"kind": "text", "text": "Para.", "media_ref": None, "offset": 1},
    {"kind": "list_item", "text": "item", "media_ref": None, "offset": 2},
]


def _extracted_ds():
    rows = [
        {"doc_id": "d1", "collection_id": "c1", "spans": SPANS, "status": "completed",
         "error_message": None, "provider": "direct", "n_spans": 3, "n_chars": 15},
        {"doc_id": "d2", "collection_id": "c2", "spans": [], "status": "failed",
         "error_message": "boom", "provider": "fake", "n_spans": 0, "n_chars": 0},
    ]
    from unravel_ray.schema import EXTRACTED_SCHEMA

    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA))


def test_render_spans_order_and_formats():
    shuffled = [SPANS[2], SPANS[0], SPANS[1]]
    assert render_spans(shuffled) == "Title\nPara.\nitem"
    assert render_spans(shuffled, "markdown") == "# Title\n\nPara.\n\n- item"


def test_export_documents_gates_on_completed(ray_session):
    out = {r["doc_id"]: r for r in export_documents(_extracted_ds()).take_all()}
    assert out["d1"]["content"] == "Title\nPara.\nitem"
    assert out["d1"]["file_name"] == "d1.docx"
    assert out["d2"]["content"] == ""
    assert out["d2"]["status"] == "failed"


def test_search_projection_preview(ray_session):
    rows = {r["doc_id"]: r for r in search_projection(_extracted_ds()).take_all()}
    assert rows["d1"]["preview"] == "Title\nPara.\nitem"
    assert rows["d1"]["status"] == "completed"
    assert set(rows) == {"d1", "d2"}


def test_tombstones_and_move(ray_session):
    ds = _extracted_ds()
    kept = apply_tombstones(ds, {"c2"}).take_all()
    assert [r["doc_id"] for r in kept] == ["d1"]
    moved = {r["doc_id"]: r["collection_id"]
             for r in move_documents(ds, {"d1": "c9"}).take_all()}
    assert moved == {"d1": "c9", "d2": "c2"}


def test_point_lookup(ray_session):
    rows = point_lookup(_extracted_ds(), "d2")
    assert len(rows) == 1 and rows[0]["status"] == "failed"


def test_encrypted_blob_roundtrip_pipeline(ray_session):
    """S-pipeline for encrypted storage (FileEntry.java:46-51): encrypt ->
    (simulated store) -> decrypt recovers exact bytes; clear rows pass
    through; a wrong key yields decrypt_error rows, not an exception."""
    import pyarrow as pa

    import ray.data
    from unravel_ray.sources import decrypt_blobs, encrypt_blobs

    key = bytes(range(32))
    blobs = pa.table({
        "doc_id": ["d0", "d1", "d2"],
        "blob": [b"alpha-bytes", b"", b"\x00\xff binary \x01"],
        "is_encrypted": [False, False, False],
        "encryption_iv": pa.array([None, None, None], pa.string()),
    })
    enc = encrypt_blobs(ray.data.from_arrow(blobs), key).materialize()
    enc_rows = {r["doc_id"]: r for r in enc.take_all()}
    assert all(r["is_encrypted"] for r in enc_rows.values())
    assert enc_rows["d0"]["blob"] != b"alpha-bytes"  # actually encrypted
    # deterministic per-doc IV -> re-running encryption is idempotent bytes
    enc2 = {r["doc_id"]: r["blob"]
            for r in encrypt_blobs(ray.data.from_arrow(blobs), key).take_all()}
    assert enc2 == {d: r["blob"] for d, r in enc_rows.items()}

    dec = {r["doc_id"]: r for r in decrypt_blobs(enc, key).take_all()}
    assert dec["d0"]["blob"] == b"alpha-bytes"
    assert dec["d1"]["blob"] == b""
    assert dec["d2"]["blob"] == b"\x00\xff binary \x01"
    assert all(r["decrypt_error"] is None for r in dec.values())
    assert all(not r["is_encrypted"] for r in dec.values())

    # wrong key -> failure-as-result, batch survives
    bad = {r["doc_id"]: r for r in decrypt_blobs(enc, bytes(32)).take_all()}
    assert all(r["blob"] is None for r in bad.values())
    assert all(r["decrypt_error"] for r in bad.values())

    # already-encrypted rows pass through encrypt_blobs untouched
    re_enc = {r["doc_id"]: r["blob"] for r in encrypt_blobs(enc, key).take_all()}
    assert re_enc == {d: r["blob"] for d, r in enc_rows.items()}


def test_hash_join_semantics(ray_session):
    """Generic co-group hash join: inner vs left, duplicate-key cartesian,
    right-column suffixing on collision — no broadcast state anywhere."""
    import pyarrow as pa

    import ray.data
    from unravel_ray.relational import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2, 3], "v": ["a", "b", "c", "d"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 2, 2, 9], "v": ["X", "Y", "Z", "W"], "extra": [10, 20, 30, 40]}))

    inner = sorted(
        ((r["k"], r["v"], r["v_r"], r["extra"])
         for r in hash_join(left, right, on="k", how="inner").take_all())
    )
    # k=1: 2 left x 1 right; k=2: 1 left x 2 right; k=3/9: no match
    assert inner == [
        (1, "a", "X", 10), (1, "b", "X", 10),
        (2, "c", "Y", 20), (2, "c", "Z", 30),
    ]

    lj = sorted(
        ((r["k"], r["v"], r["v_r"], r["extra"])
         for r in hash_join(left, right, on="k", how="left").take_all()),
        key=lambda t: (t[0], t[1], t[2] or ""),
    )
    assert (3, "d", None, None) in lj
    assert len(lj) == 5  # 4 inner rows + 1 null-padded left row
    assert not any(r[0] == 9 for r in lj)  # right-only keys never appear


def test_hash_join_full_right_outer(ray_session):
    """right/full outer compose per-bucket: a key value hashes to exactly
    one bucket on both sides, so bucket-local unmatched rows are globally
    unmatched, and null keys never match (SQL semantics) — they surface
    unmatched from whatever bucket their placement hash chose.
    Differential vs DuckDB on randomized duplicate-key + null-key
    tables."""
    import duckdb
    import numpy as np
    import pytest

    from unravel_ray.relational import hash_join

    rng = np.random.default_rng(11)
    n_l, n_r = 700, 400

    def keys(n, lo, hi):
        k = rng.integers(lo, hi, n).astype(object)
        k[rng.random(n) < 0.05] = None  # null join keys on both sides
        return pa.array(list(k), pa.int64())

    # key ranges overlap only partially -> unmatched rows on both sides
    ltab = pa.table({"k": keys(n_l, 0, 60), "v": np.arange(n_l)})
    rtab = pa.table({"k": keys(n_r, 30, 90), "w": np.arange(n_r)})
    con = duckdb.connect()
    con.register("l", ltab)
    con.register("r", rtab)

    def canon(rows):
        return sorted((-1 if k is None else k, -1 if v is None else v,
                       -1 if w is None else w) for k, v, w in rows)

    for how, sql_kw in (("full", "FULL OUTER"), ("right", "RIGHT")):
        got = hash_join(ray.data.from_arrow(ltab), ray.data.from_arrow(rtab),
                        on="k", how=how).take_all()
        want = con.execute(
            f"SELECT COALESCE(l.k, r.k) AS k, l.v, r.w "
            f"FROM l {sql_kw} JOIN r ON l.k = r.k").fetchall()
        assert canon((g["k"], g["v"], g["w"]) for g in got) == canon(want), how

    # build-side salting replicates hot rows -> invalid under right/full
    with pytest.raises(ValueError):
        hash_join(ray.data.from_arrow(ltab), ray.data.from_arrow(rtab),
                  on="k", how="full", hot_keys=[40])

    # string keys: '' and null hash to the same placement bucket
    # (hash_strings folds both to the finalized-zero constant) — within
    # the bucket Arrow must still MATCH ''=='' and never match nulls
    sl = pa.table({"k": pa.array(["", None, "a"]), "v": [1, 2, 3]})
    sr = pa.table({"k": pa.array(["", None, "b"]), "w": [10, 20, 30]})
    got = hash_join(ray.data.from_arrow(sl), ray.data.from_arrow(sr),
                    on="k", how="full").take_all()
    rows = sorted(((r["k"], r["v"], r["w"]) for r in got),
                  key=lambda t: (str(t[0]), t[1] or -1, t[2] or -1))
    assert ("", 1, 10) in rows          # empty matches empty
    assert len(rows) == 5               # 1 match + 2 null-key + a/b unmatched
    assert all(not (v and w) for k, v, w in rows if k is None)


def test_asof_join_semantics(ray_session):
    """Backward as-of: last right row with ts <= left ts per key; nulls
    when nothing precedes; keys missing from right entirely -> nulls."""
    import pyarrow as pa

    import ray.data
    from unravel_ray.relational import asof_join

    left = ray.data.from_arrow(pa.table({
        "lid": [1, 2, 3, 4],
        "k": ["a", "a", "a", "b"],
        "t": pa.array([10, 25, 5, 50], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": ["a", "a", "a", "c"],
        "t": pa.array([8, 20, 30, 1], pa.int64()),
        "rv": ["r8", "r20", "r30", "rc"],
    }))
    out = {r["lid"]: r for r in asof_join(
        left, right, by="k", on="t", right_keep=["rv", "t"]).take_all()}
    assert out[1]["rv"] == "r8"     # t=10 -> last right at 8
    assert out[2]["rv"] == "r20"    # t=25 -> 20 (not 30)
    assert out[3]["rv"] is None     # t=5 precedes everything
    assert out[4]["rv"] is None     # key 'b' absent from right
    assert out[2]["t_r"] == 20      # right timestamp carried, suffixed
    # exact-tie matches inclusively (right.t <= left.t)
    left2 = ray.data.from_arrow(pa.table({
        "lid": [9], "k": ["a"], "t": pa.array([20], pa.int64())}))
    tie = asof_join(left2, right, by="k", on="t",
                    right_keep=["rv"]).take_all()[0]
    assert tie["rv"] == "r20"


def test_asof_join_blocked_matches_bruteforce(ray_session):
    """Randomized differential: the fixed-block segmented-scan asof must
    equal the per-row brute-force model, with n_blocks tiny so many keys
    co-locate in one block (runs, boundary fills, and equal timestamps
    all exercised)."""
    import random

    import pyarrow as pa

    import ray.data
    from unravel_ray.relational import asof_join

    rng = random.Random(1234)
    keys = [f"k{i}" for i in range(17)]
    lrows = [(i, rng.choice(keys), rng.randrange(0, 40))
             for i in range(300)]
    # some keys have no right rows at all; duplicate right timestamps OK
    rrows = [(rng.choice(keys[:12]), rng.randrange(0, 40), i)
             for i in range(200)]
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([r[0] for r in lrows], pa.int64()),
        "k": pa.array([r[1] for r in lrows], pa.string()),
        "t": pa.array([r[2] for r in lrows], pa.int64()),
    })).repartition(7)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rrows], pa.string()),
        "t": pa.array([r[1] for r in rrows], pa.int64()),
        "rid": pa.array([r[2] for r in rrows], pa.int64()),
    })).repartition(5)
    out = {r["lid"]: r for r in asof_join(
        left, right, by="k", on="t", right_keep=["t"],
        n_blocks=3).take_all()}
    assert len(out) == len(lrows)
    for lid, k, t in lrows:
        prior = [rt for rk, rt, _ in rrows if rk == k and rt <= t]
        want = max(prior) if prior else None
        assert out[lid]["t_r"] == want, (lid, k, t)


def test_range_join_semantics(ray_session):
    """Interval containment: [lo, hi) bands, outside rows get nulls,
    bands validated sorted/disjoint."""
    import pyarrow as pa
    import pytest as _pt

    import ray.data
    from unravel_ray.relational import range_join

    bands = pa.table({
        "lo": pa.array([0.0, 10.0], pa.float64()),
        "hi": pa.array([10.0, 20.0], pa.float64()),
        "label": ["low", "high"],
    })
    ds = ray.data.from_arrow(pa.table({"v": pa.array([-1.0, 0.0, 9.999, 10.0, 25.0])}))
    out = [r["label"] for r in range_join(ds, bands, value_col="v").take_all()]
    assert out == [None, "low", "low", "high", None]

    bad = pa.table({"lo": pa.array([0.0, 5.0]), "hi": pa.array([6.0, 9.0]),
                    "label": ["a", "b"]})  # overlapping
    with _pt.raises(ValueError, match="disjoint"):
        range_join(ds, bad, value_col="v")


def test_hash_join_semi_anti(ray_session):
    import pyarrow as pa

    import ray.data
    from unravel_ray.relational import hash_join

    left = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": list("abcd")}))
    right = ray.data.from_arrow(pa.table({"k": [2, 2, 4], "w": [9, 9, 9]}))
    semi = sorted(r["k"] for r in hash_join(left, right, on="k", how="semi").take_all())
    anti = sorted(r["k"] for r in hash_join(left, right, on="k", how="anti").take_all())
    assert semi == [2, 4]  # existence only — no duplication from dup right keys
    assert anti == [1, 3]
    # semi/anti outputs carry ONLY left columns
    cols = set(hash_join(left, right, on="k", how="semi").take_all()[0])
    assert cols == {"k", "v"}


def test_docx_export_is_valid_ooxml(ray_session):
    """S9 completed: real .docx bytes — a well-formed OOXML zip whose
    document.xml carries the spans as styled paragraphs in span order."""
    import io
    import zipfile
    import xml.etree.ElementTree as ET

    import ray.data
    from unravel_ray.export import docx_bytes, export_docx
    from unravel_ray.pipeline import build_extraction
    from unravel_ray.config import PipelineConfig
    from unravel_ray.synth import make_corpus

    spans = [
        {"kind": "heading", "text": "Title", "media_ref": None, "offset": 0},
        {"kind": "text", "text": "line one\nline two", "media_ref": None, "offset": 1},
        {"kind": "list_item", "text": "item <a&b>", "media_ref": None, "offset": 2},
    ]
    blob = docx_bytes(spans)
    z = zipfile.ZipFile(io.BytesIO(blob))
    assert set(z.namelist()) == {"[Content_Types].xml", "_rels/.rels",
                                 "word/document.xml"}
    W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    root = ET.fromstring(z.read("word/document.xml"))
    texts = [t.text for t in root.iter(f"{W}t")]
    assert texts == ["Title", "line one", "line two", "- item <a&b>"]
    styles = [s.get(f"{W}val") for s in root.iter(f"{W}pStyle")]
    assert styles == ["Heading1", "ListParagraph"]

    out = export_docx(build_extraction(
        ray.data.from_arrow(make_corpus(12)),
        PipelineConfig(ocr_concurrency=1))).take_all()
    assert len(out) == 12
    for r in out:
        if r["status"] == "completed":
            zipfile.ZipFile(io.BytesIO(r["docx"]))  # every blob is a valid zip
            assert r["file_name"].endswith(".docx")
        else:
            assert r["docx"] == b""


def test_derive_join_buckets_scales_with_rows(ray_session):
    """Bucket count must grow with the estimated input so per-bucket task
    memory stays flat at corpus scale; unknown sizes keep the floor."""
    import ray.data

    from unravel_ray.relational import derive_join_buckets

    small = ray.data.range(1000)
    big = ray.data.range(50_000_000)  # metadata count, nothing executes
    assert derive_join_buckets(small, small) == 32
    assert derive_join_buckets(big, small) == 200  # 50M / 250k
    assert derive_join_buckets(small, big, target_rows_per_bucket=1_000_000) == 50
    # transforms hide the metadata count -> floor unless a hint is passed
    hidden = big.map_batches(lambda t: t, batch_format="pyarrow")
    assert derive_join_buckets(hidden, small) == 32
    assert derive_join_buckets(hidden, small, est_rows=10_000_000) == 40


def test_render_spans_column_equals_row_form():
    """Vectorized column render must match per-row render_spans for both
    formats on offset-ordered spans (the finalize contract), including
    null/empty spans lists and null texts."""
    import pyarrow as pa

    from unravel_ray.export import render_spans, render_spans_column

    spans_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    docs = [
        [{"kind": "heading", "text": "Title", "media_ref": None, "offset": 0},
         {"kind": "text", "text": "body one", "media_ref": None, "offset": 1},
         {"kind": "list_item", "text": "item", "media_ref": None, "offset": 2}],
        [],
        None,
        [{"kind": "text", "text": None, "media_ref": None, "offset": 0},
         {"kind": "text", "text": "", "media_ref": None, "offset": 1},
         {"kind": "text", "text": "kept", "media_ref": None, "offset": 2}],
    ]
    col = pa.array(docs, spans_type)
    for fmt in ("text", "markdown"):
        got = render_spans_column(col, fmt).to_pylist()
        want = [render_spans(d or [], fmt) for d in docs]
        assert got == want, (fmt, got, want)


def test_hash_join_string_keys_salted_equals_unsalted(ray_session):
    """Round-4 skew work: string keys ride the vectorized value-hash (no
    per-row Python), and hot-key salting (probe spray + build replicate)
    is row-identical to the unsalted join for every join type — including
    duplicate build rows under the hot key, where each probe row must
    meet each replica-set copy exactly once."""
    import numpy as np

    from unravel_ray.relational import hash_join

    rng = np.random.default_rng(7)
    n = 4000
    # skewed probe: key "hot" carries ~half the rows — the shape that
    # would pile into one bucket unsalted
    keys = np.where(rng.random(n) < 0.5, "hot",
                    rng.integers(0, 50, n).astype(str)).astype(object)
    left = ray.data.from_arrow(pa.table(
        {"k": pa.array(keys, pa.string()), "v": np.arange(n)}))
    right_keys = ["hot", "hot"] + [str(i) for i in range(0, 50, 2)]
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(right_keys, pa.string()),
        "w": list(range(len(right_keys)))}))

    for how in ("inner", "left", "semi", "anti"):
        plain = hash_join(left, right, on="k", how=how).take_all()
        salted = hash_join(left, right, on="k", how=how,
                           hot_keys=["hot"], n_salts=8).take_all()
        key = (lambda r: (r["k"], r["v"], r.get("w"))) \
            if how in ("inner", "left") else (lambda r: (r["k"], r["v"]))
        assert sorted(map(key, plain)) == sorted(map(key, salted)), how
    # the hot key's 8 salted bucket slots actually spread (>1 bucket at
    # the derive_join_buckets floor of 32)
    from unravel_ray.hashing import hash_strings

    h = hash_strings(pa.array(["hot"]))
    salts = np.arange(8, dtype=np.uint64)
    spread = set((((h + salts * np.uint64(0xD1B54A32D192ED03))
                   >> np.uint64(33)) % 32).tolist())
    assert len(spread) > 1


def test_detect_hot_keys(ray_session):
    from unravel_ray.relational import detect_hot_keys

    ds = ray.data.from_arrow(pa.table(
        {"k": ["a"] * 500 + ["b"] * 3 + ["c"] * 499}))
    assert set(detect_hot_keys(ds, "k", min_rows=499)) == {"a", "c"}
    assert detect_hot_keys(ds, "k", min_rows=501) == []
