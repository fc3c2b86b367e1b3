"""The split-doc repair net: when local reassembly yields >1 row for a
doc (block split mid-doc), _repair_split_docs must recompute exactly those
docs and splice a single correct row back in."""

import pyarrow as pa

import ray.data

from oracle.pyref import extract_doc
from unravel_ray.config import PipelineConfig
from unravel_ray.pipeline import _repair_split_docs, build_extraction
from unravel_ray.schema import EXTRACTED_SCHEMA
from unravel_ray.synth import make_corpus


def test_repair_merges_split_doc(ray_session):
    corpus = make_corpus(40)
    docs = ray.data.from_arrow(corpus)
    cfg = PipelineConfig(ocr_concurrency=1)

    good = build_extraction(docs, cfg).take_all()
    victim = next(r for r in good if r["status"] == "completed" and r["n_spans"] >= 2)

    # fabricate a split: victim's row appears twice, each with half the spans
    doctored = []
    for r in good:
        if r["doc_id"] == victim["doc_id"]:
            half = len(r["spans"]) // 2
            a = dict(r, spans=r["spans"][:half], n_spans=half)
            b = dict(r, spans=r["spans"][half:], n_spans=len(r["spans"]) - half)
            doctored.extend([a, b])
        else:
            doctored.append(r)
    broken = ray.data.from_arrow(pa.Table.from_pylist(doctored, schema=EXTRACTED_SCHEMA))

    repaired = _repair_split_docs(docs, broken, cfg).take_all()
    assert len(repaired) == 40
    by_id = {r["doc_id"]: r for r in repaired}
    fixed = by_id[victim["doc_id"]]
    want = extract_doc(next(d for d in corpus.to_pylist() if d["doc_id"] == victim["doc_id"]))
    assert [(s["kind"], s["text"], s["media_ref"]) for s in fixed["spans"]] == [
        (s["kind"], s["text"], s["media_ref"]) for s in want["spans"]
    ]
    assert fixed["status"] == want["status"]


def test_no_dup_passthrough(ray_session):
    docs = ray.data.from_arrow(make_corpus(30))
    cfg = PipelineConfig(ocr_concurrency=1)
    out = build_extraction(docs, cfg).take_all()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) == 30
