"""AI enrichment flow (M11+M12+M14 composed; ai/ module semantics)."""

import pyarrow as pa

import ray.data

from unravel_ray.ai import FakeLlmProvider, enrich, tags_as_list
from unravel_ray.schema import EXTRACTED_SCHEMA


def _extracted():
    long_text = "Invoice total amount due " + " ".join(f"w{i}" for i in range(30))
    rows = [
        {"doc_id": "d1", "collection_id": "c",
         "spans": [{"kind": "text", "text": long_text, "media_ref": None, "offset": 0}],
         "status": "completed", "error_message": None, "provider": "direct",
         "n_spans": 1, "n_chars": len(long_text)},
        {"doc_id": "d2", "collection_id": "c", "spans": [], "status": "failed",
         "error_message": "x", "provider": "fake", "n_spans": 0, "n_chars": 0},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA))


def test_enrich_completed_only_and_deterministic(ray_session):
    out = {r["doc_id"]: r for r in enrich(_extracted()).take_all()}
    d1, d2 = out["d1"], out["d2"]
    assert d1["document_type"] == "invoice"
    assert d1["ai_summary"].endswith("…") and len(d1["ai_summary"].split()) <= 16
    assert d1["ai_tags"] and "," in d1["ai_tags"]
    assert d2["ai_summary"] is None and d2["document_type"] is None
    again = {r["doc_id"]: r for r in enrich(_extracted()).take_all()}
    assert again["d1"]["ai_tags"] == d1["ai_tags"]


def test_tags_round_trip(ray_session):
    rows = tags_as_list(enrich(_extracted())).take_all()
    d1 = next(r for r in rows if r["doc_id"] == "d1")
    assert d1["ai_tags_list"] == d1["ai_tags"].split(",")
    d2 = next(r for r in rows if r["doc_id"] == "d2")
    assert d2["ai_tags_list"] == []


def test_fake_provider_output_is_fenced_json():
    raw = FakeLlmProvider().classify("some report with findings")
    assert raw.startswith("```json")
    from unravel_ray.functions import parse_llm_json

    parsed = parse_llm_json(raw)
    assert parsed["document_type"] == "report"
    assert isinstance(parsed["tags"], list)
