"""Checkpoint/resume correctness (FIXTURES.md §4, D1 semantics):
interrupt after K committed partitions, rerun, assert (a) committed
partitions are skipped, (b) final table row-identical to an uninterrupted
run, (c) no duplicate doc_id."""

import collections

import pytest

import ray.data

from unravel_ray.checkpoint import (
    PartitionInterrupted,
    load_extracted,
    read_manifest,
    run_with_checkpoint,
)
from unravel_ray.config import PipelineConfig
from unravel_ray.synth import make_corpus

N_DOCS = 200
N_PARTS = 6
CFG = PipelineConfig(reassemble_buckets=8, ocr_concurrency=1, explode_batch_size=64)


def _make_docs():
    return ray.data.from_arrow(make_corpus(N_DOCS))


def _rows(out_dir):
    rows = load_extracted(out_dir).take_all()
    return sorted(rows, key=lambda r: r["doc_id"])


def test_kill_and_resume(ray_session, tmp_path):
    straight = tmp_path / "straight"
    resumed = tmp_path / "resumed"

    # uninterrupted baseline
    res = run_with_checkpoint(_make_docs, str(straight), N_PARTS, CFG)
    assert res["executed"] == list(range(N_PARTS))

    # interrupted after 3 commits
    with pytest.raises(PartitionInterrupted):
        run_with_checkpoint(_make_docs, str(resumed), N_PARTS, CFG, fail_after=3)
    m = read_manifest(str(resumed))
    assert len(m) == 3

    # resume completes only the pending partitions
    res2 = run_with_checkpoint(_make_docs, str(resumed), N_PARTS, CFG)
    assert sorted(res2["skipped"]) == sorted(m.keys())
    assert len(res2["executed"]) == N_PARTS - 3

    a, b = _rows(str(straight)), _rows(str(resumed))
    assert len(a) == N_DOCS
    assert a == b  # row-identical output

    ids = [r["doc_id"] for r in b]
    dupes = [d for d, c in collections.Counter(ids).items() if c > 1]
    assert not dupes


def test_manifest_lineage_fields(ray_session, tmp_path):
    out = tmp_path / "o"
    run_with_checkpoint(_make_docs, str(out), 4, CFG)
    m = read_manifest(str(out))
    assert set(m) == {0, 1, 2, 3}
    total_rows = sum(r["n_rows"] for r in m.values())
    assert total_rows == N_DOCS
    for r in m.values():
        assert r["n_rows"] == r["n_completed"] + r["n_failed"]
        assert ":" in r["input_fingerprint"]
        assert r["wall_time_s"] >= 0
