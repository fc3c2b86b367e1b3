"""HLL register sketch + inverted index + TF-IDF unit tests (the query
contract itself is exercised against DuckDB in test_queries_vs_duckdb)."""

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data
from unravel_ray.sketch import (
    EMPTY_TERM,
    EST_CAP,
    LC_TABLE_MICROS,
    LC_THRESHOLD_MICROS,
    N_BUCKETS,
    NUMER,
    RANK_CAP,
    _rank_of,
    hll_estimate,
    hll_registers,
)


def _reference_estimate(values) -> int:
    """Single-threaded model of the exact estimator contract."""
    regs = {}
    for v in values:
        h = hashlib.sha256(str(v).encode()).hexdigest()
        b = int(h[:2], 16)
        regs[b] = max(regs.get(b, 0), _rank_of(h))
    n_hit = len(regs)
    denom = sum(1 << (RANK_CAP - r) for r in regs.values()) \
        + (N_BUCKETS - n_hit) * EMPTY_TERM
    est = min(NUMER // denom, EST_CAP)
    if est <= LC_THRESHOLD_MICROS and n_hit < N_BUCKETS:
        est = N_BUCKETS * LC_TABLE_MICROS[n_hit]
    return est


@pytest.mark.parametrize("n_distinct", [40, 1200, 20000])
def test_hll_estimate_accuracy_band(ray_session, n_distinct):
    # duplicated values must not move the sketch: each value appears twice
    vals = [f"u{i}" for i in range(n_distinct)] * 2
    ds = ray.data.from_arrow(pa.table({
        "g": ["x"] * len(vals), "v": vals})).repartition(8)
    out = hll_estimate(ds, "v", "g")
    est = out["distinct_est_micros"][0].as_py() / 1e6
    assert est == pytest.approx(_reference_estimate(
        [f"u{i}" for i in range(n_distinct)]) / 1e6)
    # HLL-256 error band (~6.5% sigma); allow 3 sigma plus LC transition
    assert abs(est / n_distinct - 1) < 0.20, est


def test_hll_registers_merge_invariant_under_partitioning(ray_session):
    vals = [f"doc{i % 500}" for i in range(2000)]
    tbl = pa.table({"g": ["a" if i % 3 else "b" for i in range(2000)],
                    "v": vals})

    def regs(n_parts):
        ds = ray.data.from_arrow(tbl).repartition(n_parts)
        t = pa.Table.from_pylist(
            hll_registers(ds, "v", "g").take_all()).sort_by(
                [("g", "ascending"), ("bucket", "ascending")])
        return t.to_pydict()

    assert regs(1) == regs(16)


def test_inverted_index_matches_bruteforce(ray_session):
    from unravel_ray.textstats import inverted_index

    docs = [(1, "alpha beta gamma"), (2, "beta beta delta"),
            (3, "Gamma, ALPHA!"), (4, None), (5, "epsilon")]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    out = pa.Table.from_pylist(
        inverted_index(ray.data.from_arrow(tbl).repartition(4))
        .take_all()).sort_by("word")
    got = {r["word"]: (r["df"], r["postings"]) for r in out.to_pylist()}
    assert got == {
        "alpha": (2, "1,3"),
        "beta": (2, "1,2"),
        "delta": (1, "2"),
        "epsilon": (1, "5"),
        "gamma": (2, "1,3"),
    }


def test_inverted_index_min_df(ray_session):
    from unravel_ray.textstats import inverted_index

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b", "a c"], pa.string())})
    out = pa.Table.from_pylist(
        inverted_index(ray.data.from_arrow(tbl), min_df=2).take_all())
    assert out["word"].to_pylist() == ["a"]


def test_bloom_prefilter_no_false_negatives(ray_session):
    from unravel_ray.relational import bloom_build, bloom_prefilter

    keys = pa.table({"k": pa.array([f"key{i}" for i in range(0, 100, 2)],
                                   pa.string())})
    bits = bloom_build(ray.data.from_arrow(keys).repartition(4), "k")
    probe = pa.table({"k": pa.array([f"key{i}" for i in range(100)],
                                    pa.string()),
                      "x": pa.array(range(100), pa.int64())})
    kept = pa.Table.from_pylist(
        bloom_prefilter(ray.data.from_arrow(probe), "k", bits).take_all())
    kept_keys = set(kept["k"].to_pylist())
    # every build key must survive (Bloom guarantees zero false negatives)
    assert {f"key{i}" for i in range(0, 100, 2)} <= kept_keys
    # and the filter is deterministic: same bits -> same kept set
    kept2 = pa.Table.from_pylist(
        bloom_prefilter(ray.data.from_arrow(probe).repartition(8), "k",
                        bits).take_all())
    assert set(kept2["k"].to_pylist()) == kept_keys


def test_assign_splits_deterministic_and_stratified(ray_session):
    from unravel_ray.textstats import assign_splits

    tbl = pa.table({"doc_id": pa.array(range(2000), pa.int64())})

    def splits(n_parts):
        out = pa.Table.from_pylist(
            assign_splits(ray.data.from_arrow(tbl).repartition(n_parts))
            .take_all()).sort_by("doc_id")
        return out["split"].to_pylist()

    a = splits(1)
    assert a == splits(16)  # partition-invariant assignment
    frac_train = a.count("train") / len(a)
    frac_val = a.count("val") / len(a)
    assert 0.75 < frac_train < 0.85
    assert 0.07 < frac_val < 0.14


def test_tfidf_rank_zero_df_term_contributes_nothing(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from unravel_ray.relational import tfidf_rank

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["query query stream", "stream", "nothing here"],
                         pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = tfidf_rank(str(tmp_path), terms=("query", "zzz_absent"), k=10)
    # df(query)=1 of 3 docs -> idf = 3_000_000; absent term must add 0
    assert out.to_pydict() == {"doc_id": [1], "score_micros": [6_000_000]}


# ---------------------------------------------------------------------------
# mergeable quantile sketch
# ---------------------------------------------------------------------------

def test_quantile_bucket_upper_bound_and_error():
    import numpy as np

    from unravel_ray.sketch import bucket_upper, quantile_bucket

    v = np.concatenate([np.arange(0, 4096), 2 ** np.arange(12, 62),
                        2 ** np.arange(12, 62) - 1])
    b = quantile_bucket(v)
    u = bucket_upper(b)
    assert (u >= v).all()
    big = v >= 8
    assert ((u[big] - v[big]) / v[big] <= 0.125).all()
    # buckets are monotone in v
    order = np.argsort(v)
    assert (np.diff(b[order]) >= 0).all()


def test_quantile_sketch_estimates_and_partition_invariance(ray_session):
    import numpy as np

    from unravel_ray.sketch import quantile_sketch

    rng = np.random.default_rng(7)
    vals = rng.integers(1, 100_000, size=5_000)
    t = pa.table({"grp": pa.array(["a"] * len(vals)),
                  "v": pa.array(vals, pa.int64())})
    for nparts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nparts)
        row = quantile_sketch(ds, "v", "grp").take_all()[0]
        assert row["n"] == len(vals)
        for q in (50, 95, 99):
            exact = np.sort(vals)[int(np.ceil(len(vals) * q / 100)) - 1]
            est = row[f"p{q}_est"]
            assert est >= exact  # upper-bound estimator
            assert (est - exact) / exact <= 0.125 + 0.01


def test_heavy_hitter_words_mg_compaction_matches_bruteforce(ray_session):
    """Randomized differential on a LARGE vocabulary with k small enough
    to force Misra-Gries compaction in every batch: the certified
    candidate + exact-recount pipeline must equal brute-force counting."""
    import collections
    import random

    import pyarrow as pa

    import ray.data
    from unravel_ray.sketch import heavy_hitter_words

    rng = random.Random(99)
    # Zipf-ish: few hot words + a long tail far wider than k
    hot = [f"hot{i}" for i in range(8)]
    tail = [f"t{i}" for i in range(3000)]
    docs = []
    for _ in range(400):
        words = [rng.choice(hot) for _ in range(rng.randrange(3, 9))]
        words += [rng.choice(tail) for _ in range(rng.randrange(10, 30))]
        rng.shuffle(words)
        docs.append(" ".join(words))
    truth = collections.Counter(w for d in docs for w in d.split())
    min_count = 180
    want = {w: c for w, c in truth.items() if c >= min_count}
    assert want, "fixture must produce at least one heavy hitter"

    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    ds = ds.repartition(8)
    got = {r["word"]: r["n_occurrences"]
           for r in heavy_hitter_words(ds, min_count=min_count,
                                       k=64).take_all()}
    assert got == want


def test_heavy_hitter_words_raises_when_uncertifiable(ray_session):
    """When the accumulated MG offset reaches min_count the candidate set
    cannot be certified complete — the operator must refuse, not return
    silently-incomplete results."""
    import random

    import pyarrow as pa
    import pytest

    import ray.data
    from unravel_ray.sketch import heavy_hitter_words

    rng = random.Random(7)
    # uniform wide vocabulary: every batch compacts aggressively, so the
    # offset grows past any small threshold
    docs = [" ".join(rng.choice([f"w{i}" for i in range(2000)])
                     for _ in range(50)) for _ in range(300)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    ds = ds.repartition(8)
    with pytest.raises(ValueError, match="certified"):
        heavy_hitter_words(ds, min_count=3, k=8)
