"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
broadcast query matrix (ray.put once; never re-shipped per batch).
Scale path: LSH (random-hyperplane) bucketing so each query only scans
its probed buckets; an IVF variant would replace the hash with k-means
centroids (same plumbing).

No reference analog (search there is Elasticsearch text search,
DocumentSearchService.java); this is the training-data extension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def brute_force_topk(ds: Dataset, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Exact cosine top-k for each query row.

    Per batch: one matmul (B x D) @ (D x Q) then per-query partial top-k;
    partials merge on the driver (Q*k rows per batch — tiny). Cosines are
    rounded to 6 dp; ties broken by id ascending for determinism.
    Returns a pa.Table (query_idx, rank, vec_id, cos).
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q.T)  # D x Q

    def partial(batch: pa.Table) -> pa.Table:
        qt = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        mat = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()]
        ))
        sims = mat @ qt  # B x Q
        rows = {"query_idx": [], id_col: [], "cos": []}
        kk = min(k, ids.shape[0])
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argpartition(-col, kk - 1)[:kk]
            for i in top:
                rows["query_idx"].append(qi)
                rows[id_col].append(int(ids[i]))
                rows["cos"].append(float(col[i]))
        return pa.table({
            "query_idx": pa.array(rows["query_idx"], pa.int64()),
            id_col: pa.array(rows[id_col], pa.int64()),
            "cos": pa.array(rows["cos"], pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = {"query_idx": [], "rank": [], id_col: [], "cos": []}
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(r["query_idx"], []).append((r["cos"], r[id_col]))
    for qi in sorted(by_q):
        cand = sorted(by_q[qi], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (cos, vid) in enumerate(cand):
            out["query_idx"].append(qi)
            out["rank"].append(rank)
            out[id_col].append(vid)
            out["cos"].append(round(cos, 6))
    return pa.table({
        "query_idx": pa.array(out["query_idx"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int64()),
        id_col: pa.array(out[id_col], pa.int64()),
        "cos": pa.array(out["cos"], pa.float64()),
    })


class LshIndexStage:
    """Random-hyperplane signature stage; planes generated once per actor
    from a fixed seed (identical across actors — deterministic bucketing)."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 42,
                 vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_bits))
        self.vec_col = vec_col
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)

    def signature(self, mat: np.ndarray) -> np.ndarray:
        return ((mat @ self.planes) > 0).astype(np.int64) @ self.weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[self.vec_col].to_pylist()])
        sig = self.signature(_normalize(mat))
        return batch.append_column("lsh_bucket", pa.array(sig, pa.int64()))


def lsh_topk(ds: Dataset, queries: np.ndarray, k: int = 10, n_bits: int = 12,
             seed: int = 42, vec_col: str = "embedding", id_col: str = "vec_id",
             concurrency=2) -> pa.Table:
    """Approximate top-k: scan only rows whose LSH bucket matches a query's
    bucket (single-probe). Recall grows with fewer bits / multiprobe; this
    is the 100 TB path — each bucket is a partition-local scan.
    """
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    stage = LshIndexStage(dim, n_bits, seed, vec_col)
    q_sigs = stage.signature(_normalize(q))
    wanted = set(int(s) for s in q_sigs)
    wanted_ref = ray.put(wanted)

    indexed = ds.map_batches(
        LshIndexStage,
        fn_constructor_kwargs=dict(dim=dim, n_bits=n_bits, seed=seed, vec_col=vec_col),
        batch_format="pyarrow", concurrency=concurrency,
    )

    def keep(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        mask = pa.array([b in w for b in batch["lsh_bucket"].to_pylist()], pa.bool_())
        return batch.filter(mask)

    candidates = indexed.map_batches(keep, batch_format="pyarrow")
    return brute_force_topk(candidates, queries, k, vec_col, id_col)
