"""Mergeable distinct-count sketch (HyperLogLog-style, nibble-rank).

The at-scale answer to COUNT(DISTINCT) over 10^12 rows: exact distinct
counting shuffles every distinct value; a register sketch shuffles a
fixed 256-int payload per group regardless of cardinality, and registers
merge with MAX — associative, so they fold per batch, per block, per
node, per cluster without ever co-locating the values.

No reference analog (the reference counts distincts in SQL,
DashboardMetricsCacheService.java:40-58); this is the large-scale
extension of that KPI surface.

Determinism contract (the reason this sketch is DuckDB-oracle-checkable
value-for-value, unlike datasketches/approx_count_distinct):
  h       = sha256(str(value)) hexdigest
  bucket  = int(h[0:2], 16)                        (256 buckets)
  rho     = 1 + leading-zero-BITS of the 64-bit int h[2:18],
            capped at RANK_CAP (bit-granular: in SQL, 4 x the
            leading-'0'-nibble count + a per-nibble CASE table)
  denom   = sum over all 256 buckets of 2**(RANK_CAP - max_rho)
            (empty bucket => max_rho 0)
  raw     = min(ALPHA_MICROS * 256^2 * 2^RANK_CAP // denom, EST_CAP)
  est     = linear counting (precomputed integer ln table indexed by
            n_buckets_hit) when raw <= 2.5*m and a bucket is empty,
            else raw.
Every step is integer; both engines perform the identical arithmetic.
Measured error vs exact at 1e2..2e6 distinct: within +-10% (the
1.04/sqrt(256) = 6.5% HLL band plus small-range transition).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max, Sum

N_BUCKETS = 256
RANK_CAP = 48  # bits; 256 * 2^48 = 2^56 fits int64 exactly
EMPTY_TERM = 1 << RANK_CAP  # denom contribution of an empty bucket
ALPHA_MICROS = 718_000  # alpha_256 = 0.7213/(1 + 1.079/256), fixed-point
NUMER = ALPHA_MICROS * N_BUCKETS * N_BUCKETS * EMPTY_TERM
EST_CAP = 1 << 62  # denom >= 256 gives est ~ 2^71 max; cap keeps BIGINT

# Small-range (linear counting) correction, HLL-standard: when the raw
# estimate is <= 2.5*m and some buckets are empty, the better estimator is
# m * ln(m / (m - n_hit)). ln is float — so it is PRECOMPUTED here as a
# 256-entry integer-micros table (k = n_buckets_hit) and the identical
# constants are embedded in the SQL oracle: both engines branch on the
# same integers and index the same table. No runtime floats anywhere.
import math as _math

LC_TABLE_MICROS = tuple(
    round(_math.log(N_BUCKETS / (N_BUCKETS - k)) * 1_000_000)
    for k in range(N_BUCKETS)
)
LC_THRESHOLD_MICROS = 5 * N_BUCKETS * 1_000_000 // 2  # 2.5 * m, in micros


def _rank_of(hexdigest: str) -> int:
    v = int(hexdigest[2:2 + 16], 16)
    rho = 65 - v.bit_length()  # 1 + leading zero bits of the 64-bit tail
    return rho if rho < RANK_CAP else RANK_CAP


def _registers_partial(batch: pa.Table, group_col: str,
                       value_col: str) -> pa.Table:
    """Per-batch partial registers: <= groups x 256 slim rows leave the
    batch — the combiner that makes the groupby shuffle cardinality-free.
    sha256 runs once per DISTINCT (group, value) pair in the batch (the
    corpus determinism bridge is sha256 throughout; see synth.py)."""
    t = pa.table({
        "g": batch[group_col],
        "v": pc.cast(batch[value_col], pa.string()),
    })
    distinct = t.group_by(["g", "v"]).aggregate([])
    vs = distinct["v"].to_pylist()
    buckets = np.empty(len(vs), np.int64)
    ranks = np.empty(len(vs), np.int64)
    for i, s in enumerate(vs):
        h = hashlib.sha256(s.encode()).hexdigest()
        buckets[i] = int(h[:2], 16)
        ranks[i] = _rank_of(h)
    part = pa.table({
        "g": distinct["g"],
        "bucket": pa.array(buckets),
        "rank": pa.array(ranks),
    })
    agg = part.group_by(["g", "bucket"]).aggregate([("rank", "max")])
    return agg.rename_columns(["g", "bucket", "rank"])


def hll_registers(ds: Dataset, value_col: str, group_col: str) -> Dataset:
    """Grouped register sketch: Dataset of (g, bucket, rank) — at most
    256 rows per group after the slim 3-int-column shuffle."""
    return (
        ds.map_batches(
            lambda b: _registers_partial(b, group_col, value_col),
            batch_format="pyarrow",
        )
        .groupby(["g", "bucket"])
        .aggregate(Max("rank", alias_name="rank"))
    )


def hll_estimate(ds: Dataset, value_col: str, group_col: str) -> pa.Table:
    """Per-group distinct estimate from the register sketch.

    Returns (g, n_buckets_hit, distinct_est_micros) — one row per group.
    The register fold is map_groups over <= 256-row groups; integer
    arithmetic end to end (see module docstring for the exact formula).
    """
    regs = hll_registers(ds, value_col, group_col)

    def fold(group: pa.Table) -> pa.Table:
        ranks = group["rank"].to_numpy()
        n_hit = len(ranks)
        denom = int(np.sum(np.int64(1) << (RANK_CAP - ranks))) \
            + (N_BUCKETS - n_hit) * EMPTY_TERM
        est = min(NUMER // denom, EST_CAP)
        if est <= LC_THRESHOLD_MICROS and n_hit < N_BUCKETS:
            est = N_BUCKETS * LC_TABLE_MICROS[n_hit]
        return pa.table({
            "g": group["g"][:1],
            "n_buckets_hit": pa.array([n_hit], pa.int64()),
            "distinct_est_micros": pa.array([est], pa.int64()),
        })

    rows = regs.groupby("g").map_groups(fold, batch_format="pyarrow").take_all()
    out = pa.Table.from_pylist(rows, schema=pa.schema([
        ("g", pa.string()), ("n_buckets_hit", pa.int64()),
        ("distinct_est_micros", pa.int64())]))
    return out.sort_by("g")


def exact_distinct_by(ds: Dataset, value_col: str, group_col: str) -> pa.Table:
    """Exact per-group distinct count, combiner-first: per-batch distinct
    (g, v) pairs -> global pair dedupe (the unavoidable full-cardinality
    shuffle the sketch exists to amortize) -> per-batch group counts ->
    slim grouped sum. Returns (g, exact_distinct)."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "g": batch[group_col],
            "v": pc.cast(batch[value_col], pa.string()),
        })
        return t.group_by(["g", "v"]).aggregate([])

    def group_counts(batch: pa.Table) -> pa.Table:
        vc = batch["g"].value_counts()
        return pa.table({"g": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from ray.data.aggregate import Count

    uniq = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["g", "v"])
        .aggregate(Count(alias_name="_c"))
    )
    counted = (
        uniq.map_batches(group_counts, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="exact_distinct"))
    )
    rows = counted.take_all()
    out = pa.Table.from_pylist(rows, schema=pa.schema([
        ("g", pa.string()), ("exact_distinct", pa.int64())]))
    return out.sort_by("g")


# ---------------------------------------------------------------------------
# mergeable quantile sketch (log-bucket histogram, HDR-style)
# ---------------------------------------------------------------------------
#
# The at-scale answer to exact percentiles (relational.doc_size_percentiles
# shuffles every value): a fixed-size integer histogram whose buckets are
# exponential with 3 sub-bucket bits (relative error <= 12.5%), merged with
# SUM — associative, so it folds per batch / block / node like the HLL
# registers above. Every step is integer bit arithmetic, reproduced verbatim
# in the DuckDB oracle via bin()/>>/& — no floats anywhere.
#
#   bucket(v) = v                            for 0 <= v < 8
#             = 8*(hb-4) + ((v >> (hb-4)) & 7) + 8   otherwise,
#               hb = bit_length(v)
#   upper(b)  = b                            for b < 8
#             = ((9 + (b-8) % 8) << ((b-8) // 8)) - 1
#   estimate(q%) = upper(smallest bucket with cum_count >= ceil(n*q/100))

def _bit_length_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized int bit_length — branchless binary clz, exact (no log2
    float edge cases at powers of two)."""
    v = v.astype(np.uint64)
    hb = np.zeros(len(v), np.int64)
    cur = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(shift))
        hb[big] += shift
        cur[big] >>= np.uint64(shift)
    hb[cur > 0] += 1
    return hb


def quantile_bucket(v: np.ndarray) -> np.ndarray:
    """Histogram bucket id per value (int64 >= 0)."""
    v = np.maximum(v.astype(np.int64), 0)
    hb = _bit_length_vec(v)
    small = v < 8
    sub = (v >> np.maximum(hb - 4, 0)) & 7
    b = 8 * (hb - 4) + sub + 8
    return np.where(small, v, b).astype(np.int64)


def bucket_upper(b: np.ndarray) -> np.ndarray:
    """Inclusive upper bound of each bucket id."""
    b = b.astype(np.int64)
    small = b < 8
    e = np.maximum((b - 8) // 8, 0)
    sub = (b - 8) % 8
    return np.where(small, b, ((9 + sub) << e) - 1).astype(np.int64)


def quantile_sketch(ds: Dataset, value_col: str, group_col: str,
                    percentiles: tuple[int, ...] = (50, 95, 99)) -> Dataset:
    """Per-group approximate percentiles from the mergeable histogram.

    Shuffle payload: at most groups x ~500 slim (g, bucket, cnt) rows —
    independent of row count, the property exact percentile sort lacks.
    Returns one row per group: (g, n, p<q>_est ...), each estimate the
    inclusive upper bound of the bucket holding that rank (<= 12.5%
    relative error by construction).
    """

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({
            "g": batch[group_col],
            "bucket": pa.array(quantile_bucket(v), pa.int64()),
        })
        agg = t.group_by(["g", "bucket"]).aggregate([([], "count_all")])
        return agg.rename_columns(["g", "bucket", "cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def fold(group: pa.Table) -> pa.Table:
        g = group.sort_by([("bucket", "ascending")])
        b = g["bucket"].combine_chunks().to_numpy()
        c = g["cnt"].combine_chunks().to_numpy().astype(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        ub = bucket_upper(b)
        cols = {"g": g["g"][:1], "n": pa.array([n], pa.int64())}
        for q in percentiles:
            target = -(-n * q // 100)  # ceil(n*q/100)
            i = int(np.searchsorted(cum, target))
            cols[f"p{q}_est"] = pa.array([int(ub[min(i, len(ub) - 1)])],
                                         pa.int64())
        return pa.table(cols)

    return hist.groupby("g").map_groups(fold, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Heavy hitters — Misra-Gries candidates + exact recount verify
# ---------------------------------------------------------------------------

def heavy_hitter_words(ds: Dataset, min_count: int, k: int = 512,
                       text_col: str = "text") -> Dataset:
    """Every word whose corpus frequency is >= ``min_count``, EXACT —
    via the at-scale two-phase shape: bounded-state Misra-Gries
    candidate generation, then an exact recount restricted to the
    candidates (completing the mergeable-sketch family: HLL distinct,
    log-bucket quantiles, and now frequency heavy hitters).

    Phase 1 (sketch): each batch computes exact in-batch word counts
    (Arrow value_counts), then MG-compacts to <= k counters by
    subtracting the (k+1)-th largest count and dropping non-positives;
    the subtracted offset is emitted as a marker row. Counter sums merge
    itemwise in one slim groupby — the classic mergeable-summary
    property — and any word with true count >= min_count retains a
    merged count >= min_count - off_total, so filtering the merged
    sketch at that bound yields a certified-complete candidate set.
    The filter runs distributed; the driver only ever holds the
    candidates (<= total_words / (min_count - off_total) of them) plus
    one marker row. Raises when off_total >= min_count (k too small to
    certify completeness for this corpus/threshold — grow k).

    Phase 2 (verify): candidates broadcast once via ray.put; a second
    tokenize pass keeps only candidate words (vectorized is_in),
    combiner-first counts them exactly, and the final filter applies
    min_count to TRUE counts — false positives from phase 1 drop out,
    so the result is hash-identical to SQL GROUP BY/HAVING.

    Tokenization contract matches vocab_top_words: lowercase, split on
    whitespace, drop empties. The merged sketch is consumed eagerly at
    graph-construction time (documented bounded driver collection, same
    family as decontaminate's eval set).
    """
    import ray

    def tokenize(batch: pa.Table) -> pa.Array:
        words = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(batch[text_col], "")), r"\s+"))
        return words.filter(pc.not_equal(words, ""))

    def mg_partial(batch: pa.Table) -> pa.Table:
        vc = tokenize(batch).value_counts()
        vals = vc.field("values")
        cnts = pc.cast(vc.field("counts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        off = 0
        if cnts.shape[0] > k:
            off = int(np.partition(cnts, -k - 1)[-k - 1])  # (k+1)-th largest
            keep = cnts > off
            vals = vals.filter(pa.array(keep))
            cnts = cnts[keep] - off
        # the subtracted offset travels in a DEDICATED marker column, not
        # as a reserved value in the word domain (ADVICE r4: a corpus
        # token equal to an in-band sentinel would fold into the offset
        # accumulator and silently drop from the result)
        n = len(vals)
        return pa.table({
            "word": pa.concat_arrays([vals.combine_chunks()
                                      if isinstance(vals, pa.ChunkedArray)
                                      else vals,
                                      pa.array([""], type=pa.string())]),
            "cnt": pa.array(np.concatenate([cnts, [off]]), pa.int64()),
            "is_marker": pa.array([0] * n + [1], pa.int8()),
        })

    # materialized ONCE: the merged sketch is slim (word, cnt) rows,
    # bounded by k x input blocks, and is read twice below (offset row,
    # then the distributed candidate filter)
    merged = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby(["word", "is_marker"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )

    def pick_off(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["is_marker"], 1))

    off_rows = merged.map_batches(pick_off, batch_format="pyarrow").take_all()
    off_total = int(off_rows[0]["cnt"]) if off_rows else 0
    if off_total >= min_count:
        raise ValueError(
            f"heavy_hitter_words: accumulated MG offset {off_total} >= "
            f"min_count {min_count}; candidates cannot be certified "
            f"complete — increase k (got {k})")
    bound = min_count - off_total

    def survivors(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["cnt"], bound),
                    pc.equal(t["is_marker"], 0))
        return t.filter(m).select(["word"])

    cand_words = pa.array(
        [r["word"] for r in merged.map_batches(
            survivors, batch_format="pyarrow").take_all()], pa.string())
    cand_ref = ray.put(cand_words)

    def recount(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        words = tokenize(batch)
        words = words.filter(pc.is_in(words, value_set=wanted))
        vc = words.value_counts()
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    def apply_min(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_occurrences"], min_count))

    return (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="n_occurrences"))
        .map_batches(apply_min, batch_format="pyarrow")
    )
