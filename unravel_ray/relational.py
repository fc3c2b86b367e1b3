"""Relational operators over the driver testdata — the SQL-checkable surface.

Each function takes ``sf_dir`` and returns a ``ray.data.Dataset`` (or small
``pyarrow.Table``). Every query here has a matching DuckDB oracle in
``__ray_entry__.oracle_sql()``; column names match exactly.

Numeric-equality discipline: the driver value-hashes results, so float
aggregates must be bit-reproducible across engines. Money/value columns are
summed as integer cents (``round(x*100)`` per row is deterministic; integer
sums are order-independent), and averages are computed as exact-integer
ratios so both engines perform the identical single division.

Scale notes per operator in docstrings. Reads always prune columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


def _pq(sf_dir: str, table: str, columns: list[str] | None = None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(batch: pa.Table, src: str, dst: str) -> pa.Table:
    # half_towards_infinity matches DuckDB ROUND() (half away from zero);
    # pyarrow's default half_to_even would diverge on exact .5-cent inputs
    c = pc.cast(
        pc.round(pc.multiply(batch[src], pa.scalar(100.0)),
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )
    return batch.append_column(dst, c)


# ---------------------------------------------------------------------------
# G1/G7 — grouped counts & sums (documents by source)
# ---------------------------------------------------------------------------

def source_stats(sf_dir: str) -> Dataset:
    """Per-source doc count + char total (G1 upload-size sum, G7 grouped KPIs;
    reference DocumentUploadImpl.java:81-82, DashboardMetricsCacheService.java:98-124).

    Scale: tiny shuffle — pre-aggregation happens inside Ray's tree
    aggregate; only (source, partial) rows move.
    """
    return (
        _pq(sf_dir, "documents", ["source", "n_chars"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
    )


# ---------------------------------------------------------------------------
# TPC-H-Q1-style pricing summary (G2/G5/G8 aggregate showcase)
# ---------------------------------------------------------------------------

def lineitem_pricing(sf_dir: str) -> Dataset:
    """Grouped pricing summary with exact integer cents.

    Partial aggregation genuinely happens BEFORE the exchange: each block
    collapses to at most one row per (returnflag, linestatus) via an
    Arrow group_by — ~6 rows per block instead of one per lineitem — so
    the Ray groupby sorts a few hundred partial rows, not the table.
    (The pre-fix version only slimmed columns; the exchange still moved
    every row: 3.2-6.6 s -> 2.2-2.5 s same-window A/B at sf0.1/32 CPUs.)
    """
    ds = _pq(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        rm = {"round_mode": "half_towards_infinity"}  # DuckDB ROUND parity
        qty = pc.cast(pc.round(batch["l_quantity"], **rm), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)), **rm), pa.int64())
        disc_bp = pc.cast(pc.round(pc.multiply(batch["l_discount"], pa.scalar(100.0)), **rm), pa.int64())
        # disc_price_cents = price_cents * (100 - disc_basis_points) — exact ints
        disc_price_c = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_bp))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": qty,
                "price_cents": price_c,
                "disc_price_c100": disc_price_c,
            }
        )
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"),
             ("disc_price_c100", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "price_cents",
             "disc_price_c100", "n"])

    agg = (
        ds.map_batches(derive, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_base_cents"),
            Sum("disc_price_c100", alias_name="sum_disc_cents100"),
            Sum("n", alias_name="n_rows"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # exact integer micro-average: (sum*1e6)//n — identical in any engine
        avg_qty_micros = pc.divide(
            pc.multiply(batch["sum_qty"], pa.scalar(1_000_000, pa.int64())),
            batch["n_rows"],
        )
        return batch.append_column("avg_qty_micros", pc.cast(avg_qty_micros, pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# G4 — per-user accounting (events)
# ---------------------------------------------------------------------------

def _keyed_sum_fold(group: pa.Table, keys: list[str], sums: list[str],
                    out_names: list[str]) -> pa.Table:
    """Shared merge step of the fixed hash-block aggregate family
    (user_event_totals, event_hourly_windows): drop the block key, one
    Arrow group_by summing ``sums``, emit keys then int64 sums renamed to
    ``out_names`` — factored so the two folds cannot drift (r5 review)."""
    t = group.drop_columns(["__blk"])
    g = pa.TableGroupBy(t, keys).aggregate([(c, "sum") for c in sums])
    cols = {k: g[k] for k in keys}
    for c, name in zip(sums, out_names):
        cols[name] = pc.cast(g[f"{c}_sum"], pa.int64())
    return pa.table(cols)


def user_event_totals(sf_dir: str, n_blocks: int = 64) -> Dataset:
    """Per-user event count + value cents (G4 storage accounting analog,
    DocumentUploadImpl.java:150-161).

    Combiner-first: each block partial-aggregates with a vectorized
    pyarrow TableGroupBy, so the shuffle moves one row per (user, block)
    instead of one per event. The merge uses the window family's fixed
    hash(user) % n_blocks exchange (one small int sort key, one Arrow
    group_by per block) rather than a Ray range-sort on user_id —
    2.8-3.3 s -> 2.0-2.1 s same-window A/B at sf0.1/32 CPUs."""
    ds = _pq(sf_dir, "events", ["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        b = _cents(batch, "value", "value_cents")
        # count_all (row count) matches the oracle's COUNT(*) even with
        # NULL values; ('value_cents','count') would skip them
        g = pa.TableGroupBy(b.select(["user_id", "value_cents"]), "user_id").aggregate(
            [("value_cents", "sum"), ([], "count_all")]
        )
        g = g.rename_columns(["user_id", "value_cents", "n"])
        return g.append_column("__blk", _blk_int(g["user_id"], n_blocks))

    def fold(group: pa.Table) -> pa.Table:
        return _keyed_sum_fold(group, ["user_id"], ["n", "value_cents"],
                               ["n_events", "value_cents"])

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("__blk").map_groups(fold, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# O2 — sort + pagination
# ---------------------------------------------------------------------------

def top_documents(sf_dir: str, k: int = 20) -> Dataset:
    """Largest documents (O2 search sort + page,
    DocumentSearchService.java:174-186). Deterministic tiebreak on doc_id.

    Scale: Ray's sort is a distributed range-partition sort; limit(k)
    short-circuits consumption.
    """
    return (
        _pq(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# content search — tokenized match + rank + pagination
# ---------------------------------------------------------------------------

# filename field boost, mirroring the reference's multi-field match where
# fileName carries a higher weight than body content
# (DocumentSearchIndex.java:45-48 fileName fields + :78-79 extractedText)
FILENAME_WEIGHT = 3


def search_content(sf_dir: str, query: str = "hash merge src3",
                   lang: str = "en", page: int = 1,
                   page_size: int = 20) -> "pa.Table":
    """Multi-field full-text search with deterministic relevance ranking
    and Page-object metadata.

    Mirrors DocumentSearchService.searchByContent (reference
    elasticsearch/service/DocumentSearchService.java:83-101: match query
    over fileName AND extractedText; DocumentSearchIndex.java:45-48,78-79)
    and the Page result carrying total hits
    (DocumentSearchService.java:174-186). Elasticsearch BM25 is
    engine-specific, so the deterministic analog is weighted integer term
    frequency: score = content occurrences + FILENAME_WEIGHT x
    display-name occurrences (display name derived as
    ``doc_<doc_id>_<source>.txt`` — SQL-reconstructible). Filter:
    score > 0 AND lang. Order: score DESC, doc_id ASC; page k of size n =
    OFFSET (k-1)*n LIMIT n. ``total_matches`` = full match count.

    Scale shape: one vectorized scoring scan (Arrow RE2 kernels); each
    batch keeps its local top page*page_size candidates plus ONE marker
    row carrying the batch's match count (combiner-first total), so the
    driver merge sees at most (#batches x (page*page_size + 1)) slim
    rows, never the corpus.
    """
    import re as _re

    tokens = [t for t in query.lower().split() if t]
    keep = page * page_size
    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64()),
                        ("lang", pa.string())])

    def score_batch(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["lang"], lang))
        if batch.num_rows == 0:
            return schema.empty_table()
        low = pc.utf8_lower(batch["text"])
        name = pc.utf8_lower(pc.binary_join_element_wise(
            pa.array(["doc_"] * batch.num_rows),
            pc.cast(batch["doc_id"], pa.string()),
            pa.array(["_"] * batch.num_rows), batch["source"],
            pa.array([".txt"] * batch.num_rows), ""))
        s = None
        for tok in tokens:
            pat = rf"\b{_re.escape(tok)}\b"
            c = pc.add(pc.count_substring_regex(low, pat),
                       pc.multiply(pc.count_substring_regex(name, pat),
                                   FILENAME_WEIGHT))
            s = c if s is None else pc.add(s, c)
        t = pa.table({
            "doc_id": batch["doc_id"],
            "score": pc.cast(s, pa.int64()),
            "lang": batch["lang"],
        }).filter(pc.greater(pc.cast(s, pa.int64()), 0))
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        # marker row (doc_id = -1) carries this batch's total match count
        marker = pa.table({"doc_id": pa.array([-1], pa.int64()),
                           "score": pa.array([t.num_rows], pa.int64()),
                           "lang": pa.array([None], pa.string())})
        return pa.concat_tables([t.take(idx[:keep]), marker])

    candidates = ds.map_batches(score_batch, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(candidates, schema=schema)
    is_marker = pc.equal(merged["doc_id"], -1)
    total = pc.sum(merged.filter(is_marker)["score"]).as_py() or 0
    merged = merged.filter(pc.invert(is_marker))
    idx = pc.sort_indices(
        merged, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    lo = (page - 1) * page_size
    out = merged.take(idx[lo:lo + page_size])
    return out.append_column(
        "total_matches", pa.array([total] * out.num_rows, pa.int64()))


def search_highlights(sf_dir: str, query: str = "hash merge src3",
                      lang: str = "en", page_size: int = 20,
                      window: int = 30) -> "pa.Table":
    """Highlighted snippets for the top search hits — the reference's
    includeHighlights=true result surface (DocumentSearchResult.java:62-65,
    SearchRequest.java:72-75; ES fragments with <em> wrapping). The
    deterministic analog: one row per (hit doc, query token) whose first
    substring occurrence p yields snippet
    ``replace(text[max(0,p-window) : p+len(tok)+window], tok,
    '<em>'+tok+'</em>')`` — pure substring arithmetic, identical in
    DuckDB (strpos/substr/replace).

    Scale shape: same per-batch candidate top-k as search_content, but
    candidates also carry their text — payload bounded by
    page_size x #batches rows, never the corpus; snippets build with
    Arrow kernels on the <= page_size merged rows.
    """
    import re as _re

    tokens = [t for t in query.lower().split() if t]
    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64()),
                        ("text", pa.string())])

    def score_batch(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["lang"], lang))
        if batch.num_rows == 0:
            return schema.empty_table()
        low = pc.utf8_lower(batch["text"])
        name = pc.utf8_lower(pc.binary_join_element_wise(
            pa.array(["doc_"] * batch.num_rows),
            pc.cast(batch["doc_id"], pa.string()),
            pa.array(["_"] * batch.num_rows), batch["source"],
            pa.array([".txt"] * batch.num_rows), ""))
        s = None
        for tok in tokens:
            pat = rf"\b{_re.escape(tok)}\b"
            c = pc.add(pc.count_substring_regex(low, pat),
                       pc.multiply(pc.count_substring_regex(name, pat),
                                   FILENAME_WEIGHT))
            s = c if s is None else pc.add(s, c)
        t = pa.table({
            "doc_id": batch["doc_id"],
            "score": pc.cast(s, pa.int64()),
            "text": batch["text"],
        }).filter(pc.greater(pc.cast(s, pa.int64()), 0))
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        return t.take(idx[:page_size])

    candidates = ds.map_batches(score_batch, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(candidates, schema=schema)
    idx = pc.sort_indices(
        merged, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    top = merged.take(idx[:page_size])

    # snippet assembly over the <= page_size merged rows (bounded driver
    # work; per-row start offsets vary so there is no Arrow slice kernel)
    out_doc, out_tok, out_snip = [], [], []
    ids = top["doc_id"].to_pylist()
    texts = top["text"].to_pylist()
    for did, text in zip(ids, texts):
        # simple-mapping lower (Arrow kernel == DuckDB lower()), NOT
        # str.lower(): full case folding would shift find() offsets on
        # codepoints like U+0130 (see the contract note in dedup.py)
        low = pc.utf8_lower(pa.scalar(text or "", pa.string())).as_py()
        for tok in tokens:
            p = low.find(tok)
            if p < 0:
                continue
            frag = text[max(0, p - window):p + len(tok) + window]
            out_doc.append(did)
            out_tok.append(tok)
            out_snip.append(frag.replace(tok, f"<em>{tok}</em>"))
    return pa.table({
        "doc_id": pa.array(out_doc, pa.int64()),
        "token": pa.array(out_tok, pa.string()),
        "snippet": pa.array(out_snip, pa.string()),
    })


def _lev1_pattern(tok: str) -> str:
    """RE2 whole-word pattern matching exactly the strings at Levenshtein
    distance <= 1 from ``tok`` over [a-z]: exact + one substitution +
    one deletion + one insertion. O(len) alternatives, no backtracking
    blowup — the deterministic analog of Elasticsearch match fuzziness
    (DocumentSearchService.java:83-101 relevance semantics)."""
    if not tok.isalpha() or not tok.islower():
        raise ValueError(f"fuzzy token must be lowercase alpha: {tok!r}")
    alts = {tok}
    for i in range(len(tok)):
        alts.add(tok[:i] + "[a-z]" + tok[i + 1:])  # substitution (incl exact)
        if len(tok) > 1:
            alts.add(tok[:i] + tok[i + 1:])        # deletion
    for i in range(len(tok) + 1):
        alts.add(tok[:i] + "[a-z]" + tok[i:])      # insertion
    return r"\b(?:" + "|".join(sorted(alts)) + r")\b"


def search_fuzzy(sf_dir: str, query: str = "hashe mergee",
                 lang: str = "en", k: int = 20) -> "pa.Table":
    """Typo-tolerant content search: a document word counts when it is
    within edit distance 1 of a query token.

    Both engines agree exactly: words are the maximal [a-z]+ runs of
    lower(text) (Ray pre-cleans non-letters to spaces so RE2 ``\\b``
    equals those run edges), and the lev<=1 language is enumerated as an
    O(len) RE2 alternation (``_lev1_pattern``) — DuckDB verifies with its
    native ``levenshtein`` over the extracted word list. Same per-batch
    top-k + marker-count shape as search_content.
    """
    tokens = [t for t in query.lower().split() if t]
    pats = [_lev1_pattern(t) for t in tokens]
    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])
    schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64()),
                        ("lang", pa.string())])

    def score_batch(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["lang"], lang))
        if batch.num_rows == 0:
            return schema.empty_table()
        clean = pc.replace_substring_regex(
            pc.utf8_lower(batch["text"]), "[^a-z]+", " ")
        s = None
        for pat in pats:
            c = pc.count_substring_regex(clean, pat)
            s = c if s is None else pc.add(s, c)
        t = pa.table({
            "doc_id": batch["doc_id"],
            "score": pc.cast(s, pa.int64()),
            "lang": batch["lang"],
        }).filter(pc.greater(pc.cast(s, pa.int64()), 0))
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        return t.take(idx[:k])

    candidates = ds.map_batches(score_batch, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(candidates, schema=schema)
    idx = pc.sort_indices(
        merged, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    return merged.take(idx[:k])


def tfidf_rank(sf_dir: str, terms: tuple[str, ...] = ("query", "stream", "window"),
               k: int = 20) -> "pa.Table":
    """TF-IDF ranked retrieval: corpus-statistics-weighted term scoring,
    the step up from search_content's raw term frequency.

    Deterministic integer contract (no log, no floats — both engines run
    the identical arithmetic): idf_micros(t) = N * 1_000_000 // df(t)
    (0 when df = 0), score_micros(d) = sum_t tf(t, d) * idf_micros(t),
    where tf is the RE2 word-boundary occurrence count in lower(text).
    Top-k by (score DESC, doc_id ASC).

    Scale shape: pass 1 computes (N, df per term) as ONE slim partial row
    per batch (driver sees #batches rows for a fixed term set); the idf
    weights are plain closure constants in pass 2 (a broadcast-once
    lookup, not a join); pass 2 is a vectorized scoring scan with
    per-batch partial top-k — the driver merge sees <= #batches x k rows.
    """
    import re as _re

    pats = [rf"\b{_re.escape(t)}\b" for t in terms]
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(batch["text"], ""))
        cols = {"n": pa.array([batch.num_rows], pa.int64())}
        for i, pat in enumerate(pats):
            hit = pc.greater(pc.count_substring_regex(low, pat), 0)
            cols[f"df{i}"] = pa.array(
                [pc.sum(pc.cast(hit, pa.int64())).as_py() or 0], pa.int64())
        return pa.table(cols)

    parts = pa.Table.from_pylist(
        ds.map_batches(df_partial, batch_format="pyarrow").take_all())
    n_docs = pc.sum(parts["n"]).as_py() or 0
    idf = []
    for i in range(len(terms)):
        df = pc.sum(parts[f"df{i}"]).as_py() or 0
        idf.append(n_docs * 1_000_000 // df if df else 0)

    def score_batch(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(batch["text"], ""))
        s = None
        for pat, w in zip(pats, idf):
            c = pc.multiply(
                pc.cast(pc.count_substring_regex(low, pat), pa.int64()),
                pa.scalar(w, pa.int64()))
            s = c if s is None else pc.add(s, c)
        t = pa.table({"doc_id": batch["doc_id"], "score_micros": s}).filter(
            pc.greater(s, 0))
        idx = pc.sort_indices(t, sort_keys=[
            ("score_micros", "descending"), ("doc_id", "ascending")])
        return t.take(idx[:k])

    merged = pa.Table.from_pylist(
        ds.map_batches(score_batch, batch_format="pyarrow").take_all(),
        schema=pa.schema([("doc_id", pa.int64()),
                          ("score_micros", pa.int64())]))
    idx = pc.sort_indices(merged, sort_keys=[
        ("score_micros", "descending"), ("doc_id", "ascending")])
    return merged.take(idx[:k])


# ---------------------------------------------------------------------------
# filtered listing — filter params + sort + page
# ---------------------------------------------------------------------------

def documents_filtered(sf_dir: str, lang: str = "en",
                       min_chars: int = 200, max_chars: int = 2000,
                       k: int = 25) -> "pa.Table":
    """Filtered document listing with Page-object metadata: the
    reference's findByUserId + filter params path
    (DocumentSearchService.java:174-186 — filter by fileType/status/date,
    sort, page; the Page result carries total hits). Filters push down as
    a vectorized Arrow mask; each batch keeps its local top-k plus one
    marker row carrying the batch's match count, so ``total`` is computed
    combiner-first in the SAME pass and the driver merge sees at most
    (#batches x (k+1)) slim rows."""
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                        ("source", pa.string()), ("n_chars", pa.int64())])

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["lang"], lang),
            pc.and_(pc.greater_equal(batch["n_chars"], min_chars),
                    pc.less_equal(batch["n_chars"], max_chars)),
        )
        t = batch.filter(mask)
        idx = pc.sort_indices(
            t, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        marker = pa.table({"doc_id": pa.array([-1], pa.int64()),
                           "lang": pa.array([None], pa.string()),
                           "source": pa.array([None], pa.string()),
                           "n_chars": pa.array([t.num_rows], pa.int64())})
        return pa.concat_tables([t.take(idx[:k]), marker])

    candidates = ds.map_batches(filt, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(candidates, schema=schema)
    is_marker = pc.equal(merged["doc_id"], -1)
    total = pc.sum(merged.filter(is_marker)["n_chars"]).as_py() or 0
    merged = merged.filter(pc.invert(is_marker))
    idx = pc.sort_indices(
        merged, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
    )
    out = merged.take(idx[:k])
    return out.append_column("total", pa.array([total] * out.num_rows,
                                               pa.int64()))


# ---------------------------------------------------------------------------
# M15 — preview projection
# ---------------------------------------------------------------------------

def document_previews(sf_dir: str) -> Dataset:
    """200-char preview + '...' suffix when truncated
    (DocumentSearchService.java:38,188-209). Pure pyarrow kernels."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def project(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        longer = pc.greater(pc.utf8_length(text), 200)
        prefix = pc.utf8_slice_codeunits(text, 0, 200)
        preview = pc.if_else(
            longer,
            pc.binary_join_element_wise(prefix, pa.scalar("..."), ""),
            text,
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "preview": preview, "n_chars": batch["n_chars"]}
        )

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# J5 — broadcast dimension join (customer x nation x region)
# ---------------------------------------------------------------------------

def customers_by_region(sf_dir: str) -> Dataset:
    """Region-level customer rollup via BROADCAST join — the dims (region,
    nation) are read once on the driver, shipped via ray.put, and probed
    inside map_batches. No shuffle join for small sides (J5 pattern,
    OcrProcessingService.java:113-133 user-plan lookup).
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    # broadcast parallel (key, name) arrays: the probe is a vectorized
    # index_in + take, missing keys fall out as nulls — dict semantics
    # with no per-row Python
    lookup_ref = ray.put((
        pa.array(list(n2r.keys()), pa.int64()),
        pa.array([r2name[v] for v in n2r.values()], pa.string())))

    def attach(batch: pa.Table) -> pa.Table:
        key_arr, name_arr = ray.get(lookup_ref)
        idx = pc.index_in(batch["c_nationkey"], value_set=key_arr)
        names = pc.take(name_arr, idx)
        b = _cents(batch, "c_acctbal", "acctbal_cents")
        return b.append_column("r_name", names)

    return (
        _pq(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"), Sum("acctbal_cents", alias_name="acctbal_cents"))
    )


# ---------------------------------------------------------------------------
# J1 — left join orders x customer, then segment rollup
# ---------------------------------------------------------------------------

def orders_by_segment(sf_dir: str) -> Dataset:
    """Orders joined to customer market segment, rolled up per segment
    (J1 files x ocr_data hash join, GetCollectionResultImpl.java:36-59).

    The build side (customer) is broadcast as a dict — at 100 TB the
    equivalent is a broadcast of the small dimension or an explicit
    bucketed hash join; documented trade-off, see dedup.py for the
    bucketed pattern.
    """
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    # broadcast parallel (key, segment) arrays; the probe is index_in +
    # take with missing keys null-filled to UNKNOWN — no per-row Python
    seg_ref = ray.put((cust["c_custkey"].combine_chunks(),
                       cust["c_mktsegment"].combine_chunks()))

    def attach(batch: pa.Table) -> pa.Table:
        key_arr, seg_arr = ray.get(seg_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=key_arr)
        segs = pc.fill_null(pc.take(seg_arr, idx), "UNKNOWN")
        b = _cents(batch, "o_totalprice", "price_cents")
        return b.append_column("c_mktsegment", segs)

    return (
        _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("price_cents", alias_name="price_cents"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prefilter (the at-scale map-side join optimizer)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16
BLOOM_HASHES = 3


def _bloom_pos(key: str, j: int) -> int:
    import hashlib

    return int(hashlib.sha256(f"bloom{j}:{key}".encode()).hexdigest()[:4], 16)


def bloom_build(keys_ds: Dataset, key_col: str) -> np.ndarray:
    """Distributed Bloom-filter build: per-batch partial bitsets (one
    8 KiB binary row per batch) OR-merged on the driver. The merge is
    associative, so at 10^12 rows the same partials fold per node before
    the driver sees them; the driver never sees keys, only fixed-size
    bitsets."""

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(BLOOM_BITS // 8, np.uint8)
        for k in pc.unique(pc.cast(batch[key_col], pa.string())).to_pylist():
            for j in range(BLOOM_HASHES):
                p = _bloom_pos(k, j)
                bits[p >> 3] |= np.uint8(1 << (p & 7))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(BLOOM_BITS // 8, np.uint8)
    for row in keys_ds.map_batches(partial, batch_format="pyarrow").take_all():
        out |= np.frombuffer(row["bits"], np.uint8)
    return out


def bloom_prefilter(ds: Dataset, key_col: str, bits: np.ndarray) -> Dataset:
    """Map-side semi-join prefilter: keep rows whose key passes the Bloom
    test (all BLOOM_HASHES positions set). Broadcast-once via ray.put;
    the big side never shuffles — the point of the operator: at 100 TB a
    semi join against a modest build side costs one scan plus an 8 KiB
    broadcast instead of an all-to-all exchange. False positives (bounded
    by the m/n ratio) are for the consumer to resolve exactly."""
    bits_ref = ray.put(bits)

    def filt(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        keys = pc.cast(batch[key_col], pa.string())
        # sha256 positions are the oracle contract, so the hash loop runs
        # per UNIQUE key only; the per-row mask is a vectorized
        # index_in + take over the unique verdicts
        uniq = pc.unique(keys)
        ok = pa.array(
            [all(b[(p := _bloom_pos(k, j)) >> 3] & (1 << (p & 7))
                 for j in range(BLOOM_HASHES))
             for k in uniq.to_pylist()], pa.bool_())
        mask = pc.take(ok, pc.index_in(keys, value_set=uniq))
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def bloom_semijoin_stats(sf_dir: str, segment: str = "BUILDING") -> "pa.Table":
    """Accounting for the Bloom prefilter on orders ⋉ customer(segment):
    one row (n_probe, n_pass_bloom, n_true_match, n_false_positive,
    bits_set). Every number is a deterministic integer function of the
    sha256 bloom contract, so DuckDB reproduces the filter — including
    its false positives — bit for bit."""
    def seg_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["c_mktsegment"], segment))

    build = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        seg_only, batch_format="pyarrow")
    bits = bloom_build(build, "c_custkey")
    bits_set = int(np.unpackbits(bits).sum())

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    true_keys = cust.filter(
        pc.equal(cust["c_mktsegment"], segment))["c_custkey"].combine_chunks()
    keys_ref = ray.put(true_keys)
    bits_ref = ray.put(bits)

    def probe_partial(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        tk = ray.get(keys_ref)
        ks = pc.cast(batch["o_custkey"], pa.string())
        # sha256 bloom test per UNIQUE key (the oracle contract); per-row
        # expansion and true-match count are vectorized kernels
        uniq = pc.unique(ks)
        passed = pa.array(
            [all(b[(p := _bloom_pos(k, j)) >> 3] & (1 << (p & 7))
                 for j in range(BLOOM_HASHES))
             for k in uniq.to_pylist()], pa.bool_())
        mask = pc.take(passed, pc.index_in(ks, value_set=uniq))
        n_pass = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        n_true = pc.sum(pc.cast(
            pc.is_in(batch["o_custkey"], value_set=tk),
            pa.int64())).as_py() or 0
        return pa.table({"n_probe": pa.array([batch.num_rows], pa.int64()),
                         "n_pass": pa.array([n_pass], pa.int64()),
                         "n_true": pa.array([n_true], pa.int64())})

    parts = pa.Table.from_pylist(
        _pq(sf_dir, "orders", ["o_custkey"])
        .map_batches(probe_partial, batch_format="pyarrow").take_all())
    n_probe = pc.sum(parts["n_probe"]).as_py() or 0
    n_pass = pc.sum(parts["n_pass"]).as_py() or 0
    n_true = pc.sum(parts["n_true"]).as_py() or 0
    return pa.table({
        "n_probe": pa.array([n_probe], pa.int64()),
        "n_pass_bloom": pa.array([n_pass], pa.int64()),
        "n_true_match": pa.array([n_true], pa.int64()),
        "n_false_positive": pa.array([n_pass - n_true], pa.int64()),
        "bits_set": pa.array([bits_set], pa.int64()),
    })


# ---------------------------------------------------------------------------
# O3/D1 — first event per user
# ---------------------------------------------------------------------------

def _group_head_indices(sorted_tbl: pa.Table, group_col: str, k: int) -> np.ndarray:
    """Indices of the first k rows of each group-run in an already-sorted
    table (vectorized run detection on dictionary codes)."""
    n = sorted_tbl.num_rows
    if n == 0:
        return np.empty(0, dtype=np.int64)
    codes = pc.dictionary_encode(
        sorted_tbl[group_col].combine_chunks()).indices.to_numpy()
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(codes[1:], codes[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, n))
    rank = np.arange(n) - np.repeat(starts, counts)
    return np.flatnonzero(rank < k)


def _partial_group_head(batch: pa.Table, group_col: str,
                        sort_keys: list[tuple[str, str]], k: int) -> pa.Table:
    """Combiner: keep only each group's local top-k rows in this batch, so
    the groupby shuffle moves at most k rows per (group, batch) instead of
    every row (classic pre-aggregation; see ray_guide 'Aggregation at
    scale')."""
    g = batch.sort_by([(group_col, "ascending"), *sort_keys])
    return g.take(pa.array(_group_head_indices(g, group_col, k)))


def first_event_per_user(sf_dir: str) -> Dataset:
    """Per-user earliest event (first-match pick O3, ProcessOcr.java:62-65;
    dedup-by-key D1). Combiner-first: each batch pre-reduces to one row
    per local user, THEN the slim survivors shuffle into the final
    groupby + head(1).
    """
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    keys = [("ts", "ascending"), ("event_id", "ascending")]
    n_blocks = 64

    def add_block(t: pa.Table) -> pa.Table:
        t = _partial_group_head(t, group_col="user_id", sort_keys=keys, k=1)
        return t.append_column("__blk", _blk_int(t["user_id"], n_blocks))

    def head1(group: pa.Table) -> pa.Table:
        # one block holds MANY users: sort, then vectorized run-head pick
        g = group.drop_columns(["__blk"]).sort_by(
            [("user_id", "ascending"), *keys])
        return g.take(pa.array(_group_head_indices(g, "user_id", 1)))

    # combiner-first (<=1 row per (user, batch) shuffles) into a FIXED
    # block count — never one Ray group per user
    return (
        ds.map_batches(add_block, batch_format="pyarrow")
        .groupby("__blk")
        .map_groups(head1, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# §2.9 — tumbling-window aggregate over the events stream
# ---------------------------------------------------------------------------

def event_hourly_windows(sf_dir: str, n_blocks: int = 64) -> Dataset:
    """Per-(user, hour) tumbling-window event counts + value cents.

    Ray Data has no watermarks; stream-shaped semantics are expressed as a
    derived window column + groupby (ordering restored by the window key —
    the Kafka-partition-ordering analog, OcrEventPublisher.java:24-27).
    pc.floor_temporal is the vectorized window assigner.

    Shuffle shape: per-batch Arrow partials first (at 100 TB each (user,
    hour) pair repeats many times per batch, so partials collapse the
    stream), then hash(user) % n_blocks — a FIXED block count, so the
    exchange sorts one small int key instead of range-partitioning on
    (string-ish user, timestamp); the final merge is one vectorized Arrow
    group_by per block. Same shape as the rest of the window family
    (user_running_totals / user_sliding_window). Measured at sf0.1/32
    CPUs: 4.6 s (Ray key-sort aggregate) -> 1.9 s in the same window.
    """
    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])

    def windowize_partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch["ts"], unit="hour")
        b = _cents(batch, "value", "value_cents")
        t = pa.table({
            "user_id": b["user_id"],
            "window_start": win,
            "value_cents": b["value_cents"],
        })
        g = pa.TableGroupBy(t, ["user_id", "window_start"]).aggregate(
            [("value_cents", "sum"), ([], "count_all")]  # COUNT(*) parity
        )
        g = g.rename_columns(["user_id", "window_start", "value_cents", "n"])
        return g.append_column("__blk", _blk_int(g["user_id"], n_blocks))

    def fold(group: pa.Table) -> pa.Table:
        return _keyed_sum_fold(group, ["user_id", "window_start"],
                               ["n", "value_cents"],
                               ["n_events", "value_cents"])

    return (ds.map_batches(windowize_partial, batch_format="pyarrow",
                           batch_size=None)  # whole-block partials
            .groupby("__blk").map_groups(fold, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# G6 — char/word counts
# ---------------------------------------------------------------------------

def word_counts_by_lang(sf_dir: str) -> Dataset:
    """Word/char counts per doc aggregated per lang (G6,
    OcrResult.java:76-88 getCharacterCount/getWordCount).

    Word = whitespace-separated token (Java split("\\\\s+") semantics);
    vectorized via pyarrow regex count: words = count(\\S+).
    """
    ds = _pq(sf_dir, "documents", ["lang", "text", "n_chars"])

    def derive(batch: pa.Table) -> pa.Table:
        words = pc.count_substring_regex(batch["text"], pattern=r"\S+")
        return pa.table(
            {
                "lang": batch["lang"],
                "words": pc.cast(words, pa.int64()),
                "chars": batch["n_chars"],
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("words", alias_name="total_words"),
            Sum("chars", alias_name="total_chars"),
            Min("words", alias_name="min_words"),
            Max("words", alias_name="max_words"),
        )
    )


# ---------------------------------------------------------------------------
# M7/G3 — validation accounting over derived upload metadata
# ---------------------------------------------------------------------------

# deterministic source -> mime mapping (cycle of 6, two invalid)
_MIME_CYCLE = (
    "image/png", "application/pdf", "text/html",
    "video/mp4", "image/jpeg", "audio/ogg",
)
_ALLOWED = {"image/png", "application/pdf", "text/html", "image/jpeg"}


def validation_accounting(sf_dir: str) -> Dataset:
    """Upload validation tally (M7 allowlist + G3 outcome counts;
    ValidateFileCheck.java:10-23, DocumentUploadImpl.java:133-144).

    MIME is derived deterministically from the source id (cycle of 6,
    two disallowed) and size from n_chars*20000 (so some docs exceed the
    10 MB cap); counts grouped by derived status.
    """
    ds = _pq(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def derive(batch: pa.Table) -> pa.Table:
        src_num = pc.cast(pc.utf8_slice_codeunits(batch["source"], 3, 99), pa.int64())
        mime_idx = pc.cast(pc.subtract(src_num, pc.multiply(pc.divide(src_num, 6), 6)), pa.int32())
        # dictionary take instead of a per-row list comp
        mimes = pc.take(pa.array(_MIME_CYCLE, pa.string()), mime_idx)
        size = pc.multiply(batch["n_chars"], pa.scalar(20_000, pa.int64()))
        mime_ok = pc.is_in(mimes, value_set=pa.array(sorted(_ALLOWED), pa.string()))
        size_ok = pc.less_equal(size, pa.scalar(10 * 1024 * 1024))
        status = pc.if_else(
            pc.invert(mime_ok), pa.scalar("invalid_mime"),
            pc.if_else(pc.invert(size_ok), pa.scalar("oversize"), pa.scalar("ok")),
        )
        return pa.table({"upload_status": status})

    return ds.map_batches(derive, batch_format="pyarrow").groupby("upload_status").aggregate(
        Count(alias_name="n_files")
    )


# ---------------------------------------------------------------------------
# G2 — collection rollup over the documents table (SQL-checkable variant)
# ---------------------------------------------------------------------------

def collection_rollup(sf_dir: str) -> Dataset:
    """Collection status rollup (G2 truth table, ProcessOcr.java:185-217)
    over deterministic per-doc statuses derived from the documents table:
    collection = doc_id // 8; status: n_chars % 10 in {0,1} -> 'failed',
    % 10 == 2 -> 'pending', else 'completed'.
    """
    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def derive(batch: pa.Table) -> pa.Table:
        mod = pc.subtract(
            batch["n_chars"], pc.multiply(pc.divide(batch["n_chars"], 10), 10)
        )
        completed = pc.cast(pc.greater_equal(mod, 3), pa.int64())
        failed = pc.cast(pc.less_equal(mod, 1), pa.int64())
        pending = pc.cast(pc.equal(mod, 2), pa.int64())
        coll = pc.divide(batch["doc_id"], 8)
        return pa.table(
            {
                "collection_id": coll,
                "completed": completed,
                "failed": failed,
                "pending": pending,
            }
        )

    agg = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("collection_id")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("completed", alias_name="n_completed"),
            Sum("failed", alias_name="n_failed"),
            Sum("pending", alias_name="n_pending"),
        )
    )

    def decide(batch: pa.Table) -> pa.Table:
        n, comp, fail = batch["n_docs"], batch["n_completed"], batch["n_failed"]
        status = pc.if_else(
            pc.equal(comp, n), pa.scalar("processed"),
            pc.if_else(pc.equal(pc.add(comp, fail), n), pa.scalar("failed_ocr"),
                       pa.scalar("processing")),
        )
        return batch.append_column("collection_status", status)

    return agg.map_batches(decide, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# J1 — files x ocr_data LEFT JOIN with missing -> 'pending'
# ---------------------------------------------------------------------------

def docs_with_ocr_status(sf_dir: str) -> Dataset:
    """The reference J1 join exactly (GetCollectionResultImpl.java:36-59):
    load file entries, bulk-fetch their OCR rows, left-join in memory,
    missing rows surface as status='pending'.

    The "ocr_data" side is derived deterministically from the documents
    table (docs with n_chars % 3 == 0 have no OCR row yet; the rest split
    completed/failed on n_chars % 7) — a pure function of the probed row,
    so the build side is computed MAP-SIDE inside the batch (vectorized
    if_else), with no driver-side table read and no broadcast at all. The
    genuine small-side broadcast join lives in customers_by_region /
    orders_by_segment; the bucketed hash-join shape is in dedup.py.
    """

    def _mod(col, m: int):
        # integer modulo via x - (x // m) * m (non-negative inputs)
        return pc.subtract(col, pc.multiply(pc.divide(col, m), m))

    def probe(batch: pa.Table) -> pa.Table:
        nch = batch["n_chars"]
        m3 = pc.equal(_mod(nch, 3), pa.scalar(0, pa.int64()))
        m7 = pc.not_equal(_mod(nch, 7), pa.scalar(0, pa.int64()))
        status = pc.if_else(
            m3, pa.scalar("pending"),
            pc.if_else(m7, pa.scalar("completed"), pa.scalar("failed")),
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "n_chars": batch["n_chars"],
             "ocr_status": status}
        )

    return _pq(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        probe, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# O2 — offset pagination (page 2 of the search sort)
# ---------------------------------------------------------------------------

def documents_page2(sf_dir: str, page_size: int = 20) -> "pa.Table":
    """Second page of the O2 sort (DocumentSearchService.java:174-186
    page/size windows): sort desc, skip page_size, take page_size.

    Ray Data has no OFFSET; the idiom is limit(2*size) then slice the
    (tiny) head client-side — the sort itself stays distributed.
    """
    top2 = (
        _pq(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(2 * page_size)
        .take_all()
    )
    page = top2[page_size:2 * page_size]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in page], pa.int64()),
        "source": pa.array([r["source"] for r in page], pa.string()),
        "n_chars": pa.array([r["n_chars"] for r in page], pa.int64()),
    })


# ---------------------------------------------------------------------------
# G5 — mean confidence per provider (exact integer ratio)
# ---------------------------------------------------------------------------

def mean_confidence_by_provider(sf_dir: str) -> Dataset:
    """Mean OCR confidence per provider (G5 block-confidence average,
    GoogleVisionOcrProvider.java:283-295). Confidence is derived
    deterministically in basis points (n_chars * 37 % 10000); provider =
    'vision' when doc_id % 5 == 0 else 'tesseract'. The mean is an exact
    integer ratio rounded at 6 dp — hash-stable across engines."""
    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def derive(batch: pa.Table) -> pa.Table:
        conf_bp = pc.subtract(
            pc.multiply(batch["n_chars"], pa.scalar(37, pa.int64())),
            pc.multiply(
                pc.divide(pc.multiply(batch["n_chars"], pa.scalar(37, pa.int64())),
                          pa.scalar(10_000, pa.int64())),
                pa.scalar(10_000, pa.int64()),
            ),
        )
        five = pa.scalar(5, pa.int64())
        is_vision = pc.equal(
            pc.subtract(batch["doc_id"], pc.multiply(pc.divide(batch["doc_id"], five), five)),
            pa.scalar(0, pa.int64()),
        )
        provider = pc.if_else(is_vision, pa.scalar("vision"), pa.scalar("tesseract"))
        return pa.table({"provider": provider, "conf_bp": conf_bp})

    agg = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("provider")
        .aggregate(Count(alias_name="n_docs"), Sum("conf_bp", alias_name="sum_conf_bp"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # exact integer micros: (sum_bp * 100) // n == mean * 1e6
        mean_micros = pc.divide(
            pc.multiply(batch["sum_conf_bp"], pa.scalar(100, pa.int64())),
            batch["n_docs"],
        )
        return batch.append_column(
            "mean_confidence_micros", pc.cast(mean_micros, pa.int64())
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# G7 — distinct counts
# ---------------------------------------------------------------------------

def distinct_counts(sf_dir: str) -> "pa.Table":
    """Global distinct-count KPIs (G7 dashboard metrics,
    DashboardMetricsCacheService.java:40-58): distinct langs / sources /
    users. Each is a Dataset.unique (shuffle on one slim column)."""
    n_langs = len(_pq(sf_dir, "documents", ["lang"]).unique("lang"))
    n_sources = len(_pq(sf_dir, "documents", ["source"]).unique("source"))
    n_users = len(_pq(sf_dir, "events", ["user_id"]).unique("user_id"))
    return pa.table({
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "n_users": pa.array([n_users], pa.int64()),
    })


# ---------------------------------------------------------------------------
# O2/O3 — per-group top-k (window-function shape)
# ---------------------------------------------------------------------------

def top_docs_per_lang(sf_dir: str, k: int = 3) -> Dataset:
    """Top-k largest docs per language — the window-function
    (row_number over partition) shape. Combiner-first: each batch keeps
    only its local per-lang top-k, so the shuffle moves ≤ k rows per
    (lang, batch)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    keys = [("n_chars", "descending"), ("doc_id", "ascending")]

    def head_k(group: pa.Table) -> pa.Table:
        return group.sort_by(keys).slice(0, k)

    return (
        ds.map_batches(_partial_group_head,
                       fn_kwargs={"group_col": "lang", "sort_keys": keys, "k": k},
                       batch_format="pyarrow")
        .groupby("lang")
        .map_groups(head_k, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# G7 — event-type histogram
# ---------------------------------------------------------------------------

def event_type_counts(sf_dir: str) -> Dataset:
    """Event-type histogram with per-type value cents (grouped KPI)."""
    ds = _pq(sf_dir, "events", ["event_type", "value"])
    return (
        ds.map_batches(lambda b: _cents(b, "value", "value_cents").drop_columns(["value"]),
                       batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="value_cents"))
    )


# ---------------------------------------------------------------------------
# G1 — collection total-size gate (SQL-checkable variant)
# ---------------------------------------------------------------------------

def collection_size_gate(sf_dir: str) -> Dataset:
    """Total-upload cap per collection (FileSize.MULTIPLE_FILE_SIZE 50 MB,
    BulkDocumentUploadExtractionImpl.java:76-77) over derived sizes
    (n_chars * 20000; collection = doc_id // 8). Combiner-first grouped sum."""
    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def derive(batch: pa.Table) -> pa.Table:
        eight = pa.scalar(8, pa.int64())
        return pa.table({
            "collection_id": pc.divide(batch["doc_id"], eight),
            "fsize": pc.multiply(batch["n_chars"], pa.scalar(20_000, pa.int64())),
        })

    agg = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("collection_id")
        .aggregate(Sum("fsize", alias_name="total_bytes"))
    )

    def gate(batch: pa.Table) -> pa.Table:
        status = pc.if_else(
            pc.greater(batch["total_bytes"], pa.scalar(50 * 1024 * 1024)),
            pa.scalar("rejected_total_size"), pa.scalar("accepted"),
        )
        return batch.append_column("gate", status)

    return agg.map_batches(gate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# §2.9 — session windows (gaps-and-islands)
# ---------------------------------------------------------------------------

def event_sessions(sf_dir: str, gap_minutes: int = 30) -> Dataset:
    """Per-user session windows: consecutive events with inter-event gaps
    < ``gap_minutes`` form one session (the classic gaps-and-islands
    sessionization a streaming engine does with session windows).

    Ray shape: groupby(hash(user) % n_blocks) — a FIXED group count —
    then ONE vectorized pass over each block: sort by (user, ts,
    event_id), flag session starts where the user changes OR the gap is
    >= the threshold, and read per-session first/last/count straight off
    the boundary index arrays (ray_guide 'Streaming-shaped workloads'
    pattern). Output: one row per session with start, n_events and
    duration_us (exact integers — hash-stable).
    """
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000
    n_blocks = 64

    def add_block(t: pa.Table) -> pa.Table:
        return t.append_column("__blk", _blk_int(t["user_id"], n_blocks))

    def sessions(group: pa.Table) -> pa.Table:
        g = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        n = ts.shape[0]
        # session starts: first row, user change, or gap >= threshold —
        # one vectorized flag array covering every user in the block
        new_session = np.ones(n, dtype=bool)
        if n > 1:
            new_session[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) >= gap_us)
        bounds = np.flatnonzero(new_session)          # first event per session
        n_sessions = bounds.size
        if n_sessions:
            ends = np.empty(n_sessions, dtype=np.int64)  # last event index
            ends[:-1] = bounds[1:] - 1
            ends[-1] = n - 1
            counts = np.empty(n_sessions, dtype=np.int64)
            counts[:-1] = np.diff(bounds)
            counts[-1] = n - bounds[-1]
            starts = ts[bounds]
            durs = ts[ends] - starts
            users = uid[bounds]
        else:
            starts = counts = durs = users = np.empty(0, dtype=np.int64)
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "session_start": pa.array(starts).cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "duration_us": pa.array(durs, pa.int64()),
        })

    return (ds.map_batches(add_block, batch_format="pyarrow")
            .groupby("__blk").map_groups(sessions, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# generic bucketed (co-group) hash join — the non-broadcast join shape
# ---------------------------------------------------------------------------

def _estimated_rows(ds: Dataset) -> int | None:
    """Metadata row count when the plan knows it (file-backed reads and
    row-preserving chains) — never executes the plan."""
    try:
        n = ds._meta_count()
        return int(n) if n is not None else None
    except Exception:
        return None


def derive_join_buckets(left: Dataset, right: Dataset,
                        target_rows_per_bucket: int = 250_000,
                        est_rows: int | None = None,
                        min_buckets: int = 32) -> int:
    """Bucket count sized to the DATA: each co-grouped bucket materializes
    ~rows/n_buckets of both sides in one task, so a fixed count turns into
    multi-GB tasks at corpus scale. Estimate = caller hint, else the larger
    side's metadata count; unknown sizes keep the floor (the pre-r3
    behavior) rather than guessing."""
    if est_rows is None:
        sizes = [s for s in (_estimated_rows(left), _estimated_rows(right))
                 if s is not None]
        est_rows = max(sizes) if sizes else None
    if est_rows is None:
        return min_buckets
    return max(min_buckets, -(-est_rows // target_rows_per_bucket))


def hash_join(left: Dataset, right: Dataset, on: str, how: str = "inner",
              right_suffix: str = "_r", n_buckets: int | None = None,
              target_rows_per_bucket: int = 250_000,
              est_rows: int | None = None,
              hot_keys=None, n_salts: int = 16) -> Dataset:
    """Distributed BUCKETED hash join with no driver/broadcast state —
    both sides shuffle by hash(key) % n_buckets and meet in co-located
    bucket groups, where Arrow's C++ hash join does the actual matching
    (the shape the broadcast joins in customers_by_region /
    orders_by_segment degrade to when the build side stops being small).

    ``how``: inner / left / semi / anti / right / full. Outer modes
    compose per-bucket because a key value hashes to exactly ONE bucket
    on both sides — a row unmatched in its bucket is unmatched globally;
    null keys never match (SQL semantics) and surface unmatched from
    whichever bucket their placement hash chose. right/full coalesce the
    key column (Arrow emits the right side's key for right-unmatched
    rows). Salting is incompatible with right/full (see below).

    Implementation: tag each side, union into one superset-schema stream
    (missing columns null), ``groupby(__bucket)`` co-groups each hash
    bucket, and the per-bucket kernel splits the sides back out and runs
    ``pyarrow.Table.join`` (any of the six modes via Arrow's
    inner / left outer / left semi / left anti / right outer /
    full outer; duplicate keys produce the cartesian of matches
    natively). Bucketing instead of per-key
    grouping keeps the group count bounded regardless of key
    cardinality — per-group scheduling overhead doesn't scale with keys.
    ``n_buckets=None`` (default) derives the count from the data —
    ``max(32, est_rows / target_rows_per_bucket)`` — so per-bucket task
    memory stays ~flat as inputs grow; pass ``est_rows`` when transforms
    upstream hide the metadata count (see derive_join_buckets).
    Only the joined columns ride the shuffle — prune with select_columns
    before calling. Right-side columns colliding with left names get
    ``right_suffix``.

    Evaluated against Ray 2.49's native ``Dataset.join`` (hash-shuffle
    aggregator actors) on the bench join (150k x 15k at 32 CPUs): the
    native operator ran 1.3-2x SLOWER (6.3-7.5 s vs 3.7-5.8 s same
    window) — its per-partition aggregator actor pool costs more than
    this operator's single small-int sort exchange at these scales, and
    it offers no skew salting. Re-evaluate if Ray's hash shuffle
    matures.

    Skew: pass ``hot_keys`` (any iterable of key values — e.g. from
    ``detect_hot_keys`` or table_stats frequency estimates) to SALT them:
    probe-side (left) rows of a hot key are sprayed across ``n_salts``
    buckets and the matching build-side (right) rows are replicated once
    per salt, so no single bucket materializes a hot key's full probe
    mass. Output is row-identical to the unsalted join (each left row
    meets exactly one copy of each matching right row). Without
    ``hot_keys`` a hot key still lands in one bucket.
    """
    if how not in ("inner", "left", "semi", "anti", "right", "full"):
        raise ValueError(f"unsupported how={how!r}")
    hot_list = list(hot_keys) if hot_keys is not None else []
    if hot_list and how in ("right", "full"):
        # build-side salting replicates hot right rows once per salt; a
        # replica with no probe match in its salt bucket would surface
        # n_salts times as an unmatched right row under right/full outer.
        # An EMPTY hot set is a no-op and stays valid (detect_hot_keys
        # composes: it normally returns []).
        raise ValueError(f"hot_keys salting is not valid with how={how!r}")
    if n_buckets is None:
        n_buckets = derive_join_buckets(left, right, target_rows_per_bucket,
                                        est_rows)
    arrow_how = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti",
                 "right": "right outer", "full": "full outer"}[how]
    lschema = left.schema()   # ray.data.Schema: .names + .types (arrow)
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != on]
    rout = [c + right_suffix if c in lcols else c for c in rcols]
    rtypes = dict(zip(rschema.names, rschema.types))
    ltypes = dict(zip(lschema.names, lschema.types))
    if how in ("semi", "anti"):
        rcols, rout = [], []  # existence filters keep only left columns
    union_schema = pa.schema(
        [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int32())]
        + [pa.field(c, ltypes[c]) for c in lcols]
        + [pa.field(o, rtypes[c]) for c, o in zip(rcols, rout)]
    )
    key_type = ltypes[on]
    hot_arr = pa.array(hot_list).cast(key_type) if hot_list else None

    def _key_hash(key_arr) -> np.ndarray:
        """uint64 value-hash of the join key, vectorized for int and
        string/binary keys; Python-loop str() fold only for exotic types."""
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        if pa.types.is_integer(key_type):
            if key_arr.null_count:
                # placement-only: nulls never match, they just need a
                # deterministic bucket (NaN->uint64 is platform-defined)
                key_arr = pc.fill_null(key_arr, 0)
            k = key_arr.to_numpy(zero_copy_only=False).astype(np.uint64)
            return k * np.uint64(0x9E3779B97F4A7C15)
        try:
            from .hashing import hash_strings

            return hash_strings(key_arr)
        except TypeError:
            import zlib as _z

            return np.array(
                [_z.crc32(str(v).encode()) for v in key_arr.to_pylist()],
                np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def _bucket_of(key_arr, salts: np.ndarray | None = None) -> pa.Array:
        h = _key_hash(key_arr)
        if salts is not None:
            h = h + salts.astype(np.uint64) * np.uint64(0xD1B54A32D192ED03)
        return pa.array(((h >> np.uint64(33)) % n_buckets).astype(np.int32))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            salts = None
            if hot_arr is not None:
                hot = pc.is_in(batch[on], value_set=hot_arr) \
                    .to_numpy(zero_copy_only=False).astype(bool)
                if side == 0:
                    # probe side: spray hot rows across the salt range (the
                    # salt value itself is placement-only — any assignment
                    # yields the identical join output)
                    salts = np.where(
                        hot, np.arange(batch.num_rows, dtype=np.int64) % n_salts, 0)
                elif hot.any():
                    # build side: replicate hot rows once per salt so every
                    # salted probe bucket holds its own copy
                    idx_hot = np.flatnonzero(hot)
                    idx_cold = np.flatnonzero(~hot)
                    take = np.concatenate([idx_cold, np.tile(idx_hot, n_salts)])
                    salts = np.concatenate([
                        np.zeros(idx_cold.size, np.int64),
                        np.repeat(np.arange(n_salts, dtype=np.int64),
                                  idx_hot.size)])
                    batch = batch.take(pa.array(take))
            n = batch.num_rows
            arrays = [pa.array(np.full(n, side, dtype=np.int8)),
                      _bucket_of(batch[on], salts)]
            for f in union_schema.names[2:]:
                if side == 0:
                    arrays.append(batch[f] if f in batch.column_names
                                  else pa.nulls(n, union_schema.field(f).type))
                else:
                    # map right's original name to its (possibly suffixed) slot
                    src = None
                    if f == on:
                        src = on
                    elif f in rout:
                        src = rcols[rout.index(f)]
                    if src is not None and src in batch.column_names:
                        arrays.append(batch[src])
                    else:
                        arrays.append(pa.nulls(n, union_schema.field(f).type))
            return pa.Table.from_arrays(arrays, schema=union_schema)
        return fn

    unioned = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    out_names = lcols + rout

    def join_bucket(group: pa.Table) -> pa.Table:
        sides = group["__side"]
        ltbl = group.filter(pc.equal(sides, 0)).select(lcols)
        rtbl = (group.filter(pc.equal(sides, 1)).select([on] + rout)
                .rename_columns([on] + rcols))
        joined = ltbl.join(rtbl, keys=on, join_type=arrow_how,
                           right_suffix=right_suffix)
        return joined.select(out_names)

    return unioned.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def detect_hot_keys(ds: Dataset, on: str, min_rows: int = 250_000) -> list:
    """Exact per-key row counts above ``min_rows`` — the salting input for
    hash_join. Combiner-first: per-batch Arrow value-count partials, one
    slim (key, cnt) shuffle, filter BEFORE collecting — the driver only
    ever holds the hot set (few keys by definition; a key must exceed
    min_rows to surface). Pair with table_stats NDV/row estimates to pick
    min_rows ≈ target_rows_per_bucket."""
    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select([on]), [on]).aggregate([([], "count_all")])
        return g.rename_columns([on, "cnt"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(on).aggregate(Sum("cnt", alias_name="cnt")))
    hot = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], min_rows)),
        batch_format="pyarrow")
    return [r[on] for r in hot.take_all()]


def _orders_cust_sides(sf_dir: str, priority: str | None = None,
                       segment: str | None = None):
    """Shared side-builder for the orders x customer join family: pruned
    reads, money->cents, join-key rename to ``custkey``; optional literal
    per-side filters (applied BEFORE the cents cast so dropped rows never
    pay it). The rename map_batches hides the metadata count — callers
    size buckets from the parquet footer (KB of metadata, no data read),
    scaled by their filter's selectivity."""
    ocols = ["o_orderkey", "o_custkey", "o_totalprice"]
    if priority is not None:
        ocols = ocols + ["o_orderpriority"]

    def prep_orders(b: pa.Table) -> pa.Table:
        if priority is not None:
            b = b.filter(pc.equal(b["o_orderpriority"], priority)) \
                 .drop_columns(["o_orderpriority"])
        return _cents(b, "o_totalprice", "price_cents") \
            .drop_columns(["o_totalprice"])

    orders = _pq(sf_dir, "orders", ocols) \
        .map_batches(prep_orders, batch_format="pyarrow") \
        .map_batches(lambda t: t.rename_columns(
            {"o_custkey": "custkey"}.get(c, c) for c in t.column_names),
            batch_format="pyarrow")

    def prep_cust(t: pa.Table) -> pa.Table:
        if segment is not None:
            t = t.filter(pc.equal(t["c_mktsegment"], segment))
        return t

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(prep_cust, batch_format="pyarrow") \
        .map_batches(lambda t: t.rename_columns(
            {"c_custkey": "custkey"}.get(c, c) for c in t.column_names),
            batch_format="pyarrow")
    return orders, cust


def orders_customer_join(sf_dir: str) -> Dataset:
    """Orders LEFT-joined to customer via the generic co-group hash_join
    (no broadcast): the reference's files x ocr_data join at a scale where
    neither side is broadcastable. Slim projected columns only."""
    import pyarrow.parquet as pq

    orders, cust = _orders_cust_sides(sf_dir)
    est = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    return hash_join(orders, cust, on="custkey", how="left", est_rows=est)


def orders_customer_full_join(sf_dir: str) -> Dataset:
    """FULL OUTER variant of the join above, with both sides filtered so
    each carries unmatched rows: urgent orders x BUILDING customers.
    Exercises hash_join(how="full") — unmatched rows of EITHER side
    survive with the other side's columns null and the key coalesced
    (the reconciliation shape: which orders lack a tracked customer,
    which tracked customers placed no urgent order)."""
    import pyarrow.parquet as pq

    orders, cust = _orders_cust_sides(sf_dir, priority="1-URGENT",
                                      segment="BUILDING")
    # footer count scaled by the filter's selectivity (priorities are
    # uniform 1-of-5 in this corpus) so derived buckets size to the rows
    # actually joined; placement-only, so a skewed corpus merely
    # over/under-provisions bucket count, never affects output
    est = -(-pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
            // 5)
    return hash_join(orders, cust, on="custkey", how="full", est_rows=est)


# ---------------------------------------------------------------------------
# hopping (sliding) window aggregate — §2.9 extension beyond tumbling/session
# ---------------------------------------------------------------------------

def event_hopping_windows(sf_dir: str, size_min: int = 60,
                          hop_min: int = 30) -> Dataset:
    """Per-(user, window) aggregates over HOPPING windows (size 60 min,
    hop 30 min by default): each event lands in size/hop overlapping
    windows. Window starts are hop-aligned epoch-microsecond int64 (no
    engine-specific timestamp arithmetic).

    Shape: vectorized expansion (each batch row repeated size/hop times
    with arithmetic window starts — no per-row Python), then the same
    combiner-first pattern as the tumbling windows: per-batch
    TableGroupBy partials, slim grouped sum shuffle.
    """
    size_us = size_min * 60 * 1_000_000
    hop_us = hop_min * 60 * 1_000_000
    if size_us % hop_us:
        raise ValueError("size must be a multiple of hop")
    reps = size_us // hop_us
    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])

    def expand(batch: pa.Table) -> pa.Table:
        b = _cents(batch, "value", "value_cents")
        us = pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64())
        base = pc.multiply(pc.divide(us, hop_us), pa.scalar(hop_us, pa.int64()))
        n = batch.num_rows
        idx = pa.array(np.repeat(np.arange(n), reps))
        offs = pa.array(np.tile(np.arange(reps) * hop_us, n))
        starts = pc.subtract(pc.take(base, idx), offs)
        # every event is in exactly `reps` windows: start <= ts < start+size
        # holds for all j in [0, reps) by hop alignment — no filter needed
        expanded = pa.table({
            "user_id": pc.take(b["user_id"], idx),
            "window_start_us": starts,
            "value_cents": pc.take(b["value_cents"], idx),
        })
        g = pa.TableGroupBy(expanded, ["user_id", "window_start_us"]).aggregate(
            [("value_cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["user_id", "window_start_us", "value_cents", "n"])

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["user_id", "window_start_us"])
        .aggregate(Sum("n", alias_name="n_events"),
                   Sum("value_cents", alias_name="value_cents"))
    )


# ---------------------------------------------------------------------------
# deterministic sampling — hash-gated, engine-independent
# ---------------------------------------------------------------------------

def sample_documents(sf_dir: str, pct: int = 10) -> Dataset:
    """Deterministic corpus sample: keep rows whose sha256('sample:'+id)
    first-two-byte value falls under pct% of 65536. Unlike random_sample,
    the SAME rows are selected by any engine at any parallelism — the
    reproducible-subset operator a training-data pipeline needs for
    held-out splits and debugging slices."""
    import hashlib as _h

    cut = (65536 * pct) // 100
    ds = _pq(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        mask = pa.array(
            [int(_h.sha256(f"sample:{d}".encode()).hexdigest()[:4], 16) < cut
             for d in ids], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# as-of join — the time-series operator Ray Data lacks
# ---------------------------------------------------------------------------

def asof_join(left: Dataset, right: Dataset, by: str, on: str,
              right_keep: list[str], right_suffix: str = "_r",
              n_blocks: int = 64) -> Dataset:
    """Backward as-of join: for each left row, the LAST right row of the
    same ``by`` key with right.on <= left.on (nulls when none precedes).

    Composition (north-rule custom-operator path (a)): tagged union ->
    groupby(hash(by) % n_blocks) — a FIXED group count, never one Ray
    group per key — then ONE vectorized segmented scan per block: sort
    by (key, time, right-before-left), forward-fill the last right-row
    index with np.maximum.accumulate, and invalidate fills that cross a
    key-run boundary (fill < run_start). No per-key Python anywhere.
    Partitioning assumption: rows hash-balance across blocks, so one
    block holds ~|left + right| / n_blocks rows — size n_blocks so that
    fits a worker; a single hot key cannot straddle blocks (the scan is
    order-exact within its run regardless of run length).
    """
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rtypes = dict(zip(rschema.names, rschema.types))
    ltypes = dict(zip(lschema.names, lschema.types))
    key_type = ltypes[by]
    rout = [c + right_suffix if c in lcols else c for c in right_keep]
    union_schema = pa.schema(
        [pa.field("__blk", pa.int32()), pa.field("__side", pa.int8()),
         pa.field("__t", pa.int64())]
        + [pa.field(c, ltypes[c]) for c in lcols]
        + [pa.field(o, rtypes[c]) for c, o in zip(right_keep, rout)]
    )

    def _blk(key_arr) -> pa.Array:
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        if pa.types.is_integer(key_type):
            h = key_arr.to_numpy(zero_copy_only=False).astype(np.uint64) \
                * np.uint64(0x9E3779B97F4A7C15)
        else:
            from .hashing import hash_strings

            h = hash_strings(key_arr)
        return pa.array(((h >> np.uint64(33)) % n_blocks).astype(np.int32))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = [_blk(batch[by]),
                      pa.array(np.full(n, side, dtype=np.int8)),
                      pc.cast(batch[on], pa.int64())]
            for c in lcols:
                if side == 0:
                    arrays.append(batch[c])
                elif c == by:
                    arrays.append(batch[by])
                else:
                    arrays.append(pa.nulls(n, ltypes[c]))
            for c in right_keep:
                arrays.append(batch[c] if side == 1
                              else pa.nulls(n, rtypes[c]))
            return pa.Table.from_arrays(arrays, schema=union_schema)
        return fn

    unioned = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    result_schema = pa.schema([pa.field(c, ltypes[c]) for c in lcols]
                              + [pa.field(o, rtypes[c])
                                 for c, o in zip(right_keep, rout)])

    def block_asof(group: pa.Table) -> pa.Table:
        # right rows sort BEFORE left rows at equal (key, t): a right row
        # at exactly left.on is eligible (<=); stable sort keeps original
        # order among equal right timestamps, so maximum.accumulate picks
        # the last one — same tie rule as a searchsorted(side="right")
        t = group.sort_by([(by, "ascending"), ("__t", "ascending"),
                           ("__side", "descending")])
        side = t["__side"].to_numpy(zero_copy_only=False)
        l_rows = np.flatnonzero(side == 0)
        if l_rows.size == 0:
            return result_schema.empty_table()
        n = t.num_rows
        keycol = t[by].combine_chunks()
        if pa.types.is_integer(keycol.type):
            codes = keycol.to_numpy(zero_copy_only=False)
        else:
            codes = pc.dictionary_encode(keycol).indices.to_numpy(
                zero_copy_only=False)
        change = np.empty(n, bool)
        change[0] = True
        np.not_equal(codes[1:], codes[:-1], out=change[1:])
        run_start = np.maximum.accumulate(
            np.where(change, np.arange(n, dtype=np.int64), 0))
        filled = np.maximum.accumulate(
            np.where(side == 1, np.arange(n, dtype=np.int64), -1))
        valid = filled >= run_start  # fill from an earlier key run is void
        ltbl = t.take(pa.array(l_rows))
        lvalid = valid[l_rows]
        take_idx = pa.array(np.where(lvalid, filled[l_rows], 0))
        vmask = pa.array(lvalid)
        arrays = [ltbl[c] for c in lcols]
        for c, o in zip(right_keep, rout):
            col = pc.take(t[o], take_idx)
            col = pc.if_else(vmask, col,
                             pa.nulls(1, result_schema.field(o).type)[0])
            arrays.append(col)
        return pa.Table.from_arrays(arrays, schema=result_schema)

    return unioned.groupby("__blk").map_groups(
        block_asof, batch_format="pyarrow")


def purchases_with_last_click(sf_dir: str) -> Dataset:
    """For every purchase event, the user's most recent click at-or-before
    it (backward as-of). Right side deduped to one click per (user, ts)
    by max event_id so the match is total-order deterministic; nulls
    encoded as -1 for engine-stable hashing."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase"))
        .select(["event_id", "user_id", "ts"]), batch_format="pyarrow")
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click"))
        .select(["event_id", "user_id", "ts"]), batch_format="pyarrow")

    def dedupe_clicks(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, ["user_id", "ts"]).aggregate([("event_id", "max")])
        return g.rename_columns(["user_id", "ts", "event_id"])

    # partial per-batch dedupe, exact dedupe inside the co-group via the
    # same max rule applied by asof (identical (user, ts) rows collapse)
    clicks_u = (
        clicks.map_batches(dedupe_clicks, batch_format="pyarrow")
        .groupby(["user_id", "ts"])
        .aggregate(Max("event_id", alias_name="event_id"))
    )
    joined = asof_join(purchases, clicks_u, by="user_id", on="ts",
                       right_keep=["event_id", "ts"])

    def finish(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        click_ts = pc.cast(t["ts_r"], pa.int64())
        gap = pc.subtract(ts_us, click_ts)
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts_us": ts_us,
            "click_event_id": pc.fill_null(t["event_id_r"], -1),
            "gap_us": pc.fill_null(gap, -1),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# range (non-equi interval) join — broadcast band table + searchsorted
# ---------------------------------------------------------------------------

def range_join(ds: Dataset, bands: "pa.Table", value_col: str,
               lo_col: str = "lo", hi_col: str = "hi") -> Dataset:
    """Non-equi join: attach to each row the band whose
    [lo, hi) interval contains row[value_col] (bands must be disjoint and
    sorted; rows outside every band get nulls).

    The band table is small by construction (it is a dimension), so this
    is a BROADCAST non-equi join: ray.put once, one vectorized
    np.searchsorted per batch — no shuffle, no per-row predicate loop.
    """
    lows = np.asarray(bands[lo_col].to_pylist(), dtype=np.float64)
    his = np.asarray(bands[hi_col].to_pylist(), dtype=np.float64)
    if not (np.all(np.diff(lows) > 0) and np.all(lows < his)
            and np.all(his[:-1] <= lows[1:])):
        raise ValueError("bands must be sorted and disjoint with lo < hi")
    band_cols = {c: bands[c] for c in bands.column_names
                 if c not in (lo_col, hi_col)}
    ref = ray.put((lows, his, {c: a.to_pylist() for c, a in band_cols.items()},
                   {c: bands.schema.field(c).type for c in band_cols}))

    def attach(batch: pa.Table) -> pa.Table:
        lo, hi, cols, types = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(lo, v, side="right") - 1
        inside = (pos >= 0) & (v < hi[np.maximum(pos, 0)])
        take = np.maximum(pos, 0)
        for c, values in cols.items():
            col = pa.array(
                [values[take[i]] if inside[i] else None for i in range(len(v))],
                types[c],
            )
            batch = batch.append_column(c, col)
        return batch

    return ds.map_batches(attach, batch_format="pyarrow")


PRICE_BANDS = pa.table({
    "lo": pa.array([0.0, 20_000.0, 100_000.0, 250_000.0], pa.float64()),
    "hi": pa.array([20_000.0, 100_000.0, 250_000.0, 1e18], pa.float64()),
    "price_band": pa.array(["small", "medium", "large", "jumbo"], pa.string()),
})


def orders_price_bands(sf_dir: str) -> Dataset:
    """Orders bucketed into static price bands via the range join, rolled
    up per band — the interval-dimension join shape (rate tables, SLA
    tiers, size classes)."""
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    joined = range_join(ds, PRICE_BANDS, value_col="o_totalprice")

    def partial(batch: pa.Table) -> pa.Table:
        b = _cents(batch, "o_totalprice", "price_cents")
        g = pa.TableGroupBy(b.select(["price_band", "price_cents"]),
                            "price_band").aggregate(
            [("price_cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["price_band", "price_cents", "n"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("price_band")
        .aggregate(Sum("n", alias_name="n_orders"),
                   Sum("price_cents", alias_name="price_cents"))
    )


# ---------------------------------------------------------------------------
# G8 — exact grouped percentiles (SQL-checkable variant)
# ---------------------------------------------------------------------------

def doc_size_percentiles(sf_dir: str) -> Dataset:
    """Exact discrete percentiles of n_chars per language: p50/p90 as the
    element at index ceil(q*n)-1 of the sorted values — DuckDB's
    quantile_disc convention, computed with INTEGER index arithmetic (no
    float ceil hazards).

    Shape: only the slim (lang, n_chars) columns ride the shuffle; exact
    percentiles inherently need the group's values co-located (the
    mergeable APPROXIMATE sketch for corpus-scale lives in
    metrics.StageMetrics histograms)."""
    ds = _pq(sf_dir, "documents", ["lang", "n_chars"])
    # q as integer fractions: ceil(num*n/den) - 1
    qs = [("p50_chars", 1, 2), ("p90_chars", 9, 10)]

    def pick(group: pa.Table) -> pa.Table:
        vals = np.sort(group["n_chars"].to_numpy(zero_copy_only=False))
        n = vals.shape[0]
        out = {"lang": [group["lang"][0].as_py()],
               "n_docs": pa.array([n], pa.int64())}
        for name, num, den in qs:
            k = (num * n + den - 1) // den - 1
            out[name] = pa.array([int(vals[max(k, 0)])], pa.int64())
        return pa.table(out)

    return ds.groupby("lang").map_groups(pick, batch_format="pyarrow")


def customers_without_orders(sf_dir: str, status: str = "P") -> Dataset:
    """Customers with no order in the given status — the ANTI-join shape
    (tombstone/GC scans, orphan detection) via the bucketed hash_join
    with Arrow's left-anti kernel per bucket. (The testdata's FKs are
    fully covered, so the unfiltered variant would be empty; the status
    filter makes the result non-trivial at every scale.)"""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderstatus"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], status))
            .select(["o_custkey"]).rename_columns(["c_custkey"]),
            batch_format="pyarrow")
    return hash_join(cust, orders, on="c_custkey", how="anti")


# ---------------------------------------------------------------------------
# running (cumulative) window function — SUM() OVER (PARTITION ... ORDER ...)
# ---------------------------------------------------------------------------

def _user_block_runs(group: pa.Table):
    """Shared fixed-block window kernel prologue: sort ONE hash block of
    many users by (user_id, ts, event_id), return the sorted table, its
    cents cumsum, and each row's key-run start index — everything the
    segmented window kernels need, all vectorized."""
    g = _cents(group, "value", "vc").sort_by(
        [("user_id", "ascending"), ("ts", "ascending"),
         ("event_id", "ascending")])
    uid = g["user_id"].to_numpy(zero_copy_only=False)
    n = uid.shape[0]
    if n == 0:  # empty group guard (ADVICE r4), matching _group_head_indices
        return g, np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.empty(n, bool)
    change[0] = True
    np.not_equal(uid[1:], uid[:-1], out=change[1:])
    run_start = np.maximum.accumulate(
        np.where(change, np.arange(n, dtype=np.int64), 0))
    csum = np.cumsum(g["vc"].to_numpy(zero_copy_only=False))
    return g, csum, run_start


def _blk_int(arr, n_blocks: int) -> pa.Array:
    """Fixed hash-block id for an integer key column (multiply-shift)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = arr.to_numpy(zero_copy_only=False).astype(np.uint64) \
        * np.uint64(0x9E3779B97F4A7C15)
    return pa.array(((h >> np.uint64(33)) % n_blocks).astype(np.int32))


def user_running_totals(sf_dir: str, n_blocks: int = 64) -> Dataset:
    """Per-user running value total in (ts, event_id) order — the
    window-function shape (SUM() OVER (PARTITION BY user ORDER BY ts)).
    Groups by hash(user) % n_blocks — a FIXED group count, never one Ray
    group per user — then one segmented cumsum per block: global cumsum
    minus the prefix before each row's key-run start. Only the slim
    (user, ts, event_id, cents) columns shuffle; no per-user Python."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_block(t: pa.Table) -> pa.Table:
        return t.append_column("__blk", _blk_int(t["user_id"], n_blocks))

    def running(group: pa.Table) -> pa.Table:
        g, csum, run_start = _user_block_runs(group)
        base = np.where(run_start > 0, csum[run_start - 1], 0)
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts_us": pc.cast(g["ts"], pa.int64()),
            "running_cents": pa.array(csum - base, pa.int64()),
        })

    return (ds.map_batches(add_block, batch_format="pyarrow")
            .groupby("__blk").map_groups(running, batch_format="pyarrow"))


def user_sliding_window(sf_dir: str, w: int = 4, n_blocks: int = 64) -> Dataset:
    """Per-user SLIDING window sum — the last ``w`` events' value cents
    including the current one, in (ts, event_id) order: SUM() OVER
    (PARTITION BY user ORDER BY ts, event_id ROWS BETWEEN w-1 PRECEDING
    AND CURRENT ROW). Completes the window family (tumbling / hopping /
    session / cumulative / sliding). Same fixed-block shape as
    user_running_totals; the window difference subtracts the cumsum at
    max(i - w, run_start - 1), clipping every window at its key-run
    boundary — fully vectorized across all users in the block."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_block(t: pa.Table) -> pa.Table:
        return t.append_column("__blk", _blk_int(t["user_id"], n_blocks))

    def sliding(group: pa.Table) -> pa.Table:
        g, csum, run_start = _user_block_runs(group)
        n = csum.shape[0]
        j = np.maximum(np.arange(n, dtype=np.int64) - w, run_start - 1)
        out = csum - np.where(j >= 0, csum[np.maximum(j, 0)], 0)
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "sliding_sum_cents": pa.array(out, pa.int64()),
        })

    return (ds.map_batches(add_block, batch_format="pyarrow")
            .groupby("__blk").map_groups(sliding, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# §2.8 — JSON scalar extraction over a properties column
# ---------------------------------------------------------------------------

def event_props_stats(sf_dir: str) -> Dataset:
    """Extract the integer 'k' field from the events props JSON column and
    aggregate per event type — the metadata-map scalar-function shape
    (OcrRequest.metadata analog; SURVEY §2.8 json functions). pyarrow has
    no JSON kernel, but the planted props grammar '{"k": N}' is
    regex-extractable, so the hot path is one RE2 pc.extract_regex pass
    (VERDICT r4 item 7); rows the regex misses (arbitrary JSON) fall back
    to per-row json.loads — zero rows on well-formed corpora. The
    aggregate stays combiner-first so only (type, partial) rows shuffle."""
    import json as _json

    ds = _pq(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        props = pc.fill_null(batch["props"], "")
        # integer grammar matches JSON exactly (no leading zeros): a
        # '{"k": 007}' row must fall through to json.loads and be
        # REJECTED like the oracle's TRY_CAST(json_extract(...)) does
        ext = pc.extract_regex(props,
                               pattern=r'^\{"k": (?P<k>-?(?:0|[1-9]\d*))\}$')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        miss = pc.and_(pc.is_null(k), pc.not_equal(props, ""))
        if pc.sum(pc.cast(miss, pa.int64())).as_py():
            kl = k.to_pylist()
            pl = props.to_pylist()
            for i in np.flatnonzero(
                    miss.combine_chunks().to_numpy(zero_copy_only=False)):
                try:
                    v = _json.loads(pl[i])
                    v = v.get("k") if isinstance(v, dict) else None
                except (ValueError, TypeError):
                    v = None
                kl[int(i)] = v if isinstance(v, int) else None
            k = pa.array(kl, pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k})
        t = t.filter(pc.is_valid(t["k"]))
        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("k", "sum"), ("k", "max"), ([], "count_all")])
        return g.rename_columns(["event_type", "k_sum", "k_max", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_events"),
                   Sum("k_sum", alias_name="k_total"),
                   Max("k_max", alias_name="k_max"))
    )


# ---------------------------------------------------------------------------
# PII scrub over the corpus (training-data hygiene, SQL-checkable)
# ---------------------------------------------------------------------------

def pii_scrub_stats(sf_dir: str) -> Dataset:
    """Plant deterministic contact strings per doc, scrub them with the
    RE2 PII operator, return per-doc counts + scrubbed text. The planted
    suffix is SQL-reconstructible, so DuckDB re-derives the exact
    scrubbed output (regexp_replace, same RE2 engine)."""
    from .textstats import scrub_pii

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        did = pc.cast(batch["doc_id"], pa.string())
        suffix = pc.binary_join_element_wise(
            pa.array([" contact user"] * batch.num_rows), did,
            pa.array(["@example.com or +1 555-010-"] * batch.num_rows),
            # slice to EXACTLY 4 digits: lpad alone leaves 5+-digit ids
            # unpadded while SQL lpad truncates — parity requires both sides
            # to truncate (ADVICE r2; latent at doc_id >= 10000)
            pc.utf8_slice_codeunits(pc.utf8_lpad(did, 4, "0"), 0, 4),
            pa.array([" now"] * batch.num_rows),
            "")
        text = pc.binary_join_element_wise(
            pc.fill_null(batch["text"], ""), suffix, "")
        return pa.table({"doc_id": batch["doc_id"], "text": text})

    scrubbed = scrub_pii(ds.map_batches(plant, batch_format="pyarrow"))
    # full scrubbed text is the comparison payload
    return scrubbed.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "scrubbed": t["text"],
                            "n_emails": t["n_emails"],
                            "n_phones": t["n_phones"]}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# storage reconciliation — recompute-vs-ledger backfill with drift counts
# ---------------------------------------------------------------------------

def storage_reconcile(sf_dir: str, team_region: str = "ASIA") -> Dataset:
    """Storage-accounting reconciliation: recompute each user's usage
    from their SUCCESS-state rows, compare against the stale stored
    ledger, and roll team members' usage into per-team totals — the
    batch backfill of the reference's storage migration job
    (storage/service/StorageDataMigrationService.java:47-120: per-user
    recompute over SUCCESS files :122-131, zero for empty users :65-72,
    team members routed into a team map :77-85, teams folded after
    :99-114; usersUpdated counts only CHANGED rows, teamsUpdated counts
    every team :112).

    Deterministic stand-ins on the TPC-H-ish corpus: user = customer,
    file rows = orders (o_orderstatus = 'F' is the SUCCESS analog,
    o_totalprice cents the byte size), ledger = c_acctbal cents, team
    membership = customer's nation sits in ``team_region`` (the
    conditional routing the reference reads from team_members), team id
    = nation name.

    Scale shape: orders pre-aggregate per batch before ONE slim
    groupby(custkey) sum; the customer side joins through the bucketed
    ``hash_join`` (no broadcast of the big side); nation->region routing
    is a genuinely tiny dimension broadcast via ``ray.put``. Output:
    (scope, entity, storage_used_cents, n_members, drifted).
    """
    import ray
    import pyarrow.parquet as pq

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])

    def order_partials(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["o_orderstatus"], "F"))
        b = _cents(b, "o_totalprice", "cents")
        agg = pa.table({
            "c_custkey": b["o_custkey"], "cents": b["cents"],
        }).group_by("c_custkey").aggregate([("cents", "sum")])
        return agg.rename_columns(["c_custkey", "cents"])

    recomputed = (
        orders.map_batches(order_partials, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("cents", alias_name="used_cents"))
    )

    customers = _pq(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_nationkey"])

    def ledger(batch: pa.Table) -> pa.Table:
        b = _cents(batch, "c_acctbal", "ledger_cents")
        return b.select(["c_custkey", "ledger_cents", "c_nationkey"])

    joined = hash_join(
        customers.map_batches(ledger, batch_format="pyarrow"),
        recomputed, on="c_custkey", how="left")

    # nation -> (team name, in team region): inherently tiny dimension
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    rmap = dict(zip(region["r_regionkey"].to_pylist(),
                    region["r_name"].to_pylist()))
    # broadcast parallel (key, name, in_team) arrays: the probe is one
    # vectorized index_in + take/fancy-index, no per-row dict lookups
    route_ref = ray.put((
        nation["n_nationkey"].combine_chunks(),
        nation["n_name"].combine_chunks(),
        np.array([rmap[rk] == team_region
                  for rk in nation["n_regionkey"].to_pylist()], bool)))

    def reconcile(batch: pa.Table) -> pa.Table:
        key_arr, name_arr, inteam_np = ray.get(route_ref)
        used = pc.fill_null(batch["used_cents"], 0)
        idx_arr = pc.index_in(batch["c_nationkey"], value_set=key_arr)
        if idx_arr.null_count:  # unmapped key would NaN->garbage-index (ADVICE r4)
            missing = pc.unique(batch["c_nationkey"].filter(
                pc.is_null(idx_arr))).to_pylist()
            raise ValueError(
                f"storage_reconcile: c_nationkey values {missing[:5]} missing "
                f"from the nation broadcast lookup")
        idx = idx_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        teams_arr = pc.take(name_arr, pa.array(idx))
        in_team = inteam_np[idx]
        drift = pc.not_equal(batch["ledger_cents"], used).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_users = int((~in_team).sum())
        users = pa.table({
            "scope": pa.array(["user"] * n_users, pa.string()),
            "entity": pc.cast(batch["c_custkey"], pa.string()).filter(
                pa.array(~in_team)),
            "storage_used_cents": pc.cast(used.filter(pa.array(~in_team)),
                                          pa.int64()),
            "n_members": pa.array(np.ones(n_users, np.int64)),
            "drifted": pa.array(drift[~in_team], pa.int64()),
        })
        # team partials pre-aggregated per batch: the grouped shuffle
        # carries one slim row per (team, batch), never per member;
        # drifted=1 mirrors teamsUpdated counting every team (:112)
        n_team = int(in_team.sum())
        tm = pa.table({
            "scope": pa.array(["team"] * n_team, pa.string()),
            "entity": teams_arr.filter(pa.array(in_team)),
            "storage_used_cents": pc.cast(used.filter(pa.array(in_team)),
                                          pa.int64()),
            "n_members": pa.array(np.ones(n_team, np.int64)),
            "drifted": pa.array(np.ones(n_team, np.int64)),
        }).group_by(["scope", "entity"]).aggregate(
            [("storage_used_cents", "sum"), ("n_members", "sum"),
             ("drifted", "max")]).rename_columns(
            ["scope", "entity", "storage_used_cents", "n_members", "drifted"])
        return pa.concat_tables([users, tm])

    # one slim grouped fold finishes both scopes: user rows have unique
    # (scope, entity) so the Sums are identity; team partials sum up and
    # Max keeps drifted at 1 — no scope ever co-locates in one task
    return (
        joined.map_batches(reconcile, batch_format="pyarrow")
        .groupby(["scope", "entity"])
        .aggregate(Sum("storage_used_cents", alias_name="storage_used_cents"),
                   Sum("n_members", alias_name="n_members"),
                   Max("drifted", alias_name="drifted"))
    )


# ---------------------------------------------------------------------------
# table statistics collection — the ANALYZE pass a query planner needs
# ---------------------------------------------------------------------------

def table_stats(sf_dir: str, table: str = "orders",
                int_cols: tuple[str, ...] = ("o_orderkey", "o_custkey")) -> Dataset:
    """Catalog statistics per integer column: (column, min_v, max_v,
    n_nulls, n_distinct) — the ANALYZE pass that feeds join planning
    (e.g. derive_join_buckets' row estimates and broadcast-vs-bucket
    decisions).

    Combiner-first end to end: each batch folds every column to ONE slim
    partial row (min/max/null count via Arrow kernels) plus its DISTINCT
    (column, value) pairs; the only wide op is the distinct-pair groupby
    — the unavoidable exact-NDV shuffle, which at corpus scale degrades
    to the mergeable HLL register sketch (sketch.hll_registers, same
    output contract, ±6.5%). Values never leave as raw rows: the shuffle
    carries one row per distinct (column, value).

    Contract note (ADVICE r3): the NDV branch executes EAGERLY at
    graph-construction time (take_all over one row per column — bounded
    by table WIDTH, never data) so the result can ride a broadcast dict;
    the returned per-column stats Dataset itself stays lazy.
    """
    ds = _pq(sf_dir, table, list(int_cols))

    def partials(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "min_v": [], "max_v": [], "n_nulls": [],
                "n_rows": []}
        for c in int_cols:
            col = batch[c]
            mm = pc.min_max(col)
            rows["column"].append(c)
            rows["min_v"].append(mm["min"].as_py())
            rows["max_v"].append(mm["max"].as_py())
            rows["n_nulls"].append(col.null_count)
            rows["n_rows"].append(batch.num_rows)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "min_v": pa.array(rows["min_v"], pa.int64()),
            "max_v": pa.array(rows["max_v"], pa.int64()),
            "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
        })

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Min("min_v", alias_name="min_v"),
                   Max("max_v", alias_name="max_v"),
                   Sum("n_nulls", alias_name="n_nulls"),
                   Sum("n_rows", alias_name="n_rows"))
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        parts = []
        for c in int_cols:
            u = pc.unique(batch[c].combine_chunks())
            u = u.drop_null()
            parts.append(pa.table({
                "column": pa.array([c] * len(u), pa.string()),
                "v": pc.cast(u, pa.int64()),
            }))
        return pa.concat_tables(parts)

    ndv = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["column", "v"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: pa.table({
                "column": t["column"],
                "n_distinct_part": pa.array(
                    np.ones(t.num_rows, np.int64)),
            }), batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_distinct_part", alias_name="n_distinct"))
    )

    # final merge: both sides have exactly one row per column — bounded
    # by the TABLE WIDTH, not the data — so a broadcast dict beats a
    # bucketed shuffle here
    import ray

    ndv_map = ray.put({r["column"]: r["n_distinct"] for r in ndv.take_all()})

    def finish(t: pa.Table) -> pa.Table:
        m = ray.get(ndv_map)
        return t.append_column(
            "n_distinct",
            pa.array([m.get(c, 0) for c in t["column"].to_pylist()],
                     pa.int64()),
        ).drop_columns(["n_rows"])

    return agg.map_batches(finish, batch_format="pyarrow")
