"""Ray Data batch stages for the extraction pipeline.

Stage graph (pipeline.py composes these):

    docs ──map_batches──> explode_extract   (stateless: validate + page
         │                 resolution + per-doc explode to span work units,
         │                 html/text expansion inline; column-wise builder)
         ├─map_batches──> OCR               (actor pool when a provider
         │                 needs warm engine state, else worker-cached
         │                 tasks — see pipeline._ocr_stage)
         ├─reassembly──> finalize_block     (local merge + in-doc
         │                 sort(offset, sub); slim groupby(doc_id)
         │                 verification + targeted repair in pipeline.py)
         │              OR pack_partials -> groupby(bucket) -> finalize_bucket
         │                 (literal payload shuffle variant)
         └─> extracted (EXTRACTED_SCHEMA)

Skew note (SURVEY.md §4): a 400-page scanned PDF becomes 400 independent
work-unit rows; `map_batches` re-batches across block boundaries, so the
whale's pages spread across the whole OCR stage instead of straggling one
task — this is the explicit doc-size-skew defeat the north rule asks for.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .config import PipelineConfig
from .html_extract import extract_html_spans, split_plain_text
from .pages import PageSelectionError, resolve_pages
from .pdftext import join_direct, join_ocr, needs_ocr_mode
from .providers import ProviderRegistry
from .schema import EXTRACTED_SCHEMA, SPLIT_MARKER_STATUS, WORKUNIT_SCHEMA
from .validate import ALLOWED_MIMES, SINGLE_FILE_MAX_BYTES

_PLACEHOLDER_KIND = None  # row that carries a doc with no content/work


class _UnitColumns:
    """Column-wise work-unit builder — avoids a 14-field dict per row
    (the dict churn was the memory-bandwidth hot spot at 32 workers)."""

    __slots__ = ("kind", "text", "media_ref", "offset", "sub", "page_no",
                 "needs_ocr", "pdf_mode", "doc_status", "error_message",
                 "doc_id", "collection_id", "lang", "size_bucket", "n_units")

    def __init__(self) -> None:
        for f in self.__slots__:
            setattr(self, f, [])

    def add(self, doc_id, collection_id, lang, kind=None, text=None,
            media_ref=None, offset=0, sub=0, page_no=None, needs_ocr=False,
            pdf_mode=None, doc_status="ok", error_message=None, size_bucket=0):
        self.doc_id.append(doc_id)
        self.collection_id.append(collection_id)
        self.lang.append(lang)
        self.kind.append(kind)
        self.text.append(text)
        self.media_ref.append(media_ref)
        self.offset.append(offset)
        self.sub.append(sub)
        self.page_no.append(page_no)
        self.needs_ocr.append(needs_ocr)
        self.pdf_mode.append(pdf_mode)
        self.doc_status.append(doc_status)
        self.error_message.append(error_message)
        self.size_bucket.append(size_bucket)

    def table(self) -> pa.Table:
        cols = {}
        for field in WORKUNIT_SCHEMA:
            cols[field.name] = pa.array(getattr(self, field.name), field.type)
        return pa.table(cols)


def explode_extract(batch: pa.Table) -> pa.Table:
    """Validate + resolve pages + explode docs into span work units.

    One input doc row -> N work-unit rows (html fragments expanded to runs,
    pdf pages one row each, images one row each). Validation-failed docs
    emit a single placeholder row so the doc is never dropped
    (partial-success semantics, DocumentUploadImpl.java:111-120).
    Column-wise output construction; only the nested spans column goes
    through python objects.
    """
    cols = batch.column_names

    def col(name, default=None):
        if name in cols:
            return batch[name].to_pylist()
        return [default] * batch.num_rows

    doc_ids = col("doc_id")
    colls = col("collection_id")
    mimes = col("mime_type")
    sizes = col("file_size", 0)
    langs = col("lang")
    sps = col("start_page")
    eps = col("end_page")
    pgs = col("pages")
    spans_col = col("spans")
    prechecks = col("precheck_error")  # upstream gates (e.g. total-size cap)
    storage_errs = col("storage_error")  # upload failures, rows retained

    out = _UnitColumns()
    for i in range(batch.num_rows):
        start = len(out.doc_id)
        if prechecks[i]:
            out.add(doc_ids[i], colls[i], langs[i],
                    doc_status="failed_validation", error_message=prechecks[i])
        else:
            _explode_doc_cols(out, doc_ids[i], colls[i], mimes[i], sizes[i],
                              langs[i], sps[i], eps[i], pgs[i], spans_col[i],
                              storage_errs[i])
        # backfill the doc's total unit count on every one of its rows —
        # reassembly uses it for block-local split detection
        n = len(out.doc_id) - start
        out.n_units.extend([n] * n)
    return out.table()


def _explode_doc_cols(out: _UnitColumns, doc_id, collection_id, mime, size,
                      lang, start_page, end_page, pages, spans,
                      storage_error=None) -> None:
    base = (doc_id, collection_id, lang)
    if mime not in ALLOWED_MIMES:
        out.add(*base, doc_status="failed_validation",
                error_message=f"Invalid file type: {mime}")
        return
    if (size or 0) > SINGLE_FILE_MAX_BYTES:
        out.add(*base, doc_status="failed_validation",
                error_message=(f"The file size must not exceed "
                               f"{SINGLE_FILE_MAX_BYTES // (1024 * 1024)} MB."))
        return
    if storage_error:
        # upload failed; row retained with its error (partial-success
        # matrix, DocumentUploadImplTest storage-failure rows)
        out.add(*base, doc_status="failed_storage", error_message=storage_error)
        return

    spans_in = sorted(spans or [], key=lambda s: s["offset"])
    pdf_pages = [s for s in spans_in if s["kind"] == "pdf_page"]

    selected: list[int] = []
    if pdf_pages:
        try:
            selected = resolve_pages(
                len(pdf_pages), start_page, end_page, list(pages or []) or None
            )
        except PageSelectionError as exc:
            out.add(*base, doc_status="failed_validation", error_message=str(exc))
            return

    n_spans = len(spans_in)
    size_bucket = 0 if n_spans <= 16 else (1 if n_spans <= 64 else 2)
    emitted = 0
    seq = 0  # doc-global emission sequence: reassembly sorts (offset, sub),
             # and a per-span-restarting sub would interleave units of two
             # input spans sharing an offset; the global counter preserves
             # the oracle's stable input order exactly
    pdf_done = False
    for s in spans_in:
        kind, off = s["kind"], s["offset"]
        if kind == "html":
            for k, t in extract_html_spans(s["text"] or ""):
                out.add(*base, kind=k, text=t, offset=off, sub=seq,
                        size_bucket=size_bucket)
                seq += 1
                emitted += 1
        elif kind == "text":
            for line in split_plain_text(s["text"]):
                if line:
                    out.add(*base, kind="text", text=line, offset=off, sub=seq,
                            size_bucket=size_bucket)
                    seq += 1
                    emitted += 1
        elif kind == "image":
            out.add(*base, kind="image", media_ref=s["media_ref"], offset=off,
                    sub=seq, needs_ocr=True, size_bucket=size_bucket)
            seq += 1
            emitted += 1
        elif kind == "pdf_page":
            if pdf_done:
                continue
            pdf_done = True
            sel_pages = [(i + 1, pdf_pages[i]["text"]) for i in selected]
            if needs_ocr_mode(sel_pages):
                for i in selected:
                    out.add(*base, kind="pdf_page",
                            media_ref=pdf_pages[i]["media_ref"], offset=off,
                            sub=seq, page_no=i + 1, needs_ocr=True,
                            pdf_mode="ocr", size_bucket=size_bucket)
                    seq += 1
                    emitted += 1
            else:
                for i in selected:
                    out.add(*base, kind="pdf_page", text=pdf_pages[i]["text"],
                            offset=off, sub=seq, page_no=i + 1,
                            pdf_mode="direct", size_bucket=size_bucket)
                    seq += 1
                    emitted += 1
        elif s.get("text") or s.get("media_ref"):
            out.add(*base, kind=kind, text=s.get("text"),
                    media_ref=s.get("media_ref"), offset=off, sub=seq,
                    size_bucket=size_bucket)
            seq += 1
            emitted += 1
    if not emitted:
        out.add(*base)


def apply_ocr(batch: pa.Table, registry: ProviderRegistry) -> pa.Table:
    """Fill OCR'd text for rows with needs_ocr=True; failure-as-result."""
    needs = batch["needs_ocr"].to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(needs)
    provider_col = np.full(batch.num_rows, None, dtype=object)
    if idx.size == 0:
        return batch.append_column("ocr_provider", pa.array(provider_col, pa.string()))

    media = batch["media_ref"].to_pylist()
    langs = batch["lang"].to_pylist()
    text = batch["text"].to_pylist()
    errors = batch["error_message"].to_pylist()
    # group by language: a batch mixes rows from many docs, and a real
    # engine loads language-specific models — one extract_batch per lang
    by_lang: dict = {}
    for i in idx:
        by_lang.setdefault(langs[i], []).append(i)
    for lang, rows in by_lang.items():
        outputs, names = registry.extract_batch([media[i] for i in rows], lang)
        for o, name, i in zip(outputs, names, rows):
            provider_col[i] = name
            if o.success:
                text[i] = o.text
            else:
                errors[i] = o.error_message
    batch = batch.set_column(
        batch.column_names.index("text"), "text", pa.array(text, pa.string())
    )
    batch = batch.set_column(
        batch.column_names.index("error_message"), "error_message",
        pa.array(errors, pa.string()),
    )
    return batch.append_column("ocr_provider", pa.array(provider_col, pa.string()))


_REGISTRY_CACHE: dict[tuple, ProviderRegistry] = {}


def ocr_task(batch: pa.Table, preferred: str, fallback_chain: tuple[str, ...]) -> pa.Table:
    """Task-based OCR with per-WORKER-PROCESS cached registry.

    Ray reuses worker processes across tasks, so the registry (engine
    handles) is still built once per worker — same warm-state guarantee as
    the actor pool without pool spin-up/autoscale ramp, and the stage fuses
    with its task-based neighbors into one pass per block. Used when every
    provider in the chain declares requires_warm_state=False; providers
    holding heavyweight engines (Tesseract, Vision RPC channels) keep the
    dedicated actor pool (OcrStage).
    """
    key = (preferred, tuple(fallback_chain))
    reg = _REGISTRY_CACHE.get(key)
    if reg is None:
        reg = _REGISTRY_CACHE[key] = ProviderRegistry(preferred, fallback_chain)
    return apply_ocr(batch, reg)


class OcrStage:
    """Actor-pool OCR stage (A1/A2, SURVEY.md §2.3).

    The provider registry (engine handles, fallback chain) is built ONCE in
    ``__init__`` — per actor, not per batch (the reference re-instantiates
    Tesseract per request, TesseractOcrProvider.java:210-228; fixed here).
    Rows with ``needs_ocr=False`` pass through untouched, so one stream
    serves both cheap and expensive rows without a branch-merge dance.
    Failures are per-row error columns, never exceptions (failure-as-result,
    TesseractOcrProvider.java:102-119).
    """

    def __init__(self, preferred: str = "fake", fallback_chain: tuple[str, ...] = ("fake",)):
        self.registry = ProviderRegistry(preferred, fallback_chain)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_ocr(batch, self.registry)


def add_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Coarse shuffle key: crc32(doc_id) % B (deterministic across runs)."""
    ids = batch["doc_id"].to_pylist()
    buckets = np.fromiter(
        (zlib.crc32(s.encode()) % n_buckets for s in ids), dtype=np.int32, count=len(ids)
    )
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


# ---------------------------------------------------------------------------
# combiner: pack per-doc partials BEFORE the shuffle
# ---------------------------------------------------------------------------

_UNIT_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("sub", pa.int32()),
        pa.field("page_no", pa.int32()),
        pa.field("pdf_mode", pa.string()),
        pa.field("error_message", pa.string()),
        pa.field("ocr_provider", pa.string()),
    ]
)

PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("collection_id", pa.string()),
        pa.field("doc_status", pa.string()),
        pa.field("val_error", pa.string()),
        pa.field("units", pa.list_(_UNIT_STRUCT)),
    ]
)

_UNIT_FIELDS = ("kind", "text", "media_ref", "offset", "sub", "page_no",
                "pdf_mode", "error_message", "ocr_provider")


def _pack_rows(rows: list[dict]) -> list[dict]:
    """Collapse work-unit row dicts into one partial dict per doc."""
    by_doc: dict[str, dict] = {}
    for r in rows:
        d = by_doc.get(r["doc_id"])
        if d is None:
            d = by_doc[r["doc_id"]] = {
                "doc_id": r["doc_id"],
                "collection_id": r["collection_id"],
                "doc_status": r["doc_status"],
                "val_error": (r["error_message"]
                               if r["doc_status"] in ("failed_validation", "failed_storage")
                               else None),
                "units": [],
            }
        if r["kind"] is not None or r["error_message"]:
            d["units"].append({f: r.get(f) for f in _UNIT_FIELDS})
    return list(by_doc.values())


def pack_partials(batch: pa.Table) -> pa.Table:
    """Combiner (classic pre-aggregation before groupby, see ray_guide
    'Aggregation at scale'): collapse this block's work-unit rows into one
    partial row per doc — the reassembly shuffle then moves ~n_docs rows,
    not ~n_spans rows (18x fewer at the bench mix). Docs split across
    blocks (possible only if an upstream block was split mid-doc) simply
    produce two partials that the grouped merge concatenates — correctness
    never depends on block contiguity."""
    return pa.Table.from_pylist(_pack_rows(batch.to_pylist()), schema=PARTIAL_SCHEMA)


def _merge_partial_rows(partials: list[dict]) -> list[dict]:
    """Merge packed partial rows (PARTIAL_SCHEMA dicts) into EXTRACTED rows."""
    merged: dict[str, dict] = {}
    for r in partials:
        d = merged.get(r["doc_id"])
        if d is None:
            merged[r["doc_id"]] = r
        else:
            d["units"].extend(r["units"])
            if r["doc_status"] in ("failed_validation", "failed_storage"):
                d["doc_status"] = r["doc_status"]
                d["val_error"] = d["val_error"] or r["val_error"]
    out = []
    for doc_id in sorted(merged):
        p = merged[doc_id]
        units = sorted(p["units"], key=lambda u: (u["offset"], u["sub"]))
        for u in units:
            u["doc_id"] = p["doc_id"]
            u["collection_id"] = p["collection_id"]
            u["doc_status"] = p["doc_status"]
        if p["doc_status"] in ("failed_validation", "failed_storage") or not units:
            units = [{
                "doc_id": p["doc_id"], "collection_id": p["collection_id"],
                "doc_status": p["doc_status"], "error_message": p["val_error"],
                "kind": None, "text": None, "media_ref": None, "offset": 0,
                "sub": 0, "page_no": None, "pdf_mode": None, "ocr_provider": None,
            }]
        out.append(_reassemble_doc(units))
    return out


_SPANS_TYPE = EXTRACTED_SCHEMA.field("spans").type


def finalize_block(batch: pa.Table) -> pa.Table:
    """Shuffle-free reassembly: merge + in-doc sort(offset, sub) + span
    assembly over one whole block of OCR'd work units (batch_size=None).

    Valid because explode_extract emits each doc's rows contiguously inside
    one output table, and Ray only splits a map output block mid-table when
    it exceeds target_max_block_size. Split detection is BLOCK-LOCAL: each
    work unit carries the doc's total unit count (n_units); a doc group
    whose row count falls short is an incomplete fragment and emits a slim
    SPLIT_MARKER_STATUS row (no payload) instead of a wrong partial doc.
    The repair/publish paths (pipeline.py) replace marker docs with an
    exact recompute from source — no groupby verification pass needed.

    Column-wise implementation (no per-row dicts): groups are index lists
    into the block's columns; output spans are built as tuple structs.
    """
    if batch.num_rows == 0:
        return EXTRACTED_SCHEMA.empty_table()
    C = {n: batch[n].to_pylist() for n in (
        "doc_id", "collection_id", "kind", "text", "media_ref", "offset",
        "sub", "page_no", "pdf_mode", "doc_status", "error_message",
        "ocr_provider",
    )}
    n_units = (batch["n_units"].to_pylist()
               if "n_units" in batch.column_names else None)
    groups: dict[str, list[int]] = {}
    for i, d in enumerate(C["doc_id"]):
        g = groups.get(d)
        if g is None:
            groups[d] = [i]
        else:
            g.append(i)

    o = {k: [] for k in ("doc_id", "collection_id", "spans", "status",
                         "error_message", "provider", "n_spans", "n_chars")}
    off, sub = C["offset"], C["sub"]
    for d in sorted(groups):
        idx = sorted(groups[d], key=lambda i: (off[i], sub[i]))
        first = idx[0]
        o["doc_id"].append(d)
        o["collection_id"].append(C["collection_id"][first])
        if n_units is not None and n_units[first] is not None \
                and len(idx) < n_units[first]:
            # incomplete fragment (doc split across blocks): emit a slim
            # marker row; repair recomputes this doc exactly from source
            o["spans"].append([])
            o["status"].append(SPLIT_MARKER_STATUS)
            o["error_message"].append(None)
            o["provider"].append(None)
            o["n_spans"].append(0)
            o["n_chars"].append(0)
            continue
        if C["doc_status"][first] in ("failed_validation", "failed_storage"):
            o["spans"].append([])
            o["status"].append(C["doc_status"][first])
            o["error_message"].append(C["error_message"][first])
            o["provider"].append(None)
            o["n_spans"].append(0)
            o["n_chars"].append(0)
            continue
        failure = next((i for i in idx if C["error_message"][i]), None)
        used = next((C["ocr_provider"][i] for i in idx if C["ocr_provider"][i]), None)
        if failure is not None:
            o["spans"].append([])
            o["status"].append("failed")
            o["error_message"].append(C["error_message"][failure])
            o["provider"].append(used or C["ocr_provider"][failure])
            o["n_spans"].append(0)
            o["n_chars"].append(0)
            continue
        kinds = C["kind"]
        spans: list[tuple] = []  # (kind, text, media_ref, offset)
        n_chars = 0
        pdf_idx = [i for i in idx if kinds[i] == "pdf_page"]
        pdf_emitted = False
        for i in idx:
            k = kinds[i]
            if k is None:
                continue
            if k == "pdf_page":
                if pdf_emitted:
                    continue
                pdf_emitted = True
                pages = [(C["page_no"][j], C["text"][j]) for j in pdf_idx]
                joined = (join_ocr(pages) if C["pdf_mode"][pdf_idx[0]] == "ocr"
                          else join_direct(pages))
                if joined:
                    spans.append(("pdf_text", joined, None, len(spans)))
                    n_chars += len(joined)
            elif k == "image":
                t = C["text"][i]
                spans.append(("ocr_text", t, C["media_ref"][i], len(spans)))
                n_chars += len(t) if t else 0
            else:
                t = C["text"][i]
                spans.append((k, t, C["media_ref"][i], len(spans)))
                n_chars += len(t) if t else 0
        o["spans"].append(spans)
        o["status"].append("completed")
        o["error_message"].append(None)
        o["provider"].append(used or "direct")
        o["n_spans"].append(len(spans))
        o["n_chars"].append(n_chars)

    return pa.table({
        "doc_id": pa.array(o["doc_id"], pa.string()),
        "collection_id": pa.array(o["collection_id"], pa.string()),
        "spans": pa.array(o["spans"], _SPANS_TYPE),
        "status": pa.array(o["status"], pa.string()),
        "error_message": pa.array(o["error_message"], pa.string()),
        "provider": pa.array(o["provider"], pa.string()),
        "n_spans": pa.array(o["n_spans"], pa.int32()),
        "n_chars": pa.array(o["n_chars"], pa.int64()),
    })


def finalize_bucket(group: pa.Table) -> pa.Table:
    """Grouped merge + in-doc sort(offset, sub) + final span assembly —
    the literal groupby(bucket)+sort shuffle variant (cfg.reassembly=
    'shuffle'). Correct at any block layout, but Ray's sort moves the full
    span payload (~16 MB/s measured) — prefer the default local+repair
    path, which shuffles nothing."""
    if group.num_rows == 0:
        return EXTRACTED_SCHEMA.empty_table()
    return pa.Table.from_pylist(
        _merge_partial_rows(group.to_pylist()), schema=EXTRACTED_SCHEMA
    )


def reassemble_bucket(group: pa.Table) -> pa.Table:
    """Rebuild ordered per-doc span sequences for one hash bucket.

    This runs after the groupby(bucket) shuffle — all rows of a doc are
    co-located here. Within the bucket: stable sort by (doc_id, offset,
    sub), then a single pass building each doc's ordered spans, applying
    the exact PDF join semantics (M1/M2) and failure accounting.
    """
    if group.num_rows == 0:
        return EXTRACTED_SCHEMA.empty_table()
    g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending"), ("sub", "ascending")])
    rows = g.to_pylist()
    out: list[dict] = []
    i = 0
    n = len(rows)
    while i < n:
        j = i
        did = rows[i]["doc_id"]
        while j < n and rows[j]["doc_id"] == did:
            j += 1
        out.append(_reassemble_doc(rows[i:j]))
        i = j
    return pa.Table.from_pylist(out, schema=EXTRACTED_SCHEMA)


def _reassemble_doc(rows: list[dict]) -> dict:
    first = rows[0]
    out = {
        "doc_id": first["doc_id"],
        "collection_id": first["collection_id"],
        "spans": [],
        "status": "completed",
        "error_message": None,
        "provider": "direct",
        "n_spans": 0,
        "n_chars": 0,
    }
    if first["doc_status"] in ("failed_validation", "failed_storage"):
        out["status"] = first["doc_status"]
        out["error_message"] = first["error_message"]
        out["provider"] = None
        return out

    failure = next((r for r in rows if r["error_message"]), None)
    used = next((r["ocr_provider"] for r in rows if r.get("ocr_provider")), None)
    if failure is not None:
        out["status"] = "failed"
        out["error_message"] = failure["error_message"]
        out["provider"] = used or failure.get("ocr_provider")
        return out

    emitted: list[tuple[str, str | None, str | None]] = []
    pdf_rows = [r for r in rows if r["kind"] == "pdf_page"]
    pdf_emitted = False
    for r in rows:
        kind = r["kind"]
        if kind is None:
            continue
        if kind == "pdf_page":
            if pdf_emitted:
                continue
            pdf_emitted = True
            pages = [(p["page_no"], p["text"]) for p in pdf_rows]
            joined = (
                join_ocr(pages) if pdf_rows[0]["pdf_mode"] == "ocr" else join_direct(pages)
            )
            if joined:
                emitted.append(("pdf_text", joined, None))
        elif kind == "image":
            emitted.append(("ocr_text", r["text"], r["media_ref"]))
        else:
            emitted.append((kind, r["text"], r["media_ref"]))

    out["spans"] = [
        {"kind": k, "text": t, "media_ref": m, "offset": idx}
        for idx, (k, t, m) in enumerate(emitted)
    ]
    out["provider"] = used or "direct"
    out["n_spans"] = len(emitted)
    out["n_chars"] = sum(len(t) for _, t, _ in emitted if t)
    return out
