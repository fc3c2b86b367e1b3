"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1).

Two generators:

* :func:`make_corpus` — standalone corpus from ``(seed, n_docs)``; same
  bytes every run. Archetype mix per FIXTURES.md: 40% html-dominant,
  25% text-pdf, 15% scanned-pdf, 15% image-heavy, 5% skew whales
  (100-400 pdf pages), plus 2% invalid rows (bad MIME / oversize,
  reference FileType.java:6-27 + FileSize.java:6-9) and 1% poison rows
  (provider raises -> quarantine, TesseractOcrProvider.java:102-119).

* :func:`interleave_documents_batch` — bridge from the driver testdata's
  ``documents(doc_id:int64, text, lang, source, n_chars)`` table to the
  interleaved-span shape, deterministically per doc_id (no external data;
  the doc's own text is chunked into html/pdf/text spans).

Per-doc RNG is ``hash(seed, doc_id)`` — row content never depends on row
order or partitioning, so any parallel plan generates identical bytes.
No ambient ``random``/time dependence anywhere.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

from .providers import POISON_MARKER
from .schema import DOCS_SCHEMA

VOCAB = (
    "data pipeline ray arrow span batch block shuffle stream actor table "
    "column row vector hash sort merge scan filter group index page text "
    "image media corpus extract parse layout heading list anchor token "
    "window offset order partition manifest lineage checkpoint resume"
).split()

SEED = 42


def _rng(seed: int, doc_id: str) -> random.Random:
    digest = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def _words(r: random.Random, lo: int, hi: int) -> str:
    # one batched choices() call per run (whale docs sample ~10^7 words per
    # 100k docs; per-word choice() was the generator's hot spot)
    return " ".join(r.choices(VOCAB, k=r.randint(lo, hi)))


def _sentence(r: random.Random) -> str:
    return _words(r, 4, 12).capitalize() + "."


def _paragraph(r: random.Random) -> str:
    return " ".join(_sentence(r) for _ in range(r.randint(1, 3)))


def _html_fragment(r: random.Random, doc_id: str) -> str:
    """HTML with real content plus boilerplate the strip stage must remove."""
    parts: list[str] = []
    if r.random() < 0.5:
        parts.append("<script>window.track('pv');</script>")
    if r.random() < 0.4:
        links = "".join(
            f'<a href="https://x.test/{i}">{r.choice(VOCAB)}</a> ' for i in range(r.randint(4, 8))
        )
        parts.append(f"<nav>{links}</nav>")
    if r.random() < 0.3:
        # link farm in a plain div: mostly-anchor short block -> density drop
        links = "".join(f'<a href="#{i}">{r.choice(VOCAB)}</a> ' for i in range(r.randint(5, 9)))
        parts.append(f"<div>{links}</div>")
    level = r.randint(1, 3)
    parts.append(f"<h{level}>{_words(r, 2, 5).title()}</h{level}>")
    for _ in range(r.randint(1, 3)):
        body = _sentence(r)
        if r.random() < 0.5:
            body += f" <b>{r.choice(VOCAB)}</b> {_sentence(r)}"
        if r.random() < 0.3:
            body += f" <em>{r.choice(VOCAB)}</em>."
        onclick = ' onclick="steal()"' if r.random() < 0.2 else ""
        parts.append(f"<p{onclick}>{body}</p>")
    if r.random() < 0.4:
        tag = r.choice(("ul", "ol"))
        items = "".join(f"<li>{_words(r, 2, 6)}</li>" for _ in range(r.randint(2, 4)))
        parts.append(f"<{tag}>{items}</{tag}>")
    if r.random() < 0.3:
        parts.append("<style>.x{color:red}</style>")
    return "".join(parts)


def _doc(seed: int, i: int) -> dict:
    doc_id = f"doc-{i:08d}"
    r = _rng(seed, doc_id)
    roll = r.random()
    spans: list[dict] = []
    mime = "text/html"
    file_size = r.randint(1_000, 5_000_000)
    start_page = end_page = None
    pages = None
    storage_error = None

    def span(kind, text=None, media_ref=None):
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    if roll < 0.01:  # poison
        mime = "image/png"
        span("image", media_ref=POISON_MARKER)
        if r.random() < 0.5:
            span("image", media_ref=f"s3://corpus/{doc_id}/img-1.png")
    elif roll < 0.03:  # invalid
        if r.random() < 0.5:
            mime = "video/mp4"
        else:
            file_size = 20 * 1024 * 1024
        span("html", text=_html_fragment(r, doc_id))
    elif roll < 0.04:  # storage failure: upload failed, row retained
        mime = "image/png"
        span("image", media_ref=f"s3://corpus/{doc_id}/img-0.png")
        storage_error = "Failed to upload file to storage."
    elif roll < 0.08:  # whale pdf
        mime = "application/pdf"
        n_pages = r.randint(100, 400)
        scanned = r.random() < 0.5
        for p in range(1, n_pages + 1):
            span(
                "pdf_page",
                text="" if scanned else _paragraph(r),
                media_ref=f"s3://corpus/{doc_id}/page-{p}.pdf",
            )
    elif roll < 0.48:  # html-dominant
        mime = "text/html"
        for _ in range(r.randint(1, 3)):
            span("html", text=_html_fragment(r, doc_id))
        if r.random() < 0.3:
            span("text", text=_paragraph(r) + "\n" + _paragraph(r))
        if r.random() < 0.2:
            span("image", media_ref=f"s3://corpus/{doc_id}/img-0.png")
    elif roll < 0.73:  # text-pdf
        mime = "application/pdf"
        n_pages = r.randint(3, 12)
        for p in range(1, n_pages + 1):
            blank = r.random() < 0.15  # some blank pages exercise the skip rule
            span(
                "pdf_page",
                text="" if blank else _paragraph(r),
                media_ref=f"s3://corpus/{doc_id}/page-{p}.pdf",
            )
        sel = r.random()
        if sel < 0.15:
            start_page = r.randint(1, max(1, n_pages - 1))
            end_page = r.randint(start_page, n_pages)
        elif sel < 0.25:
            pages = sorted({r.randint(1, n_pages) for _ in range(r.randint(1, 4))})
            if r.random() < 0.3:  # unsorted + duplicate input, resolver must fix
                pages = pages[::-1] + pages[:1]
        elif sel < 0.27:  # invalid selection -> failed_validation
            start_page = n_pages + 3
            end_page = n_pages + 5
    elif roll < 0.88:  # scanned pdf
        mime = "application/pdf"
        for p in range(1, r.randint(2, 6) + 1):
            span("pdf_page", text="", media_ref=f"s3://corpus/{doc_id}/page-{p}.pdf")
    else:  # image-heavy
        mime = "image/png"
        for j in range(r.randint(1, 5)):
            span("image", media_ref=f"s3://corpus/{doc_id}/img-{j}.png")
        if r.random() < 0.3:
            span("text", text=_paragraph(r))

    return {
        "doc_id": doc_id,
        "collection_id": f"col-{i // 8:06d}",
        "spans": spans,
        "mime_type": mime,
        "file_size": file_size,
        "lang": "eng",
        "start_page": start_page,
        "end_page": end_page,
        "pages": pages,
        "storage_error": storage_error,
        # request-metadata JSON on a deterministic subset (index-derived so
        # the RNG stream — and thus corpus content — is unchanged)
        "metadata": (f'{{"channel":"bulk","priority":{i % 3}}}'
                     if i % 5 == 0 else None),
    }


def _docs_table(rows: list[dict]) -> pa.Table:
    """Column-wise DOCS_SCHEMA assembly: the nested spans column is built
    from flat field arrays + offsets (ListArray.from_arrays) instead of
    per-row dict conversion — ~2x faster than Table.from_pylist, which was
    the generator's second hot spot after the RNG."""
    if not rows:
        return DOCS_SCHEMA.empty_table()
    span_type = DOCS_SCHEMA.field("spans").type.value_type
    offsets = [0]
    fk: list = []
    ft: list = []
    fm: list = []
    fo: list = []
    for r in rows:
        for s in r["spans"]:
            fk.append(s["kind"])
            ft.append(s["text"])
            fm.append(s["media_ref"])
            fo.append(s["offset"])
        offsets.append(len(fk))
    spans = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [pa.array(fk, pa.string()), pa.array(ft, pa.string()),
             pa.array(fm, pa.string()), pa.array(fo, pa.int32())],
            fields=list(span_type),
        ),
    )
    return pa.Table.from_arrays(
        [
            pa.array([r["doc_id"] for r in rows], pa.string()),
            pa.array([r["collection_id"] for r in rows], pa.string()),
            spans,
            pa.array([r["mime_type"] for r in rows], pa.string()),
            pa.array([r["file_size"] for r in rows], pa.int64()),
            pa.array([r["lang"] for r in rows], pa.string()),
            pa.array([r["start_page"] for r in rows], pa.int32()),
            pa.array([r["end_page"] for r in rows], pa.int32()),
            pa.array([r.get("pages") for r in rows], pa.list_(pa.int32())),
            pa.array([r.get("storage_error") for r in rows], pa.string()),
            pa.array([r.get("metadata") for r in rows], pa.string()),
        ],
        schema=DOCS_SCHEMA,
    )


def make_corpus(n_docs: int, seed: int = SEED) -> pa.Table:
    """Deterministic interleaved docs table (DOCS_SCHEMA)."""
    return _docs_table([_doc(seed, i) for i in range(n_docs)])


def make_corpus_range(start: int, stop: int, seed: int = SEED) -> pa.Table:
    """Corpus slice [start, stop) — content identical to make_corpus's rows,
    generated shard-locally (the 100 TB path: each read task synthesizes or
    reads only its shard; no driver-side materialization)."""
    return _docs_table([_doc(seed, i) for i in range(start, stop)])


def corpus_dataset(n_docs: int, seed: int = SEED, block_size: int = 1000):
    """Distributed deterministic corpus: each read task generates only its
    id-shard (per-doc RNG is hash(seed, doc_id), so content is independent
    of partitioning). Never materializes the corpus on the driver."""
    import ray.data

    ds = ray.data.range(n_docs, override_num_blocks=max(1, n_docs // block_size))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        return _docs_table([_doc(seed, int(i)) for i in ids])

    return ds.map_batches(gen, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bridge: driver testdata documents table -> interleaved docs
# ---------------------------------------------------------------------------

def _chunk_words(text: str, chunk: int) -> list[str]:
    ws = text.split()
    if not ws:
        return [""]
    return [" ".join(ws[i:i + chunk]) for i in range(0, len(ws), chunk)]


def bridge_roll(doc_id: str, seed: int = SEED) -> tuple[int, int]:
    """Archetype dice for the documents->interleaved bridge: the first two
    BYTES of sha256(f"{seed}:{doc_id}") — SQL-recomputable (DuckDB:
    substr(sha256(..), 1, 2) compared as lowercase hex), which is what
    lets flagship-derived queries carry DuckDB oracles."""
    d = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
    return d[0], d[1]


# bridge archetype thresholds over the 0..255 roll byte — keep in sync
# with the oracle SQL in __ray_entry__ (hex-string thresholds)
BRIDGE_POISON = 3        # < 3   (~1.2%) poison image  -> failed
BRIDGE_INVALID = 8       # < 8   (~2%)   bad mime      -> failed_validation
BRIDGE_HTML = 110        # < 110 (~40%)  html
BRIDGE_TEXT_PDF = 174    # < 174 (~25%)  text pdf (direct join)
BRIDGE_SCANNED = 212     # < 212 (~15%)  scanned pdf   -> OCR
BRIDGE_IMAGE = 238       # < 238 (~10%)  image(s)      -> OCR
#                          else  (~7%)   plain text
BRIDGE_SELECT_PAGES = 51  # second byte < 51 (~20%): page selection on text pdf


def interleave_documents_batch(batch: pa.Table, seed: int = SEED) -> pa.Table:
    """map_batches fn: driver ``documents`` rows -> interleaved DOCS_SCHEMA rows.

    Deterministic per doc_id; the doc's own text is the only content source.
    ~40% html / 25% text-pdf / 15% scanned / 10% image / 7% plain-text,
    ~1% poison, ~2% invalid. Every branch decision derives from
    bridge_roll (sha256 bytes) or the doc's own columns, so archetype,
    status, provider AND per-ref OCR confidence are recomputable in SQL —
    the flagship rollup/confidence oracles depend on this.
    """
    rows = []
    for rec in batch.select(["doc_id", "text", "lang"]).to_pylist():
        did = int(rec["doc_id"])
        doc_id = f"doc-{did:08d}"
        text = rec["text"] or ""
        roll, roll2 = bridge_roll(doc_id, seed)
        spans: list[dict] = []
        mime = "text/html"
        file_size = max(1, len(text))
        start_page = end_page = None
        pages = None

        def span(kind, t=None, m=None):
            spans.append({"kind": kind, "text": t, "media_ref": m, "offset": len(spans)})

        chunks = _chunk_words(text, 12)
        if roll < BRIDGE_POISON:
            mime = "image/png"
            span("image", m=POISON_MARKER)
        elif roll < BRIDGE_INVALID:
            mime = "video/mp4"
            span("text", t=text)
        elif roll < BRIDGE_HTML:
            mime = "text/html"
            html = []
            for j, c in enumerate(chunks):
                if j % 4 == 0:
                    html.append(f"<h2>{c[:40].title()}</h2>")
                    html.append("<script>noise();</script>")
                elif j % 4 == 3 and len(c) > 10:
                    items = "".join(f"<li>{w}</li>" for w in c.split()[:3])
                    html.append(f"<ul>{items}</ul>")
                else:
                    html.append(f"<p>{c}</p>")
            span("html", t="".join(html))
        elif roll < BRIDGE_TEXT_PDF:
            mime = "application/pdf"
            for p, c in enumerate(chunks, start=1):
                span("pdf_page", t=c, m=f"s3://corpus/{doc_id}/page-{p}.pdf")
            if roll2 < BRIDGE_SELECT_PAGES and len(chunks) > 2:
                start_page = 1
                end_page = max(1, len(chunks) - 1)
        elif roll < BRIDGE_SCANNED:
            mime = "application/pdf"
            for p in range(1, min(len(chunks), 4) + 1):
                span("pdf_page", t="", m=f"s3://corpus/{doc_id}/page-{p}.pdf")
        elif roll < BRIDGE_IMAGE:
            mime = "image/png"
            for j in range(1 + did % 3):
                span("image", m=f"s3://corpus/{doc_id}/img-{j}.png")
        else:
            mime = "text/plain"
            span("text", t="\n".join(chunks))

        rows.append(
            {
                "doc_id": doc_id,
                "collection_id": f"col-{did // 8:06d}",
                "spans": spans,
                "mime_type": mime,
                "file_size": file_size,
                "lang": rec["lang"] or "eng",
                "start_page": start_page,
                "end_page": end_page,
                "pages": pages,
            }
        )
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
