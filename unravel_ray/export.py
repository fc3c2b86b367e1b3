"""Export / span-order consumers (S9 + M9/M10 consumers, SURVEY.md §3.3).

The reference renders extracted-or-edited content to DOCX
(DocxExportServiceImpl.java:22-39, DownloadOcrServiceImpl.java:47-80);
python-docx is unavailable here, so the renderers emit plaintext /
markdown with the same ordered-run semantics — the span order IS the
contract. A DOCX backend slots into ``render_spans`` unchanged.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from .functions import docx_filename


def render_spans(spans: list[dict], fmt: str = "text") -> str:
    """Ordered spans -> document string. fmt: 'text' | 'markdown'."""
    parts: list[str] = []
    for s in sorted(spans or [], key=lambda x: x["offset"]):
        kind, text = s.get("kind"), s.get("text") or ""
        if not text:
            continue
        if fmt == "markdown":
            if kind == "heading":
                parts.append(f"# {text}")
            elif kind == "list_item":
                parts.append(f"- {text}")
            else:
                parts.append(text)
        else:
            parts.append(text)
    sep = "\n\n" if fmt == "markdown" else "\n"
    return sep.join(parts)


def render_spans_column(spans_col, fmt: str = "text") -> "pa.Array":
    """Vectorized render_spans over a whole spans column (list<struct>):
    flatten once, prefix heading/list_item texts with Arrow if_else
    (markdown), drop empty texts, rebuild per-doc lists from filtered
    parent indices, and binary_join with the format separator. Assumes
    spans are already offset-ordered (finalize emits them sorted) —
    identical output to per-row render_spans, pinned by
    tests/test_export_sources.py."""
    import numpy as np
    import pyarrow.compute as pc

    arr = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) \
        else spans_col
    n = len(arr)
    values = arr.flatten()
    text = pc.fill_null(values.field("text"), "")
    if fmt == "markdown":
        kind = values.field("kind")
        text = pc.if_else(
            pc.equal(kind, "heading"),
            pc.binary_join_element_wise(
                pa.array(["# "] * len(text)), text, ""),
            pc.if_else(
                pc.equal(kind, "list_item"),
                pc.binary_join_element_wise(
                    pa.array(["- "] * len(text)), text, ""),
                text,
            ),
        )
        # empty-text spans were dropped BEFORE prefixing in the row form
        keep = pc.not_equal(pc.fill_null(values.field("text"), ""), "")
    else:
        keep = pc.not_equal(text, "")
    parent = pc.list_parent_indices(arr)
    kept_parent = parent.filter(keep).to_numpy(zero_copy_only=False)
    kept_text = text.filter(keep)
    counts = np.bincount(kept_parent, minlength=n) if kept_parent.size \
        else np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    lst = pa.ListArray.from_arrays(pa.array(offsets), kept_text)
    sep = "\n\n" if fmt == "markdown" else "\n"
    return pc.binary_join(lst, sep)


def export_documents(extracted: Dataset, fmt: str = "text") -> Dataset:
    """Per-doc rendered export rows: (doc_id, file_name, content, status).

    Only COMPLETED docs render (the reference refuses exports for
    unfinished OCR, DownloadOcrServiceImpl.java:56-63); others carry an
    empty content with their status for accounting.
    """

    import pyarrow.compute as pc

    def render(batch: pa.Table) -> pa.Table:
        rendered = render_spans_column(batch["spans"], fmt)
        completed = pc.equal(batch["status"], "completed")
        content = pc.if_else(completed, rendered, pa.scalar("", pa.string()))
        file_name = pc.binary_join_element_wise(
            pc.cast(batch["doc_id"], pa.string()),
            pa.array([".docx"] * batch.num_rows), "")
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.string()),
            "file_name": file_name,
            "content": content,
            "status": batch["status"],
        })

    return extracted.map_batches(render, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# S9 — real DOCX binary (pure-stdlib OOXML writer; no python-docx needed)
# ---------------------------------------------------------------------------

_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def docx_bytes(spans: list[dict]) -> bytes:
    """Render ordered spans to a minimal valid .docx (OOXML zip built with
    the stdlib only — the sandbox has no python-docx). Mirrors the
    reference's run mapping (DocxExportServiceImpl.java:46-159): headings
    become styled Heading1 paragraphs, list items bulleted-style
    paragraphs ('- ' text prefix; no numbering part in the minimal
    package), everything else plain paragraphs; multi-line text becomes
    one paragraph per line (the reference's line splitter, :28-34)."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    paras: list[str] = []

    def para(text: str, style: str | None = None) -> None:
        ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
        paras.append(
            f"<w:p>{ppr}<w:r><w:t xml:space=\"preserve\">{escape(text)}</w:t></w:r></w:p>"
        )

    for s in sorted(spans or [], key=lambda x: x["offset"]):
        kind, text = s.get("kind"), s.get("text") or ""
        if not text:
            continue
        for line in text.split("\n"):
            if kind == "heading":
                para(line, "Heading1")
            elif kind == "list_item":
                para(f"- {line}", "ListParagraph")
            else:
                para(line)

    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        + "".join(paras)
        + "<w:sectPr/></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _DOCX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _DOCX_RELS)
        z.writestr("word/document.xml", document)
    return buf.getvalue()


def export_docx(extracted: Dataset) -> Dataset:
    """Per-doc DOCX export rows: (doc_id, file_name, docx binary, status).
    Completed docs get real OOXML bytes; others an empty blob with their
    status (the reference refuses exports for unfinished OCR,
    DownloadOcrServiceImpl.java:56-63)."""

    def render(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = {"doc_id": [], "file_name": [], "docx": [], "status": []}
        for r in rows:
            out["doc_id"].append(r["doc_id"])
            out["file_name"].append(docx_filename(f"{r['doc_id']}.src"))
            out["status"].append(r["status"])
            out["docx"].append(
                docx_bytes(r["spans"]) if r["status"] == "completed" else b""
            )
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "file_name": pa.array(out["file_name"], pa.string()),
            "docx": pa.array(out["docx"], pa.binary()),
            "status": pa.array(out["status"], pa.string()),
        })

    return extracted.map_batches(render, batch_format="pyarrow")
