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


def export_documents(extracted: Dataset, fmt: str = "text") -> Dataset:
    """Per-doc rendered export rows: (doc_id, file_name, content, status).

    Only COMPLETED docs render (the reference refuses exports for
    unfinished OCR, DownloadOcrServiceImpl.java:56-63); others carry an
    empty content with their status for accounting.
    """

    def render(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = {"doc_id": [], "file_name": [], "content": [], "status": []}
        for r in rows:
            out["doc_id"].append(r["doc_id"])
            out["file_name"].append(docx_filename(f"{r['doc_id']}.src"))
            out["status"].append(r["status"])
            out["content"].append(
                render_spans(r["spans"], fmt) if r["status"] == "completed" else ""
            )
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "file_name": pa.array(out["file_name"], pa.string()),
            "content": pa.array(out["content"], pa.string()),
            "status": pa.array(out["status"], pa.string()),
        })

    return extracted.map_batches(render, batch_format="pyarrow")
