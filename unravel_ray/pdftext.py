"""PDF page-text combination semantics (operators M1/M2, SURVEY.md §2.2).

Behavioral contract (reference ocrprocessing/utils/PdfTextExtractor.java:95-143):

Direct-text mode (text-based PDFs):
* Iterate selected pages in ascending order.
* A page whose text is None or blank is skipped entirely.
* Each contributing page's text is ``str.strip()``-ed.
* Before appending a page to a non-empty accumulator, append the separator
  ``"\\n--- Page {n} ---\\n"`` where ``n`` is the 1-indexed page number of
  the page being appended. No separator before the first contributing page.

OCR mode (scanned PDFs — used when direct mode yields only blank text):
* Every selected page contributes (no blank-skip), same separator and
  per-page strip rules.

The direct-vs-OCR decision itself
(PdfTextExtractor.java:66-78): try direct first; fall back to OCR only if
the combined direct text is blank.
"""

from __future__ import annotations

from typing import Iterable


def _is_blank(s: str | None) -> bool:
    return s is None or s.strip() == ""


def join_direct(pages: Iterable[tuple[int, str | None]]) -> str:
    """Combine (1-indexed page number, page text) pairs in direct-text mode.

    Blank pages are skipped; separator carries the appended page's number.
    """
    out: list[str] = []
    for page_no, text in pages:
        if _is_blank(text):
            continue
        if out:
            out.append(f"\n--- Page {page_no} ---\n")
        out.append(text.strip())
    return "".join(out)


def join_ocr(pages: Iterable[tuple[int, str | None]]) -> str:
    """Combine OCR page texts — every page contributes, even blank ones.

    The separator gate checks accumulated TEXT emptiness (any(out)), not
    list emptiness, matching the reference's combinedText.isEmpty() check
    (PdfTextExtractor.java:136): leading blank OCR pages emit no separator.
    """
    out: list[str] = []
    for page_no, text in pages:
        if any(out):
            out.append(f"\n--- Page {page_no} ---\n")
        out.append((text or "").strip())
    return "".join(out)


def needs_ocr_mode(pages: Iterable[tuple[int, str | None]]) -> bool:
    """True when direct extraction would yield blank text for every page."""
    return _is_blank(join_direct(pages))
