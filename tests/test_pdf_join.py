"""PDF page-join semantics (M1/M2) — pins PdfTextExtractor.java:95-143."""

from unravel_ray.pdftext import join_direct, join_ocr, needs_ocr_mode


def test_direct_separator_between_pages():
    pages = [(1, "alpha"), (2, "beta"), (3, "gamma")]
    assert join_direct(pages) == "alpha\n--- Page 2 ---\nbeta\n--- Page 3 ---\ngamma"


def test_direct_no_header_before_first_page():
    assert join_direct([(1, "only")]) == "only"


def test_direct_blank_pages_skipped_and_separator_numbering():
    # blank page 2 skipped entirely; separator carries the appended page's number
    pages = [(1, "a"), (2, "   "), (3, "c")]
    assert join_direct(pages) == "a\n--- Page 3 ---\nc"


def test_direct_first_nonblank_not_prefixed():
    pages = [(1, ""), (2, "b"), (3, "c")]
    assert join_direct(pages) == "b\n--- Page 3 ---\nc"


def test_direct_per_page_strip():
    assert join_direct([(1, "  x  \n"), (2, "\ty\n")]) == "x\n--- Page 2 ---\ny"


def test_ocr_mode_keeps_blank_pages():
    pages = [(1, "a"), (2, ""), (3, "c")]
    assert join_ocr(pages) == "a\n--- Page 2 ---\n\n--- Page 3 ---\nc"


def test_ocr_leading_blank_pages_emit_no_separator():
    # combinedText.isEmpty() gate (PdfTextExtractor.java:136): blank first
    # OCR page(s) must not produce a leading separator
    assert join_ocr([(1, ""), (2, "b"), (3, "c")]) == "b\n--- Page 3 ---\nc"
    assert join_ocr([(1, ""), (2, "  ")]) == ""
    assert join_ocr([(1, None), (2, None), (3, "z")]) == "z"


def test_needs_ocr_only_when_all_blank():
    assert needs_ocr_mode([(1, ""), (2, "  ")])
    assert not needs_ocr_mode([(1, ""), (2, "x")])


def test_page_selection_numbers_survive_in_separators():
    # selected pages 3 and 8 of a larger doc
    assert join_direct([(3, "p3"), (8, "p8")]) == "p3\n--- Page 8 ---\np8"
