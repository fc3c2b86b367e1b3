"""Page-selection resolver (M3) — pins PdfPageRange.java:60-132 semantics."""

import pytest

from unravel_ray.pages import PageSelectionError, resolve_pages


def test_no_selection_all_pages():
    assert resolve_pages(4) == [0, 1, 2, 3]


def test_range_inclusive_1indexed():
    assert resolve_pages(10, start_page=3, end_page=5) == [2, 3, 4]


def test_range_defaults():
    assert resolve_pages(3, start_page=2) == [1, 2]
    assert resolve_pages(3, end_page=2) == [0, 1]


def test_discrete_dedupe_sort():
    assert resolve_pages(20, pages=[16, 3, 8, 3]) == [2, 7, 15]


def test_discrete_beats_range():
    assert resolve_pages(20, start_page=1, end_page=2, pages=[5]) == [4]


@pytest.mark.parametrize(
    "kw",
    [
        dict(pages=[0]),
        dict(pages=[21]),
        dict(start_page=0),
        dict(end_page=0),
        dict(start_page=5, end_page=3),
        dict(start_page=25),
        dict(end_page=25),
    ],
)
def test_invalid_selections(kw):
    with pytest.raises(PageSelectionError):
        resolve_pages(20, **kw)


def test_error_messages_match_reference_wording():
    with pytest.raises(PageSelectionError, match=r"Page 21 exceeds total pages \(20\)"):
        resolve_pages(20, pages=[21])
    with pytest.raises(PageSelectionError, match=r"startPage \(5\) must be <= endPage \(3\)"):
        resolve_pages(20, start_page=5, end_page=3)
