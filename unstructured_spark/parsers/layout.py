"""Reading-order layout analysis for positioned text (reference
``partition/utils/sorting.py:99-230`` and ``utils/xycut.py:17-213``;
SURVEY §2.6 "reading-order sort" row).

Recursive XY-cut over block bounding boxes: project boxes onto an axis,
find whitespace valleys, split at the widest valley, recurse — columns
read left-to-right, bands top-to-bottom. Pure arithmetic over a page's
few dozen blocks (runs inside the parse UDF; Spark parallelism is
per-document/page above it).

Boxes are (x0, y_top, x1, y_bottom) in top-down page coordinates.
"""

from __future__ import annotations


def _intervals(vals: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Merge (start, end) intervals into disjoint spans."""
    spans: list[list[float]] = []
    for a, b in sorted(vals):
        if spans and a <= spans[-1][1]:
            spans[-1][1] = max(spans[-1][1], b)
        else:
            spans.append([a, b])
    return [(a, b) for a, b in spans]


def _best_gap(
    boxes: list[tuple[float, float, float, float]],
    idxs: list[int],
    axis: int,
    min_gap: float,
) -> float | None:
    """Largest whitespace valley in the projection profile, or None."""
    lo, hi = (0, 2) if axis == 0 else (1, 3)
    spans = _intervals([(boxes[i][lo], boxes[i][hi]) for i in idxs])
    best: tuple[float, float] | None = None
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        gap = b0 - a1
        if gap >= min_gap and (best is None or gap > best[0]):
            best = (gap, (a1 + b0) / 2)
    return best[1] if best else None


def xy_cut_order(
    boxes: list[tuple[float, float, float, float]],
    *,
    min_gap: float = 8.0,
    _depth: int = 0,
) -> list[int]:
    """Indices of `boxes` in reading order (top-to-bottom bands, then
    left-to-right columns inside a band, recursively)."""
    idxs = list(range(len(boxes)))

    def rec(idxs: list[int], depth: int) -> list[int]:
        if len(idxs) <= 1 or depth > 24:
            return sorted(idxs, key=lambda i: (boxes[i][1], boxes[i][0]))
        # horizontal band split first (reading flows down the page)
        cut = _best_gap(boxes, idxs, axis=1, min_gap=min_gap)
        if cut is not None:
            top = [i for i in idxs if boxes[i][1] < cut]
            bot = [i for i in idxs if boxes[i][1] >= cut]
            if top and bot:
                return rec(top, depth + 1) + rec(bot, depth + 1)
        # then column split (left column read fully before right)
        cut = _best_gap(boxes, idxs, axis=0, min_gap=min_gap)
        if cut is not None:
            left = [i for i in idxs if boxes[i][0] < cut]
            right = [i for i in idxs if boxes[i][0] >= cut]
            if left and right:
                return rec(left, depth + 1) + rec(right, depth + 1)
        return sorted(idxs, key=lambda i: (boxes[i][1], boxes[i][0]))

    return rec(idxs, _depth)


def basic_order(
    boxes: list[tuple[float, float, float, float]],
) -> list[int]:
    """Reference's ``basic`` sort mode: top-left (y, x) ordering
    (sorting.py:99-130)."""
    return sorted(
        range(len(boxes)), key=lambda i: (boxes[i][1], boxes[i][0])
    )
