"""Training / template sidecar I/O (reference S6/S7, joins J2/J3).

Format (``main/training.c:33-109``, ``main/template.c:32-109``): one line
per labeled glyph — ``left right top bottom label``.  ``writeTraining``
emits only glyphs whose NN distance is ≤ 0.001 (exact-match training
members); ``readTraining`` re-associates each line with the current page's
glyph at (left, top) via ``glyphAtXY`` and inserts its tuple into a fresh
tree, suppressing exact-duplicate tuples (``closestMatch != 0``,
training.c:101-105).  ``readTemplate`` (template.c:49-78) instead matches
lines by their ``left right top bottom `` bbox *prefix string* and inserts
into the existing tree.

Ray mapping: the sidecar is a small broadcast table; the glyph join runs
as a dict lookup inside the caller's batch stage.  A parquet twin of the
text format is provided for pipeline use.
"""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_ray.core.knn import FontIndex, has_rtl


def training_records(
    glyphs: list,
    index: FontIndex,
    tol: float = 0.001,
) -> list[tuple[int, int, int, int, str]]:
    """writeTraining's selection: glyphs whose NN distance ≤ tol, labeled
    with their nearest font entry.  ``glyphs`` is any iterable with
    ``left/right/top/bottom`` attrs and a ``features``/``tuple`` array."""
    out = []
    feats, boxes = [], []
    for g in glyphs:
        tup = getattr(g, "features", None)
        if tup is None:
            tup = getattr(g, "tuple", None)
        if tup is None or not np.all(np.isfinite(tup)):
            continue
        feats.append(np.asarray(tup, dtype=np.float32))
        boxes.append((g.left, g.right, g.top, g.bottom))
    if not feats:
        return out
    idx, d2 = index.nearest(np.stack(feats))
    dist = np.sqrt(d2)
    for (box, i, d) in zip(boxes, idx, dist):
        if i >= 0 and d <= tol:
            out.append((*box, index.labels[int(i)]))
    return out


def write_training_file(path: str, records) -> None:
    """The text sidecar: ``%d %d %d %d %s`` per line (training.c:53-58)."""
    with open(path, "w", encoding="utf-8") as f:
        for left, right, top, bottom, label in records:
            f.write(f"{left} {right} {top} {bottom} {label}\n")


def read_training_file(path: str) -> list[tuple[int, int, int, int, str]]:
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 5:
                # fscanf %s: the label is one whitespace-free token
                out.append(
                    (int(parts[0]), int(parts[1]), int(parts[2]),
                     int(parts[3]), parts[4])
                )
    return out


def apply_training(
    records,
    glyphs: list,
) -> FontIndex:
    """readTraining (training.c:70-109): build a FRESH index from the
    sidecar's labels attached to the current glyphs' tuples, joined by the
    (left, top) point lookup, exact-duplicate tuples suppressed.

    Returns the new FontIndex (the reference replaces the process-global
    ``categorization``; distributed, the result is broadcast to actors)."""
    by_corner: dict[tuple[int, int], np.ndarray] = {}
    for g in glyphs:
        tup = getattr(g, "features", None)
        if tup is None:
            tup = getattr(g, "tuple", None)
        if tup is not None and np.all(np.isfinite(tup)):
            by_corner[(g.left, g.top)] = np.asarray(tup, dtype=np.float32)
    tuples: list[np.ndarray] = []
    labels: list[str] = []
    seen: set[bytes] = set()
    for left, right, top, bottom, label in records:
        tup = by_corner.get((left, top))
        if tup is None:
            continue  # "does not correspond to a glyph" (training.c:88-92)
        key = tup.tobytes()
        if key in seen:
            continue  # duplicate suppression (closestMatch == 0)
        seen.add(key)
        tuples.append(tup)
        labels.append(label)
    if not tuples:
        return FontIndex.empty()
    return FontIndex(np.stack(tuples), labels)


def apply_template(
    records,
    glyphs: list,
    base: FontIndex,
) -> FontIndex:
    """readTemplate (template.c:49-78): bbox-prefix match against the
    template lines; matched labels' tuples are ADDED to the existing index
    (the template path augments rather than replaces)."""
    by_box = {
        (r[0], r[1], r[2], r[3]): r[4] for r in records
    }
    tuples = [t for t in base.tuples]
    labels = list(base.labels)
    for g in glyphs:
        tup = getattr(g, "features", None)
        if tup is None:
            tup = getattr(g, "tuple", None)
        if tup is None or not np.all(np.isfinite(tup)):
            continue
        label = by_box.get((g.left, g.right, g.top, g.bottom))
        if label is not None:
            tuples.append(np.asarray(tup, dtype=np.float32))
            labels.append(label)
    if not tuples:
        return FontIndex.empty()
    return FontIndex(np.stack(tuples), labels)


def records_to_parquet(path: str, records) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "left": pa.array([r[0] for r in records], type=pa.int32()),
                "right": pa.array([r[1] for r in records], type=pa.int32()),
                "top": pa.array([r[2] for r in records], type=pa.int32()),
                "bottom": pa.array([r[3] for r in records], type=pa.int32()),
                "label": pa.array([r[4] for r in records], type=pa.string()),
            }
        ),
        path,
    )


def parquet_to_records(path: str) -> list[tuple[int, int, int, int, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    return list(
        zip(
            t.column("left").to_pylist(),
            t.column("right").to_pylist(),
            t.column("top").to_pylist(),
            t.column("bottom").to_pylist(),
            t.column("label").to_pylist(),
        )
    )
