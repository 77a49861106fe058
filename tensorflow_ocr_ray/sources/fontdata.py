"""Reference-format font database I/O (``.data`` files).

Format (``main/kd.c:520-548, 645-724``): one line per labeled tuple — 27
fields printed ``%0.3f `` followed by the UTF-8 label (which may itself be
multi-character, e.g. ``rn``).  On disk the last two dims are stored ÷3
(outTree "removes normalization", kd.c:528); ``readTuples`` multiplies them
back ×3 after reading (normalizeTuple, kd.c:687).  We read with whitespace
splitting (the C uses fscanf " %f"), which also tolerates the fixed-width
161/162-byte layout the reference's Python parsers hard-code.
"""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_ray.config import GRID, TUPLELENGTH
from tensorflow_ocr_ray.core.knn import FontIndex


def read_data_file(path: str) -> FontIndex:
    tuples: list[np.ndarray] = []
    labels: list[str] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < TUPLELENGTH + 1:
                continue
            tup = np.array(
                [np.float32(x) for x in parts[:TUPLELENGTH]], dtype=np.float32
            )
            # normalizeTuple (kd.c:639-643)
            tup[GRID * GRID] *= np.float32(3)
            tup[GRID * GRID + 1] *= np.float32(3)
            tuples.append(tup)
            # label = everything after the 27 floats (labels contain no
            # spaces in the reference corpus; fscanf %s reads one token)
            labels.append(parts[TUPLELENGTH])
    if not tuples:
        return FontIndex.empty()
    return FontIndex(np.stack(tuples), labels)


def write_data_file(path: str, index: FontIndex) -> None:
    """writeTuples/outTree (kd.c:520-548): ÷3 un-normalization, %0.3f."""
    with open(path, "w", encoding="utf-8") as f:
        for tup, label in zip(index.tuples, index.labels):
            fields = []
            for i in range(TUPLELENGTH):
                v = float(tup[i])
                if i >= GRID * GRID:
                    v /= 3  # remove normalization
                fields.append(f"{v:.3f}")
            f.write(" ".join(fields) + " " + label + "\n")


def font_index_to_parquet(index: FontIndex, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "label": pa.array(index.labels, type=pa.string()),
            "features": pa.array(
                [tup.tolist() for tup in index.tuples],
                type=pa.list_(pa.float32(), TUPLELENGTH),
            ),
        }
    )
    pq.write_table(t, path)


def parquet_to_font_index(path: str) -> FontIndex:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    labels = t.column("label").to_pylist()
    feats = t.column("features")
    if len(labels) == 0:
        return FontIndex.empty()
    tuples = np.asarray(feats.combine_chunks().flatten(), dtype=np.float32)
    return FontIndex(tuples.reshape(len(labels), TUPLELENGTH), labels)
