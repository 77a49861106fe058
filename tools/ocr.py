#!/usr/bin/env python
"""Drop-in CLI for the reference's ``ocr`` binary (main/main.c:119-231).

Same single-letter flags, same defaults, same output shape — a user of
the reference can point their existing invocation here:

    python tools/ocr.py -f fontData/kafka.data -H 600 -W 600 -d 10 \
        -w 3 -h 2 -x -i -p 1.8 -s 0.4 -A -m 1.1 page.tif [more.tif ...]

Each image's assembled text prints to stdout in argument order; ``-T``
prints the glyph feature dump (27 floats + kNN-label-or-XX per glyph,
main/kd.c:225-235) instead of text; ``-P file`` consumes labels
positionally from a prediction file (main/kd.c:182-223).  Reads any TIFF
the engine decodes (uncompressed/PackBits/G4/LZW, multi-page) plus the
OCR1/OCR8 fixture codec.

Batch corpora should use tools/run_job.py (checkpointed, distributed);
this tool is the reference-shaped single-process path and needs no Ray.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("-f", dest="font", default=None,
                    help="font .data file (reference format)")
    ap.add_argument("-T", dest="tensor_dump", action="store_true")
    ap.add_argument("-P", dest="predictions", default=None)
    ap.add_argument("-t", dest="text", action="store_true",
                    help="print text (default on here)")
    ap.add_argument("-h", dest="min_h", type=int, default=10)
    ap.add_argument("-w", dest="min_w", type=int, default=10)
    ap.add_argument("-H", dest="max_h", type=int, default=150)
    ap.add_argument("-W", dest="max_w", type=int, default=150)
    ap.add_argument("-s", dest="space_fraction", type=float, default=0.60)
    ap.add_argument("-m", dest="min_match", type=float, default=0.9)
    ap.add_argument("-g", dest="good_match", type=float, default=0.40)
    ap.add_argument("-p", dest="splittable", type=float, default=1.10)
    ap.add_argument("-c", dest="columns", type=int, default=1)
    ap.add_argument("-i", dest="ignore_vertical", action="store_true")
    ap.add_argument("-S", dest="no_shear", action="store_true")
    ap.add_argument("-L", dest="slant", type=float, default=3.65)
    ap.add_argument("-x", dest="use_flood", action="store_true")
    ap.add_argument("-C", dest="cutoff", type=float, default=0.50)
    ap.add_argument("-X", dest="no_combine", action="store_true")
    ap.add_argument("-A", dest="combine_overlaps", action="store_true")
    ap.add_argument("-d", dest="min_area", type=int, default=1)
    ap.add_argument("--help", action="help")
    ap.add_argument("images", nargs="+")
    args = ap.parse_args()

    from tensorflow_ocr_ray.config import TF_UNKNOWN, OCRFAILS, OcrConfig
    from tensorflow_ocr_ray.core.page import ocr_payload

    cfg = OcrConfig(
        min_glyph_width=args.min_w, min_glyph_height=args.min_h,
        max_glyph_width=args.max_w, max_glyph_height=args.max_h,
        min_glyph_area=args.min_area, min_match=args.min_match,
        good_match=args.good_match, space_fraction=args.space_fraction,
        splittable=args.splittable, cutoff=args.cutoff,
        columns=args.columns, ignore_vertical=args.ignore_vertical,
        no_shear=args.no_shear, slant=args.slant,
        use_flood=args.use_flood, may_combine=not args.no_combine,
        always_combine=args.combine_overlaps,
    )
    if args.font:
        from tensorflow_ocr_ray.sources.fontdata import read_data_file

        index = read_data_file(args.font)
    else:
        from tensorflow_ocr_ray.fonts import get_font_index

        index = get_font_index()

    predictions = None
    if args.predictions:
        with open(args.predictions, encoding="utf-8") as f:
            predictions = [line.rstrip("\n") for line in f]

    cursor = 0
    for path in args.images:
        with open(path, "rb") as f:
            payload = f.read()
        res = ocr_payload(
            payload, cfg, index,
            collect_glyphs=args.tensor_dump,
            predictions=predictions[cursor:] if predictions else None,
        )
        cursor += res.n_glyphs
        if args.tensor_dump:
            for g in res.glyphs:
                feats = ",".join(f"{v:0.3f}" for v in g.features)
                label = TF_UNKNOWN if g.label == OCRFAILS else g.label
                sys.stdout.write(f"{feats},{label}\n")
        else:
            sys.stdout.write(res.text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
