"""Reference-shaped `ocr` CLI (tools/ocr.py): same flags, same output."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "tools", "ocr.py")
FIXTURE_FLAGS = ["-w", "3", "-h", "3", "-d", "9", "-S"]


def _render(ref: str):
    from tensorflow_ocr_ray.fixtures import page_spec_for_ref, render_page

    spec = page_spec_for_ref(ref)
    return spec, render_page(spec)


def test_cli_text_matches_analytic_truth(tmp_path):
    from tensorflow_ocr_ray.core.raster import encode_tiff
    from tensorflow_ocr_ray.fixtures import expected_page_text

    spec, img = _render("page-42-000002-0")
    p = str(tmp_path / "page.tif")
    open(p, "wb").write(encode_tiff(img, bilevel=True, compression="g4"))
    out = subprocess.run([sys.executable, CLI, *FIXTURE_FLAGS, p],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout == expected_page_text(spec)


def test_cli_multipage_and_tensor_dump(tmp_path):
    from tensorflow_ocr_ray.core.raster import encode_tiff_multi
    from tensorflow_ocr_ray.fixtures import expected_page_text

    s1, i1 = _render("page-42-000002-0")
    s2, i2 = _render("page-42-000003-0")
    p = str(tmp_path / "two.tif")
    open(p, "wb").write(
        encode_tiff_multi([i1, i2], bilevel=True, compression="lzw")
    )
    out = subprocess.run([sys.executable, CLI, *FIXTURE_FLAGS, p],
                         capture_output=True, text=True)
    assert out.stdout == expected_page_text(s1) + expected_page_text(s2)
    dump = subprocess.run([sys.executable, CLI, "-T", *FIXTURE_FLAGS, p],
                          capture_output=True, text=True)
    lines = dump.stdout.strip().splitlines()
    assert lines and all(len(l.split(",")) == 28 for l in lines)
