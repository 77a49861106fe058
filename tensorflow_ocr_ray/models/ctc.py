"""Sliding-window line recognition with CTC-style greedy decoding.

The north star's conv path: instead of explicit glyph segmentation, slide
a fixed window along each text line, classify every window with the conv
model (``models/cnn.py``), and greedily collapse the per-step label
sequence — emit a label when it changes, treat low-ink / low-confidence
steps as CTC blanks, merge repeats unless separated by a blank.

This is an ALTERNATIVE recognition path (the default engine reproduces
the reference's explicit segmentation, which is the correctness oracle);
it exists so the conv scorer can run segmentation-free, the way a
CRNN/CTC OCR stack would, and is exercised on fixture lines in tests.
"""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_ray.models.cnn import CnnModel

BLANK = ""  # the CTC blank class


def _window_at(strip: np.ndarray, left: int, size: int) -> np.ndarray:
    """Square (line-height) window at ``left``, zero-padded at the edges,
    resampled to the model input size."""
    from tensorflow_ocr_ray.core.raster import glyph_windows

    h, w = strip.shape
    pad = np.zeros((h, h), dtype=np.uint8)
    lo, hi = max(left, 0), min(left + h, w)
    if hi > lo:
        pad[:, lo - left : hi - left] = strip[:, lo:hi]
    return glyph_windows(pad, [(0, h, 0, h)], size=size)[0]


def train_window_model(
    epochs: int = 60, seed: int = 31, size: int = 24
) -> CnnModel:
    """Train the conv model on WINDOW-shaped samples: each vocab letter
    rendered inside a line-height strip, windows centered on the letter
    (with small shifts) labeled with it; empty and half-letter windows
    labeled BLANK.  This is what makes sliding-window decoding work — a
    model trained on stretched full-glyph crops is out-of-distribution on
    windows."""
    from tensorflow_ocr_ray.fonts import (
        NOMINAL_CELL_ROWS,
        DEFAULT_SCALE,
        font_labels,
        glyph_bitmap,
        glyph_cell_top_offset,
    )

    hline = NOMINAL_CELL_ROWS * DEFAULT_SCALE
    wins, labels = [], []
    for label in font_labels():
        bmp = glyph_bitmap(label)
        bh, bw = bmp.shape
        top = glyph_cell_top_offset(label)
        strip = np.zeros((hline, bw + 2 * hline), dtype=np.uint8)
        strip[top : top + bh, hline : hline + bw] = bmp
        # dense shifts: the letter label ONLY when (near-)centered; every
        # off-center window — letter partially in frame — is a blank, so
        # the decoder emits exactly one run per letter
        center_left = hline + bw // 2 - hline // 2
        for shift in range(-hline + 2, hline - 1, 2):
            wins.append(_window_at(strip, center_left + shift, size))
            labels.append(label if abs(shift) <= 3 else BLANK)
    # pure-white blanks
    empty = np.zeros((hline, hline), dtype=np.uint8)
    for _ in range(6):
        wins.append(_window_at(empty, 0, size))
        labels.append(BLANK)
    # two-letter straddle windows (right edge of one + left edge of the
    # next) are the classic CTC insertion error — teach them as blanks
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab_list = font_labels()
    for _ in range(250):
        a = vocab_list[int(rng.integers(0, len(vocab_list)))]
        b = vocab_list[int(rng.integers(0, len(vocab_list)))]
        gap = int(rng.integers(3, 14))
        ba, bb = glyph_bitmap(a), glyph_bitmap(b)
        ta, tb = glyph_cell_top_offset(a), glyph_cell_top_offset(b)
        w = ba.shape[1] + gap + bb.shape[1]
        strip = np.zeros((hline, w + 2 * hline), dtype=np.uint8)
        strip[ta : ta + ba.shape[0], hline : hline + ba.shape[1]] = ba
        x2 = hline + ba.shape[1] + gap
        strip[tb : tb + bb.shape[0], x2 : x2 + bb.shape[1]] = bb
        boundary = hline + ba.shape[1] + gap // 2
        for off in (-3, 0, 3):
            wins.append(
                _window_at(strip, boundary - hline // 2 + off, size)
            )
            labels.append(BLANK)
    vocab = sorted(set(labels))
    model = CnnModel(vocab, seed=seed)
    model.fit(np.stack(wins), labels, epochs=epochs)
    return model


class SlidingWindowDecoder:
    def __init__(
        self,
        model: CnnModel,
        stride: int = 2,
        min_ink: float = 0.04,
        min_prob: float = 0.5,
    ):
        self.model = model
        self.stride = stride
        self.min_ink = min_ink
        self.min_prob = min_prob

    def line_windows(self, strip: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Square windows (side = line height) at ``stride`` along the
        strip, resampled to the model's input size."""
        from tensorflow_ocr_ray.core.raster import glyph_windows

        h, w = strip.shape
        lefts = np.arange(0, max(w - h, 0) + 1, self.stride)
        boxes = [(int(x), int(x) + h, 0, h) for x in lefts]
        return glyph_windows(strip, boxes, size=self.model.SIZE), lefts

    def decode_line(self, strip: np.ndarray) -> str:
        """Greedy CTC collapse over the window label sequence: the model's
        BLANK class separates letters; consecutive repeats merge; a
        low-ink window is blank regardless (pure white never votes)."""
        return "".join(label for label, _ in self.decode_line_emits(strip))

    def decode_line_emits(self, strip: np.ndarray) -> list[tuple[str, int]]:
        """Greedy collapse returning (label, emit_left_px) pairs — the
        positional info assembly needs for space insertion."""
        wins, lefts = self.line_windows(strip)
        if not len(wins):
            return []
        ink = wins.mean(axis=(1, 2))
        probs = self.model.predict_proba(wins)
        best = probs.argmax(axis=1)
        conf = probs[np.arange(len(best)), best]
        out: list[tuple[str, int]] = []
        prev_emit: str | None = None
        for i in range(len(wins)):
            label = self.model.vocab[best[i]]
            blank = (
                label == BLANK
                or ink[i] < self.min_ink
                or conf[i] < self.min_prob
            )
            if blank:
                prev_emit = None
                continue
            if label != prev_emit:
                out.append((label, int(lefts[i])))
            prev_emit = label
        return out

    def decode_page(
        self, image: np.ndarray, space_gap_frac: float = 1.2
    ) -> str:
        """Whole-page decode: line strips = maximal non-blank row runs
        (the segmentation-free line finder), one decoded line each."""
        nz = np.nonzero(image.any(axis=1))[0]
        if not len(nz):
            return ""
        breaks = np.nonzero(np.diff(nz) > 1)[0]
        starts = np.concatenate(([nz[0]], nz[breaks + 1]))
        ends = np.concatenate((nz[breaks], [nz[-1]]))
        lines = []
        for r0, r1 in zip(starts, ends):
            strip = image[r0 : r1 + 1]
            cols = np.nonzero(strip.any(axis=0))[0]
            strip = strip[:, max(cols[0] - 2, 0) : cols[-1] + 3]
            lines.append(self.decode_line_text(strip, space_gap_frac))
        return "\n".join(lines) + "\n"

    def decode_line_text(
        self, strip: np.ndarray, space_gap_frac: float = 1.2
    ) -> str:
        """decode_line + space insertion: emit positions more than
        ``space_gap_frac x line_height`` apart get a space between them
        (window emissions happen at letter centers, so adjacent letters
        sit ~one window apart and word gaps farther)."""
        emits = self.decode_line_emits(strip)
        if not emits:
            return ""
        h = strip.shape[0]
        parts = [emits[0][0]]
        for (label, left), (_, prev_left) in zip(emits[1:], emits):
            if left - prev_left > space_gap_frac * h:
                parts.append(" ")
            parts.append(label)
        return "".join(parts)
