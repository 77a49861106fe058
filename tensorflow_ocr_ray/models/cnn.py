"""Conv glyph classifier — the north star's LeNet-style path, pure numpy.

The reference ships a LeNet CNN wired only to MNIST
(``main/team8/cnn_mnist.py:12-74``: conv5x5x32 → maxpool2 → conv5x5x64 →
maxpool2 → dense1024 (dropout .4) → logits); it never reaches the glyph
pipeline.  Here the same shape (narrower, fitting the tiny rendered-font
vocabulary) runs over fixed glyph windows as a first-class scorer:
``conv5x5xC1 → maxpool2 → conv5x5xC2 → maxpool2 → dense → softmax`` on
(24, 24) windows (``core.raster.glyph_windows``).  Forward + backward are
im2col matmuls; no TF in the container.  In a GPU deployment this actor
sets ``num_gpus`` and swaps the matmuls for a device library — the
Ray-side plumbing (weights broadcast once per actor, batched windows in,
labels out) is identical.
"""

from __future__ import annotations

import numpy as np


def _im2col(x: np.ndarray, k: int) -> np.ndarray:
    """(N, H, W, C) -> (N, H-k+1, W-k+1, k*k*C) sliding windows."""
    n, h, w, c = x.shape
    oh, ow = h - k + 1, w - k + 1
    s0, s1, s2, s3 = x.strides
    cols = np.lib.stride_tricks.as_strided(
        x, (n, oh, ow, k, k, c), (s0, s1, s2, s1, s2, s3), writeable=False
    )
    return cols.reshape(n, oh, ow, k * k * c)


def _maxpool2(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n, h, w, c = x.shape
    x4 = x[:, : h // 2 * 2, : w // 2 * 2, :].reshape(n, h // 2, 2, w // 2, 2, c)
    flat = x4.transpose(0, 1, 3, 5, 2, 4).reshape(n, h // 2, w // 2, c, 4)
    arg = flat.argmax(axis=-1)
    return flat.max(axis=-1), arg


class CnnModel:
    SIZE = 24

    def __init__(self, vocab: list[str], c1: int = 8, c2: int = 16,
                 hidden: int = 64, seed: int = 2024):
        self.vocab = list(vocab)
        v = len(self.vocab)
        rng = np.random.Generator(np.random.PCG64(seed))
        k = 5
        # flat spatial size after conv(5)→pool2→conv(5)→pool2 on 24x24:
        # 24→20→10→6→3
        flat = 3 * 3 * c2
        def glorot(shape, fan_in, fan_out):
            lim = np.sqrt(6.0 / (fan_in + fan_out))
            return rng.uniform(-lim, lim, shape).astype(np.float32)
        self.K1 = glorot((k * k * 1, c1), k * k, c1)
        self.b1 = np.zeros(c1, dtype=np.float32)
        self.K2 = glorot((k * k * c1, c2), k * k * c1, c2)
        self.b2 = np.zeros(c2, dtype=np.float32)
        self.W3 = glorot((flat, hidden), flat, hidden)
        self.b3 = np.zeros(hidden, dtype=np.float32)
        self.W4 = glorot((hidden, v), hidden, v)
        self.b4 = np.zeros(v, dtype=np.float32)

    # ---------------- forward ---------------------------------------------
    def _forward(self, x: np.ndarray):
        x = x.reshape(-1, self.SIZE, self.SIZE, 1).astype(np.float32)
        col1 = _im2col(x, 5)
        z1 = col1 @ self.K1 + self.b1
        a1 = np.maximum(z1, 0)
        p1, arg1 = _maxpool2(a1)
        col2 = _im2col(p1, 5)
        z2 = col2 @ self.K2 + self.b2
        a2 = np.maximum(z2, 0)
        p2, arg2 = _maxpool2(a2)
        flat = p2.reshape(p2.shape[0], -1)
        h = np.maximum(flat @ self.W3 + self.b3, 0)
        logits = h @ self.W4 + self.b4
        cache = (x, col1, z1, a1, p1, arg1, col2, z2, a2, p2, arg2, flat, h)
        return logits, cache

    def predict_proba(self, windows: np.ndarray) -> np.ndarray:
        z, _ = self._forward(np.asarray(windows))
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def predict(self, windows: np.ndarray) -> list[str]:
        p = self.predict_proba(windows)
        return [self.vocab[i] for i in np.argmax(p, axis=1)]

    # ---------------- training --------------------------------------------
    def fit(self, windows: np.ndarray, labels: list[str], epochs: int = 30,
            batch_size: int = 32, lr: float = 1e-3, seed: int = 5) -> float:
        x = np.asarray(windows, dtype=np.float32)
        lab2id = {l: i for i, l in enumerate(self.vocab)}
        y = np.array([lab2id[l] for l in labels], dtype=np.int64)
        rng = np.random.Generator(np.random.PCG64(seed))
        params = [self.K1, self.b1, self.K2, self.b2,
                  self.W3, self.b3, self.W4, self.b4]
        m = [np.zeros_like(p) for p in params]
        v = [np.zeros_like(p) for p in params]
        b1m, b2m, eps = 0.9, 0.999, 1e-7
        t = 0
        n = x.shape[0]
        for _ in range(epochs):
            order = rng.permutation(n)
            for s in range(0, n, batch_size):
                idx = order[s : s + batch_size]
                logits, cache = self._forward(x[idx])
                (xb, col1, z1, a1, p1, arg1, col2, z2, a2, p2, arg2,
                 flat, h) = cache
                yb = y[idx]
                z = logits - logits.max(axis=1, keepdims=True)
                e = np.exp(z)
                p = e / e.sum(axis=1, keepdims=True)
                g = p
                g[np.arange(len(yb)), yb] -= 1.0
                g /= len(yb)
                gW4 = h.T @ g
                gb4 = g.sum(0)
                gh = g @ self.W4.T
                gh[h <= 0] = 0
                gW3 = flat.T @ gh
                gb3 = gh.sum(0)
                gflat = (gh @ self.W3.T).reshape(p2.shape)
                # unpool 2 (route gradient to argmax cell)
                ga2 = self._unpool(gflat, arg2, a2.shape)
                ga2[z2 <= 0] = 0
                gK2 = col2.reshape(-1, col2.shape[-1]).T @ ga2.reshape(-1, ga2.shape[-1])
                gb2 = ga2.sum((0, 1, 2))
                gcol2 = ga2 @ self.K2.T
                gp1 = self._col2im(gcol2, p1.shape, 5)
                ga1 = self._unpool(gp1, arg1, a1.shape)
                ga1[z1 <= 0] = 0
                gK1 = col1.reshape(-1, col1.shape[-1]).T @ ga1.reshape(-1, ga1.shape[-1])
                gb1 = ga1.sum((0, 1, 2))
                t += 1
                for p_, g_, m_, v_ in zip(
                    params, [gK1, gb1, gK2, gb2, gW3, gb3, gW4, gb4], m, v
                ):
                    m_ *= b1m
                    m_ += (1 - b1m) * g_
                    v_ *= b2m
                    v_ += (1 - b2m) * g_ * g_
                    p_ -= lr * (m_ / (1 - b1m**t)) / (
                        np.sqrt(v_ / (1 - b2m**t)) + eps
                    )
        return float(np.mean(np.array(self.predict(x)) == np.array(labels)))

    @staticmethod
    def _unpool(grad, arg, shape):
        n, oh, ow, c = grad.shape
        out = np.zeros((n, oh, ow, c, 4), dtype=np.float32)
        ii = np.indices((n, oh, ow, c))
        out[ii[0], ii[1], ii[2], ii[3], arg] = grad
        out = out.reshape(n, oh, ow, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
        full = np.zeros(shape, dtype=np.float32)
        full[:, : oh * 2, : ow * 2, :] = out.reshape(n, oh * 2, ow * 2, c)
        return full

    @staticmethod
    def _col2im(gcol, in_shape, k):
        """Scatter im2col-gradients back to the input feature map."""
        n, h, w, c = in_shape
        oh, ow = h - k + 1, w - k + 1
        g6 = gcol.reshape(n, oh, ow, k, k, c)
        out = np.zeros(in_shape, dtype=np.float32)
        for dy in range(k):
            for dx in range(k):
                out[:, dy : dy + oh, dx : dx + ow, :] += g6[:, :, :, dy, dx, :]
        return out

    # ---------------- (de)serialization ------------------------------------
    def to_state(self) -> dict:
        return {
            "vocab": self.vocab, "K1": self.K1, "b1": self.b1,
            "K2": self.K2, "b2": self.b2, "W3": self.W3, "b3": self.b3,
            "W4": self.W4, "b4": self.b4,
        }

    @classmethod
    def from_state(cls, state: dict) -> "CnnModel":
        model = cls(
            state["vocab"],
            c1=state["K1"].shape[1],
            c2=state["K2"].shape[1],
            hidden=state["W3"].shape[1],
        )
        for name in ("K1", "b1", "K2", "b2", "W3", "b3", "W4", "b4"):
            setattr(model, name, state[name])
        return model


def train_on_font_windows(epochs: int = 40, seed: int = 2024):
    """Train the conv scorer on the built-in font's rendered glyph windows
    (each label rendered at its natural size, resampled to 24x24)."""
    from tensorflow_ocr_ray.core.raster import glyph_windows
    from tensorflow_ocr_ray.fonts import font_labels, glyph_bitmap

    wins, labels = [], []
    for label in font_labels():
        bmp = glyph_bitmap(label)
        h, w = bmp.shape
        page = np.zeros((h + 2, w + 2), dtype=np.uint8)
        page[1 : 1 + h, 1 : 1 + w] = bmp
        wins.append(glyph_windows(page, [(1, 1 + w, 1, 1 + h)])[0])
    labels = font_labels()
    vocab = sorted(set(labels))
    model = CnnModel(vocab, seed=seed)
    acc = model.fit(np.stack(wins), labels, epochs=epochs)
    return model, acc
