"""Dense glyph classifier — the reference's TF model, in pure numpy.

Reference (``main/t5.py:136-167``): ``Dense(256, relu) → Dense(|vocab|,
softmax)``, Adam, sparse-categorical-crossentropy, 40 epochs, trained on
the font ``.data`` tuples with vocab = sorted distinct label strings; the
alt config is ``Dense(512)``, 20 epochs (``main/t.py:153-166``).  The
container has no TensorFlow, so forward/backward/Adam are implemented
directly — same architecture, losses, and label decoding (argmax → vocab,
``main/t5.py:160-167``), deterministic seed.

Weights serialize to a plain dict of arrays for ``ray.put`` broadcast;
each scorer actor deserializes once in ``__init__``.
"""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_ray.config import TUPLELENGTH


class DenseModel:
    def __init__(self, vocab: list[str], hidden: int = 256, seed: int = 1337):
        self.vocab = list(vocab)
        v = len(self.vocab)
        rng = np.random.Generator(np.random.PCG64(seed))
        # Glorot-uniform init, as keras Dense defaults
        lim1 = np.sqrt(6.0 / (TUPLELENGTH + hidden))
        lim2 = np.sqrt(6.0 / (hidden + v))
        self.W1 = rng.uniform(-lim1, lim1, (TUPLELENGTH, hidden)).astype(np.float32)
        self.b1 = np.zeros(hidden, dtype=np.float32)
        self.W2 = rng.uniform(-lim2, lim2, (hidden, v)).astype(np.float32)
        self.b2 = np.zeros(v, dtype=np.float32)

    # ---------------- forward ---------------------------------------------
    def _logits(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = np.maximum(x @ self.W1 + self.b1, 0.0)
        return h, h @ self.W2 + self.b2

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        _, z = self._logits(np.asarray(x, dtype=np.float32))
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def predict(self, x: np.ndarray) -> list[str]:
        """model.predict + per-row argmax → vocab (t5.py:160-167)."""
        p = self.predict_proba(x)
        return [self.vocab[i] for i in np.argmax(p, axis=1)]

    # ---------------- training (Adam, sparse categorical CE) --------------
    def fit(
        self,
        x: np.ndarray,
        labels: list[str],
        epochs: int = 40,
        batch_size: int = 32,
        lr: float = 1e-3,
        seed: int = 7,
    ) -> float:
        x = np.asarray(x, dtype=np.float32)
        lab2id = {l: i for i, l in enumerate(self.vocab)}
        y = np.array([lab2id[l] for l in labels], dtype=np.int64)
        n = x.shape[0]
        rng = np.random.Generator(np.random.PCG64(seed))
        params = [self.W1, self.b1, self.W2, self.b2]
        m = [np.zeros_like(p) for p in params]
        v = [np.zeros_like(p) for p in params]
        b1, b2, eps = 0.9, 0.999, 1e-7
        t = 0
        for _ in range(epochs):
            order = rng.permutation(n)
            for s in range(0, n, batch_size):
                idx = order[s : s + batch_size]
                xb, yb = x[idx], y[idx]
                h = np.maximum(xb @ self.W1 + self.b1, 0.0)
                z = h @ self.W2 + self.b2
                z = z - z.max(axis=1, keepdims=True)
                e = np.exp(z)
                p = e / e.sum(axis=1, keepdims=True)
                g = p
                g[np.arange(len(yb)), yb] -= 1.0
                g /= len(yb)
                gW2 = h.T @ g
                gb2 = g.sum(axis=0)
                gh = g @ self.W2.T
                gh[h <= 0] = 0.0
                gW1 = xb.T @ gh
                gb1 = gh.sum(axis=0)
                t += 1
                for p_, g_, m_, v_ in zip(params, [gW1, gb1, gW2, gb2], m, v):
                    m_ *= b1
                    m_ += (1 - b1) * g_
                    v_ *= b2
                    v_ += (1 - b2) * g_ * g_
                    mh = m_ / (1 - b1**t)
                    vh = v_ / (1 - b2**t)
                    p_ -= lr * mh / (np.sqrt(vh) + eps)
        # train accuracy (model.evaluate, t5.py:157-158)
        return float(np.mean(np.array(self.predict(x)) == np.array(labels)))

    # ---------------- (de)serialization ------------------------------------
    def to_state(self) -> dict:
        return {
            "vocab": self.vocab, "W1": self.W1, "b1": self.b1,
            "W2": self.W2, "b2": self.b2,
        }

    @classmethod
    def from_state(cls, state: dict) -> "DenseModel":
        model = cls(state["vocab"], hidden=state["W1"].shape[1])
        model.W1, model.b1 = state["W1"], state["b1"]
        model.W2, model.b2 = state["W2"], state["b2"]
        return model


def train_on_font_index(
    index,
    hidden: int = 256,
    epochs: int = 40,
    seed: int = 1337,
) -> tuple[DenseModel, float]:
    """step2's training half (t5.py): vocab = sorted distinct labels of the
    font table; train on its (normalized) tuples as ground truth."""
    vocab = sorted(set(index.labels))
    model = DenseModel(vocab, hidden=hidden, seed=seed)
    acc = model.fit(index.tuples, index.labels, epochs=epochs)
    return model, acc
