"""Shared test utilities."""

from __future__ import annotations

from typing import Dict

import numpy as np

from tokenhawk_tpu.config import LlamaConfig


def make_ggml_weights(
    cfg: LlamaConfig, rng: np.random.Generator, scale: float = 0.05
) -> Dict[str, np.ndarray]:
    """Random dense f32 weights keyed by GGML tensor names ([out, in])."""
    D, F, V = cfg.n_embd, cfg.n_ff, cfg.n_vocab
    Dkv = cfg.n_embd_kv

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors = {
        "tok_embeddings.weight": w(V, D),
        "norm.weight": 1.0 + 0.1 * w(D),
        "output.weight": w(V, D),
    }
    for i in range(cfg.n_layer):
        pfx = f"layers.{i}."
        tensors[pfx + "attention.wq.weight"] = w(D, D)
        tensors[pfx + "attention.wk.weight"] = w(Dkv, D)
        tensors[pfx + "attention.wv.weight"] = w(Dkv, D)
        tensors[pfx + "attention.wo.weight"] = w(D, D)
        tensors[pfx + "attention_norm.weight"] = 1.0 + 0.1 * w(D)
        tensors[pfx + "feed_forward.w1.weight"] = w(F, D)
        tensors[pfx + "feed_forward.w2.weight"] = w(D, F)
        tensors[pfx + "feed_forward.w3.weight"] = w(F, D)
        tensors[pfx + "ffn_norm.weight"] = 1.0 + 0.1 * w(D)
    return tensors
