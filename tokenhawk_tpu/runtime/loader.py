"""Model loading: GGML file -> (config, device params, tokenizer).

End-to-end parity with the reference's `load_llama_file` +
`post_load_init_model` flow (/root/reference/th-llama-loader.cpp:485-635,
330-435), redesigned: tensors are mmap'd and uploaded straight into the
device layout (transposed, optionally sharded; see
`tokenhawk_tpu.parallel`), with no intermediate scratch copies.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.ggml.reader import GGMLFile
from tokenhawk_tpu.models.llama import LlamaParams, params_from_ggml
from tokenhawk_tpu.tokenizer import Tokenizer


def config_from_hparams(hp, n_ctx: int = 2048, **overrides) -> LlamaConfig:
    return LlamaConfig(
        n_vocab=hp.n_vocab,
        n_embd=hp.n_embd,
        n_head=hp.n_head,
        n_layer=hp.n_layer,
        n_mult=hp.n_mult,
        n_ctx=n_ctx,
        **overrides,
    )


def load_model(
    path: str,
    n_ctx: int = 2048,
    dtype=jnp.bfloat16,
    mesh=None,
    **config_overrides,
) -> Tuple[LlamaConfig, LlamaParams, Tokenizer]:
    f = GGMLFile(path)
    cfg = config_from_hparams(f.hparams, n_ctx=n_ctx, **config_overrides)
    tokenizer = Tokenizer.from_vocab(f.vocab)
    tensors = {name: f.load_tensor(name) for name in f.tensors}
    if mesh is not None:
        from tokenhawk_tpu.parallel import shard_params

        params = params_from_ggml(cfg, tensors, dtype=dtype)
        params = shard_params(cfg, params, mesh)
    else:
        params = params_from_ggml(cfg, tensors, dtype=dtype)
    f.close()
    return cfg, params, tokenizer
