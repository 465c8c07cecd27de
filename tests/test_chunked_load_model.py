"""load_model from a TH chunk directory == load_model from the file."""

import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.chunked import split_ggml
from tokenhawk_tpu.ggml.writer import write_ggml
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.runtime.loader import load_model

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=300, n_embd=128, n_head=2, n_layer=2, n_ff=256)
VOCAB = [b"<unk>", b"<s>", b"</s>"]


def test_chunk_dir_loads_and_matches(tmp_path):
    rng = np.random.default_rng(17)
    tensors = make_ggml_weights(CFG, rng)
    hp = dict(n_vocab=len(VOCAB), n_embd=CFG.n_embd, n_mult=CFG.n_mult,
              n_head=CFG.n_head, n_layer=CFG.n_layer, n_rot=CFG.head_dim,
              ftype=0)
    path = tmp_path / "model.bin"
    write_ggml(path, hp, VOCAB, None, tensors)
    split_ggml(path, tmp_path / "chunks", max_chunk_bytes=64 * 1024)

    greedy = SamplingConfig(temperature=0.0)
    cfg_a, params_a, tok_a = load_model(str(path), n_ctx=64, dtype=jnp.float32,
                                        n_vocab=CFG.n_vocab)
    cfg_b, params_b, tok_b = load_model(str(tmp_path / "chunks"), n_ctx=64,
                                        dtype=jnp.float32, n_vocab=CFG.n_vocab)
    assert cfg_a == cfg_b
    assert tok_b.n_vocab == len(VOCAB)

    e_a = Engine(cfg_a, params_a, sampling=greedy, cache_dtype=jnp.float32,
                 decode_chunk=4)
    e_b = Engine(cfg_b, params_b, sampling=greedy, cache_dtype=jnp.float32,
                 decode_chunk=4)
    assert e_a.generate([1, 7, 13], max_new_tokens=5).tokens == \
        e_b.generate([1, 7, 13], max_new_tokens=5).tokens
