"""Host-local sharded loading: every shard reads only its own bytes and
the result matches the dense loader bit-for-bit in behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.writer import write_ggml
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.parallel import make_mesh
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.runtime.sharded_loader import load_model_sharded
from tokenhawk_tpu.tokenizer import byte_fallback_vocab

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_embd=256, n_head=4, n_ctx=64, n_ff=512)
GREEDY = SamplingConfig(temperature=0.0)
VOCAB = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)] + [
    bytes([65 + i // 26, 65 + i % 26]) for i in range(512 - 259)
]


def _write(tmp_path, ftype):
    rng = np.random.default_rng(41)
    tensors = make_ggml_weights(CFG, rng)
    if ftype is not None:
        from tokenhawk_tpu.ggml.quants import quantize

        tensors = {
            k: (quantize(v, ftype)
                if v.ndim == 2 and "norm" not in k
                and k != "tok_embeddings.weight" else v)
            for k, v in tensors.items()
        }
    hp = dict(n_vocab=len(VOCAB), n_embd=CFG.n_embd, n_mult=CFG.n_mult,
              n_head=CFG.n_head, n_layer=CFG.n_layer, n_rot=CFG.head_dim,
              ftype=0)
    path = tmp_path / "model.bin"
    write_ggml(path, hp, VOCAB, None, tensors)
    return path, tensors


@pytest.mark.parametrize("ftype", [None, GGMLType.Q8_0, GGMLType.Q4_0])
def test_sharded_load_matches_dense_loader(tmp_path, ftype):
    path, tensors = _write(tmp_path, ftype)
    tp = 4
    mesh = make_mesh(dp=1, tp=tp)
    cfg, params, tok, rd = load_model_sharded(
        path, mesh, n_ctx=64, dtype=jnp.bfloat16, scale_dtype=jnp.bfloat16)
    assert cfg.n_embd == CFG.n_embd

    # Reference: plain host loader -> same TP layout.
    from tokenhawk_tpu.parallel.tp import shard_params_tp

    ref = shard_params_tp(
        cfg, params_from_ggml(cfg, tensors, dtype=jnp.bfloat16,
                              row_parallel_shards=tp,
                              scale_dtype=jnp.bfloat16), mesh)

    e_ref = Engine(cfg, ref, tokenizer=byte_fallback_vocab(), sampling=GREEDY,
                   cache_dtype=jnp.float32, decode_chunk=4,
                   mesh=mesh, parallel="tp")
    e_sh = Engine(cfg, params, tokenizer=byte_fallback_vocab(),
                  sampling=GREEDY, cache_dtype=jnp.float32, decode_chunk=4,
                  mesh=mesh, parallel="tp")
    want = e_ref.generate([1, 9, 17, 33], max_new_tokens=6).tokens
    got = e_sh.generate([1, 9, 17, 33], max_new_tokens=6).tokens
    assert got == want


def test_sharded_load_reads_each_byte_about_once(tmp_path):
    """Shards must not over-read: total decoded bytes stay near the
    tensor payload size (not tp x it).  Replicated norms re-read per
    device; big weights must not."""
    path, _ = _write(tmp_path, None)
    tp = 4
    mesh = make_mesh(dp=2, tp=tp)
    cfg, params, tok, rd = load_model_sharded(path, mesh, n_ctx=64)
    import jax

    jax.block_until_ready(params)
    import os

    payload = os.path.getsize(path)
    # Each weight byte decodes once per data-replica pass at worst; with
    # a dp=2 mesh every byte is read at most twice + small replicated
    # norms.  tp-fold over-reading would exceed this bound.
    assert rd.bytes_read < 2.6 * payload, (rd.bytes_read, payload)
