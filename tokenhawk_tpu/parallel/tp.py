"""Explicit tensor-parallel forward under shard_map.

GSPMD partitions plain XLA ops automatically, but Pallas kernels are
opaque custom calls — to run them tensor-parallel the partitioning must
be explicit.  This module rebuilds the model step as a shard_map program
with Megatron-style TP over the "model" axis and data parallelism over
"data":

  per layer:   wq/wk/wv column-parallel -> local heads -> local flash
               attention -> wo row-parallel -> psum    (1 all-reduce)
               w1/w3 column-parallel -> w2 row-parallel -> psum (1 all-reduce)
  embedding:   vocab-parallel gather + psum
  logits:      vocab-column-parallel matmul + tiled all-gather
  sampling:    replicated (same key everywhere -> same sample)

This is the multi-chip realization of the reference's k-way split-GEMV +
`vector_reduce` pattern (/root/reference/th.cpp:3795-3912, :4042-4127)
with the reduce riding ICI.  Weight layout contract: see
`param_specs_tp` and `pack_q4_rows` (row-parallel q4 weights are packed
per shard).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import KVCache, LayerParams, LlamaParams
from tokenhawk_tpu.ops import (
    apply_rope,
    attend_cache,
    matmul,
    rms_norm,
    rope_cos_sin,
    update_kv_cache,
)
from tokenhawk_tpu.ops.qweight import QWeight
from tokenhawk_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from tokenhawk_tpu.sampling import sample

try:  # jax >= 0.7 exposes shard_map at the top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


# ---------------------------------------------------------------------------
# Layout
# ---------------------------------------------------------------------------


def layer_specs_tp() -> LayerParams:
    col = P(None, None, MODEL_AXIS)  # [L, K, N/tp]
    row = P(None, MODEL_AXIS, None)  # [L, K/tp, N]
    vec = P(None, None)
    return LayerParams(
        wq=col, wk=col, wv=col, wo=row, w1=col, w2=row, w3=col,
        attn_norm=vec, ffn_norm=vec,
    )


def param_specs_tp() -> LlamaParams:
    return LlamaParams(
        tok_embd=P(MODEL_AXIS, None),  # vocab-parallel rows
        layers=layer_specs_tp(),
        norm=P(None),
        output=P(None, MODEL_AXIS),  # vocab-column-parallel
    )


def kv_cache_spec_tp() -> P:
    # [L, B, Hkv, S, Dh]
    return P(None, DATA_AXIS, MODEL_AXIS, None, None)


def validate_tp(cfg: LlamaConfig, tp: int):
    for name, v in (("n_kv_head", cfg.n_kv_head), ("n_vocab", cfg.n_vocab),
                    ("n_ff", cfg.n_ff)):
        if v % tp:
            raise ValueError(f"tp={tp} must divide {name}={v}")


# ---------------------------------------------------------------------------
# Local (per-shard) computation
# ---------------------------------------------------------------------------


def _embed_vocab_parallel(tok_embd_local, tokens, tp):
    """Vocab-parallel embedding: local gather + psum."""
    v_local = tok_embd_local.shape[0]
    vi = jax.lax.axis_index(MODEL_AXIS)
    local_ids = tokens - vi * v_local
    valid = (local_ids >= 0) & (local_ids < v_local)
    safe = jnp.clip(local_ids, 0, v_local - 1)
    x = tok_embd_local[safe]
    x = jnp.where(valid[..., None], x, jnp.zeros_like(x))
    return jax.lax.psum(x, MODEL_AXIS)


def _layer_forward_tp(cfg: LlamaConfig, tp: int, x, lp: LayerParams, kc, vc,
                      cos, sin, offsets, positions):
    B, T, D = x.shape
    Hl = cfg.n_head // tp  # local q heads
    Hkvl = cfg.n_kv_head // tp
    Dh = cfg.head_dim

    h = rms_norm(x, lp.attn_norm, cfg.rms_norm_eps)
    q = matmul(h, lp.wq).reshape(B, T, Hl, Dh)
    k = matmul(h, lp.wk).reshape(B, T, Hkvl, Dh)
    v = matmul(h, lp.wv).reshape(B, T, Hkvl, Dh)
    q = apply_rope(q, cos, sin, cfg.rope_style)
    k = apply_rope(k, cos, sin, cfg.rope_style)

    kc, vc = update_kv_cache(kc, vc, k, v, offsets)
    ctx = attend_cache(q, kc, vc, positions)  # local heads only
    attn = matmul(ctx.reshape(B, T, Hl * Dh), lp.wo)  # row-parallel partial
    x = x + jax.lax.psum(attn, MODEL_AXIS)

    h2 = rms_norm(x, lp.ffn_norm, cfg.rms_norm_eps)
    gate = jax.nn.silu(matmul(h2, lp.w1).astype(jnp.float32)).astype(x.dtype)
    ffn = matmul(gate * matmul(h2, lp.w3), lp.w2)  # row-parallel partial
    x = x + jax.lax.psum(ffn, MODEL_AXIS)
    return x, kc, vc


def _forward_tp(cfg: LlamaConfig, tp: int, params: LlamaParams, tokens, k_cache,
                v_cache, offsets):
    x = _embed_vocab_parallel(params.tok_embd, tokens, tp)
    x = x.astype(params.tok_embd.dtype)
    T = tokens.shape[1]
    positions = offsets[:, None] + jnp.arange(T, dtype=offsets.dtype)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    def body(x, layer_inputs):
        lp, kc, vc = layer_inputs
        x, kc, vc = _layer_forward_tp(
            cfg, tp, x, lp, kc, vc, cos, sin, offsets, positions
        )
        return x, (kc, vc)

    x, (k_new, v_new) = jax.lax.scan(body, x, (params.layers, k_cache, v_cache))
    return x, k_new, v_new


def _logits_tp(cfg, params, hidden):
    h = rms_norm(hidden, params.norm, cfg.rms_norm_eps)
    logits_local = matmul(h, params.output, accum_dtype=jnp.float32).astype(
        jnp.float32
    )  # [..., V/tp]
    return jax.lax.all_gather(logits_local, MODEL_AXIS, axis=-1, tiled=True)


# ---------------------------------------------------------------------------
# Step functions (mirror runtime.engine.make_prefill_fn / make_decode_fn)
# ---------------------------------------------------------------------------


def make_tp_prefill_fn(cfg: LlamaConfig, mesh: Mesh):
    tp = mesh.shape[MODEL_AXIS]
    validate_tp(cfg, tp)
    pspecs = param_specs_tp()
    cspec = kv_cache_spec_tp()
    bspec = P(DATA_AXIS)

    def local_fn(params, k_cache, v_cache, tokens, lengths, offsets):
        h, k_new, v_new = _forward_tp(cfg, tp, params, tokens, k_cache,
                                      v_cache, offsets)
        idx = jnp.clip(lengths - 1, 0, tokens.shape[1] - 1)
        h_last = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        logits = _logits_tp(cfg, params, h_last)
        return k_new, v_new, logits

    mapped = shard_map(
        local_fn, mesh,
        in_specs=(pspecs, cspec, cspec, P(DATA_AXIS, None), bspec, bspec),
        out_specs=(cspec, cspec, P(DATA_AXIS, None)),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache: KVCache, tokens, lengths, offsets):
        k_new, v_new, logits = mapped(params, cache.k, cache.v, tokens,
                                      lengths, offsets)
        return KVCache(k_new, v_new), logits

    return prefill


def make_tp_decode_fn(cfg: LlamaConfig, mesh: Mesh, sampling: SamplingConfig,
                      chunk: int, eos_id: int = 2):
    tp = mesh.shape[MODEL_AXIS]
    validate_tp(cfg, tp)
    pspecs = param_specs_tp()
    cspec = kv_cache_spec_tp()
    bspec = P(DATA_AXIS)

    def local_fn(params, k_cache, v_cache, last_tok, offsets, last_n, done, key):
        def step(carry, k):
            k_cache, v_cache, tok, off, last_n, done = carry
            h, k_cache, v_cache = _forward_tp(
                cfg, tp, params, tok[:, None], k_cache, v_cache, off
            )
            logits = _logits_tp(cfg, params, h[:, 0])
            nxt = sample(logits, k, sampling, last_n)
            nxt = jnp.where(done, jnp.int32(eos_id), nxt)
            # Freeze offsets for done/idle slots (see engine.make_decode_fn).
            off = off + jnp.where(done, 0, 1)
            done = done | (nxt == eos_id)
            last_n = jnp.concatenate([last_n[:, 1:], nxt[:, None]], axis=1)
            return (k_cache, v_cache, nxt, off, last_n, done), nxt

        keys = jax.random.split(key, chunk)
        (k_cache, v_cache, tok, offsets, last_n, done), toks = jax.lax.scan(
            step, (k_cache, v_cache, last_tok, offsets, last_n, done), keys
        )
        return k_cache, v_cache, toks.T, offsets, last_n, done

    mapped = shard_map(
        local_fn, mesh,
        in_specs=(pspecs, cspec, cspec, bspec, bspec, P(DATA_AXIS, None),
                  bspec, P()),
        out_specs=(cspec, cspec, P(DATA_AXIS, None), bspec,
                   P(DATA_AXIS, None), bspec),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache: KVCache, last_tok, offsets, last_n, done, key):
        k_new, v_new, toks, offsets, last_n, done = mapped(
            params, cache.k, cache.v, last_tok, offsets, last_n, done, key
        )
        return KVCache(k_new, v_new), toks, offsets, last_n, done

    return decode


# ---------------------------------------------------------------------------
# Parameter placement
# ---------------------------------------------------------------------------


def shard_params_tp(cfg: LlamaConfig, params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """Place params in the shard_map TP layout.

    NOTE: q4_0 row-parallel weights (wo, w2) must have been packed with
    k_shards=tp (see ops.qweight.pack_q4_rows); the loader does this when
    given a mesh.
    """
    tp = mesh.shape[MODEL_AXIS]
    validate_tp(cfg, tp)
    specs = param_specs_tp()

    def place(leaf, spec):
        sh = NamedSharding(mesh, spec)
        if isinstance(leaf, QWeight):
            def put(x):
                return None if x is None else jax.device_put(x, sh)

            return QWeight(
                qs=jax.device_put(leaf.qs, sh),
                scales=jax.device_put(leaf.scales, sh),
                mins=put(leaf.mins),
                scales_hi=put(leaf.scales_hi),
                kind=leaf.kind,
                group=leaf.group,
            )
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map(
        place, params, specs,
        is_leaf=lambda x: isinstance(x, (QWeight, jax.Array)) or hasattr(x, "shape"),
    )
