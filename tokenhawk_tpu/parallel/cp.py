"""Context parallelism end-to-end: engine-drivable prefill/decode over a
sequence-sharded KV cache.

Head parallelism (parallel/tp.py) tops out at n_kv_head chips; context
parallelism shards the SEQUENCE so a conversation longer than one chip's
KV capacity spans the `ctx` mesh axis.  This module turns the attention
primitives in parallel/ring.py into full model step functions with the
same signatures as runtime.engine's, so the Engine/CLI drive them
directly.  (The reference hard-caps context at 512 on one device,
/root/reference/th-llama.cpp:19; SURVEY §2.6/§5 long-context.)

Layout — CYCLIC interleave: global position p lives on ctx-shard
p % ncp at local slot p // ncp.

  * prefill: shard i takes query tokens {i, i+ncp, ...} of the block,
    computes their K/V into its own cache slots 0..T/ncp (pure local
    write), and attends via cyclic ring attention (KV blocks rotate by
    `ppermute`, one neighbour hop per step, overlapping compute).
  * decode: the new token's projections are computed replicated (tiny);
    only the owner shard (p % ncp) writes its KV slot in place; the
    query attends every shard's local KV with a flash-style partial
    softmax merged across chips by pmax/psum (O(Dh) per head on the
    wire, never the cache).

Params are replicated over `ctx` (weights stream locally; use TP for
weight sharding).  Caches are the unrolled per-layer form with the
sequence dim sharded: leaf [B, Hkv, S, Dh] with spec
P("data", None, "ctx", None).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import LayerParams, LlamaParams
from tokenhawk_tpu.ops import apply_rope, matmul, rope_cos_sin
from tokenhawk_tpu.parallel.mesh import CTX_AXIS, DATA_AXIS
from tokenhawk_tpu.parallel.ring import decode_attend_cp, ring_attention
from tokenhawk_tpu.parallel.tp import shard_map
from tokenhawk_tpu.sampling import is_eos as _is_eos
from tokenhawk_tpu.sampling import normalize_eos, sample


def layer_cache_spec_cp() -> P:
    # per-layer [B, Hkv, S, Dh]: sequence dim sharded over ctx
    return P(DATA_AXIS, None, CTX_AXIS, None)


def cache_specs_cp(cache):
    lay = layer_cache_spec_cp()
    return tuple((lay, lay) for _ in cache)


def shard_cache_cp(cache, mesh: Mesh):
    sh = NamedSharding(mesh, layer_cache_spec_cp())
    return tuple(
        tuple(jax.device_put(a, sh) for a in layer) for layer in cache
    )


def replicated_specs(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def validate_cp(cfg: LlamaConfig, ncp: int, max_seq: int):
    if max_seq % ncp:
        raise ValueError(f"cp={ncp} must divide max_seq={max_seq}")


def _shard_count(length, idx, ncp):
    """#positions p < length with p % ncp == idx (valid slots per shard)."""
    return jnp.maximum(0, (length - idx + ncp - 1) // ncp)


# ---------------------------------------------------------------------------
# Layer bodies (run INSIDE shard_map over (data, ctx))
# ---------------------------------------------------------------------------


def _qkv(cfg, lp: LayerParams, x, B, T):
    # attn_norm fuses into the (quantized) matmul (ops/linear.py).
    H, Hkv, Dh = cfg.n_head, cfg.n_kv_head, cfg.head_dim
    Dq, Dkv = H * Dh, Hkv * Dh
    eps = cfg.rms_norm_eps
    if lp.wqkv is not None:
        qkv = matmul(x, lp.wqkv, lp.attn_norm, eps=eps)
        q = qkv[..., :Dq].reshape(B, T, H, Dh)
        k = qkv[..., Dq : Dq + Dkv].reshape(B, T, Hkv, Dh)
        v = qkv[..., Dq + Dkv :].reshape(B, T, Hkv, Dh)
    else:
        q = matmul(x, lp.wq, lp.attn_norm, eps=eps).reshape(B, T, H, Dh)
        k = matmul(x, lp.wk, lp.attn_norm, eps=eps).reshape(B, T, Hkv, Dh)
        v = matmul(x, lp.wv, lp.attn_norm, eps=eps).reshape(B, T, Hkv, Dh)
    return q, k, v


def _ffn(cfg, lp: LayerParams, x):
    F = cfg.n_ff
    eps = cfg.rms_norm_eps
    if lp.w13 is not None:
        gu = matmul(x, lp.w13, lp.ffn_norm, eps=eps)
        g, u = gu[..., :F], gu[..., F:]
    else:
        g = matmul(x, lp.w1, lp.ffn_norm, eps=eps)
        u = matmul(x, lp.w3, lp.ffn_norm, eps=eps)
    gate = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype)
    return x + matmul(gate * u, lp.w2)


def _prefill_layer_cp(cfg, ncp, x, lp, kc, vc, cos, sin):
    """One layer over this shard's cyclic query slice; cache write is a
    pure local dus at slots [0, T_loc)."""
    B, T_loc, D = x.shape
    q, k, v = _qkv(cfg, lp, x, B, T_loc)
    q = apply_rope(q, cos, sin, cfg.rope_style)
    k = apply_rope(k, cos, sin, cfg.rope_style)

    k_blk = jnp.swapaxes(k, 1, 2).astype(kc.dtype)  # [B, Hkv, T_loc, Dh]
    v_blk = jnp.swapaxes(v, 1, 2).astype(vc.dtype)
    kc = jax.lax.dynamic_update_slice(kc, k_blk, (0, 0, 0, 0))
    vc = jax.lax.dynamic_update_slice(vc, v_blk, (0, 0, 0, 0))

    ctx = ring_attention(
        jnp.swapaxes(q, 1, 2), k_blk, v_blk, CTX_AXIS, ncp, layout="cyclic"
    )  # [B, H, T_loc, Dh]
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T_loc, D)
    x = x + matmul(ctx, lp.wo)
    return _ffn(cfg, lp, x), kc, vc


def _decode_layer_cp(cfg, ncp, x, lp, kc, vc, cos, sin, offsets):
    """One decode layer: replicated compute, owner-shard KV write,
    cross-shard partial-softmax attention."""
    B, _, D = x.shape
    Hkv, Dh = cfg.n_kv_head, cfg.head_dim
    idx = jax.lax.axis_index(CTX_AXIS)
    q, k, v = _qkv(cfg, lp, x, B, 1)
    q = apply_rope(q, cos, sin, cfg.rope_style)
    k = apply_rope(k, cos, sin, cfg.rope_style)

    k_new = jnp.swapaxes(k, 1, 2).astype(kc.dtype)  # [B, Hkv, 1, Dh]
    v_new = jnp.swapaxes(v, 1, 2).astype(vc.dtype)
    # Owner-predicated in-place write (static unroll over B, matching
    # ops/attention.py's aliasing-friendly dus chain).
    for b in range(B):
        slot = offsets[b] // ncp
        owner = (offsets[b] % ncp) == idx
        cur_k = jax.lax.dynamic_slice(kc, (b, 0, slot, 0), (1, Hkv, 1, Dh))
        cur_v = jax.lax.dynamic_slice(vc, (b, 0, slot, 0), (1, Hkv, 1, Dh))
        kc = jax.lax.dynamic_update_slice(
            kc, jnp.where(owner, k_new[b][None], cur_k), (b, 0, slot, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            vc, jnp.where(owner, v_new[b][None], cur_v), (b, 0, slot, 0)
        )

    lengths = offsets + 1  # current token included
    shard_lengths = _shard_count(lengths, idx, ncp)
    ctx = decode_attend_cp(q[:, 0], kc, vc, shard_lengths, CTX_AXIS)
    x = x + matmul(ctx.reshape(B, 1, D), lp.wo)
    return _ffn(cfg, lp, x), kc, vc


# ---------------------------------------------------------------------------
# Step functions (Engine-compatible signatures)
# ---------------------------------------------------------------------------


def make_cp_prefill_fn(cfg: LlamaConfig, mesh: Mesh, params: LlamaParams):
    """Prefill over the (data, ctx) mesh.  Tokens arrive replicated over
    ctx; each shard takes its cyclic slice.  Offsets must be zero (CP
    sessions prefill from the start; continuation lands in decode)."""
    ncp = mesh.shape[CTX_AXIS]
    if not isinstance(params.layers, tuple):
        raise ValueError("CP path expects unrolled params (unstack_params)")
    pspecs = replicated_specs(params)
    cspecs = cache_specs_cp(tuple(range(cfg.n_layer)))
    bspec = P(DATA_AXIS)

    def local_fn(params, cache, tokens, lengths, offsets):
        B, T = tokens.shape
        T_loc = T // ncp
        idx = jax.lax.axis_index(CTX_AXIS)
        cols = idx + jnp.arange(T_loc) * ncp  # this shard's positions
        toks_local = jnp.take(tokens, cols, axis=1)
        x = params.tok_embd[toks_local].astype(params.tok_embd.dtype)
        positions = jnp.broadcast_to(cols[None, :], (B, T_loc))
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

        new_cache = []
        for lp, (kc, vc) in zip(params.layers, cache):
            x, kc, vc = _prefill_layer_cp(cfg, ncp, x, lp, kc, vc, cos, sin)
            new_cache.append((kc, vc))

        # Last valid token's hidden lives on shard (lengths-1) % ncp.
        last = lengths - 1
        slot = jnp.clip(last // ncp, 0, T_loc - 1)
        h_here = jnp.take_along_axis(x, slot[:, None, None], axis=1)[:, 0]
        mine = ((last % ncp) == idx)[:, None]
        h_last = jax.lax.psum(jnp.where(mine, h_here, 0.0), CTX_AXIS)

        from tokenhawk_tpu.models.llama import logits_from_hidden

        logits = logits_from_hidden(cfg, params, h_last)
        return tuple(new_cache), logits

    mapped = shard_map(
        local_fn, mesh,
        in_specs=(pspecs, cspecs, P(DATA_AXIS, None), bspec, bspec),
        out_specs=(cspecs, P(DATA_AXIS, None)),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, tokens, lengths, offsets):
        return mapped(params, cache, tokens, lengths, offsets)

    return prefill


def make_cp_decode_fn(cfg: LlamaConfig, mesh: Mesh, sampling: SamplingConfig,
                      chunk: int, eos_id=2, params: LlamaParams = None):
    eos0, eos_ids = normalize_eos(eos_id)
    ncp = mesh.shape[CTX_AXIS]
    pspecs = replicated_specs(params)
    cspecs = cache_specs_cp(tuple(range(cfg.n_layer)))
    bspec = P(DATA_AXIS)

    def local_fn(params, cache, last_tok, offsets, last_n, done, key):
        from tokenhawk_tpu.models.llama import logits_from_hidden

        def step(carry, k):
            cache, tok, off, last_n, done = carry
            x = params.tok_embd[tok[:, None]].astype(params.tok_embd.dtype)
            positions = off[:, None]
            cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
            new_cache = []
            for lp, (kc, vc) in zip(params.layers, cache):
                x, kc, vc = _decode_layer_cp(
                    cfg, ncp, x, lp, kc, vc, cos, sin, off
                )
                new_cache.append((kc, vc))
            logits = logits_from_hidden(cfg, params, x[:, 0])
            nxt = sample(logits, k, sampling, last_n)  # replicated: same key
            nxt = jnp.where(done, jnp.int32(eos0), nxt)
            off = off + jnp.where(done, 0, 1)
            done = done | _is_eos(nxt, eos_ids)
            last_n = jnp.concatenate([last_n[:, 1:], nxt[:, None]], axis=1)
            return (tuple(new_cache), nxt, off, last_n, done), nxt

        keys = jax.random.split(key, chunk)
        (cache, tok, offsets, last_n, done), toks = jax.lax.scan(
            step, (cache, last_tok, offsets, last_n, done), keys
        )
        return cache, toks.T, offsets, last_n, done

    mapped = shard_map(
        local_fn, mesh,
        in_specs=(pspecs, cspecs, bspec, bspec, P(DATA_AXIS, None), bspec, P()),
        out_specs=(cspecs, P(DATA_AXIS, None), bspec, P(DATA_AXIS, None), bspec),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache, last_tok, offsets, last_n, done, key):
        return mapped(params, cache, last_tok, offsets, last_n, done, key)

    return decode
