"""Tensor-parallel PAGED serving: the production scheduler's page-pool
path under shard_map.

The page pool [L, Hkv, n_pages, ps, Dh] shards along the KV-head axis —
the same Megatron head split as the dense TP path (parallel/tp.py), so
column-parallel wqkv/w13 shards produce exactly the local heads whose
pages live on the shard, attention is fully local, and the row-parallel
wo/w2 partials all-reduce over ICI.  Page TABLES, lengths, and token ids
stay replicated (they are tiny host-driven control state); the paged
forwards themselves run per shard with a LOCAL head-count config and
psum hooks (models/llama.py forward_paged_* psum_axis).

This gives the full production serving stack — continuous batching,
chunked prefill, automatic prefix caching (page reuse is index-level and
device-layout agnostic), per-request sampling — on tensor-sharded
models: BASELINE configs 4-5.  Speculative decoding and int8 pages
remain single-chip (PagedScheduler validates).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.models.llama import (
    forward_paged_decode,
    forward_paged_prefill,
    forward_paged_prefill_cont,
)
from tokenhawk_tpu.parallel.mesh import MODEL_AXIS
from tokenhawk_tpu.parallel.tp import (
    _logits_tp,
    param_specs_tp,
    shard_map,
    validate_tp,
)
from tokenhawk_tpu.runtime.paged import PagedKVCache

EOS_ID = 2


def paged_cache_spec_tp() -> PagedKVCache:
    """[L, Hkv, n_pages, ps, Dh]: heads sharded, everything else local."""
    s = P(None, MODEL_AXIS, None, None, None)
    return PagedKVCache(s, s)


def shard_paged_cache_tp(cache: PagedKVCache, mesh: Mesh) -> PagedKVCache:
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        cache, paged_cache_spec_tp())


def make_tp_paged_prefill_fn(cfg: LlamaConfig, mesh: Mesh,
                             params=None):
    tp = mesh.shape[MODEL_AXIS]
    validate_tp(cfg, tp)
    pspecs = param_specs_tp(params)
    cspecs = paged_cache_spec_tp()
    rep = P()

    def local_fn(params, cache, tokens, lengths, table_row):
        h, cache = forward_paged_prefill(
            cfg, params, tokens, cache, table_row, lengths,
            psum_axis=MODEL_AXIS, tp=tp)
        idx = jnp.clip(lengths - 1, 0, tokens.shape[1] - 1)
        h_last = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        logits = _logits_tp(cfg, params, h_last)
        return cache, logits

    mapped = shard_map(
        local_fn, mesh,
        in_specs=(pspecs, cspecs, rep, rep, rep),
        out_specs=(cspecs, rep),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, tokens, lengths, table_row):
        return mapped(params, cache, tokens, lengths, table_row)

    return prefill


def make_tp_paged_prefill_cont_fn(cfg: LlamaConfig, mesh: Mesh,
                                  params=None):
    tp = mesh.shape[MODEL_AXIS]
    validate_tp(cfg, tp)
    pspecs = param_specs_tp(params)
    cspecs = paged_cache_spec_tp()
    rep = P()

    def local_fn(params, cache, tokens, table_row, start, n_new):
        h, cache = forward_paged_prefill_cont(
            cfg, params, tokens, cache, table_row, start, n_new,
            psum_axis=MODEL_AXIS, tp=tp)
        idx = jnp.clip(n_new - 1, 0, tokens.shape[1] - 1)
        h_last = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        logits = _logits_tp(cfg, params, h_last)
        return cache, logits

    mapped = shard_map(
        local_fn, mesh,
        in_specs=(pspecs, cspecs, rep, rep, rep, rep),
        out_specs=(cspecs, rep),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def prefill_cont(params, cache, tokens, table_row, start, n_new):
        return mapped(params, cache, tokens, table_row, start, n_new)

    return prefill_cont


def make_tp_paged_decode_fn_dynamic(cfg: LlamaConfig, mesh: Mesh,
                                    chunk: int, eos_id: int = EOS_ID,
                                    params=None):
    """Chunked paged decode with per-slot sampling under shard_map TP.

    Sampling runs REPLICATED per shard on the all-gathered logits (same
    per-slot counter streams -> identical draws on every shard), so
    token feedback never leaves the mesh mid-chunk.
    """
    from tokenhawk_tpu.sampling import sample_dynamic

    tp = mesh.shape[MODEL_AXIS]
    validate_tp(cfg, tp)
    pspecs = param_specs_tp(params)
    cspecs = paged_cache_spec_tp()
    rep = P()

    def local_fn(params, cache, table, last_tok, lengths, last_n, done,
                 sp, counters):
        def step(carry, _):
            cache, tok, lens, last_n, done, counters = carry
            h, cache = forward_paged_decode(
                cfg, params, tok[:, None], cache, table, lens,
                psum_axis=MODEL_AXIS, tp=tp)
            logits = _logits_tp(cfg, params, h[:, 0])
            nxt = sample_dynamic(logits, sp, counters, last_n)
            nxt = jnp.where(done, jnp.int32(eos_id), nxt)
            lens = lens + jnp.where(done, 0, 1)
            counters = counters + 1
            done = done | (nxt == eos_id)
            last_n = jnp.concatenate([last_n[:, 1:], nxt[:, None]], axis=1)
            return (cache, nxt, lens, last_n, done, counters), nxt

        (cache, tok, lengths, last_n, done, counters), toks = jax.lax.scan(
            step, (cache, last_tok, lengths, last_n, done, counters),
            None, length=chunk,
        )
        return cache, toks.T, done, counters

    sp_spec = jax.tree_util.tree_map(lambda _: rep,
                                     _sp_structure())
    mapped = shard_map(
        local_fn, mesh,
        in_specs=(pspecs, cspecs, rep, rep, rep, rep, rep, sp_spec, rep),
        out_specs=(cspecs, rep, rep, rep),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache, table, last_tok, lengths, last_n, done, sp,
               counters):
        return mapped(params, cache, table, last_tok, lengths, last_n,
                      done, sp, counters)

    return decode


def _sp_structure():
    """A SamplingParams pytree skeleton for spec construction."""
    from tokenhawk_tpu.sampling import SamplingParams

    z = jnp.zeros((1,))
    return SamplingParams(temperature=z, top_k=z, top_p=z,
                          repeat_penalty=z, seed=z)
