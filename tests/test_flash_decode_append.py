"""Fused append+attend decode kernel vs update-then-attend (interpret).

flash_decode_append must (a) write the new K/V rows into the cache at
slot lengths-1 exactly like update_kv_cache's dus chain, and (b) return
the same attention output as flash_decode_dma over the updated cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.ops.attention import attend_cache, update_kv_cache
from tokenhawk_tpu.ops.pallas.flash_decode_dma import flash_decode_append


@pytest.mark.parametrize("B,S,Hkv,rep,Dh", [
    (1, 256, 2, 1, 128),   # MHA-ish, one batch
    (2, 256, 2, 4, 128),   # GQA, ragged lengths
    (3, 512, 1, 8, 128),   # MQA-ish
])
def test_append_matches_update_then_attend(rng, B, S, Hkv, rep, Dh):
    H = Hkv * rep
    q = rng.standard_normal((B, 1, H, Dh)).astype(np.float32)
    k_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    k_new = rng.standard_normal((B, 1, Hkv, Dh)).astype(np.float32)
    v_new = rng.standard_normal((B, 1, Hkv, Dh)).astype(np.float32)
    # offsets = number of tokens already in the cache (0 allowed)
    offsets = np.array([0, S // 3, S - 1][:B], np.int32)

    kc, vc = update_kv_cache(
        jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(k_new), jnp.asarray(v_new), jnp.asarray(offsets),
    )
    want = np.asarray(attend_cache(
        jnp.asarray(q), kc, vc, jnp.asarray(offsets)[:, None]
    ))

    qg = (jnp.asarray(q)[:, 0] * (1.0 / Dh**0.5)).reshape(B, Hkv, rep, Dh)
    out, kc2, vc2 = flash_decode_append(
        qg,
        jnp.asarray(k_new)[:, 0],
        jnp.asarray(v_new)[:, 0],
        jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(offsets) + 1,
        interpret=True,
    )
    got = np.asarray(out).reshape(B, 1, H, Dh)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kc2), np.asarray(kc), atol=0)
    np.testing.assert_allclose(np.asarray(vc2), np.asarray(vc), atol=0)


def test_append_clamps_past_capacity(rng):
    """A slot whose offset ran past the cache writes the last slot and
    attends over the full (clamped) cache — matching the engine's
    length-clamp semantics for done/overlong slots."""
    B, S, Hkv, rep, Dh = 1, 256, 2, 2, 128
    H = Hkv * rep
    q = rng.standard_normal((B, 1, H, Dh)).astype(np.float32)
    k_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)

    out, kc, vc = flash_decode_append(
        (jnp.asarray(q)[:, 0] * (1.0 / Dh**0.5)).reshape(B, Hkv, rep, Dh),
        jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray([S + 7], jnp.int32),  # over-long: clamps to S
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(kc)[0, :, S - 1], np.asarray(k_new)[0], atol=0)
    np.testing.assert_allclose(
        np.asarray(vc)[0, :, S - 1], np.asarray(v_new)[0], atol=0)
    # Attention must cover the clamped cache with the new row at S-1.
    kc_ref = np.array(k_cache)
    vc_ref = np.array(v_cache)
    kc_ref[0, :, S - 1] = np.asarray(k_new)[0]
    vc_ref[0, :, S - 1] = np.asarray(v_new)[0]
    want = np.asarray(attend_cache(
        jnp.asarray(q), jnp.asarray(kc_ref), jnp.asarray(vc_ref),
        jnp.asarray([[S - 1]], jnp.int32),
    ))
    np.testing.assert_allclose(
        np.asarray(out).reshape(B, 1, H, Dh), want, atol=2e-5, rtol=1e-4)


def test_model_forward_uses_append(rng, monkeypatch):
    """End-to-end decode step parity: fused path vs dus+attend path."""
    from tokenhawk_tpu.config import LlamaConfig
    from tokenhawk_tpu.models.llama import (
        forward,
        init_params,
        make_unrolled_cache,
        unstack_params,
    )
    from tokenhawk_tpu.ops import dispatch

    cfg = LlamaConfig(
        n_vocab=64, n_embd=256, n_head=2, n_layer=2, n_ctx=128, n_ff=384,
    )
    params = unstack_params(init_params(cfg, jax.random.PRNGKey(0), jnp.float32))
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 1)), jnp.int32)
    offsets = jnp.asarray([5], jnp.int32)

    dispatch.set_backend("pallas_interpret")
    try:
        # "force": the test model is dense f32, and dense weights prefer
        # the dus path on TPU (MSA interaction, see _attend_and_update).
        monkeypatch.setenv("THAWK_DECODE_APPEND", "force")
        cache = make_unrolled_cache(cfg, 1, cfg.n_ctx, jnp.float32)
        h_fused, cache_fused = forward(cfg, params, tokens, cache, offsets)

        monkeypatch.setenv("THAWK_DECODE_APPEND", "0")
        cache = make_unrolled_cache(cfg, 1, cfg.n_ctx, jnp.float32)
        h_ref, cache_ref = forward(cfg, params, tokens, cache, offsets)
    finally:
        dispatch.set_backend("auto")

    np.testing.assert_allclose(
        np.asarray(h_fused), np.asarray(h_ref), atol=2e-5, rtol=1e-4)
    for (kf, vf), (kr, vr) in zip(cache_fused, cache_ref):
        np.testing.assert_allclose(np.asarray(kf), np.asarray(kr), atol=0)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), atol=0)

@pytest.mark.parametrize("B,S,Hkv,rep,Dh,offs", [
    (1, 256, 2, 1, 128, [100]),            # single slot, partial block
    (4, 256, 2, 2, 128, [0, 85, 128, 255]),  # empty, partial, exact, last
    (8, 512, 2, 1, 128, [64 + 7 * i for i in range(8)]),  # serve-like
])
def test_walk_variant_matches_append(rng, B, S, Hkv, rep, Dh, offs):
    """flash_decode_append_walk (multi-slot flattened walk, one grid
    cell per head group) must reproduce the grid-per-slot kernel's
    output and in-place cache append exactly."""
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import (
        flash_decode_append_walk,
    )

    H = Hkv * rep
    q = rng.standard_normal((B, Hkv, rep, Dh)).astype(np.float32)
    k_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)
    lengths = np.asarray(offs, np.int32) + 1

    want, kc, vc = flash_decode_append(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_cache), jnp.asarray(v_cache), jnp.asarray(lengths),
        interpret=True,
    )
    got, kc2, vc2 = flash_decode_append_walk(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_cache), jnp.asarray(v_cache), jnp.asarray(lengths),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kc2), np.asarray(kc), atol=0)
    np.testing.assert_allclose(np.asarray(vc2), np.asarray(vc), atol=0)

def test_walk_variant_70b_gqa_shape(rng):
    """70B-topology GQA (Hkv=8, rep=8): the walk kernel's MXU path
    (rep>1 disables the rep==1-only variants) must match the grid
    kernel on the config-5 head geometry."""
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import (
        flash_decode_append_walk,
    )

    B, S, Hkv, rep, Dh = 2, 256, 8, 8, 128
    q = rng.standard_normal((B, Hkv, rep, Dh)).astype(np.float32)
    k_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)
    lengths = np.asarray([129, 40], np.int32)

    want, kc, vc = flash_decode_append(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_cache), jnp.asarray(v_cache), jnp.asarray(lengths),
        interpret=True,
    )
    got, kc2, vc2 = flash_decode_append_walk(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_cache), jnp.asarray(v_cache), jnp.asarray(lengths),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kc2), np.asarray(kc), atol=0)
    np.testing.assert_allclose(np.asarray(vc2), np.asarray(vc), atol=0)

@pytest.mark.parametrize("knob", ["THAWK_ATTN_PACK", "THAWK_ATTN_VPU"])
def test_walk_env_variants_match_baseline(rng, monkeypatch, knob):
    """The env-gated attention variants (head-packed MXU dots /
    VPU-scores) must reproduce the per-head-GEMV baseline within the
    kernel parity tolerance.  Guards the pack-precision defect (default
    MXU precision truncates the f32 operands to bf16: ~2.8e-3 error,
    100x over tolerance, caught on chip)."""
    import jax as _jax

    B, S, Hkv, rep, Dh = 2, 256, 4, 1, 128
    q = rng.standard_normal((B, Hkv, rep, Dh)).astype(np.float32)
    k_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v_cache = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, Dh)).astype(np.float32)
    lengths = np.asarray([100, 255], np.int32)

    def run():
        # The wrappers read the env at trace time; a cached trace from
        # another test would silently ignore the knob.
        _jax.clear_caches()
        from tokenhawk_tpu.ops.pallas.flash_decode_dma import (
            flash_decode_append_walk,
        )

        out, kc, vc = flash_decode_append_walk(
            jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.asarray(lengths), interpret=True,
        )
        return np.asarray(out), np.asarray(kc), np.asarray(vc)

    monkeypatch.delenv(knob, raising=False)
    want, kc1, vc1 = run()
    monkeypatch.setenv(knob, "1")
    got, kc2, vc2 = run()
    _jax.clear_caches()  # do not leak the knob'd trace to later tests
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(kc2, kc1, atol=0)
    np.testing.assert_allclose(vc2, vc1, atol=0)
