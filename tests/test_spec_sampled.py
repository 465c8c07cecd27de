"""Sampled (rejection-sampling) speculative decoding.

The accept/residual rule must commit tokens distributed EXACTLY as
target-only processed sampling, position by position, for any draft —
checked statistically at the round-fn level and behaviourally through
both schedulers (greedy slots in a mixed batch stay bit-identical to
non-speculative greedy output).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import KVCache, forward, init_params, logits_from_hidden
from tokenhawk_tpu.runtime.scheduler import Request, Scheduler
from tokenhawk_tpu.runtime.speculative import (
    make_spec_serving_fn,
    make_spec_serving_fn_sampled,
)
from tokenhawk_tpu.sampling import SamplingParams, processed_probs_dynamic

CFG = LlamaConfig(
    n_vocab=97, n_embd=64, n_head=2, n_layer=2, n_ctx=96, n_ff=96,
)
DRAFT_CFG = LlamaConfig(
    n_vocab=97, n_embd=32, n_head=2, n_layer=1, n_ctx=96, n_ff=48,
)
GAMMA = 3
N_RING = 16


def _params(cfg, seed):
    return init_params(cfg, jax.random.PRNGKey(seed), jnp.float32)


def _prefilled_state(target, draft, prompt):
    """Caches + state after a prompt prefill on both models."""
    tc = KVCache.create(CFG, 1, CFG.n_ctx, jnp.float32)
    dc = KVCache.create(DRAFT_CFG, 1, CFG.n_ctx, jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    off0 = jnp.zeros((1,), jnp.int32)
    h, tc = forward(CFG, target, toks, tc, off0)
    _, dc = forward(DRAFT_CFG, draft, toks, dc, off0)
    lg = logits_from_hidden(CFG, target, h[:, -1])
    first = jnp.argmax(lg, -1).astype(jnp.int32)
    offsets = jnp.asarray([len(prompt)], jnp.int32)
    ring = np.full((1, N_RING), -1, np.int32)
    hist = (prompt + [int(first[0])])[-N_RING:]
    ring[0, N_RING - len(hist):] = hist
    return tc, dc, first, offsets, jnp.asarray(ring)


def _sp(temp, seed, top_k=0, top_p=1.0, penalty=1.0):
    return SamplingParams(
        temperature=jnp.asarray([temp], jnp.float32),
        top_k=jnp.asarray([top_k], jnp.int32),
        top_p=jnp.asarray([top_p], jnp.float32),
        repeat_penalty=jnp.asarray([penalty], jnp.float32),
        seed=jnp.asarray([seed], jnp.int32),
    )


@pytest.mark.parametrize("spkw", [
    dict(temp=1.0),
    dict(temp=0.8, top_k=12, top_p=0.9, penalty=1.1),
])
def test_first_committed_token_distribution(rng, spkw):
    """Empirical distribution of the FIRST committed token over many
    seeds == the processed target distribution at that position (total
    variation within Monte-Carlo noise), for an unrelated draft."""
    target = _params(CFG, 0)
    draft = _params(DRAFT_CFG, 7)
    prompt = rng.integers(3, CFG.n_vocab, 6).tolist()
    step = make_spec_serving_fn_sampled(DRAFT_CFG, CFG, GAMMA)

    tc0, dc0, first, offsets, ring = _prefilled_state(target, draft, prompt)

    # Analytic target distribution at the first speculative position:
    # forward the committed token, process the logits.
    h, _ = forward(CFG, target,
                   jnp.asarray([[int(first[0])]], jnp.int32),
                   jax.tree_util.tree_map(jnp.copy, tc0), offsets)
    lg = logits_from_hidden(CFG, target, h[:, 0])
    kw = dict(spkw)
    temp = kw.pop("temp")
    p_t = np.asarray(processed_probs_dynamic(
        lg, _sp(temp, 0, **kw), ring), np.float64)[0]

    N = 1500
    counts = np.zeros(CFG.n_vocab, np.int64)
    done = jnp.zeros((1,), bool)
    for i in range(N):
        sp = _sp(temp, 1000 + i, **kw)
        out = step(draft, target,
                   jax.tree_util.tree_map(jnp.copy, dc0),
                   jax.tree_util.tree_map(jnp.copy, tc0),
                   first, offsets, done, ring, sp,
                   jnp.ones((1,), jnp.int32))
        tok = int(np.asarray(out[2])[0, 0])
        counts[tok] += 1

    emp = counts / N
    tv = 0.5 * np.abs(emp - p_t).sum()
    # TV of a multinomial sample vs its own distribution concentrates
    # around sqrt(K_eff/N); 0.12 gives comfortable margin at N=1500.
    assert tv < 0.12, (tv, emp.max(), p_t.max())
    # support check: committed tokens must lie inside the processed
    # support (top-k/top-p filtered distributions have exact zeros)
    assert np.all(p_t[counts > 0] > 0)


def test_sampled_fn_greedy_slots_match_greedy_fn(rng):
    """temperature=0 through the sampled fn == the exact-match greedy fn
    (one-hot distributions reduce rejection sampling to the greedy
    rule), token for token over several rounds."""
    target = _params(CFG, 0)
    draft = _params(DRAFT_CFG, 7)
    prompt = rng.integers(3, CFG.n_vocab, 5).tolist()
    g_step = make_spec_serving_fn(DRAFT_CFG, CFG, GAMMA)
    s_step = make_spec_serving_fn_sampled(DRAFT_CFG, CFG, GAMMA)

    tc, dc, first, offsets, ring = _prefilled_state(target, draft, prompt)
    tc2 = jax.tree_util.tree_map(jnp.copy, tc)
    dc2 = jax.tree_util.tree_map(jnp.copy, dc)
    done = jnp.zeros((1,), bool)
    sp = _sp(0.0, 3, penalty=1.1)
    counters = jnp.ones((1,), jnp.int32)
    last_g, off_g, done_g = first, offsets, done
    last_s, off_s, done_s, ring_s = first, offsets, done, ring
    for _ in range(4):
        dc, tc, out_g, n_g, off_g, done_g, last_g = g_step(
            draft, target, dc, tc, last_g, off_g, done_g)
        (dc2, tc2, out_s, n_s, off_s, done_s, last_s, ring_s,
         counters) = s_step(
            draft, target, dc2, tc2, last_s, off_s, done_s, ring_s, sp,
            counters)
        np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_s))
        np.testing.assert_array_equal(np.asarray(n_g), np.asarray(n_s))


def test_scheduler_mixed_batch_greedy_slot_exact(rng):
    """A spec scheduler serving one greedy and one sampled request: the
    greedy request's output must be bit-identical to the plain greedy
    scheduler's (the mixed batch routes through the sampled round fn)."""
    target = _params(CFG, 0)
    draft = _params(DRAFT_CFG, 7)
    p1 = rng.integers(3, CFG.n_vocab, 5).tolist()
    p2 = rng.integers(3, CFG.n_vocab, 7).tolist()

    base = Scheduler(CFG, target, sampling=SamplingConfig(temperature=0.0),
                     max_batch=2, max_seq=96)
    r_ref = Request(prompt=list(p1), max_new_tokens=10,
                    sampling=SamplingConfig(temperature=0.0))
    base.submit(r_ref)
    base.run()

    spec = Scheduler(CFG, target, sampling=SamplingConfig(temperature=0.0),
                     max_batch=2, max_seq=96,
                     draft_cfg=DRAFT_CFG, draft_params=draft, gamma=GAMMA)
    r_g = Request(prompt=list(p1), max_new_tokens=10,
                  sampling=SamplingConfig(temperature=0.0))
    r_s = Request(prompt=list(p2), max_new_tokens=10,
                  sampling=SamplingConfig(temperature=0.9, seed=5))
    spec.submit(r_g)
    spec.submit(r_s)
    spec.run()
    assert r_g.output == r_ref.output
    assert r_s.finish_reason in ("eos", "length", "stop")
    assert len(r_s.output) > 0


def test_paged_scheduler_sampled_spec(rng):
    """Paged spec scheduler serves sampled requests end-to-end, and a
    greedy request in the same batch matches non-spec paged greedy."""
    from tokenhawk_tpu.runtime.paged_scheduler import PagedScheduler

    target = _params(CFG, 0)
    draft = _params(DRAFT_CFG, 7)
    p1 = rng.integers(3, CFG.n_vocab, 5).tolist()
    p2 = rng.integers(3, CFG.n_vocab, 9).tolist()

    base = PagedScheduler(CFG, target,
                          sampling=SamplingConfig(temperature=0.0),
                          max_batch=2, max_seq=96, page_size=16,
                          n_pages=16)
    r_ref = Request(prompt=list(p1), max_new_tokens=9,
                    sampling=SamplingConfig(temperature=0.0))
    base.submit(r_ref)
    base.run()

    spec = PagedScheduler(CFG, target,
                          sampling=SamplingConfig(temperature=0.0),
                          max_batch=2, max_seq=96, page_size=16,
                          n_pages=16, draft_cfg=DRAFT_CFG,
                          draft_params=draft, gamma=GAMMA)
    r_g = Request(prompt=list(p1), max_new_tokens=9,
                  sampling=SamplingConfig(temperature=0.0))
    r_s = Request(prompt=list(p2), max_new_tokens=9,
                  sampling=SamplingConfig(temperature=0.9, seed=12))
    spec.submit(r_g)
    spec.submit(r_s)
    spec.run()
    assert r_g.output == r_ref.output
    # a random-weight model may legitimately sample EOS early; the slot
    # must still retire cleanly
    assert r_s.finish_reason in ("eos", "length", "stop")
