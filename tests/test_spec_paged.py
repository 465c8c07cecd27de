"""Speculative decoding inside the PAGED continuous-batching scheduler.

Same guarantee as the dense spec scheduler: for ANY draft model, greedy
outputs are bit-identical to the non-speculative paged scheduler — the
draft only changes how many tokens commit per round.
"""

import jax
import jax.numpy as jnp
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import init_params
from tokenhawk_tpu.runtime.paged_scheduler import PagedScheduler
from tokenhawk_tpu.runtime.scheduler import Request

CFG = LlamaConfig(
    n_vocab=97, n_embd=64, n_head=2, n_layer=2, n_ctx=96, n_ff=96,
)
DRAFT_CFG = LlamaConfig(
    n_vocab=97, n_embd=32, n_head=2, n_layer=1, n_ctx=96, n_ff=48,
)
GREEDY = SamplingConfig(temperature=0.0)


def _params(cfg, seed):
    return init_params(cfg, jax.random.PRNGKey(seed), jnp.float32)


def _run(sched, prompts, max_new=(12, 7)):
    reqs = [Request(prompt=list(p), max_new_tokens=m)
            for p, m in zip(prompts, max_new)]
    for r in reqs:
        sched.submit(r)
    sched.run()
    return [r.output for r in reqs]


PROMPTS = [[1, 5, 9, 13, 17], [1, 30, 60]]


@pytest.mark.parametrize("draft_seed", [0, 7])
def test_spec_paged_matches_plain(draft_seed):
    params = _params(CFG, 3)
    kw = dict(sampling=GREEDY, max_batch=2, max_seq=96,
              cache_dtype=jnp.float32, page_size=16, n_pages=20,
              decode_chunk=4)
    want = _run(PagedScheduler(CFG, params, **kw), PROMPTS)
    got = _run(PagedScheduler(
        CFG, params, draft_cfg=DRAFT_CFG,
        draft_params=_params(DRAFT_CFG, draft_seed), gamma=3, **kw),
        PROMPTS)
    assert got == want


def test_spec_paged_draft_is_target():
    """draft == target: every proposal accepted, outputs still exact."""
    params = _params(CFG, 3)
    kw = dict(sampling=GREEDY, max_batch=2, max_seq=96,
              cache_dtype=jnp.float32, page_size=16, n_pages=20,
              decode_chunk=4)
    want = _run(PagedScheduler(CFG, params, **kw), PROMPTS)
    got = _run(PagedScheduler(
        CFG, params, draft_cfg=CFG, draft_params=params, gamma=4, **kw),
        PROMPTS)
    assert got == want


def test_spec_paged_accepts_sampled_requests():
    """Sampled requests route through the paged rejection-sampling round
    fn (round 2 rejected them)."""
    params = _params(CFG, 3)
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=1,
                       max_seq=96, cache_dtype=jnp.float32, page_size=16,
                       n_pages=20, draft_cfg=DRAFT_CFG,
                       draft_params=_params(DRAFT_CFG, 0))
    r = Request(prompt=[1, 5], max_new_tokens=4,
                sampling=SamplingConfig(temperature=0.8, seed=2))
    s.submit(r)
    s.run()
    assert r.finish_reason in ("eos", "length", "stop")


def test_spec_composes_with_prefix_cache_and_chunked():
    """spec x prefix-cache x chunked-prefill: outputs stay bit-identical
    to plain paged greedy, and the second identical prompt reuses cached
    pages (shared indices never reach the verify frontier)."""
    params = _params(CFG, 3)
    kw = dict(sampling=GREEDY, max_batch=2, max_seq=96,
              cache_dtype=jnp.float32, page_size=16, n_pages=24,
              decode_chunk=4)
    long_prompt = list(range(3, 44))  # 41 tokens: chunks + 2 cacheable pages
    want = _run(PagedScheduler(CFG, params, **kw),
                [long_prompt, [1, 5, 9]])
    s = PagedScheduler(CFG, params, draft_cfg=DRAFT_CFG,
                       draft_params=_params(DRAFT_CFG, 0), gamma=3,
                       prefix_cache=True, prefill_chunk=16, **kw)
    got = _run(s, [long_prompt, [1, 5, 9]])
    assert got == want
    got2 = _run(s, [long_prompt, [1, 5, 9]])
    assert got2 == want
    assert s.prefix_hits >= 2
