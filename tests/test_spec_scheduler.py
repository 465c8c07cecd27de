"""Speculative decoding inside the continuous-batching scheduler.

The accept rule is the greedy form, so for ANY draft model the scheduler
with speculation must produce bit-identical outputs to the plain greedy
scheduler — the draft only changes how many tokens commit per round.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import init_params
from tokenhawk_tpu.runtime.scheduler import Request, Scheduler

CFG = LlamaConfig(
    n_vocab=97, n_embd=64, n_head=2, n_layer=2, n_ctx=96, n_ff=96,
)
DRAFT_CFG = LlamaConfig(
    n_vocab=97, n_embd=32, n_head=2, n_layer=1, n_ctx=96, n_ff=48,
)
GREEDY = SamplingConfig(temperature=0.0)


def _params(cfg, seed):
    return init_params(cfg, jax.random.PRNGKey(seed), jnp.float32)


def _run(sched, prompts, max_new=(12, 7, 15)):
    reqs = [Request(prompt=list(p), max_new_tokens=m)
            for p, m in zip(prompts, max_new)]
    for r in reqs:
        sched.submit(r)
    sched.run()
    return [r.output for r in reqs]


@pytest.mark.parametrize("draft_seed", [0, 7])
def test_spec_scheduler_matches_greedy(rng, draft_seed):
    """draft_seed=0 shares the target's seed family (still a different,
    smaller model); 7 is fully unrelated — acceptance differs, outputs
    must not."""
    target = _params(CFG, 0)
    draft = _params(DRAFT_CFG, draft_seed)
    prompts = [rng.integers(3, CFG.n_vocab, n).tolist() for n in (5, 11, 3)]

    base = Scheduler(CFG, target, sampling=GREEDY, max_batch=2, max_seq=96)
    want = _run(base, prompts)

    spec = Scheduler(CFG, target, sampling=GREEDY, max_batch=2, max_seq=96,
                     draft_cfg=DRAFT_CFG, draft_params=draft, gamma=3)
    got = _run(spec, prompts)
    assert got == want


def test_spec_scheduler_perfect_draft(rng):
    """Draft == target: every draft token accepts, rounds commit
    gamma+1 tokens, outputs still identical."""
    target = _params(CFG, 0)
    prompts = [rng.integers(3, CFG.n_vocab, n).tolist() for n in (6, 4)]

    base = Scheduler(CFG, target, sampling=GREEDY, max_batch=2, max_seq=96)
    want = _run(base, prompts, max_new=(10, 10))

    spec = Scheduler(CFG, target, sampling=GREEDY, max_batch=2, max_seq=96,
                     draft_cfg=CFG, draft_params=target, gamma=4)
    got = _run(spec, prompts, max_new=(10, 10))
    assert got == want


def test_spec_scheduler_sessions(rng):
    """Multi-turn sessions compose with speculation: the second message
    continues the pinned KV (both caches) and still matches the plain
    greedy scheduler run turn-for-turn."""
    target = _params(CFG, 0)
    draft = _params(DRAFT_CFG, 3)

    def two_turns(sched):
        outs = []
        for turn in range(2):
            r = Request(prompt=rng1[turn], max_new_tokens=6, session="s1")
            sched.submit(r)
            sched.run()
            assert r.finish_reason in ("length", "eos")
            outs.append(r.output)
        return outs

    rng1 = [rng.integers(3, CFG.n_vocab, 5).tolist(),
            rng.integers(3, CFG.n_vocab, 4).tolist()]
    base = Scheduler(CFG, target, sampling=GREEDY, max_batch=2, max_seq=96)
    want = two_turns(base)
    spec = Scheduler(CFG, target, sampling=GREEDY, max_batch=2, max_seq=96,
                     draft_cfg=DRAFT_CFG, draft_params=draft, gamma=3)
    got = two_turns(spec)
    assert got == want


def test_spec_scheduler_accepts_sampled():
    """Sampled requests route through the rejection-sampling round fn
    (round 2 rejected them; see test_spec_sampled.py for the
    distributional correctness tests)."""
    target = _params(CFG, 0)
    draft = _params(DRAFT_CFG, 1)
    spec = Scheduler(CFG, target,
                     sampling=SamplingConfig(temperature=0.8),
                     max_batch=2, max_seq=96,
                     draft_cfg=DRAFT_CFG, draft_params=draft)
    r = Request(prompt=[5, 6], max_new_tokens=6,
                sampling=SamplingConfig(temperature=0.9, seed=4))
    spec.submit(r)
    spec.run()
    assert r.finish_reason in ("eos", "length", "stop")
