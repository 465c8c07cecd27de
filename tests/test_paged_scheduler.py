"""Paged continuous batching == dense continuous batching (greedy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.runtime.paged_scheduler import PagedScheduler
from tokenhawk_tpu.runtime.scheduler import Scheduler

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_ctx=64)
GREEDY = SamplingConfig(temperature=0.0)


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(77)
    return params_from_ggml(CFG, make_ggml_weights(CFG, rng), dtype=jnp.float32)


def _dense(params, prompts, n):
    s = Scheduler(CFG, params, sampling=GREEDY, max_batch=2,
                  cache_dtype=jnp.float32, decode_chunk=4)
    return [r.output for r in s.generate_many(prompts, max_new_tokens=n)]


def _paged(params, prompts, n, **kw):
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, **kw)
    return s, [r.output for r in s.generate_many(prompts, max_new_tokens=n)]


def test_paged_matches_dense(params):
    prompts = [[1, 5, 9, 13], [1, 30, 60, 90, 120, 150]]
    want = _dense(params, prompts, 8)
    _, got = _paged(params, prompts, 8)
    assert got == want


def test_paged_more_requests_than_slots_recycles_pages(params):
    prompts = [[1, i + 3, i + 9] for i in range(6)]
    want = _dense(params, prompts, 5)
    sched, got = _paged(params, prompts, 5, n_pages=12)
    assert got == want
    # All pages returned to the pool at the end (only trash remains out).
    assert sched.alloc.n_free == 12 - 1


def test_paged_oom_queues_requests(params):
    # Pool with room for ~one active sequence; both must still finish.
    prompts = [[1, 7, 21], [1, 2, 3]]
    sched, got = _paged(params, prompts, 4, n_pages=4)
    want = _dense(params, prompts, 4)
    assert got == want


def test_page_accounting(params):
    sched = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                           cache_dtype=jnp.float32, decode_chunk=4,
                           page_size=16, n_pages=10)
    from tokenhawk_tpu.runtime.scheduler import Request

    req = Request(prompt=[1, 4, 7], max_new_tokens=6)
    sched.submit(req)
    sched.step()
    # prompt bucket 16 -> 1 page, chunk top-up may add one more
    used = 10 - 1 - sched.alloc.n_free
    assert 1 <= used <= 3
    sched.run()
    assert sched.alloc.n_free == 10 - 1


def test_chunked_prefill_matches_single_shot(params):
    """A long prompt admitted in page-aligned chunks decodes the same
    greedy continuation as single-shot admission."""
    rng = np.random.default_rng(21)
    long_prompt = [1] + rng.integers(3, 500, 40).tolist()  # 41 tokens
    short = [1, 5, 9]
    _, want = _paged(params, [long_prompt, short], 6)
    _, got = _paged(params, [long_prompt, short], 6, prefill_chunk=16)
    assert got == want


def test_chunked_prefill_interleaves_decode(params):
    """While a long prompt is chunk-prefilling, an already-active slot
    keeps emitting tokens (the stall-bounding property)."""
    rng = np.random.default_rng(22)
    long_prompt = [1] + rng.integers(3, 500, 40).tolist()
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                       cache_dtype=jnp.float32, decode_chunk=2,
                       page_size=16, prefill_chunk=16)
    from tokenhawk_tpu.runtime.scheduler import Request

    r_short = Request(prompt=[1, 5, 9], max_new_tokens=32)
    s.submit(r_short)
    s.step()  # short admits + decodes
    emitted_before = len(r_short.output)
    r_long = Request(prompt=long_prompt, max_new_tokens=4)
    s.submit(r_long)
    s.step()  # long claims its slot, first chunk only; short still decodes
    assert s.chunking[1] is not None or s.chunking[0] is not None
    assert len(r_short.output) > emitted_before
    while s.has_work:
        s.step()
    assert r_long.finish_reason in ("length", "eos")
    assert len(r_long.output) > 0


def test_chunked_prefill_page_size_validation(params):
    with pytest.raises(ValueError):
        PagedScheduler(CFG, params, max_batch=1, page_size=16,
                       prefill_chunk=20)


def test_prefix_cache_reuses_pages(params):
    """Second request with the same prompt skips its cached prefix pages
    and produces identical greedy output (the reused pages ARE the bytes
    the recomputation would produce)."""
    rng = np.random.default_rng(31)
    prompt = [1] + rng.integers(3, 500, 39).tolist()  # 40 tokens, ps=16
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, prefix_cache=True)
    [r1] = s.generate_many([prompt], max_new_tokens=6)
    assert s.prefix_hits == 0
    assert len(s._pc) == 2  # floor((40-1)/16) full pages registered
    [r2] = s.generate_many([prompt], max_new_tokens=6)
    assert s.prefix_hits == 2  # both cached pages reused
    assert r2.output == r1.output

    # without the cache: same outputs (bit-identical semantics)
    s2 = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                        cache_dtype=jnp.float32, decode_chunk=4,
                        page_size=16)
    [r3] = s2.generate_many([prompt], max_new_tokens=6)
    assert r3.output == r1.output


def test_prefix_cache_shared_prefix_different_tail(params):
    rng = np.random.default_rng(32)
    base = [1] + rng.integers(3, 500, 39).tolist()
    alt = base[:32] + rng.integers(3, 500, 10).tolist()
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=1,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=16, prefix_cache=True)
    [r1] = s.generate_many([base], max_new_tokens=4)
    [r2] = s.generate_many([alt], max_new_tokens=4)
    assert s.prefix_hits == 2  # the two full common-prefix pages

    s2 = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=1,
                        cache_dtype=jnp.float32, decode_chunk=4,
                        page_size=16, n_pages=16)
    [w2] = s2.generate_many([alt], max_new_tokens=4)
    assert r2.output == w2.output


def test_prefix_cache_eviction_under_pressure(params):
    """Idle cached pages evict LRU when the pool runs dry; requests keep
    admitting."""
    rng = np.random.default_rng(33)
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=1,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=10, prefix_cache=True)
    outs = []
    for i in range(5):
        prompt = [1 + i] + rng.integers(3, 500, 39).tolist()
        [r] = s.generate_many([prompt], max_new_tokens=4)
        assert r.finish_reason in ("length", "eos"), r.finish_reason
        outs.append(r.output)
    # pool is only 10 pages; cached entries must have been evicted
    assert len(s._pc) < 10
    assert all(o for o in outs)


def test_prefix_cache_with_chunked_prefill(params):
    rng = np.random.default_rng(34)
    prompt = [1] + rng.integers(3, 500, 60).tolist()  # 61 tokens
    kw = dict(sampling=GREEDY, max_batch=1, cache_dtype=jnp.float32,
              decode_chunk=4, page_size=16, n_pages=16)
    s0 = PagedScheduler(CFG, params, **kw)
    [want] = s0.generate_many([prompt], max_new_tokens=6)
    s = PagedScheduler(CFG, params, prefix_cache=True, prefill_chunk=32,
                       **kw)
    [r1] = s.generate_many([prompt], max_new_tokens=6)
    assert r1.output == want.output
    [r2] = s.generate_many([prompt], max_new_tokens=6)
    assert r2.output == want.output
    assert s.prefix_hits == 3  # floor(60/16) full pages


def test_infeasible_request_fails_instead_of_livelock(params):
    """A request whose page need exceeds anything the pool can ever
    provide fails with oom_pages rather than spinning step() forever."""
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=1,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=3)  # 1 trash + 2 free
    from tokenhawk_tpu.runtime.scheduler import Request

    r = Request(prompt=list(range(3, 43)), max_new_tokens=4)  # needs 4 pages
    s.submit(r)
    for _ in range(5):
        if not s.has_work:
            break
        s.step()
    assert not s.has_work
    assert r.finish_reason == "oom_pages"


def test_chunked_prefill_and_prefix_cache_int8(params):
    """Chunked prefill + prefix caching over int8 pages: outputs match
    the single-shot int8 admission (same quantized-page contents)."""
    rng = np.random.default_rng(35)
    prompt = [1] + rng.integers(3, 500, 40).tolist()
    kw = dict(sampling=GREEDY, max_batch=1, decode_chunk=4,
              page_size=16, n_pages=16, cache_dtype="int8")
    s0 = PagedScheduler(CFG, params, **kw)
    [want] = s0.generate_many([prompt], max_new_tokens=5)
    s = PagedScheduler(CFG, params, prefill_chunk=16, prefix_cache=True,
                       **kw)
    [r1] = s.generate_many([prompt], max_new_tokens=5)
    assert r1.output == want.output
    [r2] = s.generate_many([prompt], max_new_tokens=5)
    assert r2.output == want.output
    assert s.prefix_hits == 2


def test_chunked_prefill_non_pow2_pages_no_clamp_corruption():
    """Regression: the last short chunk of a long prompt must not write
    pad-only pages — with a non-power-of-two max_pages the pad page's
    table index used to clamp onto the last live page and zero token
    KV (take_along_axis clamps under jit)."""
    cfg = LlamaConfig.tiny(n_vocab=512, n_ctx=144)
    rng = np.random.default_rng(41)
    p2 = params_from_ggml(cfg, make_ggml_weights(cfg, rng),
                          dtype=jnp.float32)
    prompt = [1] + rng.integers(3, 500, 128).tolist()  # 129 tokens
    kw = dict(sampling=GREEDY, max_batch=1, cache_dtype=jnp.float32,
              decode_chunk=4, page_size=16, n_pages=16, max_seq=144)
    s0 = PagedScheduler(cfg, p2, **kw)
    [want] = s0.generate_many([prompt], max_new_tokens=5)
    s1 = PagedScheduler(cfg, p2, prefill_chunk=32, **kw)
    [got] = s1.generate_many([prompt], max_new_tokens=5)
    assert got.output == want.output


# ---------------------------------------------------------------------------
# Unrolled per-layer page pool (the serve decode-fast form, round 4)
# ---------------------------------------------------------------------------


def test_unrolled_pool_matches_stacked():
    """Unrolled params + per-layer tuple pool (in-place donated updates)
    must be bit-identical to the stacked scan form — bf16 and int8,
    plain and chunked-prefill + prefix-cache admissions."""
    from tokenhawk_tpu.models.llama import unstack_params
    from tokenhawk_tpu.runtime.paged import is_unrolled_pool

    rng = np.random.default_rng(77)
    params = params_from_ggml(CFG, make_ggml_weights(CFG, rng),
                              dtype=jnp.float32)
    params_u = unstack_params(params)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(3, CFG.n_vocab, n).tolist() for n in (5, 37)]

    for extra in (
        dict(cache_dtype=jnp.float32),
        dict(cache_dtype="int8"),
        dict(cache_dtype=jnp.float32, prefill_chunk=16, prefix_cache=True),
    ):
        kw = dict(sampling=GREEDY, max_batch=2, max_seq=64, page_size=16,
                  n_pages=24, decode_chunk=4, **extra)
        s_ref = PagedScheduler(CFG, params, **kw)
        s_unr = PagedScheduler(CFG, params_u, **kw)
        assert s_unr._unrolled and is_unrolled_pool(s_unr.cache)
        assert not s_ref._unrolled
        want = [r.output for r in s_ref.generate_many(prompts,
                                                      max_new_tokens=7)]
        got = [r.output for r in s_unr.generate_many(prompts,
                                                     max_new_tokens=7)]
        assert got == want, extra


def test_unrolled_pool_speculative_matches():
    """Speculative serving over the unrolled pool (verify writes pages
    in place) stays bit-identical to non-speculative greedy."""
    import jax

    from tokenhawk_tpu.models.llama import init_params, unstack_params

    draft_cfg = LlamaConfig(n_vocab=CFG.n_vocab, n_embd=32, n_head=2,
                            n_layer=1, n_ctx=64, n_ff=48)
    rng = np.random.default_rng(77)
    params_u = unstack_params(params_from_ggml(
        CFG, make_ggml_weights(CFG, rng), dtype=jnp.float32))
    kw = dict(sampling=GREEDY, max_batch=2, max_seq=64, page_size=16,
              n_pages=24, decode_chunk=4, cache_dtype=jnp.float32)
    plain = PagedScheduler(CFG, params_u, **kw)
    spec = PagedScheduler(
        CFG, params_u, draft_cfg=draft_cfg,
        draft_params=init_params(draft_cfg, jax.random.PRNGKey(0),
                                 jnp.float32), gamma=3, **kw)
    prompts = [[1, 5, 9, 13, 17], [1, 30, 60]]
    want = [r.output for r in plain.generate_many(prompts, max_new_tokens=9)]
    got = [r.output for r in spec.generate_many(prompts, max_new_tokens=9)]
    assert got == want


def test_batched_admission_matches_sequential(params):
    """Same-step multi-slot admissions go through ONE padded prefill
    dispatch (_admit_batch); outputs must be identical to admitting the
    same requests one step apart (each a batch of 1)."""
    from tokenhawk_tpu.runtime.scheduler import Request

    prompts = [[1, 5, 9, 13], [1, 30, 60, 90, 120], [1, 4, 4, 8],
               [1, 2, 3, 4, 5, 6, 7]]

    def run(stagger):
        s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=4,
                           cache_dtype=jnp.float32, decode_chunk=4,
                           page_size=16, n_pages=24)
        reqs = [Request(prompt=p, max_new_tokens=6) for p in prompts]
        if stagger:
            for r in reqs:
                s.submit(r)
                s.step()  # admit alone: batch of exactly 1
        else:
            for r in reqs:
                s.submit(r)  # all four admit in step 1: one batch of 4
        while s.has_work:
            s.step()
        return [r.output for r in reqs]

    assert run(stagger=False) == run(stagger=True)


def test_batched_admission_mixed_sampling_reproducible(params):
    """Per-request sampling params survive the fused multi-slot state
    scatter: a seeded stochastic request admitted in a batch yields the
    same tokens as when admitted alone (per-slot counter RNG)."""
    from tokenhawk_tpu.runtime.scheduler import Request

    mk = lambda: [  # noqa: E731
        Request(prompt=[1, 9, 17], max_new_tokens=6),  # scheduler default
        Request(prompt=[1, 33, 65], max_new_tokens=6,
                sampling=SamplingConfig(temperature=0.9, top_k=13, seed=5)),
        Request(prompt=[1, 8, 21], max_new_tokens=6,
                sampling=SamplingConfig(temperature=0.7, top_p=0.8,
                                        seed=11)),
    ]

    def run(batched):
        s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=4,
                           cache_dtype=jnp.float32, decode_chunk=4,
                           page_size=16, n_pages=24)
        reqs = mk()
        for r in reqs:
            s.submit(r)
            if not batched:
                s.step()
        while s.has_work:
            s.step()
        return [r.output for r in reqs]

    assert run(batched=True) == run(batched=False)


def test_batched_admission_pads_to_pow2(params, monkeypatch):
    """A 3-wide group prefills as a padded 4-row dispatch; padding rows
    must not perturb live slots (trash-table writes, dropped scatter)."""
    from tokenhawk_tpu.runtime.scheduler import Request

    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=4,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=24)
    seen = []
    orig = s._prefill

    def spy(params_, cache, toks, lengths, table):
        seen.append(tuple(toks.shape))
        return orig(params_, cache, toks, lengths, table)

    s._prefill = spy
    prompts = [[1, 5, 9], [1, 30, 60, 90], [1, 4, 4, 8, 15]]
    got = [r.output
           for r in s.generate_many(prompts, max_new_tokens=5)]
    want = _dense(params, prompts[:2], 5) + _dense(params, prompts[2:], 5)
    assert got == want
    assert seen and seen[0][0] == 4  # 3 admissions padded to 4 rows


def test_batched_cont_admission_matches_sequential(params):
    """Prefix-cache continuation admissions also batch (one padded
    prefill_cont dispatch); outputs identical to staggered admission."""
    from tokenhawk_tpu.runtime.scheduler import Request

    shared = [1] + list(range(3, 3 + 31))  # two full 16-token pages

    def run(stagger):
        s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=4,
                           cache_dtype=jnp.float32, decode_chunk=4,
                           page_size=16, n_pages=40, prefix_cache=True)
        # seed the prefix cache so later admissions take the cont path
        s.generate_many([shared + [200, 201]], max_new_tokens=2)
        reqs = [Request(prompt=shared + [210 + i, 99, 98 - i],
                        max_new_tokens=6) for i in range(3)]
        for r in reqs:
            s.submit(r)
            if stagger:
                s.step()
        while s.has_work:
            s.step()
        assert s.prefix_hits >= (3 if stagger else 3)
        return [r.output for r in reqs]

    assert run(stagger=False) == run(stagger=True)

def test_batched_chunk_advance_matches_sequential(params, monkeypatch):
    """Two long prompts chunk-prefilling at the same time advance as ONE
    padded prefill_cont dispatch per step (_advance_chunking_batch);
    outputs identical to the single-slot path, including the step where
    the shorter prompt completes (mixed completion group: the finishing
    row activates from the leading logits row, the other keeps its
    chunking state)."""
    from tokenhawk_tpu.runtime.scheduler import Request

    rng = np.random.default_rng(31)
    long_a = [1] + rng.integers(3, 500, 44).tolist()  # 45 tok: 3 chunks
    long_b = [1] + rng.integers(3, 500, 33).tolist()  # 34 tok: 3 chunks

    def run(single):
        s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                           cache_dtype=jnp.float32, decode_chunk=4,
                           page_size=16, n_pages=24, prefill_chunk=16)
        if single:
            # Force the pre-batching behavior: one slot per step.
            def one_per_step():
                for slot in range(s.B):
                    if s.chunking[slot] is not None:
                        s._advance_chunking(slot)
                        break

            monkeypatch.setattr(s, "_advance_chunking_batch", one_per_step)
        widths = []
        orig = s._prefill_cont

        def spy(params_, cache, toks, table, start, n_new):
            widths.append(tuple(toks.shape))
            return orig(params_, cache, toks, table, start, n_new)

        s._prefill_cont = spy
        reqs = [Request(prompt=long_a, max_new_tokens=6),
                Request(prompt=long_b, max_new_tokens=6)]
        for r in reqs:
            s.submit(r)
        while s.has_work:
            s.step()
        return [r.output for r in reqs], widths

    got, widths = run(single=False)
    want, _ = run(single=True)
    assert got == want
    # The full-width chunk advances really batched: a 2-row dispatch.
    assert any(w[0] == 2 for w in widths)

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_workload_matches_dense(params, seed):
    """Fuzz the production composition: random prompt lengths (some
    above prefill_chunk, some sharing page-aligned prefixes), staggered
    arrivals, and a mid-flight cancel — batched admissions, batched
    chunk advances, chunked prefill, and the prefix cache all engage in
    one run, and every completed request must still match the dense
    scheduler's greedy output exactly.  Ends with full page-pool
    reclamation (no leak through any admission path)."""
    from tokenhawk_tpu.runtime.scheduler import Request

    rng = np.random.default_rng(100 + seed)
    shared = [1] + rng.integers(3, 500, 31).tolist()  # two full pages
    prompts = []
    for i in range(8):
        kind = rng.integers(0, 3)
        if kind == 0:  # short unique
            prompts.append([1] + rng.integers(3, 500, int(rng.integers(2, 12))).tolist())
        elif kind == 1:  # long unique: chunk-prefills (> prefill_chunk)
            prompts.append([1] + rng.integers(3, 500, int(rng.integers(20, 44))).tolist())
        else:  # shared prefix: prefix-cache continuation admission
            prompts.append(shared + rng.integers(3, 500, int(rng.integers(2, 10))).tolist())

    want = _dense(params, prompts, 6)

    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=3,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=40, prefill_chunk=16,
                       prefix_cache=True)
    reqs = [Request(prompt=p, max_new_tokens=6) for p in prompts]
    pending = list(reqs)
    cancel_at = int(rng.integers(2, 6))
    steps = 0
    while s.has_work or pending:
        if pending:  # staggered arrivals: 0-2 submissions per step
            for _ in range(int(rng.integers(0, 3))):
                if pending:
                    s.submit(pending.pop(0))
        steps += 1
        if steps == cancel_at:
            victim = next((r for r in reqs if r.finish_reason == ""), None)
            if victim is not None:
                s.cancel(victim)
        s.step()
    for r, w in zip(reqs, want):
        if r.finish_reason == "cancelled":
            assert r.output == w[: len(r.output)]  # clean prefix, no garbage
        else:
            assert r.output == w
    # Every page either back in the pool or parked in the prefix cache
    # at refcount 0 (only the trash page stays out).
    assert s.alloc.n_free + len(set(s._pc.values())) == 40 - 1

def test_same_step_cold_prefix_shares_pages(params):
    """Same-step requests with an identical UNCACHED prefix: the first
    becomes the prefix leader (admitted solo, pages registered), the
    rest admit as batched continuations reusing the leader's pages —
    not N private prefills of the same prefix."""
    from tokenhawk_tpu.runtime.scheduler import Request

    shared = [1] + list(range(3, 3 + 31))  # two full 16-token pages

    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=4,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=40, prefix_cache=True)
    prompts = [shared + [200 + i, 99] for i in range(4)]
    reqs = [Request(prompt=p, max_new_tokens=5) for p in prompts]
    for r in reqs:
        s.submit(r)
    s.step()
    # followers hit the leader's two prefix pages (3 followers x 2)
    assert s.prefix_hits == 6
    while s.has_work:
        s.step()
    want = _dense(params, prompts[:2], 5) + _dense(params, prompts[2:], 5)
    assert [r.output for r in reqs] == want


def test_all_chunking_starved_fails_one_not_livelocks(params):
    """Two chunking slots, pool too small for either to finish, nothing
    active: the scheduler must fail ONE (oom_pages) so the other can
    finish — not spin forever in mutual waiting."""
    from tokenhawk_tpu.runtime.scheduler import Request

    rng = np.random.default_rng(77)
    long_a = [1] + rng.integers(3, 500, 44).tolist()  # needs 3 pages
    long_b = [1] + rng.integers(3, 500, 44).tolist()
    # 1 trash + 4 usable pages: both claim 1-2 pages for chunk 1, then
    # neither can grow to 3.
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=5, prefill_chunk=16)
    ra = Request(prompt=long_a, max_new_tokens=4)
    rb = Request(prompt=long_b, max_new_tokens=4)
    s.submit(ra)
    s.submit(rb)
    for _ in range(200):
        if not s.has_work:
            break
        s.step()
    assert not s.has_work, "scheduler livelocked"
    reasons = sorted([ra.finish_reason, rb.finish_reason])
    assert "oom_pages" in reasons
    assert any(r in ("eos", "length") for r in reasons)


def test_chunk_advance_single_slot_while_decoding(params):
    """With live decode streams, chunk advances keep the one-chunk-per-
    step stall bound (no multi-row chunk dispatch while n_active > 0)."""
    from tokenhawk_tpu.runtime.scheduler import Request

    rng = np.random.default_rng(78)
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=3,
                       cache_dtype=jnp.float32, decode_chunk=2,
                       page_size=16, n_pages=40, prefill_chunk=16)
    widths = []
    orig = s._prefill_cont

    def spy(p, cache, toks, table, start, n_new):
        widths.append(tuple(toks.shape))
        return orig(p, cache, toks, table, start, n_new)

    s._prefill_cont = spy
    short = Request(prompt=[1, 5, 9], max_new_tokens=24)
    s.submit(short)
    s.step()  # short is live and decoding
    la = Request(prompt=[1] + rng.integers(3, 500, 40).tolist(),
                 max_new_tokens=3)
    lb = Request(prompt=[1] + rng.integers(3, 500, 40).tolist(),
                 max_new_tokens=3)
    s.submit(la)
    s.submit(lb)
    while s.has_work:
        s.step()
    assert widths and all(w[0] == 1 for w in widths)

def test_unique_cold_prefixes_still_batch(params):
    """Distinct cold prompts under prefix_cache must still admit as ONE
    padded batch — only a prefix SHARED by same-step requests earns a
    solo leader admission (going solo for every multi-page cold prompt
    would re-serialize the batched admission path)."""
    from tokenhawk_tpu.runtime.scheduler import Request

    rng = np.random.default_rng(41)
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=4,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=40, prefix_cache=True)
    widths = []
    orig = s._prefill

    def spy(p, cache, toks, lengths, table):
        widths.append(tuple(toks.shape))
        return orig(p, cache, toks, lengths, table)

    s._prefill = spy
    # four DISTINCT multi-page prompts (cold, unshared)
    prompts = [[1 + i] + rng.integers(3, 500, 30).tolist()
               for i in range(4)]
    reqs = [Request(prompt=p, max_new_tokens=4) for p in prompts]
    for r in reqs:
        s.submit(r)
    while s.has_work:
        s.step()
    assert widths and widths[0][0] == 4  # one padded 4-row dispatch


def test_livelock_escape_prefers_infeasible_victim(params):
    """When all chunking slots are starved, the one with the LARGEST
    page need (the infeasible one) is sacrificed, not the satisfiable
    one."""
    from tokenhawk_tpu.runtime.scheduler import Request

    rng = np.random.default_rng(42)
    feasible = [1] + rng.integers(3, 500, 44).tolist()   # 45 tok: 3 pages
    infeasible = [1] + rng.integers(3, 500, 120).tolist()  # 8 pages > pool
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                       cache_dtype=jnp.float32, decode_chunk=4,
                       page_size=16, n_pages=5, prefill_chunk=16,
                       max_seq=256)
    rf = Request(prompt=feasible, max_new_tokens=4)
    ri = Request(prompt=infeasible, max_new_tokens=4)
    s.submit(rf)
    s.submit(ri)
    for _ in range(300):
        if not s.has_work:
            break
        s.step()
    assert not s.has_work
    assert ri.finish_reason == "oom_pages"
    assert rf.finish_reason in ("eos", "length")
