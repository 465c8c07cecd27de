"""Tensor-parallel PAGED serving (parallel/tp_paged.py) vs single-device.

The production stack — continuous batching over a page pool, chunked
prefill, automatic prefix caching, per-request sampling — must produce
bit-identical outputs when the page pool and weights shard across a
virtual TP mesh (BASELINE configs 4-5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.parallel import make_mesh
from tokenhawk_tpu.parallel.tp import shard_params_tp
from tokenhawk_tpu.runtime.paged_scheduler import PagedScheduler
from tokenhawk_tpu.runtime.scheduler import Request

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_embd=256, n_head=4, n_ctx=96,
                       n_ff=512)
GREEDY = SamplingConfig(temperature=0.0)


@pytest.fixture(scope="module")
def tensors():
    return make_ggml_weights(CFG, np.random.default_rng(41))


def _pair(tensors, tp, **kw):
    """(reference scheduler, TP scheduler) over the same weights."""
    mesh = make_mesh(dp=1, tp=tp)
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    params_tp = shard_params_tp(
        CFG, params_from_ggml(CFG, tensors, dtype=jnp.float32,
                              row_parallel_shards=tp), mesh)
    base = dict(sampling=GREEDY, max_batch=2, max_seq=96,
                cache_dtype=jnp.float32, page_size=16, n_pages=24,
                decode_chunk=4)
    base.update(kw)
    s_ref = PagedScheduler(CFG, params, **base)
    s_tp = PagedScheduler(CFG, params_tp, mesh=mesh, **base)
    return s_ref, s_tp


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_paged_matches_single_device(tensors, tp):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, CFG.n_vocab, n).tolist() for n in (5, 11)]
    s_ref, s_tp = _pair(tensors, tp)
    want = [r.output for r in s_ref.generate_many(prompts,
                                                  max_new_tokens=7)]
    got = [r.output for r in s_tp.generate_many(prompts, max_new_tokens=7)]
    assert got == want


def test_tp_paged_chunked_prefill_and_prefix_cache(tensors):
    """Chunked prefill + prefix cache compose with TP: a long prompt
    admits in page chunks, a repeat prompt reuses cached pages, outputs
    bit-match the single-device scheduler."""
    rng = np.random.default_rng(1)
    long_prompt = list(range(3, 44))  # 41 tokens -> chunks + cacheable pages
    s_ref, s_tp = _pair(tensors, 4, prefill_chunk=16, prefix_cache=True,
                        n_pages=32)
    want = [r.output for r in s_ref.generate_many(
        [long_prompt], max_new_tokens=6)]
    want += [r.output for r in s_ref.generate_many(
        [long_prompt], max_new_tokens=6)]
    got = [r.output for r in s_tp.generate_many(
        [long_prompt], max_new_tokens=6)]
    got += [r.output for r in s_tp.generate_many(
        [long_prompt], max_new_tokens=6)]
    assert got == want
    assert s_tp.prefix_hits >= 1  # second prompt reused pages


def test_tp_paged_sampled_requests(tensors):
    """Per-request sampling under TP: same seeds -> same outputs as the
    single-device paged scheduler (sampling is replicated per shard)."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, CFG.n_vocab, 6).tolist() for _ in range(2)]
    s_ref, s_tp = _pair(tensors, 4)
    scfg = SamplingConfig(temperature=0.8, top_k=20, seed=7)

    def run(s):
        reqs = [Request(prompt=list(p), max_new_tokens=6, sampling=scfg)
                for p in prompts]
        for r in reqs:
            s.submit(r)
        s.run()
        return [r.output for r in reqs]

    assert run(s_tp) == run(s_ref)


def test_tp_paged_int8_pages_match_single_device(tensors):
    """int8 pages under TP: the scale pages shard along the same KV-head
    axis as their payloads, so quantize-on-append and the int8 attention
    stay shard-local — outputs bit-match the single-device int8 paged
    scheduler."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, CFG.n_vocab, n).tolist() for n in (5, 9)]
    s_ref, s_tp = _pair(tensors, 4, cache_dtype="int8")
    want = [r.output for r in s_ref.generate_many(prompts, max_new_tokens=6)]
    got = [r.output for r in s_tp.generate_many(prompts, max_new_tokens=6)]
    assert got == want


def test_tp_paged_int8_chunked_prefill(tensors):
    """int8 pages + chunked prefill + TP compose."""
    long_prompt = list(range(3, 40))
    s_ref, s_tp = _pair(tensors, 2, cache_dtype="int8", prefill_chunk=16,
                        n_pages=32)
    want = [r.output for r in s_ref.generate_many([long_prompt],
                                                  max_new_tokens=5)]
    got = [r.output for r in s_tp.generate_many([long_prompt],
                                                max_new_tokens=5)]
    assert got == want


DRAFT_CFG = LlamaConfig.tiny(n_vocab=512, n_embd=128, n_head=2, n_ctx=96,
                             n_ff=128)


def _draft_params(seed=0):
    import jax
    from tokenhawk_tpu.models.llama import init_params

    return init_params(DRAFT_CFG, jax.random.PRNGKey(seed), jnp.float32)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_paged_speculative_greedy(tensors, tp):
    """Speculative serving under TP: the draft runs replicated per shard,
    the target verifies head-sharded — greedy outputs bit-match the
    single-device speculative paged scheduler (which is itself
    bit-identical to non-speculative greedy, test_spec_paged.py)."""
    rng = np.random.default_rng(4)
    prompts = [rng.integers(3, CFG.n_vocab, n).tolist() for n in (5, 8)]
    kw = dict(draft_cfg=DRAFT_CFG, draft_params=_draft_params(), gamma=3)
    s_ref, s_tp = _pair(tensors, tp, **kw)
    want = [r.output for r in s_ref.generate_many(prompts, max_new_tokens=7)]
    got = [r.output for r in s_tp.generate_many(prompts, max_new_tokens=7)]
    assert got == want


def test_tp_paged_speculative_sampled(tensors):
    """Sampled speculation under TP: per-slot (seed, counter) RNG streams
    run on model-axis-replicated values, so the rejection-sampling draws
    match the single-device sampled speculative scheduler bit for bit."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, CFG.n_vocab, 6).tolist() for _ in range(2)]
    kw = dict(draft_cfg=DRAFT_CFG, draft_params=_draft_params(1), gamma=3)
    s_ref, s_tp = _pair(tensors, 4, **kw)
    scfg = SamplingConfig(temperature=0.8, top_k=20, seed=11)

    def run(s):
        reqs = [Request(prompt=list(p), max_new_tokens=6, sampling=scfg)
                for p in prompts]
        for r in reqs:
            s.submit(r)
        s.run()
        return [r.output for r in reqs]

    assert run(s_tp) == run(s_ref)


def test_paged_scheduler_accepts_loader_params(tmp_path):
    """REGRESSION: the loader's pipelines end in the unrolled tuple form
    while the paged forwards scan stacked layers — PagedScheduler must
    restack (and re-shard under TP).  Before this fix,
    `serving --paged -m model` crashed in lax.scan."""
    import numpy as np
    from tokenhawk_tpu.ggml.writer import write_ggml
    from tokenhawk_tpu.runtime.loader import load_model

    cfg_t = LlamaConfig.tiny(n_vocab=512, n_embd=128, n_head=2, n_layer=2,
                             n_ff=256)
    vocab = ([b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)]
             + [f"t{i}".encode() for i in range(512 - 259)])
    hp = dict(n_vocab=512, n_embd=cfg_t.n_embd, n_mult=cfg_t.n_mult,
              n_head=cfg_t.n_head, n_layer=cfg_t.n_layer,
              n_rot=cfg_t.head_dim, ftype=0)
    path = tmp_path / "m.bin"
    write_ggml(path, hp, vocab, [0.0] * 512,
               make_ggml_weights(cfg_t, np.random.default_rng(13)))

    cfg0, params0, _ = load_model(str(path), n_ctx=64, dtype=jnp.float32)
    assert isinstance(params0.layers, tuple)  # loader's unrolled form
    s0 = PagedScheduler(cfg0, params0, sampling=GREEDY, max_batch=2,
                        max_seq=64, page_size=16, n_pages=12,
                        cache_dtype=jnp.float32, decode_chunk=4)
    want = [r.output for r in s0.generate_many([[1, 5, 9]],
                                               max_new_tokens=4)]
    assert want and len(want[0]) == 4

    mesh = make_mesh(dp=1, tp=2)
    cfg, params, _ = load_model(str(path), n_ctx=64, dtype=jnp.float32,
                                mesh=mesh, parallel="tp")
    s = PagedScheduler(cfg, params, mesh=mesh, sampling=GREEDY,
                       max_batch=2, max_seq=64, page_size=16, n_pages=12,
                       cache_dtype=jnp.float32, decode_chunk=4)
    got = [r.output for r in s.generate_many([[1, 5, 9]], max_new_tokens=4)]
    assert got == want
