"""Multi-EOS stopping (Llama-3-family vocabs stop on <|end_of_text|>
AND <|eot_id|>): `eos_id` accepts an id set everywhere a single id was
accepted — engine, both schedulers, TP — and the traced done-latch
treats every member as end-of-generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import init_params
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.runtime.paged_scheduler import PagedScheduler
from tokenhawk_tpu.runtime.scheduler import Scheduler
from tokenhawk_tpu.sampling import is_eos, normalize_eos

CFG = LlamaConfig(n_vocab=97, n_embd=64, n_head=2, n_layer=2, n_ctx=96,
                  n_ff=96)
GREEDY = SamplingConfig(temperature=0.0)
PROMPT = [1, 5, 9, 13]


def test_normalize_and_is_eos():
    assert normalize_eos(2) == (2, (2,))
    assert normalize_eos((9, 2, 5)) == (2, (2, 5, 9))
    with pytest.raises(ValueError):
        normalize_eos(())
    m = is_eos(jnp.asarray([1, 2, 5, 9, 7]), (2, 5, 9))
    assert m.tolist() == [False, True, True, True, False]


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(3), jnp.float32)


@pytest.fixture(scope="module")
def baseline(params):
    """Greedy stream with an unreachable EOS: the raw token sequence."""
    eng = Engine(CFG, params, sampling=GREEDY, max_seq=96, eos_id=9999)
    return eng.generate(PROMPT, max_new_tokens=12).tokens


def test_engine_stops_on_any_member(params, baseline):
    assert len(baseline) == 12
    cut = baseline[4]  # make the 5th emitted token an extra EOS
    eng = Engine(CFG, params, sampling=GREEDY, max_seq=96,
                 eos_id=(9999, cut))
    toks = eng.generate(PROMPT, max_new_tokens=12).tokens
    assert toks == baseline[:4]  # engine excludes the EOS token itself


def test_schedulers_stop_on_any_member(params, baseline):
    cut = baseline[2]
    for make in (
        lambda: Scheduler(CFG, params, sampling=GREEDY, max_batch=2,
                          max_seq=96, cache_dtype=jnp.float32,
                          decode_chunk=4, eos_id=(9999, cut)),
        lambda: PagedScheduler(CFG, params, sampling=GREEDY, max_batch=2,
                               max_seq=96, page_size=16, n_pages=24,
                               cache_dtype=jnp.float32, decode_chunk=4,
                               eos_id=(9999, cut)),
    ):
        s = make()
        (req,) = s.generate_many([PROMPT], max_new_tokens=12)
        assert req.output == baseline[:2]  # eos token itself not emitted
        assert req.finish_reason == "eos"


def test_tp_scheduler_multi_eos(params, baseline):
    from tokenhawk_tpu.parallel import make_mesh
    from tokenhawk_tpu.parallel.tp import shard_params_tp

    cfg = LlamaConfig.tiny(n_vocab=512, n_embd=256, n_head=4, n_ctx=64,
                           n_ff=512)
    from helpers import make_ggml_weights
    from tokenhawk_tpu.models.llama import params_from_ggml

    tensors = make_ggml_weights(cfg, np.random.default_rng(8))
    p_single = params_from_ggml(cfg, tensors, dtype=jnp.float32)
    ref = Scheduler(cfg, p_single, sampling=GREEDY, max_batch=1,
                    cache_dtype=jnp.float32, decode_chunk=4, eos_id=9999)
    (r0,) = ref.generate_many([[1, 7, 3]], max_new_tokens=8)
    assert len(r0.output) == 8
    cut = r0.output[3]

    mesh = make_mesh(dp=1, tp=2)
    p_tp = shard_params_tp(
        cfg, params_from_ggml(cfg, tensors, dtype=jnp.float32,
                              row_parallel_shards=2), mesh)
    s_tp = Scheduler(cfg, p_tp, sampling=GREEDY, max_batch=1,
                     cache_dtype=jnp.float32, decode_chunk=4,
                     eos_id=(9999, cut), mesh=mesh, parallel="tp")
    (r,) = s_tp.generate_many([[1, 7, 3]], max_new_tokens=8)
    assert r.output == r0.output[:3]  # eos token itself not emitted


def test_bpe_tokenizer_eog_flows_to_engine(tmp_path):
    """A gpt2 GGUF with an <|eot_id|>-style terminator: the engine's
    traced eos set contains BOTH the eos and the eot ids."""
    import sys

    sys.path.insert(0, "tests")
    from test_tokenizer_bpe import CORPUS, _train_merges

    from helpers import make_ggml_weights
    from tokenhawk_tpu.ggml.gguf import write_gguf
    from tokenhawk_tpu.runtime.loader import load_model

    tokens, merges = _train_merges(CORPUS)
    tokens = tokens + ["<|begin_of_text|>", "<|end_of_text|>", "<|eot_id|>"]
    types = [1] * (len(tokens) - 3) + [3, 3, 3]
    n_vocab = len(tokens)
    cfg = LlamaConfig.tiny(n_vocab=n_vocab, n_embd=64, n_head=2, n_layer=2,
                           n_ff=128)
    weights = make_ggml_weights(cfg, np.random.default_rng(7))
    name_map = {
        "tok_embeddings.weight": "token_embd.weight",
        "norm.weight": "output_norm.weight",
        "output.weight": "output.weight",
    }
    for i in range(cfg.n_layer):
        for a, b in [("attention.wq", "attn_q"), ("attention.wk", "attn_k"),
                     ("attention.wv", "attn_v"),
                     ("attention.wo", "attn_output"),
                     ("attention_norm", "attn_norm"), ("ffn_norm", "ffn_norm"),
                     ("feed_forward.w1", "ffn_gate"),
                     ("feed_forward.w2", "ffn_down"),
                     ("feed_forward.w3", "ffn_up")]:
            name_map[f"layers.{i}.{a}.weight"] = f"blk.{i}.{b}.weight"
    md = {
        "general.architecture": "llama",
        "llama.embedding_length": cfg.n_embd,
        "llama.block_count": cfg.n_layer,
        "llama.attention.head_count": cfg.n_head,
        "llama.feed_forward_length": cfg.n_ff,
        "llama.rope.dimension_count": cfg.head_dim,
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": n_vocab - 3,
        "tokenizer.ggml.eos_token_id": n_vocab - 2,
    }
    path = tmp_path / "m.gguf"
    write_gguf(path, md, {name_map[k]: v for k, v in weights.items()})
    lcfg, params, tok = load_model(path, n_ctx=64)
    assert tok.eog_ids == {n_vocab - 2, n_vocab - 1}
    eng = Engine(lcfg, params, tokenizer=tok, sampling=GREEDY, max_seq=64)
    assert set(eng.eos_ids) == {n_vocab - 2, n_vocab - 1}
