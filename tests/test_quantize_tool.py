import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.reader import GGMLFile
from tokenhawk_tpu.ggml.writer import write_ggml
from tokenhawk_tpu.runtime.eval import perplexity
from tokenhawk_tpu.runtime.loader import load_model
from tokenhawk_tpu.tools.quantize import quantize_file

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=300, n_embd=128, n_head=2, n_layer=2, n_ff=256)
VOCAB = [b"<unk>", b"<s>", b"</s>"]


def _write_f16_model(tmp_path):
    rng = np.random.default_rng(9)
    tensors = {k: (v.astype(np.float16) if v.ndim == 2 else v)
               for k, v in make_ggml_weights(CFG, rng).items()}
    hp = dict(n_vocab=len(VOCAB), n_embd=CFG.n_embd, n_mult=CFG.n_mult,
              n_head=CFG.n_head, n_layer=CFG.n_layer, n_rot=CFG.head_dim,
              ftype=1)
    path = tmp_path / "f16.bin"
    write_ggml(path, hp, VOCAB, None, tensors)
    return path


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0])
def test_quantize_roundtrip_loads_and_scores(tmp_path, kind):
    src = _write_f16_model(tmp_path)
    dst = tmp_path / "quant.bin"
    stats = quantize_file(str(src), str(dst), kind, verbose=False)
    assert stats["tensors_quantized"] > 0
    assert stats["output_bytes"] < stats["input_bytes"]

    with GGMLFile(dst) as f:
        assert f.tensors["layers.0.attention.wq.weight"].ggml_type == kind
        # embedding + norms stay dense
        assert f.tensors["tok_embeddings.weight"].ggml_type == GGMLType.F16
        assert f.tensors["norm.weight"].ggml_type == GGMLType.F16

    cfg_f, params_f, _ = load_model(str(src), n_ctx=64, dtype=jnp.float32,
                                    n_vocab=CFG.n_vocab)
    cfg_q, params_q, _ = load_model(str(dst), n_ctx=64, dtype=jnp.float32,
                                    n_vocab=CFG.n_vocab)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, CFG.n_vocab, size=64)
    ppl_f = perplexity(cfg_f, params_f, toks, window=32)
    ppl_q = perplexity(cfg_q, params_q, toks, window=32)
    # quantization perturbs ppl only mildly (q4 bound looser)
    bound = 0.05 if kind == GGMLType.Q8_0 else 0.35
    assert abs(np.log(ppl_q) - np.log(ppl_f)) < bound
