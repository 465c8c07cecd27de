"""The one-shot real-model validation procedure runs end-to-end on a
synthetic model (weight-holders point it at real GGML weights)."""

import subprocess
import sys

import numpy as np

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.ggml.writer import write_ggml

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=300, n_embd=128, n_head=2, n_layer=2, n_ff=256)
VOCAB = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)] + [
    bytes([97 + i % 26]) * 2 for i in range(300 - 259)
]


def test_validate_real_model_runs(tmp_path):
    rng = np.random.default_rng(3)
    tensors = make_ggml_weights(CFG, rng)
    hp = dict(n_vocab=len(VOCAB), n_embd=CFG.n_embd, n_mult=CFG.n_mult,
              n_head=CFG.n_head, n_layer=CFG.n_layer, n_rot=CFG.head_dim,
              ftype=0)
    model = tmp_path / "model.bin"
    write_ggml(model, hp, VOCAB, None, tensors)
    text = tmp_path / "corpus.txt"
    text.write_text("the quick brown fox jumps over the lazy dog. " * 40)

    proc = subprocess.run(
        [sys.executable, "-m", "tokenhawk_tpu.tools.validate_real_model",
         "--model", str(model), "--text", str(text),
         "--window", "64", "--max-windows", "3", "--quant", "q8_0"],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert proc.returncode in (0, 1), proc.stderr[-2000:]
    assert "f16 ppl:" in proc.stdout
    assert "q8_0 ppl:" in proc.stdout
