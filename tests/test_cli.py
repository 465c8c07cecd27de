"""CLI end-to-end: write a tiny model file, run the CLI, check output."""

import subprocess
import sys

import numpy as np

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.ggml.writer import write_ggml

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=300, n_embd=128, n_head=2, n_layer=2, n_ff=256)
VOCAB = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)]


def _write_model(tmp_path):
    rng = np.random.default_rng(13)
    tensors = make_ggml_weights(CFG, rng)
    hp = dict(n_vocab=len(VOCAB), n_embd=CFG.n_embd, n_mult=CFG.n_mult,
              n_head=CFG.n_head, n_layer=CFG.n_layer, n_rot=CFG.head_dim,
              ftype=0)
    path = tmp_path / "model.bin"
    write_ggml(path, hp, VOCAB, None, tensors)
    return path


def test_cli_generates(tmp_path):
    path = _write_model(tmp_path)
    proc = subprocess.run(
        [sys.executable, "-m", "tokenhawk_tpu.cli",
         "-m", str(path), "hi", "--max-tokens", "4", "--greedy",
         "--n-ctx", "64", "--dtype", "f32", "--timing"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "tok/s" in proc.stderr
    assert "generated" in proc.stderr


def test_cli_usage_error(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "tokenhawk_tpu.cli"],
        capture_output=True, text=True, timeout=120,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode != 0
    assert "model" in proc.stderr.lower() or "usage" in proc.stderr.lower()
