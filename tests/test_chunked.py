"""TH chunk container: split a GGML file, re-read via ChunkedReader."""

import numpy as np
import pytest

from tokenhawk_tpu.ggml.chunked import ChunkedReader, split_ggml
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.quants import dequantize, quantize
from tokenhawk_tpu.ggml.reader import GGMLFile
from tokenhawk_tpu.ggml.writer import write_ggml

HP = dict(n_vocab=3, n_embd=64, n_mult=256, n_head=2, n_layer=1, n_rot=32, ftype=1)
VOCAB = [b"<unk>", b"<s>", b"</s>"]


def _model(tmp_path, rng, n_tensors=6, quant=False):
    tensors = {}
    for i in range(n_tensors):
        w = rng.standard_normal((16, 64)).astype(np.float32)
        if quant and i % 2 == 0:
            tensors[f"t{i}"] = quantize(w, GGMLType.Q4_0)
        else:
            tensors[f"t{i}"] = w
    path = tmp_path / "model.bin"
    write_ggml(path, HP, VOCAB, None, tensors)
    return path, tensors


def test_split_and_reload(tmp_path, rng):
    path, tensors = _model(tmp_path, rng)
    chunks = split_ggml(path, tmp_path / "chunks", max_chunk_bytes=8192)
    assert len(chunks) >= 3  # header + >=1 weights + footer

    cr = ChunkedReader(tmp_path / "chunks")
    assert cr.hparams.n_embd == 64
    assert cr.vocab.tokens == VOCAB
    assert set(cr.tensors) == set(tensors)
    for name, w in tensors.items():
        np.testing.assert_array_equal(cr.load_tensor(name), w)


def test_split_quantized(tmp_path, rng):
    path, tensors = _model(tmp_path, rng, quant=True)
    split_ggml(path, tmp_path / "chunks", max_chunk_bytes=4096)
    cr = ChunkedReader(tmp_path / "chunks")
    for name, w in tensors.items():
        got = cr.load_tensor(name)
        if hasattr(w, "qs"):
            np.testing.assert_array_equal(got.qs, w.qs)
            np.testing.assert_allclose(dequantize(got), dequantize(w))
        else:
            np.testing.assert_array_equal(got, w)


def test_chunk_alignment_preserved(tmp_path, rng):
    """Tensor data stays 32-byte aligned relative to the original file."""
    path, _ = _model(tmp_path, rng)
    split_ggml(path, tmp_path / "chunks", max_chunk_bytes=100000)
    cr = ChunkedReader(tmp_path / "chunks")
    with GGMLFile(path) as f:
        for name, rec in cr.tensors.items():
            assert rec.data_offset == f.tensors[name].data_offset
            assert rec.data_offset % 32 == 0


def test_footer_count_mismatch_detected(tmp_path, rng):
    path, _ = _model(tmp_path, rng)
    chunks = split_ggml(path, tmp_path / "chunks", max_chunk_bytes=8192)
    # Delete a weights chunk -> count mismatch
    chunks[1].unlink()
    with pytest.raises(ValueError, match="chunk count mismatch"):
        ChunkedReader(tmp_path / "chunks")
