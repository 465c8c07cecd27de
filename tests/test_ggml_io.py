import numpy as np
import pytest

from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.quants import dequantize, quantize
from tokenhawk_tpu.ggml.reader import GGMLFile, load_ggml
from tokenhawk_tpu.ggml.writer import write_ggml

HP = dict(n_vocab=4, n_embd=64, n_mult=256, n_head=2, n_layer=1, n_rot=32, ftype=1)
VOCAB = [b"<unk>", b"<s>", b"</s>", b"hello"]
SCORES = [0.0, 0.0, 0.0, -1.5]


def _write(tmp_path, tensors):
    path = tmp_path / "model.bin"
    write_ggml(path, HP, VOCAB, SCORES, tensors)
    return path


def test_header_and_vocab_roundtrip(tmp_path, rng):
    w = rng.standard_normal((8, 64)).astype(np.float32)
    path = _write(tmp_path, {"w": w})
    with GGMLFile(path) as f:
        assert f.hparams.n_vocab == 4
        assert f.hparams.n_embd == 64
        assert f.hparams.n_head == 2
        assert f.vocab.tokens == VOCAB
        np.testing.assert_allclose(f.vocab.scores, SCORES)


def test_f32_f16_tensor_roundtrip(tmp_path, rng):
    w32 = rng.standard_normal((8, 64)).astype(np.float32)
    w16 = rng.standard_normal((4, 32)).astype(np.float16)
    path = _write(tmp_path, {"a.weight": w32, "b.weight": w16})
    with GGMLFile(path) as f:
        a = f.load_tensor("a.weight")
        b = f.load_tensor("b.weight")
        assert a.dtype == np.float32 and a.shape == (8, 64)
        assert b.dtype == np.float16 and b.shape == (4, 32)
        np.testing.assert_array_equal(a, w32)
        np.testing.assert_array_equal(b, w16)


def test_data_offsets_are_32B_aligned(tmp_path, rng):
    tensors = {f"t{i}": rng.standard_normal((3, 32)).astype(np.float32) for i in range(5)}
    path = _write(tmp_path, tensors)
    with GGMLFile(path) as f:
        for rec in f:
            assert rec.data_offset % 32 == 0


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1])
def test_quantized_tensor_roundtrip(tmp_path, rng, kind):
    x = rng.standard_normal((16, 64)).astype(np.float32)
    qt = quantize(x, kind)
    path = _write(tmp_path, {"wq": qt})
    with GGMLFile(path) as f:
        qt2 = f.load_tensor("wq")
        np.testing.assert_array_equal(qt.qs, qt2.qs)
        np.testing.assert_allclose(dequantize(qt), dequantize(qt2))
        dense = f.load_tensor("wq", dequant=True)
        np.testing.assert_allclose(dense, dequantize(qt))


def test_eager_load_all(tmp_path, rng):
    w = rng.standard_normal((8, 64)).astype(np.float32)
    q = quantize(rng.standard_normal((8, 64)).astype(np.float32), GGMLType.Q4_0)
    path = _write(tmp_path, {"w": w, "q": q})
    hp, vocab, tensors = load_ggml(path)
    assert set(tensors) == {"w", "q"}
    assert hp.n_layer == 1


def test_bad_magic_rejected(tmp_path):
    path = tmp_path / "bad.bin"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        GGMLFile(path)
