import jax
import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.config import SamplingConfig
from tokenhawk_tpu.sampling import (
    apply_repeat_penalty,
    greedy,
    sample,
    top_k_mask,
    top_p_mask,
)


def test_greedy_matches_argmax(rng):
    logits = jnp.asarray(rng.standard_normal((3, 100)).astype(np.float32))
    cfg = SamplingConfig(temperature=0.0)
    out = sample(logits, jax.random.PRNGKey(0), cfg)
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))
    np.testing.assert_array_equal(np.asarray(greedy(logits)), np.asarray(out))


def test_top_k_keeps_k_best(rng):
    logits = jnp.asarray(rng.standard_normal((2, 50)).astype(np.float32))
    masked = top_k_mask(logits, 5)
    kept = np.asarray(masked) > -1e29
    assert (kept.sum(-1) == 5).all()
    for b in range(2):
        best = set(np.argsort(np.asarray(logits)[b])[-5:])
        assert set(np.nonzero(kept[b])[0]) == best


def test_top_p_inclusive_crossing():
    # probs ~ [0.5, 0.3, 0.15, 0.05]; top_p=0.7 keeps the first two
    # (0.5 < 0.7, then 0.5+0.3 crosses -> inclusive).
    p = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.asarray(np.log(p)[None, :].astype(np.float32))
    masked = np.asarray(top_p_mask(logits, 0.7))[0]
    assert (masked[:2] > -1e29).all()
    assert (masked[2:] < -1e29).all()


def test_top_p_one_is_identity(rng):
    logits = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(top_p_mask(logits, 1.0)), np.asarray(logits))


def test_repeat_penalty_signs():
    logits = jnp.asarray(np.array([[2.0, -2.0, 1.0, -1.0]], dtype=np.float32))
    last = jnp.asarray(np.array([[0, 1]], dtype=np.int32))
    out = np.asarray(apply_repeat_penalty(logits, last, 2.0))
    # Positive seen logit divided, negative seen logit multiplied.
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0, -1.0])


def test_repeat_penalty_ignores_empty_slots():
    logits = jnp.asarray(np.array([[2.0, -2.0]], dtype=np.float32))
    last = jnp.asarray(np.array([[-1, -1]], dtype=np.int32))
    out = np.asarray(apply_repeat_penalty(logits, last, 2.0))
    np.testing.assert_allclose(out[0], [2.0, -2.0])


def test_sample_respects_top1_distribution():
    # With a dominant logit and top_k=1, sampling is deterministic.
    logits = jnp.asarray(np.array([[0.0, 10.0, 0.0]], dtype=np.float32))
    cfg = SamplingConfig(temperature=0.8, top_k=1, top_p=0.95, repeat_penalty=1.0)
    for seed in range(5):
        out = sample(logits, jax.random.PRNGKey(seed), cfg)
        assert int(out[0]) == 1


def test_sample_distribution_roughly_matches(rng):
    probs = np.array([0.7, 0.2, 0.1], dtype=np.float32)
    logits = jnp.asarray(np.log(probs)[None, :].repeat(512, 0))
    cfg = SamplingConfig(temperature=1.0, top_k=0, top_p=1.0, repeat_penalty=1.0)
    out = np.asarray(sample(logits, jax.random.PRNGKey(0), cfg))
    freq = np.bincount(out, minlength=3) / len(out)
    np.testing.assert_allclose(freq, probs, atol=0.08)
