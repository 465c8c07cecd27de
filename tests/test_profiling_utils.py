import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.models.llama import init_params
from tokenhawk_tpu.utils.profiling import (
    decode_speed_of_light,
    kv_stream_bytes,
    roofline_fraction,
    weight_stream_bytes,
)
from tokenhawk_tpu.utils.timing import TokenTimer, descriptive_stats

import jax


def test_weight_stream_bytes_counts_everything_but_embedding():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    total = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    got = weight_stream_bytes(params)
    assert got == total - params.tok_embd.nbytes


def test_speed_of_light_math():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    sol = decode_speed_of_light(params, chip="v5e")
    assert sol == 819e9 / weight_stream_bytes(params)
    assert abs(roofline_fraction(sol / 2, params, chip="v5e") - 0.5) < 1e-9


def test_kv_stream_bytes():
    cfg = LlamaConfig.tiny()
    b = kv_stream_bytes(cfg, n_past=10, batch=2, dtype_bytes=2)
    assert b == 2 * cfg.n_layer * 2 * cfg.n_kv_head * 10 * cfg.head_dim * 2


def test_descriptive_stats_fields():
    s = descriptive_stats([1.0, 2.0, 3.0, 4.0, 100.0])
    for k in ("mean_ms", "median_ms", "mode_ms", "stddev_ms",
              "p99_ms", "p95_ms", "p5_ms", "p1_ms", "count"):
        assert k in s
    assert s["count"] == 5
    assert s["median_ms"] == 3.0


def test_token_timer_collects():
    t = TokenTimer()
    for _ in range(5):
        t.tick()
    assert len(t.samples_ms) == 4
    assert t.stats()["count"] == 4
