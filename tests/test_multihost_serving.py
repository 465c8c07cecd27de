"""Replicated-control multi-host serving protocol
(parallel/multihost_serving.py).

A coordinator and a follower driver run two independent scheduler
instances over the same weights, connected only by the control-packet
transport (faked in-process).  Multi-host correctness = the follower,
replaying packets, reproduces the coordinator's outputs exactly — the
single invariant JAX's multi-controller model needs from a host-driven
scheduler."""

import jax
import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import init_params
from tokenhawk_tpu.parallel.multihost_serving import (
    MultihostServingDriver,
    decode_packet,
    encode_packet,
)
from tokenhawk_tpu.runtime.paged_scheduler import PagedScheduler
from tokenhawk_tpu.runtime.scheduler import Request

CFG = LlamaConfig(n_vocab=97, n_embd=64, n_head=2, n_layer=2, n_ctx=96,
                  n_ff=96)


def _sched():
    params = init_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    return PagedScheduler(
        CFG, params, sampling=SamplingConfig(temperature=0.0), max_batch=2,
        max_seq=96, page_size=16, n_pages=24, decode_chunk=4,
        cache_dtype=jnp.float32)


class FakeTransport:
    """One-way packet queue standing in for broadcast_one_to_all."""

    def __init__(self):
        self.q = []

    def coordinator(self, payload):
        self.q.append(payload)
        return payload

    def follower(self, payload):
        assert payload is None
        return self.q.pop(0)


def test_packet_roundtrip():
    reqs = [Request(prompt=[1, 2, 3], max_new_tokens=5),
            Request(prompt=[4], max_new_tokens=2,
                    sampling=SamplingConfig(temperature=0.7, top_k=11,
                                            seed=42))]
    data = encode_packet(reqs, [7], stop=False)
    out, cancels, stop = decode_packet(data)
    assert [r.prompt for r in out] == [[1, 2, 3], [4]]
    assert out[0].sampling is None
    assert out[1].sampling.top_k == 11 and out[1].sampling.seed == 42
    assert cancels == [7] and stop is False
    _, _, stop2 = decode_packet(encode_packet([], [], stop=True))
    assert stop2 is True


def test_follower_reproduces_coordinator():
    """Mid-stream admissions through the packet protocol: the follower's
    scheduler finishes with identical outputs per request id."""
    t = FakeTransport()
    drv_c = MultihostServingDriver(_sched(), is_coordinator=True,
                                   broadcast=t.coordinator)
    drv_f = MultihostServingDriver(_sched(), is_coordinator=False,
                                   broadcast=t.follower)

    rng = np.random.default_rng(0)
    r1 = Request(prompt=rng.integers(3, 90, 5).tolist(), max_new_tokens=8)
    r2 = Request(prompt=rng.integers(3, 90, 3).tolist(), max_new_tokens=5,
                 sampling=SamplingConfig(temperature=0.8, top_k=20, seed=9))
    drv_c.submit(r1)

    rounds = 0
    submitted_late = False
    while drv_c.has_work:
        drv_c.step()
        assert drv_f.step()
        rounds += 1
        if rounds == 2 and not submitted_late:
            drv_c.submit(r2)  # arrives mid-flight, rides round 3's packet
            submitted_late = True
    drv_c.step(stop=True)
    assert drv_f.step() is False

    want = {tuple(r.prompt): r.output
            for r in drv_c.sched.finished}
    got = {tuple(r.prompt): r.output
           for r in drv_f.sched.finished}
    assert want == got and len(want) == 2
    assert r1.output and r2.output  # coordinator callbacks saw tokens


def test_follower_rejects_external_submission():
    t = FakeTransport()
    drv_f = MultihostServingDriver(_sched(), is_coordinator=False,
                                   broadcast=t.follower)
    import pytest

    with pytest.raises(RuntimeError):
        drv_f.submit(Request(prompt=[1], max_new_tokens=1))
