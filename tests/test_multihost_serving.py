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


def test_packet_carries_stop_sequences_and_session():
    """Stop sequences retire slots and sessions pin them — both are
    CONTROL decisions, so they must survive the wire (advisor r4)."""
    reqs = [Request(prompt=[1], max_new_tokens=3,
                    stop=[b"\x00raw\xff", b"END"], session="chat-42")]
    out, _, _ = decode_packet(encode_packet(reqs, []))
    assert out[0].stop == [b"\x00raw\xff", b"END"]
    assert out[0].session == "chat-42"
    # absent fields stay absent
    out2, _, _ = decode_packet(encode_packet(
        [Request(prompt=[2], max_new_tokens=1)], []))
    assert out2[0].stop is None and out2[0].session is None


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


def test_cancel_resolves_through_replay_map():
    """cancel(replay_id) must actually cancel — on BOTH processes.  The
    schedulers cancel by Request object identity, so the drivers keep a
    replay-ordered id -> Request map (advisor r4: the raw int silently
    matched nothing)."""
    t = FakeTransport()
    drv_c = MultihostServingDriver(_sched(), is_coordinator=True,
                                   broadcast=t.coordinator)
    drv_f = MultihostServingDriver(_sched(), is_coordinator=False,
                                   broadcast=t.follower)

    rng = np.random.default_rng(1)
    r1 = Request(prompt=rng.integers(3, 90, 4).tolist(), max_new_tokens=40)
    r2 = Request(prompt=rng.integers(3, 90, 4).tolist(), max_new_tokens=40)
    rid1 = drv_c.submit(r1)
    rid2 = drv_c.submit(r2)
    assert rid1 != rid2

    rounds = 0
    while drv_c.has_work:
        if rounds == 2:
            drv_c.cancel(rid2)  # r2 is mid-decode in a slot by now
        drv_c.step()
        assert drv_f.step()
        rounds += 1
    drv_c.step(stop=True)
    assert drv_f.step() is False

    by_prompt_c = {tuple(r.prompt): r for r in drv_c.sched.finished}
    by_prompt_f = {tuple(r.prompt): r for r in drv_f.sched.finished}
    assert by_prompt_c[tuple(r2.prompt)].finish_reason == "cancelled"
    assert by_prompt_f[tuple(r2.prompt)].finish_reason == "cancelled"
    # the cancelled request stopped at the same token on both sides and
    # well short of its budget; the survivor ran to completion identically
    for key in by_prompt_c:
        assert by_prompt_c[key].output == by_prompt_f[key].output
    assert len(by_prompt_c[tuple(r2.prompt)].output) < 40
    assert by_prompt_c[tuple(r1.prompt)].finish_reason != "cancelled"


def test_stop_sequence_parity_across_processes():
    """A stop-sequence retirement is a control decision: with the stop
    text on the wire and a local detok on every process, coordinator and
    follower retire the slot at the same step with identical output."""
    detok = lambda t: f"<{t}>".encode()  # noqa: E731

    # Phase 1: learn what this toy model generates (no stop).
    t = FakeTransport()
    drv_c = MultihostServingDriver(_sched(), is_coordinator=True,
                                   broadcast=t.coordinator)
    drv_f = MultihostServingDriver(_sched(), is_coordinator=False,
                                   broadcast=t.follower)
    probe = Request(prompt=[5, 6, 7], max_new_tokens=12)
    drv_c.submit(probe)
    while drv_c.has_work:
        drv_c.step()
        drv_f.step()
    drv_c.step(stop=True)
    drv_f.step()
    assert len(probe.output) >= 4

    # Phase 2: fresh pair; stop on the 4th generated token's text.
    stop_text = detok(probe.output[3])
    t2 = FakeTransport()
    drv_c2 = MultihostServingDriver(_sched(), is_coordinator=True,
                                    broadcast=t2.coordinator, detok=detok)
    drv_f2 = MultihostServingDriver(_sched(), is_coordinator=False,
                                    broadcast=t2.follower, detok=detok)
    req = Request(prompt=[5, 6, 7], max_new_tokens=12, stop=[stop_text])
    drv_c2.submit(req)
    while drv_c2.has_work:
        drv_c2.step()
        drv_f2.step()
    drv_c2.step(stop=True)
    drv_f2.step()

    fin_c = drv_c2.sched.finished[-1]
    fin_f = drv_f2.sched.finished[-1]
    assert fin_c.finish_reason == "stop"
    assert fin_f.finish_reason == "stop"
    assert fin_c.output == fin_f.output
    assert len(fin_c.output) < len(probe.output)


def test_follower_without_detok_rejects_stop_requests():
    import pytest

    t = FakeTransport()
    drv_c = MultihostServingDriver(_sched(), is_coordinator=True,
                                   broadcast=t.coordinator,
                                   detok=lambda t_: b"x")
    drv_f = MultihostServingDriver(_sched(), is_coordinator=False,
                                   broadcast=t.follower)  # no detok
    drv_c.submit(Request(prompt=[1, 2], max_new_tokens=2, stop=[b"zz"]))
    drv_c.step()
    with pytest.raises(RuntimeError, match="detok"):
        drv_f.step()


def test_follower_rejects_external_submission():
    t = FakeTransport()
    drv_f = MultihostServingDriver(_sched(), is_coordinator=False,
                                   broadcast=t.follower)
    import pytest

    with pytest.raises(RuntimeError):
        drv_f.submit(Request(prompt=[1], max_new_tokens=1))
