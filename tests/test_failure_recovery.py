"""Failure detection and recovery (SURVEY §5: the reference has none —
load failure latches a flag, step errors kill the session).

Covers: load retry with backoff, /health degradation reporting, and the
serving loop's device-state rebuild after repeated step failures.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import init_params
from tokenhawk_tpu.runtime.scheduler import Request, Scheduler
from tokenhawk_tpu.serving.server import ServingLoop
from tokenhawk_tpu.tokenizer import byte_fallback_vocab

CFG = LlamaConfig(
    n_vocab=300, n_embd=64, n_head=2, n_layer=2, n_ctx=64, n_ff=96,
)


def _sched(**kw):
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    return Scheduler(CFG, params, sampling=SamplingConfig(temperature=0.0),
                     max_batch=2, max_seq=64, **kw)


def test_load_model_retries_transient_failures(monkeypatch, tmp_path):
    from tokenhawk_tpu.runtime import loader

    calls = {"n": 0}

    def flaky(path, *a, **kw):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient transfer failure")
        return "cfg", "params", "tok"

    monkeypatch.setattr(loader, "_load_model_once", flaky)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    assert loader.load_model("x.bin", retries=2) == ("cfg", "params", "tok")
    assert calls["n"] == 3

    calls["n"] = 0
    with pytest.raises(RuntimeError):
        loader.load_model("x.bin", retries=1)

    # Corrupt/missing files must NOT retry.
    def corrupt(path, *a, **kw):
        calls["n"] += 1
        raise OSError("no such file")

    calls["n"] = 0
    monkeypatch.setattr(loader, "_load_model_once", corrupt)
    with pytest.raises(OSError):
        loader.load_model("x.bin", retries=2)
    assert calls["n"] == 1


def test_scheduler_reset_device_state_serves_again():
    sched = _sched()
    r1 = Request(prompt=[5, 6, 7], max_new_tokens=4)
    sched.submit(r1)
    sched.run()
    assert len(r1.output) > 0

    sched.reset_device_state()
    assert sched.n_active == 0 and not sched.sessions
    r2 = Request(prompt=[5, 6, 7], max_new_tokens=4)
    sched.submit(r2)
    sched.run()
    assert r2.output == r1.output  # clean state: same greedy output


def test_serving_loop_degrades_then_recovers():
    sched = _sched()
    loop = ServingLoop(sched, byte_fallback_vocab())
    assert loop.health()["status"] == "ok"

    # Inject persistent step failures: the loop must fail the active
    # requests, report degraded health, and rebuild device state after
    # RECOVER_AFTER consecutive errors.
    real_step = sched.step
    fail = {"n": 0}

    def broken_step():
        fail["n"] += 1
        raise RuntimeError("injected device fault")

    sched.step = broken_step
    loop.start()
    outs = [loop.submit_text("Hi", max_tokens=4) for _ in range(2)]
    deadline = time.time() + 30
    while loop.stats["recoveries"] == 0 and time.time() < deadline:
        time.sleep(0.05)
    assert loop.stats["recoveries"] >= 1
    assert loop.stats["step_errors"] >= ServingLoop.RECOVER_AFTER
    assert loop.health()["status"] == "degraded"  # recent errors

    # Heal the device: serving resumes for new requests.
    sched.step = real_step
    out = loop.submit_text("Hello again", max_tokens=4)
    got = []
    deadline = time.time() + 60
    while time.time() < deadline:
        piece = out.get(timeout=60)
        if isinstance(piece, tuple) and piece[0] == "__done__":
            assert not piece[1].startswith("error")
            break
        got.append(piece)
    assert got  # streamed tokens after recovery
    h = loop.health()
    assert h["recoveries"] >= 1 and h["completed"] >= 1
    loop.stop()
