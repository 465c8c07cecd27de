"""Stop sequences: holdback streaming filter + scheduler integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.runtime.scheduler import Request, Scheduler

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_ctx=64)
GREEDY = SamplingConfig(temperature=0.0)


def _req(stop, pieces):
    """Request whose detok maps token i -> pieces[i]."""
    emitted = []
    r = Request(prompt=[1], stop=[s.encode() for s in stop],
                detok=lambda t: pieces[t],
                on_text=lambda b: emitted.append(b))
    return r, emitted


def test_feed_text_simple_match():
    r, out = _req(["END"], [b"he", b"llo E", b"ND tail"])
    assert not r.feed_text(0)
    assert not r.feed_text(1)  # "E" held back (possible stop prefix)
    assert r.feed_text(2)  # completes "END": stop, tail suppressed
    assert b"".join(out) == b"hello "


def test_feed_text_false_prefix_flushes():
    r, out = _req(["END"], [b"E", b"N", b"X", b"!"])
    r.feed_text(0)
    r.feed_text(1)
    assert b"".join(out) == b""  # "EN" held
    assert not r.feed_text(2)  # "ENX" can't be a stop prefix anymore
    assert b"".join(out) == b"ENX"
    r.feed_text(3)
    assert b"".join(out) == b"ENX!"


def test_feed_text_stream_end_flush():
    r, out = _req(["\n\n"], [b"a\n"])
    r.feed_text(0)
    assert b"".join(out) == b"a"  # trailing \n held
    r.flush_text()
    assert b"".join(out) == b"a\n"


def test_feed_text_multiple_stops():
    r, out = _req(["</s>", "User:"], [b"ok User", b": more"])
    assert not r.feed_text(0)
    assert r.feed_text(1)
    assert b"".join(out) == b"ok "


def test_scheduler_stop_retires_slot():
    rng = np.random.default_rng(4)
    params = params_from_ggml(CFG, make_ggml_weights(CFG, rng),
                              dtype=jnp.float32)
    s = Scheduler(CFG, params, sampling=GREEDY, max_batch=2,
                  cache_dtype=jnp.float32, decode_chunk=4)
    # Free-running greedy to learn the continuation.
    probe = Request(prompt=[1, 7, 21], max_new_tokens=8)
    s.submit(probe)
    while s.has_work:
        s.step()
    assert len(probe.output) >= 3
    stop_tok = probe.output[2]  # stop on the 3rd emitted token's text

    pieces = {t: f"<{t}>".encode() for t in set(probe.output)}
    emitted = []
    r = Request(prompt=[1, 7, 21], max_new_tokens=8,
                stop=[f"<{stop_tok}>".encode()],
                detok=lambda t: pieces.get(t, str(t).encode()),
                on_text=lambda b: emitted.append(b))
    s.submit(r)
    while s.has_work:
        s.step()
    assert r.finish_reason == "stop"
    assert r.output[:2] == probe.output[:2]
    text = b"".join(emitted)
    assert f"<{stop_tok}>".encode() not in text
    assert text == b"".join(pieces[t] for t in probe.output[:2])


def test_cancel_pending_and_active():
    rng = np.random.default_rng(5)
    params = params_from_ggml(CFG, make_ggml_weights(CFG, rng),
                              dtype=jnp.float32)
    s = Scheduler(CFG, params, sampling=GREEDY, max_batch=1,
                  cache_dtype=jnp.float32, decode_chunk=4)
    r1 = Request(prompt=[1, 5], max_new_tokens=40)
    r2 = Request(prompt=[1, 9], max_new_tokens=40)
    s.submit(r1)
    s.submit(r2)  # queued behind r1 (max_batch=1)
    s.step()
    assert s.cancel(r2)  # still pending
    assert r2.finish_reason == "cancelled" and r2.done_at is not None
    assert s.cancel(r1)  # active slot
    assert r1.finish_reason == "cancelled"
    assert s.n_active == 0 and not s.pending
    assert not s.cancel(r1)  # idempotent: already gone


def test_cancel_paged_chunking():
    from tokenhawk_tpu.runtime.paged_scheduler import PagedScheduler

    rng = np.random.default_rng(6)
    params = params_from_ggml(CFG, make_ggml_weights(CFG, rng),
                              dtype=jnp.float32)
    s = PagedScheduler(CFG, params, sampling=GREEDY, max_batch=1,
                       cache_dtype=jnp.float32, decode_chunk=2,
                       page_size=16, prefill_chunk=16)
    long_prompt = [1] + rng.integers(3, 500, 40).tolist()
    r = Request(prompt=long_prompt, max_new_tokens=8)
    s.submit(r)
    s.step()  # claims slot, first chunk
    assert s.n_chunking == 1
    pool_free_before = s.alloc.n_free
    assert s.cancel(r)
    assert r.finish_reason == "cancelled"
    assert s.n_chunking == 0 and not s.has_work
    assert s.alloc.n_free > pool_free_before  # pages returned


def test_stop_enforced_without_on_text():
    """Batch callers set stop+detok without a streaming callback; the
    stop must still retire the request (detection != emission)."""
    r = Request(prompt=[1], stop=[b"END"],
                detok=lambda t: {0: b"x EN", 1: b"D y"}[t])
    assert not r.feed_text(0)
    assert r.feed_text(1)
