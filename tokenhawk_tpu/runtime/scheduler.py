"""Continuous batching scheduler.

The reference serves exactly one request at a time (one model, one queue,
/root/reference/th-llama.cpp:464-660).  This scheduler multiplexes up to
`max_batch` concurrent requests through the batched decode step:

  - a fixed pool of batch slots, each owning a stripe of the KV cache;
  - prompts prefill into a bucket-padded cache fragment which is
    scatter-inserted into the slot's stripe (one jitted dynamic-update);
  - every decode chunk advances all active slots together; finished
    slots latch EOS on device and are recycled on the host side;
  - per-request streaming callbacks fire as chunks come back.

This is the shape-stable (jit-friendly) formulation of continuous
batching: the device never sees a dynamic batch size, only a done mask.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from functools import partial
from typing import Callable, Deque, List, Optional, Sequence

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import KVCache, LlamaParams
from tokenhawk_tpu.runtime.engine import make_decode_fn, make_prefill_fn, _bucket
from tokenhawk_tpu.sampling import sample
from tokenhawk_tpu.tokenizer import EOS_ID


@dataclasses.dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int = 256
    # Per-request sampling parameters; None = the scheduler's default.
    # Applied via traced per-slot device arrays (sampling.SamplingParams),
    # so concurrent requests with different settings share one compiled
    # decode step.
    sampling: Optional[SamplingConfig] = None
    # Multi-turn conversation id: successive requests with the same
    # session continue the same KV state (the reference chat carries
    # n_past across messages, /root/reference/web/main.cpp:160-179).
    # The session's slot stays pinned between requests, so the next
    # message prefills ONLY its new tokens (prefix cache by retention).
    session: Optional[str] = None
    on_token: Optional[Callable[[int], None]] = None
    on_done: Optional[Callable[["Request"], None]] = None
    # Stop sequences (bytes) checked against the decoded text stream.
    # Requires `detok` (token id -> bytes, supplied by the serving layer).
    # Matched text is never emitted: the stream holds back any suffix
    # that could be a stop prefix and flushes it on retirement.
    stop: Optional[List[bytes]] = None
    detok: Optional[Callable[[int], bytes]] = None
    on_text: Optional[Callable[[bytes], None]] = None
    # filled by the scheduler:
    id: int = -1
    output: List[int] = dataclasses.field(default_factory=list)
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    done_at: Optional[float] = None
    finish_reason: str = ""
    n_past0: int = 0  # KV tokens already resident when this request started
    _text_buf: bytes = b""  # holdback buffer for stop-sequence streaming

    @property
    def ttft_seconds(self) -> Optional[float]:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.submitted_at

    def feed_text(self, tok: int) -> bool:
        """Stream one token's text through the stop-sequence filter.

        Returns True if a stop sequence matched (caller retires the
        slot).  Emits via on_text; never emits matched stop text, and
        holds back any tail that could still become a stop prefix."""
        if self.detok is None:
            return False

        def emit(chunk: bytes):
            if chunk and self.on_text is not None:
                self.on_text(chunk)

        b = self.detok(tok)
        if not self.stop:
            emit(b)
            return False
        buf = self._text_buf + b
        hit = min((i for i in (buf.find(s) for s in self.stop) if i >= 0),
                  default=-1)
        if hit >= 0:
            emit(buf[:hit])
            self._text_buf = b""
            return True
        # Longest suffix of buf that is a proper prefix of some stop.
        hold = 0
        for s in self.stop:
            for n in range(min(len(s) - 1, len(buf)), 0, -1):
                if buf.endswith(s[:n]):
                    hold = max(hold, n)
                    break
        emit(buf[: len(buf) - hold] if hold else buf)
        self._text_buf = buf[len(buf) - hold :] if hold else b""
        return False

    def flush_text(self):
        """Emit any held-back text (stream ended without a stop match)."""
        if self._text_buf and self.on_text is not None:
            self.on_text(self._text_buf)
        self._text_buf = b""


@dataclasses.dataclass
class Session:
    id: str
    slot: int
    n_past: int  # conversation length (prompt + replies), in tokens
    tail: List[int]  # recent conversation tokens (repeat-penalty ring)
    # History tokens sampled but never written to the KV cache (a token's
    # KV is written when it is USED AS INPUT; the last reply token has no
    # next step if the decode chunk ended at its sampling).  They replay
    # at the start of the next continuation prefill.
    pending: List[int] = dataclasses.field(default_factory=list)
    last_used: float = 0.0


@partial(jax.jit, donate_argnums=(0,))
def _insert_fragment(big: jax.Array, frag: jax.Array, slot) -> jax.Array:
    # Only `big` can alias the output; donating the (differently-shaped)
    # fragment just produced buffer-donation warnings.
    """frag [L, 1, Hkv, Tb, Dh] -> big [L, B, Hkv, S, Dh] at (slot, seq 0)."""
    return jax.lax.dynamic_update_slice(
        big, frag.astype(big.dtype), (0, slot, 0, 0, 0)
    )


@partial(jax.jit, donate_argnums=(0,))
def _insert_fragment_unrolled(big, frag, slot):
    """Unrolled caches: per-layer tuples of ([B,Hkv,S,Dh], ...) pairs."""
    out = []
    for big_l, frag_l in zip(big, frag):
        new_l = tuple(
            jax.lax.dynamic_update_slice(b, f.astype(b.dtype), (slot, 0, 0, 0))
            for b, f in zip(big_l, frag_l)
        )
        out.append(new_l)
    return tuple(out)


def _multi_insert(b, f, slots):
    """Scatter fragment rows f [Nb, Hkv, Tb, ...] into b [B, Hkv, S, ...]
    at (slot, token 0); out-of-range slot indices (padding rows) drop."""
    idx = (slots, slice(None), slice(0, f.shape[2]))
    idx += (slice(None),) * (b.ndim - 3)
    return b.at[idx].set(f.astype(b.dtype), mode="drop")


@partial(jax.jit, donate_argnums=(0,))
def _insert_fragments_unrolled(big, frag, slots):
    """Multi-slot generalization of _insert_fragment_unrolled: one
    scatter per cache array writes every newly-admitted slot's stripe."""
    out = []
    for big_l, frag_l in zip(big, frag):
        out.append(tuple(
            _multi_insert(b, f, slots) for b, f in zip(big_l, frag_l)
        ))
    return tuple(out)


@partial(jax.jit, donate_argnums=(0,))
def _insert_fragments(big: jax.Array, frag: jax.Array, slots) -> jax.Array:
    """Stacked caches: frag [L, Nb, Hkv, Tb, Dh] -> big [L, B, Hkv, S, Dh]
    at (slot, token 0) per row; padding rows drop."""
    return big.at[:, slots, :, : frag.shape[3], :].set(
        frag.astype(big.dtype), mode="drop")


@partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 6))
def _admit_state_dense_many(logits, sp, counters, last_tok, offsets, last_n,
                            done, slots, rings, offs, slot_sp):
    """Fused multi-admission state update for the dense scheduler (the
    analogue of paged _admit_state_paged_many): one dispatch samples
    every newly-admitted slot's first token from the batched prefill
    logits [Nb, V] and scatters all per-slot device state.  Padding rows
    carry an out-of-range slot index and drop at the scatter."""
    from tokenhawk_tpu.sampling import sample_dynamic

    n = logits.shape[0]
    first = sample_dynamic(logits, slot_sp, jnp.zeros((n,), jnp.int32),
                           rings)
    sp = jax.tree_util.tree_map(
        lambda a, v: a.at[slots].set(v, mode="drop"), sp, slot_sp)
    counters = counters.at[slots].set(1, mode="drop")
    last_tok = last_tok.at[slots].set(first, mode="drop")
    offsets = offsets.at[slots].set(offs, mode="drop")
    last_n = last_n.at[slots].set(
        jnp.concatenate([rings[:, 1:], first[:, None]], axis=1),
        mode="drop")
    done = done.at[slots].set(False, mode="drop")
    return sp, counters, last_tok, offsets, last_n, done, first


@jax.jit
def _extract_stripe(big: jax.Array, slot) -> jax.Array:
    """big [L, B, Hkv, S, Dh] -> slot stripe [L, 1, Hkv, S, Dh]."""
    return jax.lax.dynamic_slice_in_dim(big, slot, 1, axis=1)


@jax.jit
def _extract_stripe_unrolled(big, slot):
    return tuple(
        tuple(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0) for a in layer)
        for layer in big
    )


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _admit_state(last_tok, offsets, last_n, done, slot, first_tok, offset, ring):
    last_tok = last_tok.at[slot].set(first_tok)
    offsets = offsets.at[slot].set(offset)
    last_n = last_n.at[slot].set(ring)
    done = done.at[slot].set(False)
    return last_tok, offsets, last_n, done


@partial(jax.jit, donate_argnums=(0,))
def _kill_slot(done, slot):
    return done.at[slot].set(True)


class Scheduler:
    native_sessions = True  # KV-pinned multi-turn sessions (see Session)

    def __init__(
        self,
        cfg: LlamaConfig,
        params: LlamaParams,
        sampling: SamplingConfig = SamplingConfig(),
        max_batch: int = 8,
        max_seq: Optional[int] = None,
        cache_dtype=jnp.bfloat16,
        decode_chunk: int = 8,
        eos_id: int = EOS_ID,
        mesh=None,
        parallel: str = "gspmd",
        draft_cfg: Optional[LlamaConfig] = None,
        draft_params: Optional[LlamaParams] = None,
        gamma: int = 4,
    ):
        self.cfg = cfg
        self.params = params
        self.sampling = sampling
        self.B = max_batch
        self.S = max_seq or cfg.n_ctx
        from tokenhawk_tpu.sampling import normalize_eos

        self.eos_id, self.eos_ids = normalize_eos(eos_id)
        eos_id = self.eos_ids if len(self.eos_ids) > 1 else self.eos_id
        self.decode_chunk = decode_chunk
        self.mesh = mesh
        self.parallel = parallel

        # Speculative serving: a draft model proposes gamma tokens per
        # round and the target commits the accepted prefix + one token —
        # continuous batching and speculation compose because every slot
        # advances by its own n_new (runtime/speculative.py).  Greedy
        # slots use the exact-match rule (bit-identical to
        # non-speculative greedy serving); sampled slots use rejection
        # sampling (outputs distributed exactly as target-only sampling,
        # including repetition penalty / top-k / top-p).
        self.spec = draft_params is not None
        self.gamma = gamma
        if self.spec:
            if draft_cfg.n_vocab != cfg.n_vocab:
                raise ValueError("draft and target must share the vocab")
            self.draft_cfg = draft_cfg
            self.draft_params = draft_params
            if mesh is not None and parallel == "tp":
                # TP speculation: draft replicated over the model axis,
                # target verify head-sharded (parallel/tp.py).
                from tokenhawk_tpu.parallel.tp import (
                    make_tp_spec_serving_fn,
                    make_tp_spec_serving_fn_sampled,
                )

                self._spec_step = make_tp_spec_serving_fn(
                    draft_cfg, cfg, mesh, gamma, eos_id, params,
                    params_d=draft_params)
                self._spec_step_sampled = make_tp_spec_serving_fn_sampled(
                    draft_cfg, cfg, mesh, gamma, eos_id, params,
                    params_d=draft_params)
            elif mesh is not None:
                raise NotImplementedError(
                    "speculative serving under a mesh requires "
                    "parallel='tp'")
            else:
                from tokenhawk_tpu.runtime.speculative import (
                    make_spec_serving_fn,
                    make_spec_serving_fn_sampled,
                )

                self._spec_step = make_spec_serving_fn(draft_cfg, cfg,
                                                       gamma, eos_id)
                self._spec_step_sampled = make_spec_serving_fn_sampled(
                    draft_cfg, cfg, gamma, eos_id)
            # Host mirror of per-slot temperatures: rounds where every
            # live slot is greedy take the cheaper exact-match fn.
            self._slot_sampled = [False] * max_batch

        if mesh is not None and parallel == "tp":
            from tokenhawk_tpu.parallel.tp import (
                make_tp_decode_fn_dynamic,
                make_tp_prefill_fn,
            )

            self._dynamic = True
            self._prefill = make_tp_prefill_fn(cfg, mesh, params)
            self._decode = make_tp_decode_fn_dynamic(cfg, mesh, decode_chunk,
                                                     eos_id, params)
        else:
            from tokenhawk_tpu.runtime.engine import make_decode_fn_dynamic

            self._dynamic = True
            self._prefill = make_prefill_fn(cfg)
            self._decode = make_decode_fn_dynamic(cfg, decode_chunk, eos_id)

        self._unrolled = isinstance(params.layers, tuple)
        if self._unrolled:
            from tokenhawk_tpu.models.llama import make_unrolled_cache

            cache = make_unrolled_cache(cfg, self.B, self.S, cache_dtype)
            if mesh is not None and parallel == "tp":
                from tokenhawk_tpu.parallel.tp import shard_cache_tp

                cache = shard_cache_tp(cache, mesh)
        else:
            cache = KVCache.create(cfg, self.B, self.S, cache_dtype)
            if mesh is not None:
                from tokenhawk_tpu.parallel import shard_kv_cache

                cache = shard_kv_cache(cache, mesh)
        self.cache = cache
        self.cache_dtype = cache_dtype

        if self.spec:
            self._draft_unrolled = isinstance(draft_params.layers, tuple)
            if self._draft_unrolled:
                from tokenhawk_tpu.models.llama import make_unrolled_cache

                self.draft_cache = make_unrolled_cache(
                    draft_cfg, self.B, self.S, cache_dtype)
            else:
                self.draft_cache = KVCache.create(
                    draft_cfg, self.B, self.S, cache_dtype)
            self._draft_prefill = make_prefill_fn(draft_cfg)

        n_ring = max(sampling.repeat_last_n, 1)
        self.n_ring = n_ring
        self.last_tok = jnp.zeros((self.B,), jnp.int32)
        self.offsets = jnp.zeros((self.B,), jnp.int32)
        self.last_n = jnp.full((self.B, n_ring), -1, jnp.int32)
        self.done = jnp.ones((self.B,), bool)
        from tokenhawk_tpu.sampling import SamplingParams

        self.sp = SamplingParams.broadcast(sampling, self.B)
        self.counters = jnp.zeros((self.B,), jnp.int32)

        self.slots: List[Optional[Request]] = [None] * self.B
        self.pending: Deque[Request] = deque()
        self.finished: List[Request] = []
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(sampling.seed)

        # Multi-turn sessions: sid -> Session; pinned maps an IDLE slot
        # to the session whose KV it retains between requests.  Pinned
        # slots are evicted LRU when fresh admissions need capacity.
        self.sessions: dict = {}
        self.pinned: dict = {}

        # Prefill buckets (powers of two).
        self.buckets = []
        b = 16
        while b < self.S:
            self.buckets.append(b)
            b *= 2
        self.buckets.append(self.S)

    # ------------------------------------------------------------------

    def _fail(self, req: Request, reason: str) -> int:
        req.finish_reason = reason
        req.done_at = time.perf_counter()
        self.finished.append(req)
        req.flush_text()
        if req.on_done:
            req.on_done(req)
        return req.id

    def submit(self, req: Request) -> int:
        req.id = next(self._ids)
        req.submitted_at = time.perf_counter()
        if req.max_new_tokens <= 0:
            return self._fail(req, "length")
        if len(req.prompt) >= self.S:
            return self._fail(req, "error:prompt_too_long")
        sess = self.sessions.get(req.session) if req.session else None
        if sess is not None:
            # Context-full up front, like the reference's onError path
            # (/root/reference/th-llama.cpp:111-119): the padded new
            # message must fit behind the session's resident tokens.
            pad = -(-len(req.prompt) // 8) * 8 + (self.gamma if self.spec else 0)
            if sess.n_past + pad >= self.S:
                return self._fail(req, "error:context_full")
        self.pending.append(req)
        return req.id

    def reset_session(self, sid: str) -> bool:
        """Forget a session's KV state (`[cmd] reset` parity,
        /root/reference/web/main.cpp:164-170).  Safe while idle."""
        sess = self.sessions.pop(sid, None)
        if sess is None:
            return False
        self.pinned.pop(sess.slot, None)
        return True

    @property
    def n_active(self) -> int:
        return sum(s is not None for s in self.slots)

    @property
    def has_work(self) -> bool:
        return self.n_active > 0 or len(self.pending) > 0

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------

    def _admit_one(self, slot: int, req: Request):
        cfg = self.cfg
        prompt = req.prompt
        Tb = _bucket(len(prompt), self.buckets)

        # Prefill into a fragment cache, then scatter into the slot stripe.
        if self._unrolled:
            from tokenhawk_tpu.models.llama import make_unrolled_cache

            frag = make_unrolled_cache(cfg, 1, Tb, self.cache_dtype)
        else:
            frag = KVCache.create(cfg, 1, Tb, self.cache_dtype)
        toks = np.zeros((1, Tb), np.int32)
        toks[0, : len(prompt)] = prompt
        frag, logits = self._prefill(
            self.params, frag,
            jnp.asarray(toks), jnp.asarray([len(prompt)], jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
        if self._unrolled:
            self.cache = _insert_fragment_unrolled(self.cache, frag, slot)
        else:
            k_big = _insert_fragment(self.cache.k, frag.k, slot)
            v_big = _insert_fragment(self.cache.v, frag.v, slot)
            self.cache = KVCache(k_big, v_big)
        if self.spec:
            self._spec_prefill(slot, toks, len(prompt), base_w=0)

        self._finish_admit(slot, req, logits, base=0, tail=[])

    def _admit_batch(self, group: list):
        """Admit a same-bucket group of plain requests with ONE padded
        prefill dispatch + ONE fused state dispatch (mirrors the paged
        scheduler's _admit_batch; row count pads to a power of two so
        at most log2(B)+1 variants compile per token bucket).  Padding
        rows carry zero lengths; their fragment rows scatter-drop via an
        out-of-range slot index."""
        cfg = self.cfg
        Tb = group[0][2]
        n = len(group)
        Nb = 1 << (n - 1).bit_length()
        if self._unrolled:
            from tokenhawk_tpu.models.llama import make_unrolled_cache

            frag = make_unrolled_cache(cfg, Nb, Tb, self.cache_dtype)
        else:
            frag = KVCache.create(cfg, Nb, Tb, self.cache_dtype)
        toks = np.zeros((Nb, Tb), np.int32)
        lengths = np.zeros((Nb,), np.int32)
        slots = np.full((Nb,), self.B, np.int32)
        rings = np.full((Nb, self.n_ring), -1, np.int32)
        scfgs = []
        for i, (slot, req, _Tb) in enumerate(group):
            prompt = req.prompt
            toks[i, : len(prompt)] = prompt
            lengths[i] = len(prompt)
            slots[i] = slot
            m = min(self.n_ring, len(prompt))
            if m:
                rings[i, self.n_ring - m:] = prompt[-m:]
            scfgs.append(req.sampling or self.sampling)
        frag, logits = self._prefill(
            self.params, frag, jnp.asarray(toks), jnp.asarray(lengths),
            jnp.zeros((Nb,), jnp.int32),
        )
        slots_dev = jnp.asarray(slots)
        if self._unrolled:
            self.cache = _insert_fragments_unrolled(self.cache, frag,
                                                    slots_dev)
        else:
            self.cache = KVCache(
                _insert_fragments(self.cache.k, frag.k, slots_dev),
                _insert_fragments(self.cache.v, frag.v, slots_dev),
            )
        from tokenhawk_tpu.sampling import SamplingParams

        slot_sp = SamplingParams.from_configs(scfgs, Nb)
        (self.sp, self.counters, self.last_tok, self.offsets, self.last_n,
         self.done, first) = _admit_state_dense_many(
            logits, self.sp, self.counters, self.last_tok, self.offsets,
            self.last_n, self.done, slots_dev, jnp.asarray(rings),
            jnp.asarray(lengths), slot_sp,
        )
        first_host = np.asarray(first)
        now = time.perf_counter()
        for i, (slot, req, _Tb) in enumerate(group):
            req.n_past0 = 0
            self.slots[slot] = req
            self.pinned.pop(slot, None)
            req.first_token_at = now
            self._deliver(slot, int(first_host[i]))

    def _continue_one(self, slot: int, req: Request, sess) -> bool:
        """Continue a session: prefill ONLY the new tokens (plus any
        pending unwritten reply tail) into the pinned slot's stripe at
        its write frontier.  The retained KV is the prefix cache — the
        conversation so far is never recomputed."""
        combined = list(sess.pending) + list(req.prompt)
        base_w = sess.n_past - len(sess.pending)  # write frontier
        Tb = None
        for b in self.buckets:
            if b >= len(combined) and base_w + b <= self.S:
                Tb = b
                break
        if Tb is None:
            Tb = -(-len(combined) // 8) * 8  # tight pad near the context edge
        if base_w + Tb > self.S:
            self._fail(req, "error:context_full")
            return False

        if self._unrolled:
            stripe = _extract_stripe_unrolled(self.cache, slot)
        else:
            stripe = KVCache(_extract_stripe(self.cache.k, slot),
                             _extract_stripe(self.cache.v, slot))
        toks = np.zeros((1, Tb), np.int32)
        toks[0, : len(combined)] = combined
        stripe, logits = self._prefill(
            self.params, stripe,
            jnp.asarray(toks), jnp.asarray([len(combined)], jnp.int32),
            jnp.asarray([base_w], jnp.int32),
        )
        if self._unrolled:
            self.cache = _insert_fragment_unrolled(self.cache, stripe, slot)
        else:
            k_big = _insert_fragment(self.cache.k, stripe.k, slot)
            v_big = _insert_fragment(self.cache.v, stripe.v, slot)
            self.cache = KVCache(k_big, v_big)
        if self.spec:
            self._spec_prefill(slot, toks, len(combined), base_w=base_w)

        self._finish_admit(slot, req, logits, base=sess.n_past, tail=sess.tail)
        return True

    def _spec_prefill(self, slot: int, toks: np.ndarray, n: int, base_w: int):
        """Mirror an admission/continuation prefill into the DRAFT cache
        (its logits are unused — the first token always comes from the
        target; the draft only needs the KV state)."""
        Tb = toks.shape[1]
        if self._draft_unrolled:
            from tokenhawk_tpu.models.llama import make_unrolled_cache

            if base_w == 0:
                frag = make_unrolled_cache(self.draft_cfg, 1, Tb,
                                           self.cache_dtype)
            else:
                frag = _extract_stripe_unrolled(self.draft_cache, slot)
            frag, _ = self._draft_prefill(
                self.draft_params, frag, jnp.asarray(toks),
                jnp.asarray([n], jnp.int32),
                jnp.asarray([base_w], jnp.int32),
            )
            self.draft_cache = _insert_fragment_unrolled(
                self.draft_cache, frag, slot)
        else:
            if base_w == 0:
                frag = KVCache.create(self.draft_cfg, 1, Tb, self.cache_dtype)
            else:
                frag = KVCache(_extract_stripe(self.draft_cache.k, slot),
                               _extract_stripe(self.draft_cache.v, slot))
            frag, _ = self._draft_prefill(
                self.draft_params, frag, jnp.asarray(toks),
                jnp.asarray([n], jnp.int32),
                jnp.asarray([base_w], jnp.int32),
            )
            self.draft_cache = KVCache(
                _insert_fragment(self.draft_cache.k, frag.k, slot),
                _insert_fragment(self.draft_cache.v, frag.v, slot),
            )

    def _finish_admit(self, slot: int, req: Request, logits, base: int,
                      tail: List[int]):
        prompt = req.prompt
        req.n_past0 = base
        ring = np.full((self.n_ring,), -1, np.int32)
        hist = (list(tail) + list(prompt))[-self.n_ring:]
        ring[self.n_ring - len(hist):] = hist
        if self._dynamic:
            from tokenhawk_tpu.sampling import SamplingParams, sample_dynamic

            scfg = req.sampling or self.sampling
            if self.spec:
                self._slot_sampled[slot] = scfg.temperature > 0.0
            self.sp = self.sp.set_slot(slot, SamplingParams.slot_values(scfg))
            first = sample_dynamic(
                logits, SamplingParams.broadcast(scfg, 1),
                jnp.zeros((1,), jnp.int32), jnp.asarray(ring[None, :]),
            )[0]
            self.counters = self.counters.at[slot].set(1)
        else:
            first = sample(
                logits, self._next_key(), self.sampling,
                jnp.asarray(ring[None, :]),
            )[0]

        self.last_tok, self.offsets, self.last_n, self.done = _admit_state(
            self.last_tok, self.offsets, self.last_n, self.done,
            slot, first, base + len(prompt),
            jnp.concatenate([jnp.asarray(ring[1:]), first[None]]),
        )
        self.slots[slot] = req
        # The slot now belongs to this request; drop any idle pin.
        self.pinned.pop(slot, None)
        req.first_token_at = time.perf_counter()
        self._deliver(slot, int(first))

    def _deliver(self, slot: int, tok: int) -> bool:
        """Feed one token to the request in `slot`; True if it stays active."""
        req = self.slots[slot]
        if req is None:
            return False
        if tok in self.eos_ids:
            self._retire(slot, "eos")
            return False
        req.output.append(tok)
        if req.on_token:
            req.on_token(tok)
        if req.feed_text(tok):
            self._retire(slot, "stop")
            return False
        if len(req.output) >= req.max_new_tokens:
            self._retire(slot, "length")
            return False
        # Spec mode retires gamma tokens early: the next round's target
        # forward writes a [gamma+1] block, and a block whose dus start
        # would clamp below the committed frontier must never be issued
        # (it would overwrite session history).
        margin = 1 + (self.gamma if self.spec else 0)
        if req.n_past0 + len(req.prompt) + len(req.output) >= self.S - margin:
            self._retire(slot, "context_full")
            return False
        return True

    def _retire(self, slot: int, reason: str):
        req = self.slots[slot]
        req.finish_reason = reason
        req.done_at = time.perf_counter()
        self.slots[slot] = None
        self.done = _kill_slot(self.done, slot)
        if req.session is not None and not reason.startswith("error"):
            # Pin the slot: its KV stripe (prompt + response) is the
            # session's context for the next message.
            tail = (list(req.prompt) + list(req.output))[-self.n_ring:]
            sess = self.sessions.get(req.session)
            if sess is None:
                sess = Session(id=req.session, slot=slot, n_past=0, tail=[])
                self.sessions[req.session] = sess
            sess.slot = slot
            H = req.n_past0 + len(req.prompt) + len(req.output)
            sess.n_past = H
            # Tokens actually written to the cache = the device write
            # frontier (capped at H: overrun steps past retirement wrote
            # garbage BEYOND the history, which continuation overwrites).
            written = min(int(np.asarray(self.offsets)[slot]), H)
            hist_req = list(req.prompt) + list(req.output)
            sess.pending = hist_req[written - req.n_past0:]
            sess.tail = ((sess.tail if req.n_past0 else []) + tail)[-self.n_ring:]
            sess.last_used = time.perf_counter()
            self.pinned[slot] = req.session
        self.finished.append(req)
        req.flush_text()
        if req.on_done:
            req.on_done(req)

    def cancel(self, req: "Request", reason: str = "cancelled") -> bool:
        """Abort a request (client disconnect): frees its slot or drops
        it from the queue.  Call from the scheduler thread (the serving
        loop routes cancels through its inbox)."""
        if req in self.pending:
            self.pending.remove(req)
            req.finish_reason = reason
            req.done_at = time.perf_counter()
            self.finished.append(req)
            if req.on_done:
                req.on_done(req)
            return True
        for slot, r in enumerate(self.slots):
            if r is req:
                self._retire(slot, reason)
                return True
        return False

    def reset_device_state(self):
        """Recovery path: rebuild every device buffer from scratch.

        After repeated device-step failures (e.g. a poisoned buffer or a
        runtime fault), serving must not stay wedged: callers retire the
        active slots, then this drops all KV caches and slot state and
        reallocates clean buffers.  Sessions lose their context (their
        KV may be corrupt); the pending queue is untouched.  The
        reference has no recovery at all (SURVEY §5: load failure sets a
        flag, nothing retries)."""
        from tokenhawk_tpu.models.llama import make_unrolled_cache

        if self._unrolled:
            self.cache = make_unrolled_cache(
                self.cfg, self.B, self.S, self.cache_dtype)
            if self.mesh is not None and self.parallel == "tp":
                from tokenhawk_tpu.parallel.tp import shard_cache_tp

                self.cache = shard_cache_tp(self.cache, self.mesh)
        else:
            self.cache = KVCache.create(self.cfg, self.B, self.S,
                                        self.cache_dtype)
            if self.mesh is not None:
                from tokenhawk_tpu.parallel import shard_kv_cache

                self.cache = shard_kv_cache(self.cache, self.mesh)
        if self.spec:
            if self._draft_unrolled:
                self.draft_cache = make_unrolled_cache(
                    self.draft_cfg, self.B, self.S, self.cache_dtype)
            else:
                self.draft_cache = KVCache.create(
                    self.draft_cfg, self.B, self.S, self.cache_dtype)
        self.last_tok = jnp.zeros((self.B,), jnp.int32)
        self.offsets = jnp.zeros((self.B,), jnp.int32)
        self.last_n = jnp.full((self.B, self.n_ring), -1, jnp.int32)
        self.done = jnp.ones((self.B,), bool)
        from tokenhawk_tpu.sampling import SamplingParams

        self.sp = SamplingParams.broadcast(self.sampling, self.B)
        self.counters = jnp.zeros((self.B,), jnp.int32)
        self.slots = [None] * self.B
        self.sessions.clear()
        self.pinned.clear()

    def _free_slot(self, exclude=()) -> Optional[int]:
        """An idle unpinned slot, else evict the LRU pinned session.
        `exclude`: slots already claimed by a deferred (batched)
        admission this step — occupied, but not yet in self.slots."""
        for slot in range(self.B):
            if (self.slots[slot] is None and slot not in self.pinned
                    and slot not in exclude):
                return slot
        lru = None
        for slot, sid in self.pinned.items():
            if self.slots[slot] is None:
                sess = self.sessions.get(sid)
                t = sess.last_used if sess else 0.0
                if lru is None or t < lru[1]:
                    lru = (slot, t, sid)
        if lru is None:
            return None
        self.pinned.pop(lru[0], None)
        self.sessions.pop(lru[2], None)
        return lru[0]

    # ------------------------------------------------------------------

    def step(self):
        """Admit what fits, then run one decode chunk."""
        # Scan the whole queue rather than stopping at the head: a
        # request whose session slot is busy (or, once slots are full, a
        # session continuation behind fresh requests) must not starve
        # unrelated work behind it.  Skipped requests keep their order.
        deferred = []
        batch: list = []  # deferred plain admissions (slot, req, Tb)
        claimed: set = set()
        # Plain admissions batch into ONE padded prefill + ONE fused
        # state dispatch per token bucket (same rationale as the paged
        # scheduler's _admit_batch: each separate prefill call pays the
        # full per-dispatch cost).  Sessions and speculative admissions
        # keep the per-request path (they carry extra per-slot work).
        can_batch = self._dynamic and not self.spec
        while self.pending:
            req = self.pending.popleft()
            sess = self.sessions.get(req.session) if req.session else None
            if sess is not None:
                if (self.slots[sess.slot] is not None
                        or sess.slot in claimed):
                    deferred.append(req)  # session busy; don't block others
                    continue
                self._continue_one(sess.slot, req, sess)
                continue
            slot = self._free_slot(exclude=claimed)
            if slot is None:
                deferred.append(req)
                continue  # later session continuations may still admit
            if can_batch:
                claimed.add(slot)
                batch.append((slot, req, _bucket(len(req.prompt),
                                                 self.buckets)))
            else:
                self._admit_one(slot, req)
        for req in reversed(deferred):
            self.pending.appendleft(req)
        if batch:
            batch.sort(key=lambda e: e[2])
            for _, grp in itertools.groupby(batch, key=lambda e: e[2]):
                self._admit_batch(list(grp))
        if self.n_active == 0:
            return

        if self.spec:
            any_sampled = any(
                self._slot_sampled[s] for s in range(self.B)
                if self.slots[s] is not None)
            if any_sampled:
                (self.draft_cache, self.cache, out, n_new, self.offsets,
                 self.done, self.last_tok, self.last_n,
                 self.counters) = self._spec_step_sampled(
                    self.draft_params, self.params, self.draft_cache,
                    self.cache, self.last_tok, self.offsets, self.done,
                    self.last_n, self.sp, self.counters,
                )
            else:
                (self.draft_cache, self.cache, out, n_new, self.offsets,
                 self.done, self.last_tok) = self._spec_step(
                    self.draft_params, self.params, self.draft_cache,
                    self.cache, self.last_tok, self.offsets, self.done,
                )
            out_host = np.asarray(out)
            n_host = np.asarray(n_new)
            for slot in range(self.B):
                if self.slots[slot] is None:
                    continue
                for t in out_host[slot, : n_host[slot]]:
                    if not self._deliver(slot, int(t)):
                        break
            return

        if self._dynamic:
            (self.cache, toks, self.offsets, self.last_n, self.done,
             self.counters) = self._decode(
                self.params, self.cache, self.last_tok, self.offsets,
                self.last_n, self.done, self.sp, self.counters,
            )
        else:
            self.cache, toks, self.offsets, self.last_n, self.done = self._decode(
                self.params, self.cache, self.last_tok, self.offsets,
                self.last_n, self.done, self._next_key(),
            )
        self.last_tok = toks[:, -1]
        toks_host = np.asarray(toks)
        for slot in range(self.B):
            if self.slots[slot] is None:
                continue
            for t in toks_host[slot]:
                if not self._deliver(slot, int(t)):
                    break

    def run(self):
        """Run until all submitted work is complete."""
        while self.has_work:
            self.step()

    def generate_many(self, prompts: Sequence[Sequence[int]],
                      max_new_tokens: int = 256) -> List[Request]:
        reqs = [Request(prompt=list(p), max_new_tokens=max_new_tokens)
                for p in prompts]
        for r in reqs:
            self.submit(r)
        self.run()
        return reqs
