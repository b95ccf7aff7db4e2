"""Continuous-batching TTS serving engine (token-level slot scheduling).

The reference's serving story is its vLLM plugin
(cosyvoice/vllm/cosyvoice2.py) — and vLLM's headline mechanism is
continuous batching: requests join and leave the running decode batch at
token granularity instead of waiting for a whole cohort to drain.  This is
the TPU-native equivalent, built on static shapes:

- ONE persistent segmented decode program with ``slots`` fixed batch rows
  (``llm_decode_batch`` with slot-local cache columns), compiled once;
- a newcomer is prefilled and spliced into a free slot at the next segment
  boundary (``llm_admit_slot``) — its time-to-first-audio is one segment
  (~``seg_tokens`` tokens of device time), not the running cohort's longest
  utterance;
- each slot's token stream is bit-identical to a solo ``llm_decode`` with
  the request's own key (the admission carries the request's rng stream);
- finished slots free immediately and are reused by the next admission, so
  under sustained load the batch stays full and aggregate tok/s sits at the
  measured B=slots amortization point (PERF.md: 2.5x at B=8) while
  per-request latency stays one-segment-bounded.

Capacity model: every slot owns cache columns ``[0, L0 + max_len)`` of its
own batch row (``BatchDecodeState.lens``), so a free slot can admit ANY
pending request immediately — there is no shared runway and admission never
waits for the running cohort to drain.  (The pre-r7 design kept one shared
column counter; under a 24-request load on 16 slots its runway deferral
collapsed TTFA to ~26 s mean — PERF.md "continuous batching v2".)

Usage::

    eng = ContinuousBatchEngine(pipeline, slots=4)
    q = eng.submit(jax.random.key(0), text_tokens)   # returns a queue
    while (chunk := q.get()) is not None:            # (1, n) wav chunks
        play(chunk)
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional

import jax
import numpy as np

from .pipeline import StreamState, attend_rung


def _canon_key(rng):
    """Canonicalize to a typed key so state.rngs has one dtype regardless of
    whether callers pass raw uint32 PRNGKeys or typed keys (the bit streams
    are identical — wrapping does not change the threefry stream)."""
    import jax.numpy as jnp

    rng = jnp.asarray(rng)
    if rng.dtype == jnp.uint32:
        return jax.random.wrap_key_data(rng)
    return rng


class EngineRequest:
    """One in-flight synthesis request."""

    def __init__(self, rng, text_tokens, spk_embedding, max_len_cap):
        self.k_llm, self.k_wav = jax.random.split(_canon_key(rng))
        self.text_tokens = text_tokens
        self.spk_embedding = spk_embedding
        self.max_len_cap = max_len_cap
        self.q: queue.Queue = queue.Queue()
        self.err: Optional[BaseException] = None
        self.cancelled = False
        # filled at admission
        self.prefix = None  # (1, L, D) device array
        self.valid = 0
        self.min_len = 0
        self.cap = 0
        self.pos = 0  # tokens consumed by emitted windows
        self.ki = 0  # wav-chunk counter (rng folding)
        self.stream_state: Optional[StreamState] = None
        self.tokens: Optional[np.ndarray] = None  # final stream (debugging/tests)

    def chunks(self):
        """Iterate this request's wav chunks; raises the request's error."""
        while (got := self.q.get()) is not None:
            yield got
        if self.err is not None:
            raise self.err


class ContinuousBatchEngine:
    """Token-level continuous batching over one persistent decode state."""

    def __init__(self, pipeline, slots: int = 4, prefix_len: int = 128,
                 max_len: int = 512, seg_tokens: Optional[int] = None,
                 device_lock: Optional[threading.Lock] = None,
                 prefetch: bool = False):
        self.pl = pipeline
        # family: TTSPipeline (300M, .cfg) vs TTS2Pipeline (CosyVoice2,
        # .lcfg/.fcfg) — same engine, different prefix builder / emission
        self.is_cv2 = not hasattr(pipeline, "cfg")
        self.B = slots
        self.L0 = prefix_len
        self.max_len = max_len
        # segment = admission granularity; default one audio hop so emission
        # cadence and admission cadence coincide (pipeline constants)
        if self.is_cv2:
            self.hop = pipeline.token_hop_len
            self.seg = seg_tokens or 2 * self.hop
        else:
            self.hop = pipeline.token_min_hop_len
            self.seg = seg_tokens or self.hop
        self.lock = device_lock or threading.Lock()

        self._slots: List[Optional[EngineRequest]] = [None] * slots
        self._lens = np.zeros(slots, np.int32)  # host copy of per-slot lens
        self._valid = np.ones(slots, np.int32)
        self._min_lens = np.zeros(slots, np.int32)
        self._caps = np.ones(slots, np.int32)
        self._state = None
        self._i = 1  # host copy of the loop-step counter
        self._pending: List[EngineRequest] = []
        self._cv = threading.Condition()
        self._thread: Optional[threading.Thread] = None
        self._stopping = False
        self._dummy_rng = jax.random.key(0)
        D = (pipeline.lcfg.llm_input_size if self.is_cv2
             else pipeline.cfg.llm.llm_input_size)
        self._spk_dim = (pipeline.fcfg.spk_embed_dim if self.is_cv2
                         else pipeline.cfg.llm.spk_embed_dim)
        import jax.numpy as jnp

        # dtype must match _build_prefix's output (the params dtype): the
        # persistent state is created from this array's dtype
        wdt = pipeline.llm_params["llm_embedding.weight"].dtype
        self._zero_prefix = jnp.zeros((slots, prefix_len, D), wdt)
        self.segments_run = 0  # observability
        # dispatch pipelining: segment k+1 submitted from the in-flight
        # device state before segment k is synced/emitted, so the decode
        # executes while the loop thread fetches tokens and synthesizes
        # audio.  (res, state, target, caps_snapshot) — discarded whenever
        # an admission or a cancellation changes the inputs it was built
        # with (the state is functional, so dropping it is always safe).
        # Default OFF: at the engine's design point (sustained load, slots
        # refilling) admissions discard most prefetched segments, and each
        # discard is a wasted full decode segment — measured agg RTF 0.787
        # -> 0.846 WORSE with prefetch on (tools/probe_engine.py --ab,
        # 8 reqs / 4 slots).  Enable for low-concurrency deployments where
        # admissions are rare; the single-stream pipelines keep their own
        # always-on prefetch (-21% total RTF, PERF.md).
        self._prefetch = None
        self._prefetch_on = prefetch
        self.prefetch_hits = 0  # observability

    # -- public API -------------------------------------------------------

    def submit(self, rng, text_tokens, spk_embedding=None) -> EngineRequest:
        """Queue a request; returns the :class:`EngineRequest` — consume wav
        chunks via ``req.chunks()`` (or ``req.q`` directly: (1, n) arrays
        terminated by None, with ``req.err`` set on failure)."""
        req = EngineRequest(rng, np.asarray(text_tokens), spk_embedding,
                            max_len_cap=self.max_len)
        with self._cv:
            self._pending.append(req)
            if self._thread is None or not self._thread.is_alive():
                self._stopping = False
                self._thread = threading.Thread(target=self._loop, daemon=True)
                self._thread.start()
            self._cv.notify()
        return req

    def cancel(self, req: EngineRequest):
        """Abandon a request (e.g. its client disconnected).  Pending
        requests are dropped immediately; an admitted request's slot stops
        at the next segment boundary and frees for the next admission —
        the engine does not synthesize the rest of an utterance nobody is
        consuming.  No-op if the request already finished."""
        with self._cv:
            req.cancelled = True
            if req in self._pending:
                self._pending.remove(req)
                req.q.put(None)
            # if admitted, the loop thread notices `cancelled` in _segment
            # (it owns all slot/caps bookkeeping — no cross-thread mutation)
            self._cv.notify()

    def stop(self):
        with self._cv:
            self._stopping = True
            self._cv.notify()
        if self._thread is not None:
            self._thread.join(timeout=30)

    # -- internals ----------------------------------------------------------

    def _active(self) -> bool:
        return any(r is not None for r in self._slots)

    def _park(self):
        """Initialize the decode state with all slots empty: one prefill
        with caps=1 marks every slot done instantly.  Only needed to create
        the state — admission is runway-free, so there is nothing to reset
        mid-flight."""
        import jax.numpy as jnp

        ones = jnp.ones(self.B, jnp.int32)
        with self.lock:  # device program — serialize like every other call
            _, st = self.pl._decode_batch_seg_jit(
                self.pl.llm_params, self._dummy_rng, self._zero_prefix,
                ones, jnp.zeros(self.B, jnp.int32), ones,
                jnp.asarray(1), None, max_len=self.max_len,
                attend_width=attend_rung(self.L0, 1, self.max_len))
        self._state = st
        self._i = 1
        self._lens[:] = 1
        self._valid[:] = 1
        self._min_lens[:] = 0
        self._caps[:] = 1

    def _build(self, req: EngineRequest) -> bool:
        """Build + left-pad the request's prefix to the engine bucket.
        Returns False (and fails the request) if it cannot ever fit."""
        import jax.numpy as jnp

        if self.is_cv2:
            prefix, min_len, max_len = self.pl._build_prefix(
                req.text_tokens, None, None, req.max_len_cap)
        else:
            prefix, min_len, max_len = self.pl._build_prefix(
                req.text_tokens, None, None, req.spk_embedding,
                req.max_len_cap)
        if prefix.shape[1] > self.L0:
            req.err = ValueError(
                f"prefix length {prefix.shape[1]} exceeds engine bucket "
                f"{self.L0}")
            req.q.put(None)
            return False
        req.valid = int(prefix.shape[1])
        req.prefix = jnp.pad(prefix, ((0, 0), (self.L0 - req.valid, 0), (0, 0)))
        req.min_len = min_len
        req.cap = min(max_len, self.max_len)
        if self.is_cv2:
            from .pipeline2 import Stream2State

            req.stream_state = Stream2State()
        else:
            req.stream_state = StreamState(
                mel_overlap=np.zeros((1, 80, 0), np.float32))
        return True

    def _try_admit(self):
        """Admit pending requests into free slots (runway-free: a free slot
        always fits any buildable request — slot-local cache columns)."""
        import jax.numpy as jnp

        while True:
            # all pending-list reads/pops under _cv: cancel() removes
            # entries from another thread
            with self._cv:
                if not self._pending:
                    return
                req = self._pending[0]
            if req.prefix is None and not self._build(req):
                with self._cv:
                    if self._pending and self._pending[0] is req:
                        self._pending.pop(0)
                continue
            try:
                b = self._slots.index(None)
            except ValueError:
                return  # no free slot
            if self._state is None:
                self._park()
            with self._cv:
                if not self._pending or self._pending[0] is not req:
                    continue  # cancelled while building — already closed
                self._pending.pop(0)
                if req.cancelled:
                    continue  # cancel() already put the None sentinel
            with self.lock:
                if self.is_cv2:
                    self._state = self.pl._admit_jit(
                        self.pl.llm_params, self._state, req.prefix,
                        jnp.asarray(req.valid), req.k_llm, jnp.asarray(b),
                        jnp.asarray(req.cap), jnp.asarray(req.min_len))
                else:
                    self._state = self.pl._admit_jit(
                        self.pl.llm_params, self._state, req.prefix,
                        jnp.asarray(req.valid), req.k_llm, jnp.asarray(b),
                        jnp.asarray(req.cap))
            self._slots[b] = req
            self._lens[b] = 1  # admit prefilled token 0
            self._valid[b] = req.valid
            self._min_lens[b] = req.min_len
            self._caps[b] = req.cap
            # any in-flight prefetched segment was built without this slot's
            # prefill — drop it (next _segment submits fresh from the
            # admitted state)
            self._prefetch = None

    def _segment(self):
        """Run one decode segment and emit every slot's ready audio."""
        import jax.numpy as jnp

        pl = self.pl
        hop = self.hop
        ov = 0 if self.is_cv2 else pl.token_overlap_len
        # cancelled rows stop at this segment boundary: cap them below their
        # current length so the decode marks them done and the slot frees
        # (caps bookkeeping stays in this loop thread — cancel() only flags)
        for b, r in enumerate(self._slots):
            if r is not None and r.cancelled:
                self._caps[b] = 1
        # loop-step target: every live slot advances <= seg tokens; i is a
        # pure step counter (cache columns are slot-local), so no max_len
        # clamp — slots bound themselves via caps/attempt limits
        target = self._i + self.seg
        # attend width: cover the highest cache column any live slot can
        # write this segment (done slots re-write their frozen column, which
        # is below their lens)
        live_lens = [int(self._lens[b]) for b, r in enumerate(self._slots)
                     if r is not None]
        # consume the prefetched segment if its inputs still hold: same
        # target (the step counter advanced exactly seg while any slot was
        # live) and same caps on every occupied slot (a cancel() since the
        # prefetch was submitted changes the cap the slot must stop at)
        pf, self._prefetch = self._prefetch, None
        if (pf is not None and pf[2] == target
                and all(pf[3][b] == self._caps[b]
                        for b, r in enumerate(self._slots) if r is not None)):
            res, self._state = pf[0], pf[1]
            self.prefetch_hits += 1
        else:
            w_tokens = min(max(live_lens, default=1) + self.seg, self.max_len)
            with self.lock:
                res, self._state = pl._decode_batch_seg_jit(
                    pl.llm_params, self._dummy_rng, self._zero_prefix,
                    jnp.asarray(self._valid), jnp.asarray(self._min_lens),
                    jnp.asarray(self._caps), jnp.asarray(target), self._state,
                    max_len=self.max_len,
                    attend_width=attend_rung(self.L0, w_tokens, self.max_len))
        # prefetch segment k+1 from the (still in-flight) device state
        # BEFORE syncing segment k — the decode executes while this thread
        # fetches tokens and synthesizes audio (pure dispatch pipelining;
        # token streams are bit-identical, the resumed while_loop sees the
        # same state either way, and an all-done submission exits its loop
        # immediately).  Skipped when an admission is already queued so a
        # newcomer's admit program is not delayed behind a segment that
        # would be discarded anyway.
        with self._cv:
            admission_waiting = bool(self._pending)
        if self._prefetch_on and not admission_waiting:
            next_target = target + self.seg
            w_next = min(max(live_lens, default=1) + 2 * self.seg,
                         self.max_len)
            with self.lock:
                nres, nstate = pl._decode_batch_seg_jit(
                    pl.llm_params, self._dummy_rng, self._zero_prefix,
                    jnp.asarray(self._valid), jnp.asarray(self._min_lens),
                    jnp.asarray(self._caps), jnp.asarray(next_target),
                    self._state, max_len=self.max_len,
                    attend_width=attend_rung(self.L0, w_next, self.max_len))
            self._prefetch = (nres, nstate, next_target, self._caps.copy())
        lengths = np.asarray(res.lengths)
        done_dev = np.asarray(self._state.done)
        all_tokens = np.asarray(res.tokens)
        self._i = int(self._state.i)
        self._lens[:] = np.asarray(self._state.lens)
        self.segments_run += 1
        for b, req in enumerate(self._slots):
            if req is None:
                continue
            n = int(lengths[b])
            sdone = bool(done_dev[b])
            if req.cancelled:
                if sdone:
                    req.q.put(None)
                    self._free(b)
                continue  # no emission for a dead consumer
            try:
                self._emit(b, req, all_tokens[b], n, sdone, hop, ov)
                if sdone:
                    req.tokens = all_tokens[b][:n].copy()
                    req.q.put(None)
                    self._free(b)
            except Exception as e:  # noqa: BLE001 — isolate per request
                req.err = e
                req.q.put(None)
                self._free(b)

    def _emit(self, b, req, toks, n, sdone, hop, ov):
        """Emit slot ``b``'s ready audio windows (family-specific geometry:
        v1 slides hop+overlap windows, CV2 grows a cumulative window with
        pre-lookahead and a token offset)."""
        pl = self.pl
        spk = (np.zeros((1, self._spk_dim), np.float32)
               if req.spk_embedding is None else np.asarray(req.spk_embedding))
        if self.is_cv2:
            la = pl.fcfg.pre_lookahead_len
            while n >= req.pos + hop + la:
                window = toks[None, : req.pos + hop + la]
                with self.lock:
                    wav, req.stream_state = pl.token2wav(
                        jax.random.fold_in(req.k_wav, req.ki), window,
                        None, None, spk, req.pos, req.stream_state,
                        stream=True, finalize=False)
                req.q.put(wav)
                req.pos += hop
                req.ki += 1
            if sdone:
                window = toks[None, :n]
                with self.lock:
                    wav, _ = pl.token2wav(
                        jax.random.fold_in(req.k_wav, req.ki), window,
                        None, None, spk, req.pos, req.stream_state,
                        finalize=True)
                req.q.put(wav)
            return
        while n - req.pos >= hop + ov:
            window = toks[None, req.pos: req.pos + hop + ov]
            with self.lock:
                wav, req.stream_state = pl.token2wav(
                    jax.random.fold_in(req.k_wav, req.ki), window,
                    None, None, spk, stream_state=req.stream_state,
                    finalize=False)
            req.q.put(wav)
            req.pos += hop
            req.ki += 1
        if sdone:
            window = toks[None, req.pos: n]
            with self.lock:
                wav, _ = pl.token2wav(
                    jax.random.fold_in(req.k_wav, req.ki), window,
                    None, None, spk, stream_state=req.stream_state,
                    finalize=True)
            req.q.put(wav)

    def _free(self, b: int):
        self._slots[b] = None
        self._caps[b] = 1
        self._min_lens[b] = 0
        # done[b] stays True on device; lens/valid are don't-cares
        if all(r is None for r in self._slots):
            # last live request finished: drop any dangling prefetched
            # segment — it references a full (nl,2,B,H,S,dk) KV decode
            # state that would otherwise stay allocated on-device while
            # the engine idles (it could never be consumed anyway: the
            # next admission resets the state)
            self._prefetch = None

    def _fail_all(self, e: BaseException):
        for b, req in enumerate(self._slots):
            if req is not None:
                req.err = e
                req.q.put(None)
                self._free(b)
        # under _cv: submit()/cancel() mutate _pending from other threads —
        # a request appended mid-iteration must not be dropped un-failed
        with self._cv:
            for req in self._pending:
                req.err = e
                req.q.put(None)
            self._pending.clear()
        self._state = None  # force a fresh park on recovery
        self._prefetch = None  # chained off the dead state

    def _loop(self):
        while True:
            with self._cv:
                while (not self._pending and not self._active()
                       and not self._stopping):
                    self._cv.wait()
                if self._stopping and not self._active() and not self._pending:
                    return
                pending_or_active = True  # noqa: F841
            try:
                self._try_admit()
                if self._active():
                    self._segment()
            except Exception as e:  # noqa: BLE001 — the engine must survive
                self._fail_all(e)
