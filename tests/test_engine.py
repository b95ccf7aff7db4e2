"""Continuous-batching engine: token-level slot scheduling (infer/engine.py).

The core property — a request ADMITTED into a running decode batch
(llm_admit_slot, slot-local cache columns) produces a token stream
bit-identical to a solo llm_decode with the request's own key — is asserted
at the model level under f64 (same rationale as test_batch_decode.py), then
the engine itself is driven end-to-end on the tiny pipeline: mid-flight
admission, slot reuse beyond the slot count, long-runner/short-joiner
overlap (the scenario the old shared-runway design deferred), and error
isolation.
"""

import queue
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.config import EncoderConfig, LLMConfig, replace
from cosy_tpu.models import llm as L
from cosy_tpu.params import P

from test_api import _make_api


def _cfg():
    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2)
    return LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=replace(enc, static_chunk_size=1),
        llm=replace(enc, static_chunk_size=1, input_layer="linear_legacy"))


def test_admit_slot_mid_flight_matches_solo():
    """A newcomer spliced into a paused cohort at shared step i decodes
    bit-identically to a solo run with its own key, and the running slot's
    stream is untouched by the admission."""
    with jax.enable_x64(True):
        cfg = _cfg()
        p = L.init_llm_params(jax.random.PRNGKey(0), cfg)
        p = {k: v.astype(jnp.float64) for k, v in p.items()}
        rng = jax.random.PRNGKey(7)
        pe1 = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16), jnp.float64)
        pe2 = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16), jnp.float64)
        MAXL = 16

        # slot0 active (cap 12), slot1 parked (cap 1 -> done at prefill)
        pb = jnp.concatenate([pe1, jnp.zeros((1, 7, 16))], axis=0)
        res, st = L.llm_decode_batch(
            P(p), cfg, rng, pb, jnp.asarray([7, 1]), jnp.asarray([2, 0]),
            MAXL, max_lens=jnp.asarray([12, 1]), stop_at=jnp.asarray(4),
            state=None, return_state=True)
        assert int(st.i) == 4 and bool(st.done[1])

        # admit the newcomer into slot1 with ITS OWN key, mid-flight
        k_new = jax.random.PRNGKey(11)
        pe_new = jnp.pad(pe2, ((0, 0), (2, 0), (0, 0)))  # left-pad to L0
        st2 = L.llm_admit_slot(P(p), cfg, st, pe_new, jnp.asarray(5), k_new,
                               jnp.asarray(1), jnp.asarray(6))
        assert int(st2.lens[1]) == 1  # newcomer restarts at its own column 0
        res2, _ = L.llm_decode_batch(
            P(p), cfg, rng, pb, jnp.asarray([7, 5]), jnp.asarray([2, 3]),
            MAXL, max_lens=jnp.asarray([12, 6]), stop_at=jnp.asarray(MAXL * 2),
            state=st2, return_state=True)

        rn = L.llm_decode(P(p), cfg, k_new, pe2, 5, jnp.asarray(3), 6)
        np.testing.assert_array_equal(np.asarray(res2.tokens[1])[:6],
                                      np.asarray(rn.tokens))
        assert int(res2.lengths[1]) == int(rn.length)

        r1 = L.llm_decode(P(p), cfg, jax.random.fold_in(rng, 0), pe1, 7,
                          jnp.asarray(2), 12)
        np.testing.assert_array_equal(np.asarray(res2.tokens[0])[:12],
                                      np.asarray(r1.tokens))


@pytest.fixture(scope="module")
def api():
    """One compiled pipeline for the whole module: the engine tests drive
    fresh ContinuousBatchEngine instances over a SHARED TTSPipeline, so the
    jitted decode/flow/vocoder programs compile once instead of once per
    test (~25 s x 7 tests of pure recompilation on this box)."""
    return _make_api()


def _engine(api, **kw):
    from cosy_tpu.infer.engine import ContinuousBatchEngine

    kw.setdefault("slots", 2)
    kw.setdefault("prefix_len", 32)
    kw.setdefault("max_len", 64)
    return ContinuousBatchEngine(api.model, **kw)


def _ids(api, text):
    return api.frontend.extract_text_token(text) % 40


def test_engine_single_request_end_to_end(api):
    eng = _engine(api)
    try:
        req = eng.submit(jax.random.PRNGKey(0), _ids(api, "hello there."))
        chunks = list(req.chunks())
        assert len(chunks) >= 1
        wav = np.concatenate([c[0] for c in chunks])
        assert wav.size > 0 and np.isfinite(wav).all()
        assert req.tokens is not None and len(req.tokens) >= 1
    finally:
        eng.stop()


def test_engine_tokens_match_solo_decode(api):
    """The engine-side stream equals a solo llm_decode with the request's
    k_llm (the submit split) — continuous batching changes scheduling, not
    tokens."""
    eng = _engine(api)
    try:
        key = jax.random.PRNGKey(3)
        req = eng.submit(key, _ids(api, "one two three."))
        for _ in req.chunks():
            pass
        pl = api.model
        prefix, min_len, max_len = pl._build_prefix(
            req.text_tokens, None, None, None, eng.max_len)
        res = L.llm_decode(P(pl.llm_params), pl.cfg.llm, req.k_llm, prefix,
                           prefix.shape[1], jnp.asarray(min_len),
                           min(max_len, eng.max_len))
        n = int(res.length)
        sol = np.asarray(res.tokens)[:n]
        # CPU bf16-fastpath noise can flip a near-tie sample late in the
        # stream; the prefix must agree (identical rng stream + same math)
        m = min(len(sol), len(req.tokens))
        agree = int((sol[:m] == req.tokens[:m]).sum())
        assert agree >= max(1, m - 1), (sol, req.tokens)
    finally:
        eng.stop()


def test_engine_mid_flight_admission_and_slot_reuse(api):
    """3 requests through 2 slots: the 3rd is admitted only after a slot
    frees (continuous batching), all finish, and token streams are
    independent per request key."""
    eng = _engine(api)
    try:
        reqs = [eng.submit(jax.random.PRNGKey(10 + i),
                           _ids(api, t))
                for i, t in enumerate(["first request.",
                                       "the second one is a bit longer.",
                                       "third."])]
        outs = []
        for r in reqs:
            outs.append(np.concatenate([c[0] for c in r.chunks()]))
        assert all(o.size > 0 for o in outs)
        assert all(r.tokens is not None for r in reqs)
        assert eng.segments_run >= 1
        # slots all freed after completion
        assert not eng._active()
    finally:
        eng.stop()


def test_engine_concurrent_consumers(api):
    """Requests submitted from concurrent threads (the serving pattern) all
    complete; a request arriving mid-decode joins without waiting for the
    running request to finish first (admission happens between segments)."""
    eng = _engine(api, seg_tokens=4)
    try:
        results = {}

        def one(i, text):
            req = eng.submit(jax.random.PRNGKey(100 + i), _ids(api, text))
            results[i] = np.concatenate([c[0] for c in req.chunks()])

        t1 = threading.Thread(target=one, args=(0, "a slow long first sentence here."))
        t1.start()
        time.sleep(0.05)
        t2 = threading.Thread(target=one, args=(1, "quick."))
        t2.start()
        t1.join(timeout=600)
        t2.join(timeout=600)
        assert set(results) == {0, 1}
        assert all(v.size > 0 for v in results.values())
    finally:
        eng.stop()


def test_engine_prefix_too_long_fails_only_that_request(api):
    eng = _engine(api, prefix_len=16)  # tiny bucket
    try:
        # long text -> prefix over the bucket -> clean per-request error
        long_req = eng.submit(jax.random.PRNGKey(0),
                              _ids(api, "x" * 400))
        ok_req = eng.submit(jax.random.PRNGKey(1), _ids(api, "hi."))
        with pytest.raises(ValueError):
            list(long_req.chunks())
        out = np.concatenate([c[0] for c in ok_req.chunks()])
        assert out.size > 0
    finally:
        eng.stop()


def test_qwen2lm_admit_slot_mid_flight_matches_solo():
    """CV2 admission: the joiner prefills at its own slot-local RoPE
    positions/cache columns, so its stream equals a solo qwen2lm_decode with
    its own key — with the solo run's FULL attempt budget (the old
    shared-counter design truncated late joiners to MAXL - birth)."""
    from cosy_tpu.layers.qwen2 import Qwen2Config
    from cosy_tpu.models.qwen2lm import (
        Qwen2LMConfig, init_qwen2lm_params, qwen2lm_decode,
        qwen2lm_decode_batch, qwen2lm_admit_slot)

    with jax.enable_x64(True):
        cfg = Qwen2LMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=30,
            qwen=Qwen2Config(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, head_dim=8, vocab_size=50))
        p = init_qwen2lm_params(jax.random.PRNGKey(0), cfg)
        p = {k: v.astype(jnp.float64) for k, v in p.items()}
        rng = jax.random.PRNGKey(9)
        pe1 = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32), jnp.float64)
        pe2 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32), jnp.float64)
        MAXL = 18

        pb = jnp.concatenate([pe1, jnp.zeros((1, 6, 32))], axis=0)
        res, st = qwen2lm_decode_batch(
            P(p), cfg, rng, pb, jnp.asarray([6, 1]), jnp.asarray([2, 0]),
            MAXL, max_lens=jnp.asarray([12, 1]), stop_at=jnp.asarray(4),
            state=None, return_state=True)
        assert int(st.i) == 4 and bool(st.done[1])

        k_new = jax.random.PRNGKey(21)
        pe_new = jnp.pad(pe2, ((0, 0), (2, 0), (0, 0)))
        st2 = qwen2lm_admit_slot(P(p), cfg, st, pe_new, jnp.asarray(4), k_new,
                                 jnp.asarray(1), jnp.asarray(6), jnp.asarray(3))
        assert int(st2.lens[1]) == 1
        res2, _ = qwen2lm_decode_batch(
            P(p), cfg, rng, pb, jnp.asarray([6, 4]), jnp.asarray([2, 3]),
            MAXL, max_lens=jnp.asarray([12, 6]), stop_at=jnp.asarray(MAXL * 4),
            state=st2, return_state=True)

        rn = qwen2lm_decode(P(p), cfg, k_new, pe2, jnp.asarray(3), MAXL)
        n_solo = int(rn.length)
        n_eng = int(res2.lengths[1])
        # identical rng stream + identical math while both are live: the
        # joiner's emitted stream is the solo stream truncated at its cap
        m = min(n_solo, n_eng)
        assert m >= 1
        assert n_eng == min(n_solo, 6)
        np.testing.assert_array_equal(np.asarray(res2.tokens[1])[:m],
                                      np.asarray(rn.tokens)[:m])

        r1 = qwen2lm_decode(P(p), cfg, jax.random.fold_in(rng, 0), pe1,
                            jnp.asarray(2), MAXL)
        m0 = min(int(r1.length), int(res2.lengths[0]), 12)
        np.testing.assert_array_equal(np.asarray(res2.tokens[0])[:m0],
                                      np.asarray(r1.tokens)[:m0])


def test_engine_cv2_end_to_end():
    """The engine drives the CosyVoice2 family too (cumulative windows +
    token offsets + Stream2State)."""
    from test_pipeline2 import _pipe

    from cosy_tpu.infer.engine import ContinuousBatchEngine

    pipe = _pipe()
    eng = ContinuousBatchEngine(pipe, slots=2, prefix_len=16, max_len=64)
    try:
        r = np.random.default_rng(0)
        reqs = [eng.submit(jax.random.PRNGKey(40 + i),
                           r.integers(0, 50, (1, 4 + i)).astype(np.int32))
                for i in range(2)]
        for req in reqs:
            wav = np.concatenate([c[0] for c in req.chunks()])
            assert wav.size > 0 and np.isfinite(wav).all()
            assert req.tokens is not None
    finally:
        eng.stop()


def test_engine_full_cap_joiner_admits_mid_flight(api):
    """A full-cap request arriving while another is mid-decode is admitted
    into the running batch immediately (slot-local columns: no runway, no
    defer-until-drain) and both complete.  The old shared-counter design
    deferred exactly this scenario."""
    eng = _engine(api, max_len=32, seg_tokens=8)
    try:
        a = eng.submit(jax.random.PRNGKey(0), _ids(api, "first one."))
        # wait until A is mid-flight so B joins a running batch
        deadline = time.time() + 300
        while eng.segments_run < 1 and time.time() < deadline:
            time.sleep(0.01)
        segs_at_submit = eng.segments_run
        b = eng.submit(jax.random.PRNGKey(1), _ids(api, "second one."))
        wa = np.concatenate([c[0] for c in a.chunks()])
        wb = np.concatenate([c[0] for c in b.chunks()])
        assert wa.size > 0 and wb.size > 0
        # b's decode overlapped a's (admission did not wait for a drain):
        # the engine never went idle between a's start and b's completion
        assert eng.segments_run > segs_at_submit
    finally:
        eng.stop()


def test_engine_cancel_frees_slot_and_stops_decode(api):
    """cancel() on an admitted request stops its row at the next segment
    boundary (no synthesis for a dead consumer), terminates its queue, and
    frees the slot for reuse."""
    eng = _engine(api, seg_tokens=4)
    try:
        req = eng.submit(jax.random.PRNGKey(0),
                         _ids(api, "a fairly long sentence to cancel."))
        first = req.q.get(timeout=600)  # it is admitted and producing
        assert first is not None
        eng.cancel(req)
        deadline = time.time() + 600
        while eng._active() and time.time() < deadline:
            time.sleep(0.05)
        assert not eng._active(), "cancelled slot never freed"
        while req.q.get(timeout=60) is not None:  # queue is terminated
            pass
        # the freed slot admits and completes a new request
        req2 = eng.submit(jax.random.PRNGKey(1), _ids(api, "hi."))
        out = np.concatenate([c[0] for c in req2.chunks()])
        assert out.size > 0
    finally:
        eng.stop()


def test_engine_cancel_pending_request(api):
    """cancel() on a not-yet-admitted request drops it from the pending list
    immediately; the in-flight request is unaffected."""
    eng = _engine(api, slots=1, seg_tokens=4)
    try:
        r1 = eng.submit(jax.random.PRNGKey(0),
                        _ids(api, "long first sentence occupying the slot."))
        assert r1.q.get(timeout=600) is not None  # r1 holds the only slot
        r2 = eng.submit(jax.random.PRNGKey(1), _ids(api, "second."))
        eng.cancel(r2)
        assert list(r2.chunks()) == []  # terminated without synthesis
        assert r2.err is None
        rest = list(r1.chunks())  # r1 runs to completion
        assert r1.tokens is not None
        assert all(np.isfinite(c).all() for c in rest)
    finally:
        eng.stop()

def test_engine_prefetch_hits_and_tokens_identical(api):
    """The decode-segment prefetch (dispatch pipelining) actually fires
    under a sustained stream AND changes nothing about the tokens: the
    same request through a prefetch-off engine yields the same stream."""
    text = _ids(api, "a long sentence so several segments run.")
    toks = {}
    for pf in (True, False):
        eng = _engine(api, slots=1, seg_tokens=4, prefetch=pf)
        try:
            req = eng.submit(jax.random.PRNGKey(11), text)
            for _ in req.chunks():
                pass
            assert req.tokens is not None
            toks[pf] = np.asarray(req.tokens)
            if pf:
                assert eng.prefetch_hits > 0, "prefetch never consumed"
                # once the last live request finished, the dangling
                # prefetched segment (holding a full decode-state KV
                # buffer on device) must have been released (ADVICE r4)
                deadline = time.time() + 5.0
                while eng._prefetch is not None and time.time() < deadline:
                    time.sleep(0.01)
                assert eng._prefetch is None, \
                    "idle engine retains a prefetched decode state"
            else:
                assert eng.prefetch_hits == 0
        finally:
            eng.stop()
    assert toks[True].shape == toks[False].shape
    assert (toks[True] == toks[False]).all()
