"""Multi-voice LoRA serving wiring: pipeline voice registry + HTTP routing.

Model-level adapter/merged equivalences live in test_multivoice.py (f64);
these tests pin the serving layer on top of them:
- set_voices registry + per-request routing through synthesize/token2wav;
- a voiced request equals a pipeline rebuilt with that voice's MERGED
  weights (same rng), end to end through the public synthesize path;
- adapter checkpoint round-trip (trainer export format -> serve loader);
- HTTP: the ``voice`` body field routes, unknown voices 400.
"""

import json
import threading
import urllib.request
import urllib.error
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosy_tpu.config import InferenceConfig, LoRAConfig
from cosy_tpu import lora as LORA
from cosy_tpu.infer.pipeline import TTSPipeline
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.serve import TTSServer, load_voice_adapters, make_handler

from test_pipeline import MODEL_CFG, init_hift_params

LLM_LORA = LoRAConfig(r=2, alpha=4, dropout=0.0)
FLOW_LORA = LoRAConfig(r=2, alpha=4, dropout=0.0,
                       target_modules=("to_q", "to_k", "to_v", "w_1", "w_2"))


def _params():
    key = jax.random.PRNGKey(0)
    return (L.init_llm_params(jax.random.fold_in(key, 1), MODEL_CFG.llm),
            F.init_flow_params(jax.random.fold_in(key, 2), MODEL_CFG.flow),
            init_hift_params(jax.random.fold_in(key, 3), MODEL_CFG.hift))


def _voice_adapters(llm_params, flow_params, seed, amp=8.0):
    """One voice's adapter dicts; amplified so voices differ audibly above
    numeric noise (init_lora B is N(0, 0.01))."""
    la = LORA.init_lora(jax.random.PRNGKey(seed), llm_params, LLM_LORA)
    fa = LORA.init_lora(jax.random.PRNGKey(seed + 100), flow_params, FLOW_LORA)
    la = {k: v * amp if k.endswith("lora_B") else v for k, v in la.items()}
    fa = {k: v * amp if ".lora_B" in k else v for k, v in fa.items()}
    return {"llm": la, "flow": fa}


@pytest.fixture(scope="module")
def setup():
    llm_p, flow_p, hift_p = _params()
    pipe = TTSPipeline(MODEL_CFG, llm_p, flow_p, hift_p, InferenceConfig(),
                       finetuned_norm=True)
    voices = {"alice": _voice_adapters(llm_p, flow_p, 7),
              "bob": _voice_adapters(llm_p, flow_p, 8)}
    pipe.set_voices(voices, llm_scale=LLM_LORA.scaling,
                    flow_scale=FLOW_LORA.scaling)
    return pipe, voices, (llm_p, flow_p, hift_p)


def _wav(pipe, voice, stream=False, seed=5):
    ids = np.asarray([[3, 9, 2, 7, 1, 4]], np.int32)
    spk = np.zeros((1, MODEL_CFG.llm.spk_embed_dim), np.float32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(seed), ids,
                                spk_embedding=spk, stream=stream, voice=voice))
    return np.concatenate([o["tts_speech"] for o in outs], axis=1)


def test_voice_routing_deterministic_and_distinct(setup):
    pipe, _, _ = setup
    a1 = _wav(pipe, "alice")
    a2 = _wav(pipe, "alice")
    b = _wav(pipe, "bob")
    base = _wav(pipe, None)
    np.testing.assert_array_equal(a1, a2)  # same rng + voice -> identical
    assert np.all(np.isfinite(a1)) and np.all(np.isfinite(b))
    # different adapters (or none) -> different audio
    assert a1.shape != b.shape or not np.allclose(a1, b)
    assert a1.shape != base.shape or not np.allclose(a1, base)


def test_voice_equals_merged_weights_end_to_end(setup):
    """synthesize(voice=...) == a pipeline rebuilt with that voice's merged
    llm/flow weights (the reference's only multi-voice option), same rng."""
    pipe, voices, (llm_p, flow_p, hift_p) = setup
    merged = TTSPipeline(
        MODEL_CFG,
        LORA.merge_lora(llm_p, voices["alice"]["llm"], LLM_LORA.scaling),
        LORA.merge_lora(flow_p, voices["alice"]["flow"], FLOW_LORA.scaling),
        hift_p, InferenceConfig(), finetuned_norm=True)
    got = _wav(pipe, "alice")
    want = _wav(merged, None)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_voice_streaming(setup):
    pipe, _, _ = setup
    a = _wav(pipe, "alice", stream=True)
    b = _wav(pipe, "bob", stream=True)
    assert np.all(np.isfinite(a)) and a.size > 0
    assert a.shape != b.shape or not np.allclose(a, b)


def test_unknown_voice_raises(setup):
    pipe, _, _ = setup
    with pytest.raises(KeyError):
        _wav(pipe, "nobody")


def test_adapter_checkpoint_round_trip(tmp_path, setup):
    """Trainer adapter-export format -> serve.load_voice_adapters."""
    from cosy_tpu.params import save_torch_checkpoint

    _, voices, _ = setup
    blob = {f"llm.{k}": jnp.asarray(v, jnp.float32)
            for k, v in voices["alice"]["llm"].items()}
    blob.update({f"flow.{k}": jnp.asarray(v, jnp.float32)
                 for k, v in voices["alice"]["flow"].items()})
    blob["llm._scaling"] = jnp.asarray(LLM_LORA.scaling, jnp.float32)
    blob["flow._scaling"] = jnp.asarray(FLOW_LORA.scaling, jnp.float32)
    path = str(tmp_path / "alice.pt")
    save_torch_checkpoint(blob, path)

    v = load_voice_adapters(path)
    assert set(v["llm"]) == set(voices["alice"]["llm"])
    assert set(v["flow"]) == set(voices["alice"]["flow"])
    assert v["llm_scale"] == LLM_LORA.scaling
    assert v["flow_scale"] == FLOW_LORA.scaling
    for k in v["llm"]:
        np.testing.assert_allclose(np.asarray(v["llm"][k]),
                                   np.asarray(voices["alice"]["llm"][k]),
                                   atol=1e-6)

    # merged weights are rejected with a clear message
    save_torch_checkpoint({"llm.encoders.0.self_attn.linear_q.weight":
                           jnp.zeros((4, 4))}, str(tmp_path / "merged.pt"))
    with pytest.raises(SystemExit):
        load_voice_adapters(str(tmp_path / "merged.pt"))


def test_trainer_export_adapters_matches_loader(tmp_path):
    """JointTrainer.export_adapters output loads through the serve loader
    and set_voices."""
    from cosy_tpu.config import TrainConfig
    from cosy_tpu.train.trainer import JointTrainer

    llm_p, flow_p, hift_p = _params()
    tcfg = TrainConfig(training_mode="joint", batch_size=1,
                       accumulate_grad_batches=1, max_feat_len=16,
                       llm_lora=LLM_LORA, flow_lora=FLOW_LORA)
    trainer = JointTrainer(MODEL_CFG, tcfg, llm_p, flow_p,
                           out_dir=str(tmp_path), total_steps=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "adapters.pt")
    trainer.export_adapters(state, path)

    v = load_voice_adapters(path)
    assert v["llm"] and v["flow"]
    assert v["llm_scale"] == tcfg.llm_lora.scaling
    pipe = TTSPipeline(MODEL_CFG, llm_p, flow_p, hift_p, InferenceConfig(),
                       finetuned_norm=True)
    pipe.set_voices({"v": {"llm": v["llm"], "flow": v["flow"]}},
                    llm_scale=v["llm_scale"], flow_scale=v["flow_scale"])
    wav = _wav(pipe, "v")
    assert np.all(np.isfinite(wav)) and wav.size > 0


def test_http_voice_routing(setup):
    pipe, _, _ = setup

    class _Api:
        model = pipe
        sample_rate = MODEL_CFG.sample_rate

        class frontend:  # noqa: N801 — duck-typed frontend
            @staticmethod
            def normalize(text, split=False):
                return text

            @staticmethod
            def extract_text_token(text):
                return np.asarray([[(3 + ord(c)) % 40 for c in text[:6]]],
                                  np.int32)

        @staticmethod
        def _next_rng():
            return jax.random.PRNGKey(11)

    server = TTSServer(_Api())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(
        server, MODEL_CFG.sample_rate))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/tts", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.read()

        wav_a = post({"text": "hello.", "voice": "alice"})
        wav_b = post({"text": "hello.", "voice": "bob"})
        assert wav_a[:4] == b"RIFF" and wav_b[:4] == b"RIFF"
        assert wav_a != wav_b  # routed to different adapters
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"text": "hello.", "voice": "mallory"})
        assert ei.value.code == 400
        assert b"unknown voice" in ei.value.read()
    finally:
        httpd.shutdown()


def test_voice_names_accessor(setup):
    pipe, _, _ = setup
    assert pipe.voice_names == ["alice", "bob"]
    # returns a copy, not the live registry
    pipe.voice_names.append("mallory")
    assert pipe.voice_names == ["alice", "bob"]


def test_voiced_request_denormalizes_on_base_pipeline():
    """Serving reality: --voices on a BASE model dir builds the pipeline
    with finetuned_norm=False, but the fine-tuned adapters operate in
    normalized mel space — the denorm must apply exactly when adapters are
    routed (lora is not None is static per trace), matching a merged
    finetuned_norm=True pipeline."""
    llm_p, flow_p, hift_p = _params()
    base = TTSPipeline(MODEL_CFG, llm_p, flow_p, hift_p, InferenceConfig(),
                       finetuned_norm=False)
    voices = {"alice": _voice_adapters(llm_p, flow_p, 7)}
    base.set_voices(voices, llm_scale=LLM_LORA.scaling,
                    flow_scale=FLOW_LORA.scaling)
    merged = TTSPipeline(
        MODEL_CFG,
        LORA.merge_lora(llm_p, voices["alice"]["llm"], LLM_LORA.scaling),
        LORA.merge_lora(flow_p, voices["alice"]["flow"], FLOW_LORA.scaling),
        hift_p, InferenceConfig(), finetuned_norm=True)
    got = _wav(base, "alice")
    want = _wav(merged, None)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_http_voice_spk_conflict(setup):
    pipe, _, _ = setup

    class _Api:
        model = pipe
        sample_rate = MODEL_CFG.sample_rate

        @staticmethod
        def _next_rng():
            return jax.random.PRNGKey(11)

    server = TTSServer(_Api())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(
        server, MODEL_CFG.sample_rate))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": "hi.", "voice": "alice",
                             "spk_id": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
        assert b"mutually exclusive" in ei.value.read()
    finally:
        httpd.shutdown()


def _cohort_wavs(pipe, ids, voices, seed=5):
    """Run synthesize_stream_batch and return per-row concatenated audio."""
    spk = np.zeros((1, MODEL_CFG.llm.spk_embed_dim), np.float32)
    parts = {}
    for b, wav, done in pipe.synthesize_stream_batch(
            jax.random.PRNGKey(seed), [ids] * len(voices),
            [spk] * len(voices), voices=voices):
        parts.setdefault(b, []).append(wav)
    return {b: np.concatenate(ws, axis=1) for b, ws in parts.items()}


def _voiced_cohort_streaming_body():
    """Voiced rows route their adapters inside the SHARED cohort decode:
    a voiced B=1 cohort equals the same cohort on a merged-weights pipeline,
    and in a mixed cohort the base row is unaffected by its voiced
    neighbor (the bank's zero base row gives an exactly-zero delta)."""
    llm_p, flow_p, hift_p = _params()
    pipe = TTSPipeline(MODEL_CFG, llm_p, flow_p, hift_p, InferenceConfig(),
                       finetuned_norm=True)
    voices = {"alice": _voice_adapters(llm_p, flow_p, 7),
              "bob": _voice_adapters(llm_p, flow_p, 8)}
    pipe.set_voices(voices, llm_scale=LLM_LORA.scaling,
                    flow_scale=FLOW_LORA.scaling)
    ids = np.asarray([[3, 9, 2, 7, 1, 4]], np.int32)

    merged = TTSPipeline(
        MODEL_CFG,
        LORA.merge_lora(llm_p, voices["alice"]["llm"], LLM_LORA.scaling),
        LORA.merge_lora(flow_p, voices["alice"]["flow"], FLOW_LORA.scaling),
        hift_p, InferenceConfig(), finetuned_norm=True)

    got = _cohort_wavs(pipe, ids, ["alice"])[0]
    want = _cohort_wavs(merged, ids, [None])[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)

    mixed = _cohort_wavs(pipe, ids, ["alice", None])
    pure = _cohort_wavs(pipe, ids, [None, None])
    # base row: zero-row routing == adapter-free decode
    np.testing.assert_allclose(mixed[1], pure[1], atol=1e-6)
    # voiced row actually differs from base
    assert (mixed[0].shape != pure[0].shape
            or not np.allclose(mixed[0], pure[0], atol=1e-4))


def test_voiced_cohort_streaming():
    """Fresh-interpreter isolation, same rationale as
    test_voiced_batch_nonstreaming below: with accumulated suite compile
    state, XLA:CPU segfaults while compiling this test's voiced cohort
    programs (reproduced at ~185 tests in, builder R4 — the crash site
    wandered here from the batched sibling when the suite's compile history
    shifted); the identical body passes standalone.  Upstream XLA:CPU bug,
    unreachable on the TPU backend."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    script = ("import sys; sys.path.insert(0, sys.argv[1]); "
              "import test_multivoice_serving as m; "
              "m._voiced_cohort_streaming_body(); print('VOICED_COHORT_OK')")
    proc = subprocess.run(
        [sys.executable, "-c", script, here],
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "COSY_TPU_NO_CACHE": "1"},
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "VOICED_COHORT_OK" in proc.stdout


def _voiced_batch_nonstreaming_body():
    """synthesize_batch with per-row voices == solo voiced synthesis rng-for-
    rng (same fold_in(k_wav, b) streams), mixed with a base row."""
    llm_p, flow_p, hift_p = _params()
    pipe = TTSPipeline(MODEL_CFG, llm_p, flow_p, hift_p, InferenceConfig(),
                       finetuned_norm=True)
    pipe.set_voices({"alice": _voice_adapters(llm_p, flow_p, 7),
                     "bob": _voice_adapters(llm_p, flow_p, 8)},
                    llm_scale=LLM_LORA.scaling, flow_scale=FLOW_LORA.scaling)
    ids = np.asarray([[3, 9, 2, 7, 1, 4]], np.int32)
    spk = np.zeros((1, MODEL_CFG.llm.spk_embed_dim), np.float32)
    rng = jax.random.PRNGKey(9)
    wavs = pipe.synthesize_batch(rng, [ids, ids], [spk, spk],
                                 voices=["bob", None])
    assert all(np.all(np.isfinite(w)) for w in wavs)
    # rows differ (bob's adapters vs base)
    assert (wavs[0].shape != wavs[1].shape
            or not np.allclose(wavs[0], wavs[1], atol=1e-4))
    # the base row matches a voice-free batch bit-for-bit (zero-row delta)
    base = pipe.synthesize_batch(rng, [ids, ids], [spk, spk])
    np.testing.assert_allclose(wavs[1], base[1], atol=1e-6)


def test_voiced_batch_nonstreaming():
    """Runs _voiced_batch_nonstreaming_body in a FRESH interpreter: after
    ~130 suite tests' accumulated compile state, XLA:CPU deterministically
    segfaults while COMPILING this one voiced batched-decode program
    (backend_compile_and_load in the faulthandler trace), yet the identical
    test passes standalone and in every smaller combination tried — an
    upstream XLA:CPU compiler-state bug, not a cosy_tpu defect, and not
    reachable on the TPU backend.  Isolating the process restores the
    condition under which the compile is reliable."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    script = ("import sys; sys.path.insert(0, sys.argv[1]); "
              "import test_multivoice_serving as m; "
              "m._voiced_batch_nonstreaming_body(); print('VOICED_BATCH_OK')")
    proc = subprocess.run(
        [sys.executable, "-c", script, here],
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "COSY_TPU_NO_CACHE": "1"},
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "VOICED_BATCH_OK" in proc.stdout
