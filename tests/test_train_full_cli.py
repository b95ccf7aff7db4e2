"""train_full.py CLI — the reference bin/train.py equivalent, end to end.

Tiny topology via a synthetic cosyvoice.yaml + synthetic parquet shards:
llm and flow branches train real steps through the processor pipeline +
FullTrainer (orbax checkpoints, .pt exports, resume); hifigan branch runs a
GAN turn from raw-speech rows.
"""

import os

import numpy as np
import pytest

import train_full

TINY_YAML = """
sample_rate: 22050
llm: !new:cosyvoice.llm.llm.TransformerLM
    text_encoder_input_size: 16
    llm_input_size: 16
    llm_output_size: 16
    text_token_size: 40
    speech_token_size: 30
    spk_embed_dim: 12
    text_encoder: !new:cosyvoice.transformer.encoder.ConformerEncoder
        input_size: 16
        output_size: 16
        attention_heads: 2
        linear_units: 24
        num_blocks: 1
        static_chunk_size: 1
    llm: !new:cosyvoice.transformer.encoder.TransformerEncoder
        input_size: 16
        output_size: 16
        attention_heads: 2
        linear_units: 24
        num_blocks: 1
        static_chunk_size: 1
flow: !new:cosyvoice.flow.flow.MaskedDiffWithXvec
    input_size: 16
    output_size: 8
    spk_embed_dim: 12
    vocab_size: 30
    encoder: !new:cosyvoice.transformer.encoder.ConformerEncoder
        input_size: 16
        output_size: 16
        attention_heads: 2
        linear_units: 24
        num_blocks: 1
    decoder: !new:cosyvoice.flow.flow_matching.ConditionalCFM
        estimator: !new:cosyvoice.flow.decoder.ConditionalDecoder
            in_channels: 32
            out_channels: 8
            channels: [16, 16]
            attention_head_dim: 4
            n_blocks: 1
            num_mid_blocks: 1
            num_heads: 2
hift: !new:cosyvoice.hifigan.generator.HiFTGenerator
    in_channels: 80
    base_channels: 16
    nb_harmonics: 2
    upsample_rates: [8, 8]
    upsample_kernel_sizes: [16, 16]
    resblock_kernel_sizes: [3]
    resblock_dilation_sizes: [[1, 3]]
    source_resblock_kernel_sizes: [3, 3]
    source_resblock_dilation_sizes: [[1], [1]]
    f0_predictor_cond_channels: 8
"""


def _write_dataset(tmp_path, name, n=48, raw_speech=False, seed=0):
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        row = {
            "utt": f"u{i}",
            "text_token": rng.integers(0, 40, int(rng.integers(3, 8))).tolist(),
            "speech_token": rng.integers(0, 30, int(rng.integers(6, 12))).tolist(),
            "utt_embedding": rng.standard_normal(12).astype(np.float32).tolist(),
        }
        if raw_speech:
            dur = int(rng.integers(3000, 6000))
            row["speech"] = (0.3 * np.sin(
                2 * np.pi * 220 * np.arange(dur) / 22050)).astype(np.float32).tolist()
            row["sample_rate"] = 22050
        else:
            T = int(rng.integers(10, 20))
            feat = (rng.standard_normal((T, 8)) * 2 - 6).astype(np.float32)
            row["speech_feat"] = feat.reshape(-1).tolist()
            row["speech_feat_shape"] = [T, 8]
        rows.append(row)
    pq = str(tmp_path / f"{name}.parquet")
    pd.DataFrame(rows).to_parquet(pq)
    lst = str(tmp_path / f"{name}.list")
    with open(lst, "w") as f:
        f.write(pq + "\n")
    return lst


@pytest.fixture()
def yaml_path(tmp_path):
    p = str(tmp_path / "cosyvoice.yaml")
    with open(p, "w") as f:
        f.write(TINY_YAML)
    return p


def test_llm_branch_train_save_resume(tmp_path, yaml_path, capsys):
    train = _write_dataset(tmp_path, "train")
    cv = _write_dataset(tmp_path, "cv", n=8, seed=1)
    mdir = str(tmp_path / "out_llm")
    base = ["--model", "llm", "--train_data", train, "--cv_data", cv,
            "--config", yaml_path, "--model_dir", mdir,
            "--batch_size", "8", "--accum", "2", "--max_steps", "2",
            "--log_every", "1", "--shuffle_size", "8", "--sort_size", "4"]
    assert train_full.main(base) == 0
    out = capsys.readouterr().out
    assert "CV loss" in out and "acc=" in out
    assert os.path.isdir(os.path.join(mdir, "ckpt"))
    assert os.path.exists(os.path.join(mdir, "llm_epoch0.pt"))
    assert "epoch: 0" in open(os.path.join(mdir, "llm_epoch0.yaml")).read()

    # resume continues the step counter
    assert train_full.main(base + ["--resume", "--max_steps", "1"]) == 0
    out = capsys.readouterr().out
    assert "resumed at step 2" in out
    assert "step 3:" in out


def test_flow_branch_vendored_style(tmp_path, yaml_path, capsys):
    train = _write_dataset(tmp_path, "train")
    mdir = str(tmp_path / "out_flow")
    rc = train_full.main(
        ["--model", "flow", "--train_data", train, "--config", yaml_path,
         "--model_dir", mdir, "--batch_size", "8", "--max_steps", "2",
         "--log_every", "1", "--shuffle_size", "8", "--sort_size", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loss=" in out
    assert os.path.exists(os.path.join(mdir, "flow_epoch0.pt"))
    # exported weights load as a flat torch state dict
    from cosy_tpu.params import load_torch_checkpoint

    loaded = load_torch_checkpoint(os.path.join(mdir, "flow_epoch0.pt"))
    assert any(k.startswith("decoder.estimator") for k in loaded)


CV2_TINY_YAML = """
sample_rate: 24000
llm: !new:cosyvoice.llm.llm.Qwen2LM
    llm_input_size: 32
    llm_output_size: 32
    speech_token_size: 30
    qwen:
        hidden_size: 32
        intermediate_size: 64
        num_hidden_layers: 2
        num_attention_heads: 4
        num_key_value_heads: 2
        head_dim: 8
        vocab_size: 50
flow: !new:cosyvoice.flow.flow.CausalMaskedDiffWithXvec
    input_size: 16
    output_size: 8
    spk_embed_dim: 12
    vocab_size: 30
    token_mel_ratio: 2
    pre_lookahead_len: 1
    num_up_blocks: 1
    encoder: !new:cosyvoice.transformer.upsample_encoder.UpsampleConformerEncoder
        input_size: 16
        output_size: 16
        attention_heads: 2
        linear_units: 24
        num_blocks: 1
        static_chunk_size: 4
    decoder: !new:cosyvoice.flow.flow_matching.CausalConditionalCFM
        estimator: !new:cosyvoice.flow.decoder.CausalConditionalDecoder
            in_channels: 32
            out_channels: 8
            channels: [16, 16]
            attention_head_dim: 4
            n_blocks: 1
            num_mid_blocks: 1
            num_heads: 2
"""


def test_dpo_branch(tmp_path, capsys):
    """--dpo: CosyVoice2 Qwen2LM preference training from rows carrying
    reject_speech_token (reference: bin/train.py --dpo)."""
    import pandas as pd

    rng = np.random.default_rng(3)
    rows = []
    for i in range(16):
        rows.append({
            "utt": f"u{i}",
            "text_token": rng.integers(0, 50, 5).tolist(),
            "speech_token": np.full(12, 3, np.int64).tolist(),
            "reject_speech_token": np.full(6, 7, np.int64).tolist(),
            "utt_embedding": rng.standard_normal(12).astype(np.float32).tolist(),
        })
    pq = str(tmp_path / "dpo.parquet")
    pd.DataFrame(rows).to_parquet(pq)
    lst = str(tmp_path / "dpo.list")
    open(lst, "w").write(pq + "\n")
    ypath = str(tmp_path / "cv2.yaml")
    open(ypath, "w").write(CV2_TINY_YAML)

    mdir = str(tmp_path / "out_dpo")
    rc = train_full.main(
        ["--model", "llm", "--dpo", "--train_data", lst, "--config", ypath,
         "--model_dir", mdir, "--batch_size", "8", "--max_steps", "2",
         "--log_every", "1", "--shuffle_size", "8", "--sort_size", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dpo_acc=" in out and "sft_loss=" in out
    assert os.path.exists(os.path.join(mdir, "llm_epoch0.pt"))


def test_cv2_llm_and_flow_branches(tmp_path, capsys):
    """--cosyvoice2: Qwen2LM training and the causal flow2 objective from
    the same CLI (the reference trains CV2 through the same bin/train.py
    with a CV2 yaml)."""
    ypath = str(tmp_path / "cv2.yaml")
    open(ypath, "w").write(CV2_TINY_YAML)
    train = _write_dataset(tmp_path, "train", n=24)

    mdir = str(tmp_path / "out_cv2_llm")
    rc = train_full.main(
        ["--model", "llm", "--cosyvoice2", "--train_data", train,
         "--config", ypath, "--model_dir", mdir, "--batch_size", "8",
         "--max_steps", "1", "--log_every", "1",
         "--shuffle_size", "8", "--sort_size", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "acc=" in out
    assert os.path.exists(os.path.join(mdir, "llm_epoch0.pt"))

    mdir2 = str(tmp_path / "out_cv2_flow")
    rc = train_full.main(
        ["--model", "flow", "--cosyvoice2", "--cv2_streaming",
         "--train_data", train, "--config", ypath, "--model_dir", mdir2,
         "--batch_size", "8", "--max_steps", "1", "--log_every", "1",
         "--shuffle_size", "8", "--sort_size", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loss=" in out
    assert os.path.exists(os.path.join(mdir2, "flow_epoch0.pt"))


@pytest.mark.slow
def test_hifigan_branch(tmp_path, yaml_path, capsys):
    train = _write_dataset(tmp_path, "gan", n=8, raw_speech=True)
    mdir = str(tmp_path / "out_gan")
    rc = train_full.main(
        ["--model", "hifigan", "--train_data", train, "--config", yaml_path,
         "--model_dir", mdir, "--batch_size", "2", "--max_steps", "1",
         "--log_every", "1", "--gan_truncate", "2048",
         "--shuffle_size", "4", "--sort_size", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "gen/loss" in out or "disc/loss" in out
    assert os.path.exists(os.path.join(mdir, "hift_epoch0.pt"))


def test_epochs_zero_exits_cleanly(tmp_path, yaml_path):
    """--epochs 0 (CV-only / dry run) must not crash in the ckptr drain
    (ADVICE r3 #5)."""
    train = _write_dataset(tmp_path, "train")
    mdir = str(tmp_path / "out_e0")
    assert train_full.main(
        ["--model", "llm", "--train_data", train, "--config", yaml_path,
         "--model_dir", mdir, "--epochs", "0", "--batch_size", "8",
         "--shuffle_size", "8", "--sort_size", "4"]) == 0


def test_llm_raw_text_rows_build_tokenizer_or_fail_fast(tmp_path, yaml_path):
    """Rows carrying only raw text (no text_token) must either tokenize via a
    discovered vocab or exit with a clear message (ADVICE r3 #4)."""
    import pandas as pd

    rng = np.random.default_rng(3)
    rows = []
    for i in range(8):
        rows.append({
            "utt": f"u{i}",
            "text": "你好世界",
            "speech_token": rng.integers(0, 30, 8).tolist(),
            "utt_embedding": rng.standard_normal(12).astype(np.float32).tolist(),
        })
    pq = str(tmp_path / "rawtext.parquet")
    pd.DataFrame(rows).to_parquet(pq)
    lst = str(tmp_path / "rawtext.list")
    with open(lst, "w") as f:
        f.write(pq + "\n")

    from cosy_tpu.data.tokenizer import find_vocab_file

    ns = type("NS", (), {"model": "llm", "shuffle_size": 8, "sort_size": 4,
                         "batch_size": 4, "use_spk_embedding": False,
                         "gan_truncate": 24576})()
    if find_vocab_file() is None:
        with pytest.raises(SystemExit, match="lack text_token"):
            train_full.build_loader(lst, ns)
    else:
        loader = train_full.build_loader(lst, ns)
        batch = next(iter(loader))
        assert "text_token" in batch
