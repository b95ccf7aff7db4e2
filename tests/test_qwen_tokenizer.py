"""QwenTokenizer (CosyVoice2 text path) contract tests.

The image ships no Qwen2 vocab asset, so the wrapper is exercised against a
tiny locally-built HF tokenizer; what is verified is exactly the behavior the
reference adds on top of the stock tokenizer (tokenizer.py:241-279): the
CosyVoice2 special-token set registered in order, plain-list encode, and
special-token-skipping decode.
"""

import pytest

from cosy_tpu.data.tokenizer import QWEN_SPECIAL_TOKENS, QwenTokenizer, get_qwen_tokenizer


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    vocab.update({" ": 26, "<|endoftext|>": 27})
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    d = str(tmp_path_factory.mktemp("qwen_tok"))
    PreTrainedTokenizerFast(tokenizer_object=tok).save_pretrained(d)
    return d


def test_special_tokens_match_reference_set():
    # exact set + order from cosyvoice/tokenizer/tokenizer.py:245-257
    add = QWEN_SPECIAL_TOKENS["additional_special_tokens"]
    assert add[:3] == ["<|im_start|>", "<|im_end|>", "<|endofprompt|>"]
    assert "[breath]" in add and "[lipsmack]" in add and add[-1] == "[mn]"
    assert len(add) == 19
    assert QWEN_SPECIAL_TOKENS["eos_token"] == "<|endoftext|>"
    assert QWEN_SPECIAL_TOKENS["pad_token"] == "<|endoftext|>"


def test_encode_decode_roundtrip(tiny_hf_dir):
    qt = QwenTokenizer(tiny_hf_dir)
    ids = qt.encode("abc")
    assert ids == [0, 1, 2]
    assert isinstance(ids, list) and all(isinstance(i, int) for i in ids)
    assert qt.decode(ids).replace(" ", "") == "abc"


def test_specials_appended_in_order_and_skipped_on_decode(tiny_hf_dir):
    qt = QwenTokenizer(tiny_hf_dir)
    base = 28  # 26 letters + space + <|endoftext|>
    add = QWEN_SPECIAL_TOKENS["additional_special_tokens"]
    for i, tok in enumerate(add):
        assert qt.tokenizer.convert_tokens_to_ids(tok) == base + i
    assert qt.vocab_size == base + len(add)
    # decode drops specials (skip_special_tokens=True default)
    ids = qt.encode("ab") + [base, base + 1]
    assert qt.decode(ids).replace(" ", "") == "ab"
    # and keeps them when asked not to skip
    qt2 = QwenTokenizer(tiny_hf_dir, skip_special_tokens=False)
    assert "<|im_start|>" in qt2.decode(ids)


def test_get_qwen_tokenizer_caches(tiny_hf_dir):
    a = get_qwen_tokenizer(tiny_hf_dir)
    b = get_qwen_tokenizer(tiny_hf_dir)
    assert a is b
