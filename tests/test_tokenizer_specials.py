"""Named special-token parity for the 300M tiktoken build.

The reference registers ~1.7k *named* specials after the 58836 mergeable
ranks (cosyvoice/tokenizer/tokenizer.py:179-199): endoftext/startoftranscript,
105 languages, 11 audio events, 4 emotions, task markers, 30 ASR
SPECIAL_TOKENs, 20 TTS vocal tokens, 1501 timestamps.  Expected ids below
were recorded from the reference encoding algorithm run against the shipped
vocab asset (58836 ranks, so specials start at 58836).
"""

import pytest

from cosy_tpu.data.tokenizer import (
    LANGUAGES, TEXT_TOKEN_SIZE, build_specials, find_vocab_file, TextTokenizer,
)


def test_specials_table_shape():
    names = build_specials()
    assert len(LANGUAGES) == 105
    # 2 + 105 + 11 + 4 + 6 + 30 + 20 + 1501
    assert len(names) == 1679
    assert names[0] == "<|endoftext|>"
    assert names[1] == "<|startoftranscript|>"
    assert names[2] == "<|en|>"
    assert names[106] == "<|en/zh|>"        # last language
    assert "<|Laughter|>" in names and "<|HAPPY|>" in names
    assert "<|SPECIAL_TOKEN_1|>" in names and "<|SPECIAL_TOKEN_30|>" in names
    assert "<|TTS/SP13|>" in names
    assert names[-1] == "<|30.00|>"         # 1500 * 0.02
    assert len(set(names)) == len(names)


VOCAB = find_vocab_file()


@pytest.mark.skipif(VOCAB is None, reason="tiktoken vocab asset not available")
def test_special_token_id_parity_with_reference():
    tok = TextTokenizer()
    assert tok.vocab_size == TEXT_TOKEN_SIZE == 60515
    # (text, ids recorded from the reference get_encoding with
    #  allowed_special='all' — see module docstring)
    cases = [
        ("<|endoftext|>", [58836]),
        ("hello <|zh|> world<|endoftext|>", [675, 1909, 220, 58839, 1002, 58836]),
        ("<|TTS/SP05|> breathe <|TTS/B|>", [59005, 9997, 220, 58994]),
        ("<|SPECIAL_TOKEN_1|><|SPECIAL_TOKEN_30|>", [58964, 58993]),
        ("<|startoftranscript|><|en/zh|><|transcribe|><|notimestamps|>",
         [58837, 58942, 58959, 58963]),
    ]
    for text, expect in cases:
        assert tok.encode(text) == expect, text
    # laughter markup + emotion + timestamps, prefix-checked full strings
    assert tok.encode("<|Laughter|>haha<|/Laughter|>")[:1] == [58950]
    assert tok.encode("<|0.00|>")[0] == 59014
    assert tok.encode("<|12.34|>")[0] == 59631
    assert tok.encode("<|30.00|>")[0] == 60514
    # round-trip through decode
    assert tok.decode([58836]) == "<|endoftext|>"


@pytest.mark.skipif(VOCAB is None, reason="tiktoken vocab asset not available")
def test_plain_text_unchanged_by_specials_port():
    tok = TextTokenizer()
    # ids recorded before the named-specials port (placeholder era) — the
    # mergeable-rank path must be unaffected
    assert tok.encode("plain mixed text 你好世界 123") == \
        [33683, 7351, 2476, 220, 48934, 50371, 48721, 53743, 33350]
