"""Text frontend edge cases: number verbalization (zh/en), cleanup rules,
paragraph splitting (reference: cosyvoice/utils/frontend_utils.py)."""

from cosy_tpu.data.text import (contains_chinese, en_number_to_words,
                                remove_bracket, replace_blank, split_paragraph,
                                spell_out_numbers, text_normalize,
                                zh_number_to_words)


def test_en_numbers():
    assert en_number_to_words(0) == "zero"
    assert en_number_to_words(13) == "thirteen"
    assert en_number_to_words(42) == "forty-two"
    assert en_number_to_words(100) == "one hundred"
    assert en_number_to_words(215) == "two hundred fifteen"  # no tens compound
    assert en_number_to_words(1000) == "one thousand"
    assert en_number_to_words(1000000) == "one million"
    assert en_number_to_words(-7) == "minus seven"


def test_zh_numbers():
    assert zh_number_to_words(0) == "零"
    assert zh_number_to_words(10) == "十"
    assert zh_number_to_words(14) == "十四"
    assert zh_number_to_words(20) == "二十"
    assert zh_number_to_words(105) == "一百零五"
    assert zh_number_to_words(110) == "一百一十"
    assert zh_number_to_words(1001) == "一千零一"
    assert zh_number_to_words(10000) == "一万"
    assert zh_number_to_words(-3) == "负三"


def test_decimal_spelling():
    assert spell_out_numbers("pi is 3.14", "en") == "pi is three point one four"
    assert spell_out_numbers("价格3.5元", "zh") == "价格三点五元"


def test_language_detection():
    assert contains_chinese("你好 world")
    assert not contains_chinese("hello world 123!")


def test_bracket_and_blank_cleanup():
    assert remove_bracket("他说「你好」(really)") == "他说你好really"
    # a space survives only between two ascii word chars
    # (frontend_utils.py:124-134); CJK-adjacent spaces are dropped
    assert replace_blank("你 好 ok go") == "你好ok go"


def test_text_normalize_en():
    assert text_normalize("  I   have 2 cats.  ") == "I have two cats."


def test_text_normalize_zh_trailing_comma():
    out = text_normalize("你好，世界，")
    assert out.endswith("。") and "，，" not in out


def test_split_paragraph_en_budget():
    tok = lambda t: list(t.encode())  # 1 token per byte
    text = ("one sentence here. " * 12).strip()
    parts = split_paragraph(text, tok, lang="en", token_max_n=80,
                            token_min_n=60, merge_len=20)
    assert len(parts) >= 2
    assert "".join(parts).replace(" ", "") == text.replace(" ", "")
    for part in parts[:-1]:
        assert len(tok(part)) <= 80 + 25  # one sentence overshoot allowed


def test_split_paragraph_zh_and_short_tail_merge():
    tok = lambda t: list(t)
    text = "春眠不觉晓。" * 20 + "完。"
    parts = split_paragraph(text, tok, lang="zh", token_max_n=30,
                            token_min_n=20, merge_len=10)
    assert len(parts) >= 3
    assert "".join(parts) == text
    # the 2-char tail was merged, not emitted alone
    assert all(len(p) >= 10 for p in parts)


def test_split_empty_and_unpunctuated():
    tok = lambda t: list(t.encode())
    assert split_paragraph("", tok, lang="en") == []
    parts = split_paragraph("no punctuation at all", tok, lang="en")
    assert parts == ["no punctuation at all."]
