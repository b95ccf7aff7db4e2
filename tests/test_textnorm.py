"""Table-driven TN cases for the wetext/inflect-reachable subset.

The reference normalizes via ttsfrd or wetext + inflect
(cosyvoice/cli/frontend.py:160-188); neither library ships in this image, so
expectations below are curated to their documented conventions (dates read
digit-by-digit for years, 幺 for phone digits, 百分之 prefix, inflect-style
hyphenated compounds and ordinals for English).
"""

import pytest

from cosy_tpu.data.text import text_normalize
from cosy_tpu.data.textnorm import en_ordinal_words, normalize_en, normalize_zh

ZH_CASES = [
    # dates
    ("今天是2024年5月1日", "今天是二零二四年五月一日"),
    ("合同签于1999年12月31号", "合同签于一九九九年十二月三十一日"),
    ("他1995年出生", "他一九九五年出生"),
    ("6月18日大促", "六月十八日大促"),
    # clock times
    ("会议在8:05开始", "会议在八点零五分开始"),
    ("下午17:30:20到站", "下午十七点三十分二十秒到站"),
    ("9:00整点开门", "九点整整点开门"),
    # percentages / fractions / decimals
    ("涨了3.5%", "涨了百分之三点五"),
    ("完成了50%", "完成了百分之五十"),
    ("占总数的3/4", "占总数的四分之三"),
    ("圆周率约为3.14", "圆周率约为三点一四"),
    ("亏损了-2.5%", "亏损了百分之负二点五"),
    # units
    ("体重65.5kg", "体重六十五点五千克"),
    ("身高175cm", "身高一百七十五厘米"),
    ("限速120km/h", "限速一百二十公里每小时"),
    ("气温-5℃到25℃", "气温负五摄氏度到二十五摄氏度"),
    ("内存32GB", "内存三十二吉字节"),
    ("加了500ml水", "加了五百毫升水"),
    # phone numbers (幺 reading)
    ("请拨13812345678", "请拨幺三八幺二三四五六七八"),
    ("座机010-12345678", "座机零幺零幺二三四五六七八"),
    # currency
    ("只要9.9元", "只要九点九元"),
    ("价格$5", "价格五美元"),
    ("￥199秒杀", "一百九十九元秒杀"),
    # ranges, classifiers, ordinals, large numbers
    ("需要5-10天", "需要五到十天"),
    ("来了2个人等2分钟", "来了两个人等两分钟"),
    ("第3名获奖", "第三名获奖"),
    ("全校共1205人", "全校共一千二百零五人"),
    ("约10000只", "约一万只"),
]

EN_CASES = [
    ("the 21st of May", "the twenty-first of May"),
    ("ranked 103rd overall", "ranked one hundred third overall"),
    ("the 12th time", "the twelfth time"),
    ("22nd and 33rd", "twenty-second and thirty-third"),
    ("it costs $5.50", "it costs five dollars fifty cents"),
    ("just $1", "just one dollar"),
    ("up 3.5% today", "up three point five percent today"),
    ("100% sure", "one hundred percent sure"),
    ("meet at 5:30", "meet at five thirty"),
    ("meet at 5:05", "meet at five oh five"),
    ("meet at 5:00", "meet at five o'clock"),
    ("pi is 3.14159", "pi is three point one four one five nine"),
    ("-42 degrees", "minus forty-two degrees"),
    ("chapter 7 of 12", "chapter seven of twelve"),
    ("born in 1984", "born in one thousand nine hundred eighty-four"),
]


@pytest.mark.parametrize("raw,want", ZH_CASES, ids=[c[0][:16] for c in ZH_CASES])
def test_normalize_zh(raw, want):
    assert normalize_zh(raw) == want


@pytest.mark.parametrize("raw,want", EN_CASES, ids=[c[0][:20] for c in EN_CASES])
def test_normalize_en(raw, want):
    assert normalize_en(raw) == want


def test_ordinal_words():
    assert en_ordinal_words(1) == "first"
    assert en_ordinal_words(2) == "second"
    assert en_ordinal_words(3) == "third"
    assert en_ordinal_words(5) == "fifth"
    assert en_ordinal_words(9) == "ninth"
    assert en_ordinal_words(20) == "twentieth"
    assert en_ordinal_words(21) == "twenty-first"
    assert en_ordinal_words(100) == "one hundredth"
    assert en_ordinal_words(1000) == "one thousandth"


def test_text_normalize_end_to_end_zh():
    # full pipeline: bracket removal, TN, dot -> 。, blank cleanup
    got = text_normalize("（新闻）2024年5月1日，涨幅3.5%. 详情拨打13812345678")
    assert got == "新闻二零二四年五月一日，涨幅百分之三点五。详情拨打幺三八幺二三四五六七八"


def test_text_normalize_end_to_end_en():
    got = text_normalize("The  21st   meeting costs $5.50, starting at 9:30.")
    assert got == "The twenty-first meeting costs five dollars fifty cents, starting at nine thirty."


def test_no_digits_survive_normalization_fuzz():
    """Property: text_normalize fully verbalizes every digit for both
    languages across templated random inputs (dates, times, units, phones,
    currency, percentages, decimals, ranges)."""
    import random
    import re

    random.seed(0)
    zh_tpl = ["价格{}元", "共{}人", "占{}%", "电话{}", "时间{}:{}",
              "日期{}年{}月{}日", "重量{}kg", "{}条", "从{}-{}", "上涨{}.{}个点"]
    en_tpl = ["costs ${}", "{}th place", "at {}:{}", "{} items", "{}% done",
              "chapter {}", "pi {}.{}"]
    for tpl_list, hi in ((zh_tpl, 99999), (en_tpl, 9999)):
        for tpl in tpl_list:
            n = tpl.count("{}")
            for _ in range(25):
                raw = tpl.format(*[random.randint(0, hi) for _ in range(n)])
                out = text_normalize(raw)
                assert not re.search(r"\d", out), (raw, out)


def test_zh_iso_date_not_read_as_range():
    """'2023-05-12' must read as a date, not a range plus a negative number
    (the range rule runs after the ISO-date rule)."""
    from cosy_tpu.data.textnorm import normalize_zh

    out = normalize_zh("会议定于2023-05-12举行")
    assert out == "会议定于二零二三年五月十二日举行", out
    # plain ranges still work
    assert normalize_zh("5-10个") == "五到十个"
