"""Frontend tests: pinyin splitting, number normalization, EN G2P, routing,
token inventory."""

import os

import pytest

from emotivoice_tpu.frontend.cn import (
    g2p_cn,
    normalize_numbers,
    pinyin_to_phonemes,
    split_pinyin,
)
from emotivoice_tpu.frontend.en import get_eng_phoneme, rule_g2p
from emotivoice_tpu.frontend.mixed import contains_chinese, g2p_cn_en
from emotivoice_tpu.frontend.numbers_cn import an2cn
from emotivoice_tpu.frontend.tokens import TokenVocab, default_inventory

REF_TOKENLIST = "/root/reference/data/youdao/text/tokenlist"


class TestSplitPinyin:
    # Expected values follow the reference split_py conventions
    # (frontend_cn.py:24-70).
    CASES = {
        "zhong1": ["zh", "ong1"],
        "guo2": ["g", "uo2"],
        "zi4": ["z", "ii4"],
        "ci2": ["c", "ii2"],
        "si1": ["s", "ii1"],
        "ri4": ["r", "ii4"],
        "zhi1": ["zh", "iii1"],
        "chi1": ["ch", "iii1"],
        "shi4": ["sh", "iii4"],
        "ya1": ["ia1"],
        "yan2": ["ian2"],
        "ye4": ["ie4"],
        "yong3": ["iong3"],
        "you3": ["iou3"],
        "yi1": ["i1"],
        "yin1": ["in1"],
        "ying2": ["ing2"],
        "yu2": ["v2"],
        "yuan2": ["van2"],
        "yun2": ["vn2"],
        "wu3": ["u3"],
        "wo3": ["uo3"],
        "wang2": ["uang2"],
        "ju2": ["j", "v2"],
        "qu4": ["q", "v4"],
        "xu3": ["x", "v3"],
        "hui4": ["h", "uei4"],
        "liu2": ["l", "iou2"],
        "lun4": ["l", "uen4"],
        "lve4": ["l", "ve4"],
        "er2": ["er2"],
        "hua1r1": None,  # not a real case; skip
        "ma5": ["m", "a5"],
        "dianr3": ["d", "ianr3"],  # erhua
        "n2": ["en2"],  # syllabic nasal
        "ng4": ["eng4"],
        "m2": ["em2"],
    }

    def test_cases(self):
        for syl, expect in self.CASES.items():
            if expect is None:
                continue
            assert split_pinyin(syl) == expect, syl


class TestNumbersCN:
    CASES = {
        "0": "零",
        "5": "五",
        "10": "十",
        "14": "十四",
        "25": "二十五",
        "100": "一百",
        "110": "一百一十",
        "105": "一百零五",
        "1000": "一千",
        "1005": "一千零五",
        "1050": "一千零五十",
        "9999": "九千九百九十九",
        "10000": "一万",
        "100200": "十万零二百",
        "123456789": "一亿二千三百四十五万六千七百八十九",
        "3.14": "三点一四",
        "0.5": "零点五",
    }

    def test_cases(self):
        for num, expect in self.CASES.items():
            assert an2cn(num) == expect, (num, an2cn(num), expect)

    def test_normalize_in_text(self):
        out = normalize_numbers("我有25个")
        assert out == "我有二十五个"

    def test_up_mode(self):
        # financial numerals (reference an2cn.py UNIT/NUMBER_UP tables)
        assert an2cn("123", "up") == "壹佰贰拾叁"
        assert an2cn("10", "up") == "壹拾"  # up mode keeps the leading 壹
        assert an2cn("1005", "up") == "壹仟零伍"
        assert an2cn("3.14", "up") == "叁点壹肆"

    def test_rmb_mode(self):
        # reference an2cn.py:63-105 元/角/分/整 branch table
        assert an2cn("123", "rmb") == "壹佰贰拾叁元整"
        assert an2cn("123.00", "rmb") == "壹佰贰拾叁元整"
        assert an2cn("123.45", "rmb") == "壹佰贰拾叁元肆角伍分"
        assert an2cn("123.4", "rmb") == "壹佰贰拾叁元肆角"
        assert an2cn("123.05", "rmb") == "壹佰贰拾叁元零伍分"
        assert an2cn("0.5", "rmb") == "伍角"
        assert an2cn("0.05", "rmb") == "伍分"
        assert an2cn("-8", "rmb") == "负捌元整"

    def test_direct_mode(self):
        assert an2cn("2023", "direct") == "二零二三"
        assert an2cn("3.14", "direct") == "三点一四"
        assert an2cn("-10", "direct") == "负一零"

    def test_bad_mode_raises(self):
        import pytest

        with pytest.raises(ValueError):
            an2cn("1", "nope")


class TestEnG2p:
    def test_structure(self):
        out = get_eng_phoneme("Happy New Year", None, pad_sos_eos=True).split()
        assert out[0] == "<sos/eos>" and out[-1] == "<sos/eos>"
        assert "engsp1" in out
        assert all(p.startswith("[") or "sp" in p or p == "<sos/eos>" for p in out)
        assert out[-2] != "engsp1"  # trailing gap stripped

    def test_punctuation_gap(self):
        out = get_eng_phoneme("yes, no", None, pad_sos_eos=False).split()
        assert "engsp4" in out

    def test_lexicon_priority(self):
        lex = {"hello": ["HH", "AH0", "L", "OW1"]}
        out = get_eng_phoneme("hello", lex, pad_sos_eos=False)
        assert out == "[HH] [AH0] [L] [OW1]"

    def test_rule_g2p_reasonable(self):
        assert rule_g2p("cat") == ["K", "AE1", "T"]
        assert rule_g2p("ship")[0] == "SH"
        assert rule_g2p("think")[0] == "TH"
        assert "EY1" in rule_g2p("make")  # magic e
        assert rule_g2p("seen")[1] == "IY1"

    def test_mini_lexicon_tokens_valid(self):
        """All fallback phones must exist in the default token inventory."""
        vocab = TokenVocab.default()
        for word in ["the", "through", "people", "beautiful"]:
            out = get_eng_phoneme(word, None, pad_sos_eos=False).split()
            ids = vocab.encode(out, strict=True)
            assert len(ids) == len(out)


class TestMixed:
    def test_contains_chinese(self):
        assert contains_chinese("你好")
        assert not contains_chinese("hello")

    def test_english_only(self):
        out = g2p_cn_en("Happy New Year").split()
        assert out[0] == "<sos/eos>" and out[-1] == "<sos/eos>"
        assert "cn_eng_sp" not in out

    @pytest.mark.skipif(
        not pytest.importorskip("jieba"), reason="jieba required"
    )
    def test_cn_requires_pypinyin_or_raises(self):
        try:
            import pypinyin  # noqa

            has = True
        except ImportError:
            has = False
        if has:
            out = g2p_cn("你好")
            assert out.startswith("<sos/eos>")
        else:
            with pytest.raises(RuntimeError):
                g2p_cn("你好")

    def test_pinyin_path_works_without_pypinyin(self):
        phs = pinyin_to_phonemes(["ni3", "hao3"])
        assert phs == ["n", "i3", "sp0", "h", "ao3"]


class TestTokenVocab:
    def test_default_inventory_covers_arpabet_and_pinyin(self):
        vocab = TokenVocab.default()
        for t in ["_", "<sos/eos>", "[AA1]", "[ZH]", "zh", "ong1", "iour1",
                  "sp0", "sp3", "engsp1", "cn_eng_sp", "uncased99"]:
            assert t in vocab.token2id, t

    @pytest.mark.skipif(
        not os.path.exists(REF_TOKENLIST), reason="reference tokenlist absent"
    )
    def test_reference_tokenlist_loads_and_is_covered(self):
        ref = TokenVocab.from_file(REF_TOKENLIST)
        assert len(ref) == 502
        assert ref.token2id["<sos/eos>"] == 1
        # Our default inventory must cover every non-reserved reference token.
        ours = set(TokenVocab.default().tokens)
        missing = [
            t for t in ref.tokens
            if t not in ours and not t.startswith("uncased")
        ]
        assert missing == [], missing


class TestEnglishNumbers:
    def test_cardinals(self):
        from emotivoice_tpu.frontend.numbers_en import number_to_words

        assert number_to_words(0) == "zero"
        assert number_to_words(14) == "fourteen"
        assert number_to_words(42) == "forty two"
        assert number_to_words(100) == "one hundred"
        assert number_to_words(1234) == "one thousand two hundred thirty four"
        assert number_to_words(1_000_000) == "one million"

    def test_ordinals_money_decimals(self):
        from emotivoice_tpu.frontend.numbers_en import normalize_numbers

        assert normalize_numbers("the 1st and 22nd") == (
            "the first and twenty second"
        )
        assert normalize_numbers("$2.50") == "two dollars fifty cents"
        assert normalize_numbers("$1") == "one dollar"
        # Irregular pound sub-unit plural (inflect in the reference: 'pence')
        assert normalize_numbers("£2.50") == "two pounds fifty pence"
        assert normalize_numbers("£1.01") == "one pound one penny"
        assert normalize_numbers("3.14") == "three point one four"
        assert normalize_numbers("in 1984") == "in nineteen eighty four"
        assert normalize_numbers("1,000") == "one thousand"

    def test_g2p_english_numbers_flag(self):
        from emotivoice_tpu.frontend.mixed import g2p_cn_en

        en = g2p_cn_en("42 cats", english_numbers=True)
        # "forty two cats" is pure English -> no Chinese phonemes
        assert "cn_eng_sp" not in en and "eng_cn_sp" not in en
        assert len(en.split()) > 6  # numbers actually expanded to words
        try:
            # default keeps reference behavior: digits -> Chinese numerals
            # (which needs the pypinyin dictionary, as in the reference)
            default = g2p_cn_en("42 cats")
            assert default != en
        except RuntimeError:
            import pytest

            pytest.skip("pypinyin not installed")


class TestCnDictionary:
    def test_cc_cedict_loaded_when_pypinyin_present(self):
        """The reference loads pypinyin_dict's cc_cedict phrase data before
        any G2P (frontend_cn.py:20-21); our module must do the same whenever
        pypinyin is importable. Verified with stub modules so the test runs
        in environments without pypinyin."""
        import importlib
        import sys
        import types

        calls = []
        fake_pypinyin = types.ModuleType("pypinyin")
        fake_pypinyin.Style = types.SimpleNamespace(TONE3="tone3")
        fake_pypinyin.pinyin = lambda word, style=None, **kw: [
            ["ni3"] for _ in word
        ]
        fake_dict = types.ModuleType("pypinyin_dict")
        fake_phrase = types.ModuleType("pypinyin_dict.phrase_pinyin_data")
        fake_cedict = types.ModuleType(
            "pypinyin_dict.phrase_pinyin_data.cc_cedict"
        )
        fake_cedict.load = lambda: calls.append("load")
        fake_phrase.cc_cedict = fake_cedict

        saved = {
            k: sys.modules.get(k)
            for k in (
                "pypinyin",
                "pypinyin_dict",
                "pypinyin_dict.phrase_pinyin_data",
                "pypinyin_dict.phrase_pinyin_data.cc_cedict",
            )
        }
        try:
            sys.modules["pypinyin"] = fake_pypinyin
            sys.modules["pypinyin_dict"] = fake_dict
            sys.modules["pypinyin_dict.phrase_pinyin_data"] = fake_phrase
            sys.modules["pypinyin_dict.phrase_pinyin_data.cc_cedict"] = (
                fake_cedict
            )
            import emotivoice_tpu.frontend.cn as cn

            cn = importlib.reload(cn)
            assert calls == ["load"]
            assert cn._HAS_PYPINYIN
            # hanzi G2P routes through the (stubbed) dictionary
            out = cn.g2p_cn("你好")
            assert out.startswith("<sos/eos>") and "i3" in out
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v
            import emotivoice_tpu.frontend.cn as cn

            importlib.reload(cn)
