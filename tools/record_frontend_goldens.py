#!/usr/bin/env python
"""Record/refresh the frontend golden fixture (tests/fixtures/frontend_goldens.jsonl).

The fixture is a byte-level regression corpus for the G2P frontend
(reference behavior: `frontend_cn.py:23-121`, `frontend.py:22-64`). Entry
types:

  {"type": "syllables", "input": [TONE3 syllables], "expect": "ph ph ..."}
      pinyin rule engine (split_pinyin / pinyin_to_phonemes) — runnable in
      any environment, recorded here.
  {"type": "en", "input": text, "expect": "..."}
      English G2P via the bundled lexicon/rule-LTS path.
  {"type": "hanzi", "input": text, "expect": str|null}
  {"type": "mixed", "input": text, "expect": str|null}
      full g2p_cn / g2p_cn_en — require jieba+pypinyin(+pypinyin_dict
      cc_cedict, reference frontend_cn.py:20-21). expect stays null until
      this tool runs on a machine that has them; the test skips null
      entries, so the same file doubles as a byte-parity gate wherever the
      reference's own dependencies are installed.

Usage: python tools/record_frontend_goldens.py [--check]
  --check: verify current outputs match the fixture instead of rewriting it.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "frontend_goldens.jsonl",
)

# Pinyin rule-engine corpus: every split_pinyin branch (zi/ci/si/ri -> ii,
# zhi/chi/shi -> iii, y/w rewrites, jqx+u -> v, ui/iu/un/ue expansions,
# syllabic nasals, erhua, all 5 tones) plus common syllables.
SYLLABLE_CASES = [
    ["ni3", "hao3"],
    ["zhong1", "guo2"],
    ["zi4", "ci2", "si1", "ri4"],
    ["zhi1", "chi2", "shi4"],
    ["yi1", "yin2", "ying3"],
    ["ya1", "yan2", "yang3", "yao4", "ye5", "yong1", "you2"],
    ["yu2", "yuan2", "yue4", "yun2"],
    ["wu3", "wo3", "wai4", "wei2", "wan2", "wen4", "wang2", "weng1"],
    ["ju1", "qu2", "xu3", "jun1", "quan2", "xue2"],
    ["hui4", "liu2", "lun2", "lve4", "jue2"],
    ["dui4", "niu2", "gun4", "nve4"],
    ["er2", "er4"],
    ["huar1", "wanr2", "dianr3"],
    ["n2", "ng5", "m5"],
    ["ma1", "ma2", "ma3", "ma4", "ma5"],
    ["bo1", "po2", "mo2", "fo2"],
    ["de5", "te4", "ne5", "le5"],
    ["ge1", "ke3", "he2"],
    ["zhuang1", "chuang2", "shuang1"],
    ["xian1", "qiang2", "jiong3"],
    ["zei2", "cao3", "sou1"],
    ["ban1", "pang2", "meng4", "feng1"],
    ["dia3", "nia1"],
    ["zhuai1", "shuai4", "guai3", "kuai4"],
    ["qiong2", "xiong2"],
    ["lv3", "nv3"],
]

# English sentences: bundled lexicon + rule-LTS fallback (frontend/en.py),
# punctuation gaps (engsp4) and word gaps (engsp1).
EN_CASES = [
    "Hello world.",
    "The quick brown fox jumps over the lazy dog.",
    "How are you today?",
    "Speech synthesis, at last!",
    "I have twelve apples and one pear.",
]

# Chinese / mixed texts (recorded only where pypinyin+jieba exist).
HANZI_CASES = [
    "你好",
    "今天天气很好。",
    "我们一起学习语音合成。",
    "他在2023年去了北京。",
    "这是一个测试句子，包含标点符号！",
    "千山鸟飞绝，万径人踪灭。",
    "小明有3个苹果和12个橘子。",
]
MIXED_CASES = [
    "我们用Python做TTS。",
    "EmotiVoice是一个语音合成系统。",
    "请打开App然后点击开始。",
    "hello你好world世界",
]


def _record():
    from emotivoice_tpu.frontend.cn import pinyin_to_phonemes

    entries = []
    for syls in SYLLABLE_CASES:
        entries.append({
            "type": "syllables",
            "input": syls,
            "expect": " ".join(pinyin_to_phonemes(syls)),
        })

    from emotivoice_tpu.frontend.mixed import g2p_cn_en

    for text in EN_CASES:
        entries.append({
            "type": "en", "input": text, "expect": g2p_cn_en(text),
        })

    try:
        import jieba  # noqa: F401
        import pypinyin  # noqa: F401

        cn_ok = True
    except ImportError:
        cn_ok = False

    from emotivoice_tpu.frontend.cn import g2p_cn

    for text in HANZI_CASES:
        entries.append({
            "type": "hanzi", "input": text,
            "expect": g2p_cn(text) if cn_ok else None,
        })
    for text in MIXED_CASES:
        entries.append({
            "type": "mixed", "input": text,
            "expect": g2p_cn_en(text) if cn_ok else None,
        })
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    new = _record()
    if args.check:
        with open(FIXTURE) as f:
            old = [json.loads(line) for line in f if line.strip()]
        n_checked = n_skipped = 0
        for o, n in zip(old, new):
            assert o["type"] == n["type"] and o["input"] == n["input"]
            if n["expect"] is None or o["expect"] is None:
                n_skipped += 1
                continue
            assert o["expect"] == n["expect"], (o, n)
            n_checked += 1
        print(f"OK: {n_checked} byte-exact, {n_skipped} unrecordable here")
        return

    # Preserve previously recorded expectations this environment can't
    # reproduce (e.g. hanzi goldens recorded where pypinyin exists).
    if os.path.exists(FIXTURE):
        with open(FIXTURE) as f:
            old = {(e["type"], json.dumps(e["input"], ensure_ascii=False)): e
                   for e in (json.loads(l) for l in f if l.strip())}
        for e in new:
            key = (e["type"], json.dumps(e["input"], ensure_ascii=False))
            if e["expect"] is None and key in old:
                e["expect"] = old[key]["expect"]

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        for e in new:
            f.write(json.dumps(e, ensure_ascii=False) + "\n")
    print(f"wrote {len(new)} entries to {FIXTURE}")


if __name__ == "__main__":
    main()
