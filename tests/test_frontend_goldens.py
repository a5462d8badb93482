"""Byte-level golden fixtures for the G2P frontend.

tests/fixtures/frontend_goldens.jsonl freezes the frontend's exact output
strings (reference behavior: `frontend_cn.py:23-121`, `frontend.py:22-64`).
Entries recordable in this environment (pinyin rule engine, English path)
are asserted byte-exact; hanzi/mixed entries carry expect=null until
tools/record_frontend_goldens.py runs where jieba+pypinyin+cc_cedict exist,
making the same file a reference byte-parity gate there.
"""

import json
import os

import pytest

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "frontend_goldens.jsonl",
)


def _entries():
    with open(FIXTURE) as f:
        return [json.loads(line) for line in f if line.strip()]


ENTRIES = _entries()


def _output_for(entry):
    if entry["type"] == "syllables":
        from emotivoice_tpu.frontend.cn import pinyin_to_phonemes

        return " ".join(pinyin_to_phonemes(entry["input"]))
    if entry["type"] == "en":
        from emotivoice_tpu.frontend.mixed import g2p_cn_en

        return g2p_cn_en(entry["input"])
    if entry["type"] == "hanzi":
        pytest.importorskip("pypinyin")
        from emotivoice_tpu.frontend.cn import g2p_cn

        return g2p_cn(entry["input"])
    if entry["type"] == "mixed":
        pytest.importorskip("pypinyin")
        from emotivoice_tpu.frontend.mixed import g2p_cn_en

        return g2p_cn_en(entry["input"])
    raise AssertionError(entry["type"])


@pytest.mark.parametrize(
    "entry", ENTRIES,
    ids=[f"{e['type']}-{i}" for i, e in enumerate(ENTRIES)],
)
def test_golden(entry):
    if entry["expect"] is None:
        pytest.skip("expectation not recorded in any environment yet")
    assert _output_for(entry) == entry["expect"]


def test_all_recorded_tokens_are_in_the_inventory():
    """Every phoneme the fixture emits must be a real model token
    (502-line tokenlist, reference data/youdao/text/tokenlist)."""
    from emotivoice_tpu.frontend.tokens import TokenVocab

    vocab = TokenVocab.default()
    unknown = set()
    for e in ENTRIES:
        if e["expect"] is None or e["type"] == "en":
            continue
        for tok in e["expect"].split():
            if tok not in vocab.token2id:
                unknown.add(tok)
    # 'em5' (syllabic 呣): the reference's own rule emits it too
    # (frontend_cn.py:29-30 'e'+py) though the tokenlist has no em*;
    # our encode() drops unknown tokens, the reference would KeyError.
    unknown.discard("em5")
    assert not unknown, f"tokens outside the inventory: {sorted(unknown)}"
