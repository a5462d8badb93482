"""Tests for offline tooling: MFA export/import round-trip."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TG_TEMPLATE = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = {xmax}
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = {xmax}
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = {xmax}
            text = "w"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = {xmax}
        intervals: size = {n}
{intervals}
"""


def make_textgrid(path, entries):
    """entries: list of (label, start, end)."""
    blocks = []
    for i, (label, s, e) in enumerate(entries):
        blocks.append(
            f"        intervals [{i+1}]:\n"
            f"            xmin = {s}\n"
            f"            xmax = {e}\n"
            f'            text = "{label}"'
        )
    with open(path, "w") as f:
        f.write(
            TG_TEMPLATE.format(
                xmax=entries[-1][2], n=len(entries),
                intervals="\n".join(blocks),
            )
        )


class TestDataBakerRecipe:
    def test_parse_label_pair_prosody_and_erhua(self):
        db = _load("prepare_databaker")
        # "卡尔普#2陪外孙#1玩滑梯#4。" style line with erhua fusion:
        # 哪儿 -> na3r (single fused syllable, 儿 has no own pinyin)
        tokens = db.parse_label_pair("你#1去哪儿#3。", "ni3 qu4 na3r")
        # 你 #1 去 #0(default) 哪(儿 fused) #3
        assert tokens == ["ni3", "#1", "qu4", "#0", "na3r", "#3"]

    def test_tokens_to_phonemes(self):
        db = _load("prepare_databaker")
        phones = db.tokens_to_phonemes(["zhong1", "#1", "er2"])
        assert phones == ["zh", "ong1", "sp1", "er2"]


class TestMFATool:
    @pytest.fixture()
    def mfa(self):
        return _load("mfa_align")

    def test_readtg_normalizes_silences(self, mfa, tmp_path):
        tg = tmp_path / "a.TextGrid"
        make_textgrid(
            tg,
            [("", 0.0, 0.05), ("k", 0.05, 0.15), ("sp", 0.15, 0.3),
             ("a1", 0.3, 0.5), ("", 0.5, 0.6)],
        )
        phones, dur = mfa.readtg(str(tg))
        assert phones == ["sil", "k", "sp", "a1", "sil"]
        np.testing.assert_allclose(dur, [0.05, 0.1, 0.15, 0.2, 0.1])

    def test_insert_special_tokens(self, mfa):
        # datalist seq with special tokens; MFA seq with silences instead
        seq = ["<sos/eos>", "k", "a1", "sp1", "m", "i2", "<sos/eos>"]
        aligned = ["sil", "k", "a1", "sp", "m", "i2", "sil"]
        dur = [0.1, 0.2, 0.3, 0.15, 0.2, 0.25, 0.1]
        new_seq, new_dur = mfa.insert_special_tokens(seq, aligned, dur)
        assert new_seq == seq
        # matched phones keep their durations; sil/sp durations accrue to
        # the adjacent special token
        np.testing.assert_allclose(
            new_dur, [0.1, 0.2, 0.3, 0.15, 0.2, 0.25, 0.1], atol=1e-9
        )

    def test_reassign_silences(self, mfa):
        seq = ["sp1", "sp3", "engsp4", "k"]
        dur = [0.5, 0.0, 0.05, 0.2]
        assert mfa.reassign_silences(seq, dur) == ["sp3", "sp0", "engsp1", "k"]

    def test_export_import_roundtrip(self, mfa, tmp_path):
        wav = tmp_path / "u1.wav"
        wav.write_bytes(b"RIFF")
        datalist = tmp_path / "datalist.jsonl"
        rec = {
            "key": "u1",
            "wav_path": str(wav),
            "speaker": "spk a",
            "text": ["<sos/eos>", "[HH]", "[AH0]", "engsp1", "[M]", "<sos/eos>"],
            "original_text": "hum",
            "prompt": "Happy",
        }
        datalist.write_text(json.dumps(rec) + "\n")

        corpus = tmp_path / "corpus"
        pdict = tmp_path / "dict.txt"
        args = type("A", (), dict(
            datalist=str(datalist), corpus_dir=str(corpus), dict=str(pdict)
        ))
        mfa.cmd_export(args)
        lab = corpus / "spka" / "spka_u1.lab"
        assert lab.read_text() == "HH_AH0 M"
        dict_lines = dict(
            l.split(" ", 1) for l in pdict.read_text().splitlines()
        )
        assert dict_lines["HH_AH0"] == "HH AH0"

        # simulate MFA output
        tg_dir = tmp_path / "tg"
        tg_dir.mkdir()
        make_textgrid(
            tg_dir / "spka_u1.TextGrid",
            [("", 0.0, 0.1), ("HH", 0.1, 0.2), ("AH0", 0.2, 0.35),
             ("sp", 0.35, 0.4), ("M", 0.4, 0.6), ("", 0.6, 0.7)],
        )
        out = tmp_path / "out.jsonl"
        args = type("A", (), dict(
            datalist=str(datalist), textgrid_dir=str(tg_dir),
            output=str(out), valid_output=None, reassign_sp=False,
        ))
        mfa.cmd_import(args)
        got = json.loads(out.read_text())
        assert got["text"] == rec["text"]
        np.testing.assert_allclose(
            got["duration"], [0.1, 0.1, 0.15, 0.05, 0.2, 0.1], atol=0.005
        )
        assert got["prompt"] == "Happy"


class TestPrefetchLoader:
    def test_yields_all_batches_in_order(self):
        from emotivoice_tpu.data.dataset import PrefetchLoader

        batches = [{"i": np.full((2,), k)} for k in range(5)]
        out = list(PrefetchLoader(batches, depth=2))
        assert len(out) == 5
        for k, b in enumerate(out):
            assert b["i"][0] == k

    def test_propagates_producer_exception(self):
        import pytest

        from emotivoice_tpu.data.dataset import PrefetchLoader

        def gen():
            yield {"i": np.zeros(1)}
            raise RuntimeError("producer failed")

        it = iter(PrefetchLoader(gen(), depth=1))
        next(it)
        with pytest.raises(RuntimeError, match="producer failed"):
            next(it)
