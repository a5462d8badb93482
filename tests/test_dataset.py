"""Data pipeline: feature extraction (shape-quantized), dataset records,
bucketed/prefetch loaders — on a generated synthetic mini corpus."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from emotivoice_tpu.config import EmotiVoiceConfig
from emotivoice_tpu.data.dataset import (
    BucketedLoader,
    BucketSpec,
    FeatureExtractor,
    PrefetchLoader,
    PromptTTSDataset,
)
from emotivoice_tpu.frontend.tokens import TokenVocab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("syncorpus")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_corpus.py"),
         "--out", str(out), "--n-train", "6", "--n-valid", "2"],
        check=True,
    )
    return out


class TestFeatureExtractor:
    def test_quantized_lengths_give_true_frame_counts(self):
        cfg = EmotiVoiceConfig()
        fx = FeatureExtractor(cfg)
        hop = cfg.audio.hop_length
        rng = np.random.RandomState(0)
        for n_samples in (5 * hop, 37 * hop, 37 * hop + 13):
            wav = (rng.randn(n_samples) * 0.1).astype(np.float32)
            feats = fx("k", wav)
            n = feats["mel"].shape[0]
            # padded extraction must still yield >= the true frame count
            # and every feature stream agrees
            assert n == len(feats["pitch"]) == len(feats["energy"])
            assert n >= n_samples // hop
            assert n <= 1 + n_samples // hop

    def test_quantization_does_not_change_interior_frames(self):
        cfg = EmotiVoiceConfig()
        hop = cfg.audio.hop_length
        rng = np.random.RandomState(1)
        wav = (rng.randn(50 * hop) * 0.1).astype(np.float32)
        a = FeatureExtractor(cfg)
        a.length_quantum = 8192
        b = FeatureExtractor(cfg)
        b.length_quantum = 1  # no quantization
        fa, fb = a("x", wav), b("x", wav)
        n = min(fa["mel"].shape[0], fb["mel"].shape[0]) - 3  # skip edge
        np.testing.assert_allclose(fa["mel"][:n], fb["mel"][:n], atol=1e-4)
        np.testing.assert_allclose(
            fa["energy"][:n], fb["energy"][:n], atol=1e-4
        )

    def test_npz_cache_roundtrip(self, tmp_path):
        cfg = EmotiVoiceConfig()
        fx = FeatureExtractor(cfg, cache_dir=str(tmp_path))
        wav = (np.random.RandomState(2).randn(8192) * 0.1).astype(np.float32)
        first = fx("utt1", wav)
        assert os.path.exists(tmp_path / "utt1.npz")
        again = fx("utt1", np.zeros(16, np.float32))  # cache hit ignores wav
        np.testing.assert_array_equal(first["mel"], again["mel"])


class TestSyntheticCorpusPipeline:
    def _dataset(self, corpus, cache=None):
        cfg = EmotiVoiceConfig()
        vocab = TokenVocab.from_file(str(corpus / "tokenlist"))
        speakers = [
            s.strip() for s in open(corpus / "speakers") if s.strip()
        ]
        cfg = cfg.replace(
            am=cfg.am.__class__(
                **{**cfg.am.__dict__, "n_vocab": len(vocab),
                   "n_speaker": len(speakers)}
            )
        )
        d = cfg.am.bert_embedding
        return PromptTTSDataset(
            str(corpus / "datalist.jsonl"), cfg, vocab, speakers,
            lambda text: np.zeros(d, np.float32), cache_dir=cache,
        )

    def test_records_are_coherent(self, corpus):
        ds = self._dataset(corpus)
        assert len(ds) == 6
        hop = ds.cfg.audio.hop_length
        item = ds[0]
        n = int(item["mel_length"])
        assert item["mel"].shape == (n, ds.cfg.audio.n_mels)
        assert item["pitch"].shape == (n,)
        assert item["energy"].shape == (n,)
        assert len(item["wav"]) == n * hop
        assert item["tokens"][0] == ds.vocab.token2id["<sos/eos>"]

    def test_bucketed_loader_static_shapes(self, corpus):
        ds = self._dataset(corpus)
        spec = BucketSpec(text_buckets=(32,), mel_buckets=(256,))
        batches = list(BucketedLoader(ds, 2, spec=spec, shuffle=False))
        assert batches
        for b in batches:
            assert b["tokens"].shape == (2, 32)
            assert b["mel"].shape == (2, 256, ds.cfg.audio.n_mels)
            assert b["wav"].shape == (2, 256 * ds.cfg.audio.hop_length)
        # deterministic without shuffle
        again = list(BucketedLoader(ds, 2, spec=spec, shuffle=False))
        np.testing.assert_array_equal(
            batches[0]["tokens"], again[0]["tokens"]
        )

    def test_pad_to_batch_keeps_full_batches(self, corpus):
        """Validation loaders (train_joint.py) pad trailing partial buckets
        by repeating rows so eval shapes always match the training grid."""
        ds = self._dataset(corpus)  # 6 utts
        spec = BucketSpec(text_buckets=(32,), mel_buckets=(256,))
        batches = list(BucketedLoader(
            ds, 4, spec=spec, shuffle=False, drop_last=False,
            pad_to_batch=True,
        ))
        assert batches
        for b in batches:
            assert b["tokens"].shape[0] == 4
        # 6 utts in one (32, 256) bucket -> 1 full + 1 padded batch whose
        # last rows repeat the partial bucket's rows
        tail = batches[-1]
        np.testing.assert_array_equal(tail["tokens"][2], tail["tokens"][0])

    def test_prefetch_matches_direct(self, corpus):
        ds = self._dataset(corpus)
        spec = BucketSpec(text_buckets=(32,), mel_buckets=(256,))
        direct = list(BucketedLoader(ds, 2, spec=spec, shuffle=False))
        pre = list(
            PrefetchLoader(BucketedLoader(ds, 2, spec=spec, shuffle=False))
        )
        assert len(direct) == len(pre)
        for a, b in zip(direct, pre):
            np.testing.assert_array_equal(a["mel"], b["mel"])

    def test_datalist_round_trips_json(self, corpus):
        lines = open(corpus / "datalist.jsonl").read().splitlines()
        rec = json.loads(lines[0])
        assert set(rec) >= {
            "key", "wav_path", "speaker", "text", "original_text", "prompt"
        }
