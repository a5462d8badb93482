"""SynthesisEngine: bucketing, batch padding, per-request trimming."""

import numpy as np
import pytest
import jax

from emotivoice_tpu.config import tiny_test_config
from emotivoice_tpu.frontend.tokens import TokenVocab
from emotivoice_tpu.models.jets import JETSGenerator
from emotivoice_tpu.serving.engine import (
    SynthesisEngine,
    SynthesisRequest,
    _bucket,
)


def test_bucket_ladder():
    assert _bucket(1, (2, 4, 8)) == 2
    assert _bucket(4, (2, 4, 8)) == 4
    assert _bucket(5, (2, 4, 8)) == 8
    assert _bucket(99, (2, 4, 8)) == 8


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_test_config()
    vocab = TokenVocab.from_tokens(["_", "<sos/eos>", "a", "b", "c"])
    cfg = cfg.replace(
        am=cfg.am.__class__(**{**cfg.am.__dict__, "n_vocab": len(vocab)})
    )
    model = JETSGenerator(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), np.int32),
        np.asarray([8], np.int32),
        np.zeros((1,), np.int32),
        np.zeros((1, cfg.am.bert_embedding), np.float32),
        np.zeros((1, cfg.am.bert_embedding), np.float32),
        max_frames=64,
    )
    return SynthesisEngine(
        cfg, params, vocab,
        text_buckets=(8, 16), mel_buckets=(64, 128), batch_buckets=(1, 2, 4),
    )


def _req(engine, phonemes, speaker=0):
    d = engine.cfg.am.bert_embedding
    return SynthesisRequest(
        phonemes=phonemes,
        speaker_id=speaker,
        style_embedding=np.zeros(d, np.float32),
        content_embedding=np.zeros(d, np.float32),
    )


class TestEngine:
    def test_returns_one_result_per_request(self, engine):
        reqs = [_req(engine, ["<sos/eos>", "a", "b", "<sos/eos>"])] * 3
        results = engine.synthesize_batch(reqs)
        assert len(results) == 3  # batch padded to 4, results trimmed to 3
        for r in results:
            assert r.wav.ndim == 1
            assert len(r.wav) == r.n_frames * engine.up

    def test_batch_padding_does_not_change_results(self, engine):
        req = _req(engine, ["<sos/eos>", "a", "b", "c", "<sos/eos>"])
        solo = engine.synthesize_batch([req])[0]
        padded = engine.synthesize_batch([req, req, req])[0]
        assert solo.n_frames == padded.n_frames
        np.testing.assert_allclose(solo.wav, padded.wav, atol=2e-4)

    def test_compile_cache_reused_across_batch_sizes(self, engine):
        engine.synthesize_batch(
            [_req(engine, ["<sos/eos>", "a", "<sos/eos>"])] * 2
        )
        info = engine._compiled.cache_info()
        # 2 and 3 requests both pad to batch bucket 4 -> same jitted fn
        engine.synthesize_batch(
            [_req(engine, ["<sos/eos>", "b", "<sos/eos>"])] * 3
        )
        assert engine._compiled.cache_info().hits > info.hits

    def test_mixed_alpha_batch_rejected(self, engine):
        # engine.py applies one traced alpha per dispatch; a mixed batch
        # must raise instead of silently speed-shifting rows 1..n.
        fast = _req(engine, ["<sos/eos>", "a", "<sos/eos>"])
        slow = _req(engine, ["<sos/eos>", "a", "<sos/eos>"])
        slow.alpha = 1.3
        with pytest.raises(ValueError, match="uniform alpha"):
            engine.synthesize_batch([fast, slow])
        # uniform non-default alpha still works
        out = engine.synthesize_batch([slow, slow])
        assert len(out) == 2


class TestDurationOverflow:
    """gaussian_upsample clamps mel lengths to the bucket; the engine must
    detect `n_frames == max_frames` saturation and redispatch at the next
    bucket instead of returning silently cut-off audio (VERDICT r3 weak #5).
    """

    def _fake_engine(self, engine, wanted_frames):
        """Engine whose model 'predicts' `wanted_frames` mel frames (clamped
        to the bucket, like the real upsampler)."""
        e = SynthesisEngine(
            engine.cfg, engine.params, engine.vocab,
            text_buckets=(8, 16), mel_buckets=(64, 128, 256),
            batch_buckets=(1, 2, 4),
        )

        def fake_compiled(t_text, max_frames):
            def fn(params, tokens, lengths, speaker, style, content, alpha):
                bb = tokens.shape[0]
                n = min(wanted_frames, max_frames)
                wav = np.zeros((bb, max_frames * e.up), np.float32)
                wav[:, : n * e.up] = 0.25
                return wav, np.full((bb,), n, np.int32)

            return fn

        e._compiled = fake_compiled
        return e

    def test_overflow_redispatches_to_next_bucket(self, engine):
        e = self._fake_engine(engine, wanted_frames=100)
        # 4 tokens -> text bucket 8 -> est 64 frames -> first bucket 64,
        # but the model wants 100 -> saturates 64, must re-run at 128.
        r = e.synthesize_batch([_req(engine, ["<sos/eos>", "a", "b", "<sos/eos>"])])[0]
        assert r.n_frames == 100  # NOT clamped to 64
        assert len(r.wav) == 100 * e.up
        assert e.saturation_redispatches == 1
        assert e.saturation_truncations == 0

    def test_ladder_top_saturation_is_counted_not_silent(self, engine):
        e = self._fake_engine(engine, wanted_frames=10_000)
        r = e.synthesize_batch([_req(engine, ["<sos/eos>", "a", "<sos/eos>"])])[0]
        assert r.n_frames == 256  # ladder top
        assert e.saturation_truncations == 1

    def test_normal_requests_do_not_redispatch(self, engine):
        e = self._fake_engine(engine, wanted_frames=20)
        e.synthesize_batch([_req(engine, ["<sos/eos>", "a", "<sos/eos>"])])
        assert e.saturation_redispatches == 0
        assert e.saturation_truncations == 0


class TestBF16Engine:
    def test_bf16_close_to_f32(self, engine):
        import jax.numpy as jnp

        e16 = SynthesisEngine(
            engine.cfg, engine.params, engine.vocab,
            text_buckets=(8, 16), mel_buckets=(64, 128),
            batch_buckets=(1, 2, 4), dtype=jnp.bfloat16,
        )
        req = _req(engine, ["<sos/eos>", "a", "b", "c", "<sos/eos>"])
        r32 = engine.synthesize_batch([req])[0]
        r16 = e16.synthesize_batch([req])[0]
        assert r16.wav.dtype == np.float32
        # durations may shift a frame under bf16 rounding
        assert abs(r16.n_frames - r32.n_frames) <= 2
        n = min(len(r16.wav), len(r32.wav))
        if n:
            assert np.abs(r16.wav[:n] - r32.wav[:n]).max() < 0.05


class TestServiceLongform:
    def _service(self, engine, longform_chars):
        from emotivoice_tpu.serving.api import TTSService

        d = engine.cfg.am.bert_embedding
        return TTSService(
            engine,
            g2p_fn=lambda text: "<sos/eos> a b <sos/eos>",
            embed_fn=lambda text: np.zeros(d, np.float32),
            speaker2id={"0": 0},
            longform_chars=longform_chars,
        )

    def test_long_input_is_chunked_and_concatenated(self, engine):
        with self._service(engine, longform_chars=10) as svc_long, \
                self._service(engine, longform_chars=10_000) as svc_one:
            text = "One sentence. Two sentence. Three sentence."
            multi = svc_long.speech(text, "0")
            single = svc_one.speech(text, "0")
            # 3 chunks of the same phonemes -> ~3x the single-pass audio
            assert len(multi) > 2 * (len(single) - 44)  # 44-byte wav header

    def test_split_sentences(self):
        from emotivoice_tpu.frontend.segment import split_sentences

        assert split_sentences("") == []
        assert split_sentences("Hello world.") == ["Hello world."]
        got = split_sentences("你好。世界！How are you? Fine.", max_chars=6)
        assert got[0] == "你好。"
        assert "".join(got).replace(" ", "") == "你好。世界！Howareyou?Fine."
        # merging respects max_chars
        merged = split_sentences("a. b. c. d.", max_chars=120)
        assert merged == ["a. b. c. d."]
        # over-long sentence hard-splits at soft punctuation
        longs = split_sentences("x" * 50 + "," + "y" * 50, max_chars=60)
        assert len(longs) == 2


class TestMicroBatcher:
    def test_concurrent_requests_batch_into_fewer_dispatches(self, engine):
        import threading

        from emotivoice_tpu.serving.batcher import MicroBatcher

        b = MicroBatcher(engine, max_batch=8, max_wait_ms=200.0)
        req = _req(engine, ["<sos/eos>", "a", "b", "<sos/eos>"])
        results = [None] * 6
        # a first solo request warms the path, then 6 land concurrently
        b.submit(req)
        start = threading.Barrier(6)

        def call(i):
            start.wait()
            results[i] = b.submit(req)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None and r.wav.ndim == 1 for r in results)
        # 6 concurrent requests must not take 6 dispatches
        assert b._dispatches < b._requests
        b.close()

    def test_alpha_mismatch_not_mixed(self, engine):
        from emotivoice_tpu.serving.batcher import MicroBatcher
        from emotivoice_tpu.serving.engine import SynthesisRequest

        seen = []
        orig = engine.synthesize_batch

        def spy(reqs):
            seen.append([r.alpha for r in reqs])
            return orig(reqs)

        engine.synthesize_batch = spy
        try:
            b = MicroBatcher(engine, max_batch=8, max_wait_ms=100.0)
            d = engine.cfg.am.bert_embedding
            reqs = [
                SynthesisRequest(
                    phonemes=["<sos/eos>", "a", "<sos/eos>"],
                    speaker_id=0,
                    style_embedding=np.zeros(d, np.float32),
                    content_embedding=np.zeros(d, np.float32),
                    alpha=a,
                )
                for a in (1.0, 1.0, 2.0)
            ]
            out = b.submit_many(reqs)
            assert len(out) == 3
            for alphas in seen:
                assert len(set(alphas)) == 1  # never mixed in one dispatch
            b.close()
        finally:
            engine.synthesize_batch = orig

    def test_engine_error_propagates(self, engine):
        import pytest

        from emotivoice_tpu.serving.batcher import MicroBatcher

        orig = engine.synthesize_batch
        engine.synthesize_batch = lambda reqs: (_ for _ in ()).throw(
            ValueError("boom")
        )
        try:
            b = MicroBatcher(engine, max_wait_ms=1.0)
            with pytest.raises(ValueError, match="boom"):
                b.submit(_req(engine, ["<sos/eos>", "a", "<sos/eos>"]))
            b.close()
        finally:
            engine.synthesize_batch = orig


class TestMeshEngine:
    def test_mesh_sharded_results_match_single_device(self, engine):
        from emotivoice_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:8])
        e_mesh = SynthesisEngine(
            engine.cfg, engine.params, engine.vocab,
            text_buckets=(8, 16), mel_buckets=(64, 128),
            batch_buckets=(1, 2, 4, 8, 16), mesh=mesh,
        )
        req = _req(engine, ["<sos/eos>", "a", "b", "c", "<sos/eos>"])
        solo = engine.synthesize_batch([req] * 3)
        sharded = e_mesh.synthesize_batch([req] * 3)  # pads 4 -> 8 rows
        assert len(sharded) == 3
        for a, b in zip(solo, sharded):
            assert a.n_frames == b.n_frames
            np.testing.assert_allclose(a.wav, b.wav, atol=2e-4)


class TestStreaming:
    def test_stream_matches_batch_output(self, engine):
        from emotivoice_tpu.serving.api import TTSService
        from emotivoice_tpu.utils.audio_io import wav_stream_header

        d = engine.cfg.am.bert_embedding
        svc = TTSService(
            engine,
            g2p_fn=lambda text: "<sos/eos> a b <sos/eos>",
            embed_fn=lambda text: np.zeros(d, np.float32),
            speaker2id={"0": 0},
            longform_chars=10,
            batching=False,
        )
        text = "One sentence. Two sentence. Three sentence."
        parts = list(svc.speech_stream(text, "0"))
        assert parts[0] == wav_stream_header(engine.sr)
        assert len(parts) >= 4  # header + one PCM part per sentence chunk
        pcm_stream = b"".join(parts[1:])
        whole = svc.speech(text, "0")
        assert pcm_stream == whole[44:]  # same PCM as the one-shot wav

    def test_mp3_without_encoder_raises_cleanly(self, engine):
        """HTTP layers default to mp3 (reference schema); without pydub or
        an ffmpeg binary the service must raise TranscodeUnavailable (mapped
        to a 400), not crash or silently return wav bytes."""
        import shutil

        import pytest

        from emotivoice_tpu.serving.api import TranscodeUnavailable, TTSService

        try:
            import pydub  # noqa: F401

            pytest.skip("pydub installed; transcode would succeed")
        except ImportError:
            pass
        if shutil.which("ffmpeg"):
            pytest.skip("ffmpeg present; transcode would succeed")

        d = engine.cfg.am.bert_embedding
        svc = TTSService(
            engine,
            g2p_fn=lambda text: "<sos/eos> a <sos/eos>",
            embed_fn=lambda text: np.zeros(d, np.float32),
            speaker2id={"0": 0},
            batching=False,
        )
        with pytest.raises(TranscodeUnavailable, match="wav"):
            svc.speech("hello", "0", response_format="mp3")

    def test_stream_validates_before_first_yield(self, engine):
        """Unknown voice must raise at call time (so HTTP layers can send a
        400), not mid-iteration after a 200 has been committed."""
        import pytest

        from emotivoice_tpu.serving.api import TTSService

        d = engine.cfg.am.bert_embedding
        svc = TTSService(
            engine,
            g2p_fn=lambda text: "<sos/eos> a <sos/eos>",
            embed_fn=lambda text: np.zeros(d, np.float32),
            speaker2id={"0": 0},
            batching=False,
        )
        with pytest.raises(KeyError):
            svc.speech_stream("hello", "missing-voice")


class TestMetrics:
    def test_metrics_snapshot_after_requests(self, engine):
        from emotivoice_tpu.serving.api import TTSService

        d = engine.cfg.am.bert_embedding
        with TTSService(
            engine,
            g2p_fn=lambda text: "<sos/eos> a b <sos/eos>",
            embed_fn=lambda text: np.zeros(d, np.float32),
            speaker2id={"0": 0},
            batching=True,
        ) as svc:
            svc.speech("hello", "0")
            svc.speech("world", "0")
            try:
                svc.speech("x", "missing-voice")
            except KeyError:
                pass
            snap = svc.metrics.snapshot(svc._batcher)
            assert snap["requests"] == 2
            assert snap["errors"] == 1
            assert snap["latency_s"]["p50"] > 0
            assert snap["batching"]["dispatches"] >= 1
            # rtf recorded when audio was produced
            assert snap["audio_seconds_served"] >= 0
            # the streaming path records too (generator fully consumed)
            list(svc.speech_stream("stream me", "0"))
            assert svc.metrics.snapshot()["requests"] == 3


class TestWarmup:
    def test_warmup_populates_compile_cache(self, engine):
        e = SynthesisEngine(
            engine.cfg, engine.params, engine.vocab,
            text_buckets=(8, 16), mel_buckets=(64, 128),
            batch_buckets=(1, 2, 4),
            frames_per_token=8.0,
        )
        e.warmup(shapes=[(1, 8, 64), (2, 16, 128)])
        assert e._compiled.cache_info().currsize >= 2
        # warmed shapes now hit the cache
        before = e._compiled.cache_info().hits
        e.synthesize_batch([_req(engine, ["<sos/eos>", "a", "<sos/eos>"])])
        assert e._compiled.cache_info().hits > before

    def test_background_warmup_covers_grid(self, engine):
        """warmup_background walks every (batch, text) bucket's natural mel
        bucket plus the overflow-redispatch target (serving cold-start fix,
        VERDICT r3 #8).

        This jax/XLA CPU build segfaults deterministically when this
        test's compiles run after the ~50 jit graphs the module built
        before it (observed 4x in full-suite runs inside
        backend_compile_and_load / the warmed dispatch, main thread or
        daemon alike, while the file passes in isolation) — so the test
        drops the accumulated executables first and pre-warms its grid on
        the MAIN thread; the daemon's _warm_one calls then replay as
        cache hits. Production is unaffected: on TPU backends compiles go
        through the serialized remote compile helper."""
        jax.clear_caches()
        e = SynthesisEngine(
            engine.cfg, engine.params, engine.vocab,
            text_buckets=(8,), mel_buckets=(64, 128),
            batch_buckets=(1, 2), frames_per_token=8.0,
        )
        e.warmup(shapes=[(b, 8, m) for b in (1, 2) for m in (64, 128)])
        done = []
        # record the shapes the daemon itself walks (the pre-warm above
        # makes its compiles cache hits, so cache-size assertions alone
        # can't detect a daemon that silently skips buckets — ADVICE r4)
        warmed = []
        orig_warm = e._warm_one
        e._warm_one = lambda b, t, m: (warmed.append((b, t, m)),
                                       orig_warm(b, t, m))[1]
        th = e.warmup_background(
            batches=(1, 2), progress_cb=lambda i, n: done.append((i, n))
        )
        th.join(timeout=600)
        assert not th.is_alive()
        # (8 -> mel 64 + overflow-redispatch 128) x batches {1, 2}: the
        # daemon must cover the FULL grid, not just report progress
        assert set(warmed) == {
            (b, 8, m) for b in (1, 2) for m in (64, 128)
        }
        assert e._compiled.cache_info().currsize >= 2
        assert done and done[-1][0] == done[-1][1]
        # every grid shape now hits the compile cache
        before = e._compiled.cache_info().hits
        e.synthesize_batch([_req(engine, ["<sos/eos>", "a", "<sos/eos>"])] * 2)
        assert e._compiled.cache_info().hits > before


class TestCogPredictor:
    def test_predict_writes_wav(self, engine, tmp_path):
        """Cog-style predictor (reference predict.py:99-234) over an
        existing engine: language guard + wav file output."""
        import pytest

        from emotivoice_tpu.serving.cog_predictor import Predictor
        from emotivoice_tpu.utils.audio_io import read_wav

        p = Predictor()
        p.setup(engine=engine)
        p.speaker2id = {"0": 0}
        d = engine.cfg.am.bert_embedding
        p.embed_fn = lambda text: np.zeros(d, np.float32)
        # our tiny-engine vocab only has a/b/c; monkeypatch g2p via lexicon
        import emotivoice_tpu.serving.cog_predictor as mod

        path = None
        try:
            import emotivoice_tpu.frontend.en as en_mod

            orig = en_mod.get_eng_phoneme
            en_mod.get_eng_phoneme = (
                lambda text, lex, pad_sos_eos=True: "<sos/eos> a b <sos/eos>"
            )
            path = p.predict(content="hello", speaker="0")
        finally:
            en_mod.get_eng_phoneme = orig
        sr, wav = read_wav(str(path))
        assert sr == engine.sr and len(wav) > 0

        with pytest.raises(ValueError, match="Chinese"):
            p.predict(content="你好", language="English", speaker="0")


class TestCompileCache:
    def test_enable_persistent_cache_sets_config(self, tmp_path):
        import jax

        from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

        d = enable_persistent_cache(str(tmp_path / "jaxcache"))
        try:
            assert jax.config.jax_compilation_cache_dir == d
            import os

            assert os.path.isdir(d)
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
