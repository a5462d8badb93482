"""Batched synthesis engine: text -> waveform with static-shape bucketing.

Serving counterpart of the reference inference CLIs
(`inference_am_vocoder_joint.py:96-134` runs batch=1 in a Python loop); here
requests are batched per (text-bucket, mel-bucket) pair, each bucket shape
jit-compiles once, and synthesis is data-parallel over the device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from emotivoice_tpu.config import EmotiVoiceConfig
from emotivoice_tpu.frontend.tokens import TokenVocab
from emotivoice_tpu.models.jets import JETSGenerator

# Mel-frame bucket ladder: ~x1.4 steps bound recompilation (SURVEY.md §7).
DEFAULT_TEXT_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256)
DEFAULT_MEL_BUCKETS = (128, 192, 256, 384, 512, 768, 1024, 1536, 2048)
# Batch is bucketed too — each distinct (batch, text, mel) triple is one
# XLA program, so an unpadded batch dimension would recompile per size.
DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32)


def _bucket(x: int, ladder: Sequence[int]) -> int:
    for b in ladder:
        if x <= b:
            return b
    return ladder[-1]


@dataclasses.dataclass
class SynthesisRequest:
    phonemes: List[str]  # frontend output tokens
    speaker_id: int
    style_embedding: np.ndarray  # (768,)
    content_embedding: np.ndarray  # (768,)
    alpha: float = 1.0


@dataclasses.dataclass
class SynthesisResult:
    wav: np.ndarray  # float32, trimmed to true length
    n_frames: int


class SynthesisEngine:
    """Holds jitted per-bucket synthesis functions over a JETSGenerator."""

    def __init__(
        self,
        cfg: EmotiVoiceConfig,
        params,
        vocab: TokenVocab,
        text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
        mel_buckets: Sequence[int] = DEFAULT_MEL_BUCKETS,
        batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
        frames_per_token: float = 8.0,
        dtype=jnp.float32,
        use_pallas: bool = False,
        use_fused_stage: Optional[bool] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.params = params
        self.vocab = vocab
        # dtype is the *compute* dtype: bfloat16 halves HBM traffic and
        # doubles MXU throughput at inference; params stay f32 and the
        # waveform always comes back f32 (see models.jets.JETSGenerator).
        compute = None if dtype in (None, jnp.float32) else dtype
        # Whole-stage fused Pallas MRF kernel: was the r4 TPU default, but
        # after the relayout-free packed flow landed the pure-s2d lowering
        # overtook it END-TO-END (r5 A/B, bench.py x2 runs each: s2d
        # 2444/2440 xRT vs fused 2320/2324 — the kernel still wins stage3
        # in isolation, but its haloed-tile materialization and the
        # pallas_call fusion barrier cost more than it saves once the
        # packed stages chain relayout-free; docs/PERFORMANCE.md r5
        # fused-vs-s2d section). Default OFF everywhere; pass
        # use_fused_stage=True to re-enable on TPU.
        if use_fused_stage is None:
            use_fused_stage = False
        self.model = JETSGenerator(
            cfg, compute_dtype=compute, use_pallas=use_pallas,
            use_fused_stage=use_fused_stage,
        )
        # Optional jax.sharding.Mesh: batches shard over the 'data' axis and
        # params replicate, so one engine drives every chip on the host
        # (reference inference_tts.py forks a full model copy per GPU thread
        # instead). Batch buckets are padded to a multiple of the axis size.
        self.mesh = mesh
        self._data_sharding = None
        self._replicated = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_axis = cfg.mesh.data_axis
            self._n_data = mesh.shape[data_axis]
            self._data_sharding = NamedSharding(mesh, P(data_axis))
            self._replicated = NamedSharding(mesh, P())
            if mesh.shape.get(cfg.mesh.model_axis, 1) > 1:
                # Tensor-parallel inference: vocoder channels / attention
                # heads partition over the 'model' axis (parallel/sharding.py)
                # instead of replicating the weights on every chip.
                from emotivoice_tpu.parallel.sharding import tree_shardings

                self.params = jax.device_put(
                    params,
                    tree_shardings(params, mesh, cfg.mesh.model_axis),
                )
            else:
                self.params = jax.device_put(params, self._replicated)
        self.text_buckets = tuple(text_buckets)
        self.mel_buckets = tuple(mel_buckets)
        self.batch_buckets = tuple(batch_buckets)
        self.frames_per_token = frames_per_token
        self.hop = cfg.audio.hop_length
        self.sr = cfg.audio.sampling_rate
        self.up = cfg.vocoder.upsample_factor
        # Duration-overflow accounting (see synthesize_batch): redispatches
        # escalate to the next mel bucket; truncations mean the largest
        # bucket still saturated and the audio really was cut.
        self.saturation_redispatches = 0
        self.saturation_truncations = 0
        # Traffic-priority handshake for warmup_background: a grid replay
        # (seconds per shape through a remote transport) must never queue
        # in front of a live request, so the daemon defers while requests
        # are in flight or arrived very recently (r5 cold-after-cache load
        # round: p95 21.9 s came from replays stacked ahead of traffic).
        self._traffic_lock = threading.Lock()
        self._inflight = 0
        self._last_traffic = 0.0

    # Sized above the full bucket grid (8 text x 9 mel = 72 combos) so an
    # adversarial shape mix cannot thrash compiled executables out of cache.
    @functools.lru_cache(maxsize=128)
    def _compiled(self, t_text: int, max_frames: int):
        # alpha (duration scale = 1/speed) is a *traced* scalar, not a
        # static closure: arbitrary client speed values reuse one executable
        # per (text, mel, batch) bucket instead of recompiling and churning
        # this cache.
        def fn(params, tokens, text_lengths, speaker, style, content, alpha):
            out = self.model.apply(
                params, tokens, text_lengths, speaker, style, content,
                max_frames=max_frames, alpha=alpha,
            )
            return out["wav_predictions"], out["output_lengths"]

        return jax.jit(fn)

    def synthesize_batch(
        self, requests: List[SynthesisRequest]
    ) -> List[SynthesisResult]:
        if not requests:
            return []
        with self._traffic_lock:
            self._inflight += 1
        try:
            return self._synthesize_batch(requests)
        finally:
            with self._traffic_lock:
                self._inflight -= 1
                self._last_traffic = time.monotonic()

    def _synthesize_batch(
        self, requests: List[SynthesisRequest]
    ) -> List[SynthesisResult]:
        # A batch larger than the biggest bucket runs as several dispatches.
        cap = self.batch_buckets[-1]
        if len(requests) > cap:
            out: List[SynthesisResult] = []
            for i in range(0, len(requests), cap):
                out.extend(self.synthesize_batch(requests[i : i + cap]))
            return out
        alpha = requests[0].alpha
        # alpha is a single traced scalar per dispatch; silently applying
        # requests[0].alpha to a mixed batch would speed-shift other rows.
        # MicroBatcher already groups by alpha (batcher.py); direct callers
        # must do the same.
        if any(r.alpha != alpha for r in requests[1:]):
            raise ValueError(
                "synthesize_batch requires a uniform alpha per batch; "
                "group requests by alpha (as serving.batcher.MicroBatcher "
                "does) or call synthesize() per request"
            )
        token_ids = [self.vocab.encode(r.phonemes) for r in requests]
        max_len = max(len(t) for t in token_ids)
        t_text = _bucket(max_len, self.text_buckets)
        est_frames = int(t_text * self.frames_per_token * max(alpha, 1.0))
        max_frames = _bucket(est_frames, self.mel_buckets)

        results = self._dispatch(requests, token_ids, t_text, max_frames, alpha)

        # Duration-overflow escape hatch: gaussian_upsample clamps predicted
        # mel lengths to the bucket (models/acoustic.py), so a slow-speaking
        # prediction that overflows `est_frames` would come back silently
        # truncated. `n_frames == max_frames` is the saturation signal —
        # redispatch those rows at the next bucket until they fit (or the
        # ladder tops out, which is surfaced as a counter + warning).
        sat = [i for i, r in enumerate(results) if r.n_frames >= max_frames]
        while sat and max_frames < self.mel_buckets[-1]:
            max_frames = _bucket(max_frames + 1, self.mel_buckets)
            self.saturation_redispatches += 1
            redo = self._dispatch(
                [requests[i] for i in sat],
                [token_ids[i] for i in sat],
                t_text, max_frames, alpha,
            )
            for i, r in zip(sat, redo):
                results[i] = r
            sat = [i for i in sat if results[i].n_frames >= max_frames]
        if sat:
            self.saturation_truncations += len(sat)
            import logging

            logging.getLogger("emotivoice_tpu.serving").warning(
                "%d request(s) saturated the largest mel bucket (%d frames);"
                " audio may be truncated", len(sat), self.mel_buckets[-1],
            )
        return results

    def _dispatch(
        self,
        requests: List[SynthesisRequest],
        token_ids: List[List[int]],
        t_text: int,
        max_frames: int,
        alpha: float,
    ) -> List[SynthesisResult]:
        b = len(requests)
        bb = _bucket(b, self.batch_buckets)
        if self.mesh is not None and bb % self._n_data:
            bb = -(-bb // self._n_data) * self._n_data  # pad to axis size
        tokens = np.zeros((bb, t_text), np.int32)
        lengths = np.ones((bb,), np.int32)  # pad rows: 1 token, speaker 0
        speaker = np.zeros((bb,), np.int32)
        style = np.zeros((bb, self.cfg.am.bert_embedding), np.float32)
        content = np.zeros((bb, self.cfg.am.bert_embedding), np.float32)
        for i, (r, ids) in enumerate(zip(requests, token_ids)):
            n = min(len(ids), t_text)
            tokens[i, :n] = ids[:n]
            lengths[i] = n
            speaker[i] = r.speaker_id
            style[i] = r.style_embedding
            content[i] = r.content_embedding

        fn = self._compiled(t_text, max_frames)
        arrays = (tokens, lengths, speaker, style, content)
        if self._data_sharding is not None:
            arrays = tuple(
                jax.device_put(a, self._data_sharding) for a in arrays
            )
        else:
            arrays = tuple(jnp.asarray(a) for a in arrays)
        wav, n_frames = fn(self.params, *arrays, jnp.float32(alpha))
        wav = np.asarray(wav)
        n_frames = np.asarray(n_frames)
        return [
            SynthesisResult(
                wav=wav[i, : int(n_frames[i]) * self.up], n_frames=int(n_frames[i])
            )
            for i in range(b)
        ]

    def synthesize(self, request: SynthesisRequest) -> SynthesisResult:
        return self.synthesize_batch([request])[0]

    def _warm_one(self, b: int, t_text: int, max_frames: int):
        """Compile + run one (batch, text, mel) bucket on dummy inputs."""
        d = self.cfg.am.bert_embedding
        bb = _bucket(b, self.batch_buckets)
        if self.mesh is not None and bb % self._n_data:
            bb = -(-bb // self._n_data) * self._n_data
        fn = self._compiled(t_text, max_frames)
        arrays = (
            np.zeros((bb, t_text), np.int32),
            np.ones((bb,), np.int32),
            np.zeros((bb,), np.int32),
            np.zeros((bb, d), np.float32),
            np.zeros((bb, d), np.float32),
        )
        if self._data_sharding is not None:
            arrays = tuple(
                jax.device_put(a, self._data_sharding) for a in arrays
            )
        jax.block_until_ready(fn(self.params, *arrays, jnp.float32(1.0)))

    def warmup_background(
        self,
        batches: Sequence[int] = (1, 2, 4, 8, 16),
        progress_cb: Optional[Callable[[int, int], None]] = None,
    ):
        """Warm the production bucket grid on a daemon thread.

        ``warmup()`` covers only a handful of shapes; the first request that
        lands on any other (batch, text, mel) bucket eats a cold XLA compile
        (round-1 load test: p95 44.5 s). This walks, for every batch x text
        bucket, the mel bucket `synthesize_batch` would pick at alpha<=1 plus
        the next one up (the duration-overflow redispatch target), compiling
        each in the background while the server is already answering warmed
        shapes. With the persistent compile cache enabled (default in
        tools/serve.py) later processes replay these compiles from disk.
        """
        import threading

        work: List[Tuple[int, int, int]] = []
        seen = set()
        for b in batches:
            for t in self.text_buckets:
                m = _bucket(int(t * self.frames_per_token), self.mel_buckets)
                m_next = _bucket(m + 1, self.mel_buckets)
                for mf in (m, m_next):
                    key = (_bucket(b, self.batch_buckets), t, mf)
                    if key not in seen:
                        seen.add(key)
                        work.append(key)

        def run():
            for i, (b, t, mf) in enumerate(work):
                self._wait_for_traffic_idle()
                try:
                    self._warm_one(b, t, mf)
                except Exception:  # pragma: no cover - warmup must not crash
                    pass
                if progress_cb is not None:
                    progress_cb(i + 1, len(work))

        th = threading.Thread(target=run, daemon=True, name="engine-warmup")
        th.start()
        return th

    def _wait_for_traffic_idle(self, idle_s: float = 0.25):
        """Block until no request is in flight and none finished within the
        last ``idle_s`` seconds — live traffic always outranks a warmup
        replay (a request that does land on a cold bucket compiles it
        itself, paying only for its own shape)."""
        while True:
            with self._traffic_lock:
                busy = self._inflight > 0
                quiet = time.monotonic() - self._last_traffic
            if not busy and quiet >= idle_s:
                return
            time.sleep(0.05)

    def warmup(self, shapes: Optional[List[Tuple[int, int, int]]] = None):
        """Pre-compile common (batch, text, mel) bucket shapes by running
        them once on dummy inputs — jax.jit's executable cache is populated
        by calls, not by building the wrapper, and the first compile in a
        fresh process can take minutes (serving must not eat that on a
        user request)."""
        # Includes the production micro-batched bucket (batch 16; see
        # bench.py / batcher max_batch) so the first loaded-traffic dispatch
        # doesn't eat a cold compile.
        shapes = shapes or [
            (1, 32, 256), (1, 64, 512), (4, 64, 512), (16, 96, 768),
        ]
        d = self.cfg.am.bert_embedding
        for b, t_text, max_frames in shapes:
            # Drive the real synthesize_batch path so warmup compiles the
            # same executables production will hit (incl. mesh sharding /
            # batch-bucket padding), not an unsharded twin.
            req = SynthesisRequest(
                phonemes=self.vocab.decode([0]) * t_text,  # pad tokens
                speaker_id=0,
                style_embedding=np.zeros(d, np.float32),
                content_embedding=np.zeros(d, np.float32),
            )
            t_bucket = _bucket(t_text, self.text_buckets)
            est = int(t_bucket * self.frames_per_token)
            if _bucket(est, self.mel_buckets) != max_frames:
                # fall back to direct compile for non-default mel buckets
                fn = self._compiled(t_text, max_frames)
                arrays = (
                    np.zeros((b, t_text), np.int32),
                    np.ones((b,), np.int32),
                    np.zeros((b,), np.int32),
                    np.zeros((b, d), np.float32),
                    np.zeros((b, d), np.float32),
                )
                if self._data_sharding is not None:
                    arrays = tuple(
                        jax.device_put(a, self._data_sharding) for a in arrays
                    )
                jax.block_until_ready(
                    fn(self.params, *arrays, jnp.float32(1.0))
                )
            else:
                self.synthesize_batch([req] * b)
