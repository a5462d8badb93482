"""Golden tests for on-device alignment ops vs scipy/numpy/torch references."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emotivoice_tpu.ops.align import (
    average_by_path,
    beta_binomial_prior,
    forward_sum_loss,
    viterbi_decode,
)
from emotivoice_tpu.ops.upsample import gaussian_upsample
from emotivoice_tpu.utils.masks import sequence_mask


def _np_mas(log_p_attn):
    """Direct numpy transcription of the MAS recurrence (reference
    alignment.py:92-121) used as the golden oracle."""
    t_mel, t_inp = log_p_attn.shape
    q = np.full((t_inp, t_mel), -np.inf)
    log_prob = log_p_attn.T
    for j in range(t_mel):
        q[0, j] = log_prob[0, : j + 1].sum()
    for j in range(1, t_mel):
        for i in range(1, min(j + 1, t_inp)):
            q[i, j] = max(q[i - 1, j - 1], q[i, j - 1]) + log_prob[i, j]
    a = np.full((t_mel,), t_inp - 1)
    for j in range(t_mel - 2, -1, -1):
        i_a = a[j + 1] - 1
        i_b = a[j + 1]
        if i_b == 0:
            a[j] = 0
        elif q[i_a, j] >= q[i_b, j]:
            a[j] = i_a
        else:
            a[j] = i_b
    return a


class TestBetaBinomialPrior:
    def test_matches_scipy(self):
        betabinom = pytest.importorskip("scipy.stats").betabinom
        text_lens = np.array([5, 8])
        feat_lens = np.array([12, 20])
        prior = np.asarray(
            beta_binomial_prior(jnp.asarray(text_lens), jnp.asarray(feat_lens), 8, 20)
        )
        for b, (n_, t_) in enumerate(zip(text_lens, feat_lens)):
            alpha = np.arange(1, t_ + 1, dtype=float)
            beta = np.array([t_ - t + 1 for t in alpha])
            k = np.arange(n_)
            ref = betabinom.logpmf(k[:, None], n_, alpha[None, :], beta[None, :]).T
            # f32 gammaln/betaln accumulate ~2e-3 absolute error vs scipy f64.
            np.testing.assert_allclose(prior[b, :t_, :n_], ref, atol=5e-3)
            assert (prior[b, t_:, :] < -1e29).all()
            assert (prior[b, :, n_:] < -1e29).all()


class TestViterbi:
    def test_matches_numpy_mas(self):
        rng = np.random.RandomState(0)
        b, t_feats, t_text = 3, 25, 7
        text_lens = np.array([7, 5, 3])
        feat_lens = np.array([25, 18, 9])
        lp = rng.randn(b, t_feats, t_text).astype(np.float32)
        ds, bin_loss, path = viterbi_decode(
            jnp.asarray(lp), jnp.asarray(text_lens), jnp.asarray(feat_lens)
        )
        ds, path = np.asarray(ds), np.asarray(path)
        total_bin = 0.0
        for i in range(b):
            ref_path = _np_mas(lp[i, : feat_lens[i], : text_lens[i]])
            np.testing.assert_array_equal(path[i, : feat_lens[i]], ref_path)
            ref_ds = np.bincount(ref_path, minlength=t_text)
            np.testing.assert_array_equal(ds[i], ref_ds)
            total_bin -= lp[i, np.arange(feat_lens[i]), ref_path].mean()
        np.testing.assert_allclose(float(bin_loss), total_bin / b, rtol=1e-5)

    def test_durations_sum_to_length(self):
        rng = np.random.RandomState(1)
        lp = rng.randn(2, 40, 11).astype(np.float32)
        tl = jnp.asarray([11, 6])
        fl = jnp.asarray([40, 22])
        ds, _, _ = viterbi_decode(jnp.asarray(lp), tl, fl)
        np.testing.assert_array_equal(np.asarray(jnp.sum(ds, 1)), [40, 22])


class TestAverageByPath:
    def test_simple(self):
        path = jnp.asarray([[0, 0, 1, 2, 2, 2]])
        xs = jnp.asarray([[1.0, 3.0, 5.0, 2.0, 4.0, 6.0]])
        avg = average_by_path(path, xs, jnp.asarray([3]), jnp.asarray([6]), 3)
        np.testing.assert_allclose(np.asarray(avg)[0], [2.0, 5.0, 4.0])

    def test_respects_feat_length(self):
        path = jnp.asarray([[0, 1, 1, 1]])
        xs = jnp.asarray([[2.0, 4.0, 8.0, 100.0]])
        avg = average_by_path(path, xs, jnp.asarray([2]), jnp.asarray([3]), 2)
        np.testing.assert_allclose(np.asarray(avg)[0], [2.0, 6.0])


class TestForwardSum:
    def test_matches_torch_ctc(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.RandomState(3)
        b, t_feats, t_text = 3, 30, 6
        text_lens = np.array([6, 4, 2])
        feat_lens = np.array([30, 20, 11])
        lp = np.log(
            rng.dirichlet(np.ones(t_text), size=(b, t_feats)).astype(np.float32)
        )
        ours = float(
            forward_sum_loss(
                jnp.asarray(lp), jnp.asarray(text_lens), jnp.asarray(feat_lens)
            )
        )
        # Reference semantics (loss.py:62-97).
        lpt = torch.from_numpy(lp)
        pad = torch.nn.functional.pad(lpt, (1, 0, 0, 0, 0, 0), value=-1.0)
        loss = 0.0
        for i in range(b):
            target = torch.arange(1, text_lens[i] + 1).unsqueeze(0)
            cur = pad[i, : feat_lens[i], : text_lens[i] + 1].unsqueeze(1)
            cur = F.log_softmax(cur, dim=-1)
            loss += F.ctc_loss(
                cur,
                target,
                torch.tensor([feat_lens[i]]),
                torch.tensor([text_lens[i]]),
                zero_infinity=True,
            )
        ref = float(loss) / b
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


class TestGaussianUpsample:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(5)
        b, t_text, d = 2, 5, 4
        hs = rng.randn(b, t_text, d).astype(np.float32)
        ds = np.array([[2, 3, 1, 0, 0], [1, 1, 1, 1, 1]], np.float32)
        text_lens = np.array([3, 5])
        tv = np.arange(t_text)[None] < text_lens[:, None]
        max_frames = 8
        out, mel_lens = gaussian_upsample(
            jnp.asarray(hs), jnp.asarray(ds), jnp.asarray(tv), max_frames
        )
        out, mel_lens = np.asarray(out), np.asarray(mel_lens)
        np.testing.assert_array_equal(mel_lens, [6, 5])
        delta = 0.1
        for i in range(b):
            n = text_lens[i]
            d_i = ds[i, :n]
            c = np.cumsum(d_i) - d_i / 2
            for t in range(mel_lens[i]):
                e = -delta * (t - c) ** 2
                w = np.exp(e - e.max())
                w = w / w.sum()
                ref = w @ hs[i, :n]
                np.testing.assert_allclose(out[i, t], ref, atol=1e-5)
            assert np.allclose(out[i, mel_lens[i] :], 0.0)

    def test_degenerate_zero_durations(self):
        hs = jnp.ones((1, 3, 2))
        ds = jnp.zeros((1, 3))
        tv = jnp.ones((1, 3), bool)
        out, mel_lens = gaussian_upsample(hs, ds, tv, 6)
        assert int(mel_lens[0]) == 3  # falls back to 1 frame per token
