"""On-device alignment ops: beta-binomial prior, monotonic alignment search
(Viterbi), and duration-bucketed averaging.

The reference runs these on the host — scipy betabinom in a Python loop
(`modules/alignment.py:59-87`), numba MAS per batch item after a
`.detach().cpu()` sync (`alignment.py:92-142`), and a numba averaging loop
(`alignment.py:145-172`). Here all three are jittable jnp/lax code, vmapped
over the batch, so the training step has zero host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln

from emotivoice_tpu.utils.masks import NEG_INF, sequence_mask


def beta_binomial_prior(
    text_lengths: jnp.ndarray,  # (B,)
    feats_lengths: jnp.ndarray,  # (B,)
    max_text: int,
    max_feats: int,
    w: float = 1.0,
) -> jnp.ndarray:
    """Batched log BetaBinom(k; n=N, a=w*t, b=w*(T-t+1)) prior, shape
    (B, max_feats, max_text); -inf outside the (T_b, N_b) valid block.

    Matches reference `AlignmentModule._generate_prior` (alignment.py:59-87):
    for frame index t (1-based) of an utterance with T frames and N tokens,
    prior[t-1, k] = betabinom.logpmf(k, N, w*t, w*(T-t+1)).
    """
    n = text_lengths.astype(jnp.float32)[:, None, None]  # N
    t_total = feats_lengths.astype(jnp.float32)[:, None, None]  # T
    t = jnp.arange(1, max_feats + 1, dtype=jnp.float32)[None, :, None]
    k = jnp.arange(max_text, dtype=jnp.float32)[None, None, :]

    a = w * t
    b = w * (t_total - t + 1.0)
    # Guard: outside the valid frame range b <= 0; clamp for finite math then mask.
    b = jnp.maximum(b, 1e-6)
    logpmf = (
        gammaln(n + 1.0)
        - gammaln(k + 1.0)
        - gammaln(n - k + 1.0)
        + betaln(k + a, n - k + b)
        - betaln(a, b)
    )
    valid = (
        sequence_mask(feats_lengths, max_feats)[:, :, None]
        & sequence_mask(text_lengths, max_text)[:, None, :]
    )
    return jnp.where(valid, logpmf, NEG_INF)


def _mas_single(log_p_attn, text_len, feats_len):
    """Monotonic alignment search for one utterance.

    log_p_attn: (T_feats, T_text) log-probabilities (padded).
    Returns (path, q_last) where path[j] = text index aligned to frame j.

    Same DP as reference `_monotonic_alignment_search` (alignment.py:92-121):
      Q[i, j] = max(Q[i-1, j-1], Q[i, j-1]) + log_p[i, j],  Q[0, j] = cumsum.
    Implemented as a lax.scan over frames carrying the Q column; choices are
    stored for the backward pass.
    """
    t_feats, t_text = log_p_attn.shape
    text_ids = jnp.arange(t_text)
    text_valid = text_ids < text_len
    lp = jnp.where(text_valid[None, :], log_p_attn, NEG_INF)  # (Tf, Tt)

    q0 = jnp.where(text_ids == 0, lp[0], NEG_INF)

    def fwd(q_prev, lp_j):
        shifted = jnp.concatenate([jnp.full((1,), NEG_INF, q_prev.dtype), q_prev[:-1]])
        take_diag = shifted > q_prev  # strict '>' => ties prefer staying (i, j-1)
        q = jnp.maximum(shifted, q_prev) + lp_j
        return q, (take_diag, q)

    q_last, (choices, qs) = jax.lax.scan(fwd, q0, lp[1:])
    # choices[j-1, i] True if Q[i, j] came from Q[i-1, j-1]; qs[j-1] = Q[:, j].
    all_q = jnp.concatenate([q0[None], qs], axis=0)  # (Tf, Tt)

    # Backward pass, mirroring reference lines 113-121: A[j] picked from
    # {A[j+1]-1, A[j+1]} by comparing Q values at column j.
    def bwd(a_next, inp):
        j, q_j = inp  # q_j = Q[:, j]
        i_b = a_next
        i_a = jnp.maximum(a_next - 1, 0)
        pick_a = (i_b > 0) & (q_j[i_a] >= q_j[i_b])
        a_j = jnp.where(pick_a, i_a, i_b)
        # Frames at/after the last valid frame stay pinned at text_len-1.
        a_j = jnp.where(j >= feats_len - 1, text_len - 1, a_j)
        return a_j, a_j

    js = jnp.arange(t_feats - 2, -1, -1)
    a_init = text_len - 1
    _, path_rev = jax.lax.scan(bwd, a_init, (js, all_q[js]))
    path = jnp.concatenate([path_rev[::-1], jnp.full((1,), a_init)])
    # Pin invalid (padded) frames to text_len - 1 as well; they are masked in
    # all downstream reductions.
    frame_valid = jnp.arange(t_feats) < feats_len
    path = jnp.where(frame_valid, path, text_len - 1)
    return path


def viterbi_decode(
    log_p_attn: jnp.ndarray,  # (B, T_feats, T_text)
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
):
    """Batched MAS. Returns (durations (B, T_text) float32, bin_loss scalar,
    path (B, T_feats) int32).

    bin_loss = -mean over valid frames of log_p_attn along the Viterbi path,
    averaged over the batch (reference `viterbi_decode`, alignment.py:124-142).
    """
    b, t_feats, t_text = log_p_attn.shape
    path = jax.vmap(_mas_single)(log_p_attn, text_lengths, feats_lengths)

    frame_valid = sequence_mask(feats_lengths, t_feats)  # (B, Tf)
    onehot = jax.nn.one_hot(path, t_text, dtype=jnp.float32)  # (B, Tf, Tt)
    onehot = onehot * frame_valid[..., None]
    durations = jnp.sum(onehot, axis=1)  # (B, Tt)

    selected = jnp.take_along_axis(log_p_attn, path[..., None], axis=2)[..., 0]
    per_item = -jnp.sum(selected * frame_valid, axis=1) / jnp.maximum(
        feats_lengths.astype(jnp.float32), 1.0
    )
    bin_loss = jnp.mean(per_item)
    return durations, bin_loss, path


def average_by_path(
    path: jnp.ndarray,  # (B, T_feats) frame->token assignment
    xs: jnp.ndarray,  # (B, T_feats) frame-level values (pitch/energy)
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    max_text: int,
) -> jnp.ndarray:
    """Token-level averages of a frame-level track over the alignment path.

    Equivalent to reference `average_by_duration` (alignment.py:145-172),
    which sums frames per duration bucket — the buckets are exactly the
    fibers of the MAS path, so a one-hot matmul reproduces it on device.
    """
    frame_valid = sequence_mask(feats_lengths, path.shape[1]).astype(jnp.float32)
    onehot = jax.nn.one_hot(path, max_text, dtype=jnp.float32) * frame_valid[..., None]
    sums = jnp.einsum("bft,bf->bt", onehot, xs.astype(jnp.float32))
    counts = jnp.sum(onehot, axis=1)
    avg = sums / jnp.maximum(counts, 1.0)
    avg = jnp.where(counts > 0, avg, 0.0)
    text_valid = sequence_mask(text_lengths, max_text)
    return jnp.where(text_valid, avg, 0.0)


def forward_sum_loss(
    log_p_attn: jnp.ndarray,  # (B, T_feats, T_text)
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    blank_logprob: float = -1.0,
) -> jnp.ndarray:
    """CTC forward-sum alignment loss, fully vectorized.

    Reference `ForwardSumLoss` (loss.py:62-97) loops Python-per-item over
    torch.nn.functional.ctc_loss with target sequence [1..N] and a prepended
    blank column with log-prob -1. Because every label is distinct, the CTC
    lattice simplifies to the standard 2N+1-state forward recursion with
    always-permitted skip transitions; we run it as one lax.scan over frames,
    vmapped over the batch. Matches torch's mean reduction: per-item NLL is
    divided by the target length, then averaged over the batch.
    """
    b, t_feats, t_text = log_p_attn.shape
    # Pad blank column then renormalize over text+blank (reference pads with
    # log(e^-1) = -1 then log_softmaxes).
    padded = jnp.concatenate(
        [jnp.full((b, t_feats, 1), blank_logprob, log_p_attn.dtype), log_p_attn],
        axis=2,
    )
    # The reference slices each item to its true text length before the
    # log_softmax (loss.py:85-90); mask padded text columns equivalently.
    col_valid = jnp.concatenate(
        [jnp.ones((b, 1), bool), sequence_mask(text_lengths, t_text)], axis=1
    )
    padded = jnp.where(col_valid[:, None, :], padded, NEG_INF)
    logp = jax.nn.log_softmax(padded, axis=2)  # (B, Tf, 1+Tt)

    s = 2 * t_text + 1  # extended path states: blank,1,blank,2,...,N,blank

    def per_item(lp, n_text, n_feats):
        # lp: (Tf, 1+Tt)
        states = jnp.arange(s)
        is_label = states % 2 == 1
        label_idx = jnp.where(is_label, (states + 1) // 2, 0)  # 1..N or blank 0
        state_valid = states < 2 * n_text + 1

        def emit(lp_t):
            return jnp.where(state_valid, lp_t[label_idx], NEG_INF)

        alpha0 = jnp.where(states < 2, emit(lp[0]), NEG_INF)
        alpha0 = jnp.where(state_valid, alpha0, NEG_INF)

        def step(alpha, lp_t):
            a1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
            a2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
            # Skip allowed only into label states (all labels distinct).
            stacked = jnp.stack(
                [alpha, a1, jnp.where(is_label, a2, NEG_INF)], axis=0
            )
            merged = jax.nn.logsumexp(stacked, axis=0)
            return merged + emit(lp_t), None

        def masked_step(carry, inp):
            t, lp_t = inp
            alpha = carry
            new_alpha, _ = step(alpha, lp_t)
            alpha = jnp.where(t < n_feats, new_alpha, alpha)
            return alpha, None

        ts = jnp.arange(1, t_feats)
        alpha_last, _ = jax.lax.scan(masked_step, alpha0, (ts, lp[1:]))
        end1 = alpha_last[2 * n_text]  # final blank
        end2 = alpha_last[2 * n_text - 1]  # final label
        nll = -jax.nn.logsumexp(jnp.stack([end1, end2]))
        return nll / jnp.maximum(n_text.astype(jnp.float32), 1.0)

    losses = jax.vmap(per_item)(logp, text_lengths, feats_lengths)
    return jnp.mean(losses)
