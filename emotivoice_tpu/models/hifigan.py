"""HiFi-GAN generator + multi-period/multi-scale discriminators in flax.

Parity target: reference `models/hifigan/models.py` (V1 topology: conv_pre k7,
4 transposed-conv upsample stages 8/8/2/2 with MRF resblocks k=3/7/11
dilations (1,3,5), conv_post k7 + tanh; MPD periods 2/3/5/7/11; MSD at
1x/2x/4x).

Weight-norm / spectral-norm are explicit (g, v) parametrizations with the
same normalization axes as torch.nn.utils.weight_norm(dim=0) on each torch
layout, so reference checkpoints convert 1:1:
  - Conv1d weight (Co, Ci/g, K): norm per output channel
  - ConvTranspose1d weight (Ci, Co, K): norm per *input* channel (the
    well-known torch default-dim quirk, kept for parity)
Param tensors are stored in torch layout and rearranged to XLA layout at
trace time (free at runtime).

Layouts: activations are feature-last (B, T, C) / (B, H, W, C).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from emotivoice_tpu.config import DiscriminatorConfig, VocoderConfig
from emotivoice_tpu.ops.s2d_conv import _accum_dtype, s2d_conv_packed

LRELU_SLOPE = 0.1


def _stage_pack_factor(channels: int, t: int) -> int:
    """Space-to-depth pack factor for a whole small-channel upsample stage.

    Isolated per-conv measurements (tools/exp_s2d_conv.py, v5e bf16,
    production batch-16 stage shapes) show the packed conv wins 1.3-1.8x at
    K=7/11 for C=64/32, but wiring it per conv LOSES in-model (131 ms vs
    84 ms full vocoder): the (B,T,C<128)<->(B,T/s,s*C) reshape is a tiled-
    layout relayout copy paid twice per conv and it breaks XLA's
    leaky_relu/add fusions. So packing is applied per STAGE: one relayout
    after the transposed conv, every MRF conv/residual in packed layout
    (s*C = 128 full lanes), one relayout at stage exit. Acceptance is the
    in-model stage delta (tools/exp_vocoder_stages.py)."""
    if channels >= 128:
        return 0
    s = 128 // channels
    return s if t % s == 0 else 0


def _norm_except_dim0(v: jnp.ndarray) -> jnp.ndarray:
    axes = tuple(range(1, v.ndim))
    return jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))


def _normal_init(std: float):
    return nn.initializers.normal(stddev=std)


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d over (B, T, C)."""

    in_features: int
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Optional[int] = None  # defaults to 'same' for stride 1
    use_weight_norm: bool = True
    init_std: float = 0.01

    def setup(self):
        k, ci, co = self.kernel_size, self.in_features, self.features
        self.v = self.param(
            "v", _normal_init(self.init_std), (co, ci // self.groups, k)
        )
        if self.use_weight_norm:
            self.g = self.param(
                "g", lambda rng, shape: _norm_except_dim0(self.v), (co, 1, 1)
            )
        self.b = self.param("b", nn.initializers.zeros, (co,))

    def folded(self) -> jnp.ndarray:
        """Effective torch-layout weight (Co, Ci/g, K) with norm baked."""
        if self.use_weight_norm:
            return self.g * self.v / jnp.maximum(_norm_except_dim0(self.v), 1e-12)
        return self.v

    def folded_hio(self) -> jnp.ndarray:
        """Effective kernel in lax HIO layout (K, Ci/g, Co)."""
        return jnp.transpose(self.folded(), (2, 1, 0))

    def packed(self, xp: jnp.ndarray, s: int) -> jnp.ndarray:
        """Packed-in/packed-out stride-1 same-pad call: (B, T/s, s*Ci) ->
        (B, T/s, s*Co) without leaving the space-to-depth layout."""
        from emotivoice_tpu.ops.s2d_conv import _accum_dtype, s2d_conv_packed

        y = s2d_conv_packed(
            xp, self.folded_hio(), dilation=self.dilation, s=s
        )
        return y + jnp.tile(self.b, s).astype(xp.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        pad = self.padding
        if pad is None:
            pad = (k - 1) // 2 * self.dilation
        # Kernel/bias follow the activation dtype (bf16 compute casts the f32
        # folded weight once at trace time; accumulation stays f32 below).
        y = jax.lax.conv_general_dilated(
            x,
            self.folded_hio().astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
            preferred_element_type=_accum_dtype(x.dtype),
        ).astype(x.dtype)
        return y + self.b.astype(x.dtype)


class WNConvTranspose1d(nn.Module):
    """Weight-normalized ConvTranspose1d matching torch semantics:
    out_len = (T-1)*stride - 2*padding + kernel_size."""

    in_features: int
    features: int
    kernel_size: int
    stride: int
    padding: int
    use_weight_norm: bool = True
    init_std: float = 0.01

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, s_in: int = 1, s_out: int = 1
    ) -> jnp.ndarray:
        k, ci, co = self.kernel_size, self.in_features, self.features
        v = self.param("v", _normal_init(self.init_std), (ci, co, k))
        if self.use_weight_norm:
            g = self.param(
                "g", lambda rng, shape: _norm_except_dim0(v), (ci, 1, 1)
            )
            w = g * v / jnp.maximum(_norm_except_dim0(v), 1e-12)
        else:
            w = v
        b = self.param("b", nn.initializers.zeros, (co,))
        if s_in > 1 or s_out > 1:
            # Space-to-depth lowering: packed-in/packed-out, lands in the
            # next MRF stage's layout with zero relayouts (s2d_conv.py).
            from emotivoice_tpu.ops.s2d_conv import tconv_packed

            y = tconv_packed(x, w, self.stride, self.padding, s_in, s_out)
            return y + jnp.tile(b, s_out).astype(x.dtype)
        # Two equivalent lowerings, picked per shape (measured on v5e, see
        # tools/exp_tconv_matmul.py): the wide first upsample stage
        # (Ci*stride >= 4096) runs 1.3x faster as a dense matmul +
        # overlap-add (no zero-dilated input); narrow/long stages are
        # faster as XLA's lhs-dilated conv.
        if ci * self.stride >= 4096 and k % self.stride == 0:
            y = self._matmul_form(x, w)
        else:
            # Transposed conv == lhs-dilated conv with flipped kernel.
            kernel = jnp.flip(jnp.transpose(w, (2, 0, 1)), axis=0)  # (K,Ci,Co)
            pad = k - 1 - self.padding
            y = jax.lax.conv_general_dilated(
                x,
                kernel.astype(x.dtype),
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=_accum_dtype(x.dtype),
            ).astype(x.dtype)
        return y + b.astype(x.dtype)

    def _matmul_form(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Subpixel lowering: X @ W' -> (T, k/u groups, u, Co), overlap-add
        the ceil(k/u) groups, crop `padding` from both sides. Exact (taps
        of input t land at output t*stride + j - padding)."""
        k, ci, co = self.kernel_size, self.in_features, self.features
        u = self.stride
        b_, t = x.shape[0], x.shape[1]
        g = k // u
        wm = jnp.transpose(w, (0, 2, 1)).reshape(ci, k * co)
        # Keep the einsum result and the overlap-add accumulator in f32 so
        # bf16 compute matches the lax-conv branch (which accumulates in
        # f32 end-to-end); cast once after the final crop.
        y = jnp.einsum(
            "btc,cf->btf", x, wm.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = y.reshape(b_, t, g, u, co)
        out_t = (t + g - 1) * u
        acc = jnp.zeros((b_, out_t, co), jnp.float32)
        for j in range(g):
            acc = acc.at[:, j * u : j * u + t * u].add(
                y[:, :, j].reshape(b_, t * u, co)
            )
        return acc[:, self.padding : out_t - self.padding].astype(x.dtype)


class WNConv2d(nn.Module):
    """Weight-normalized Conv2d over (B, H, W, C) for the MPD towers."""

    in_features: int
    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_weight_norm: bool = True
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        ci, co = self.in_features, self.features
        v = self.param("v", _normal_init(self.init_std), (co, ci, kh, kw))
        if self.use_weight_norm:
            g = self.param(
                "g", lambda rng, shape: _norm_except_dim0(v), (co, 1, 1, 1)
            )
            w = g * v / jnp.maximum(_norm_except_dim0(v), 1e-12)
        else:
            w = v
        b = self.param("b", nn.initializers.zeros, (co,))
        kernel = jnp.transpose(w, (2, 3, 1, 0))  # (Kh, Kw, Ci, Co)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=_accum_dtype(x.dtype),
        ).astype(x.dtype)
        return y + b.astype(x.dtype)


class SNConv1d(nn.Module):
    """Spectral-normalized Conv1d (power iteration, torch dim=0 semantics)."""

    in_features: int
    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: int = 0
    init_std: float = 0.01
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        k, ci, co = self.kernel_size, self.in_features, self.features
        w = self.param("w", _normal_init(self.init_std), (co, ci // self.groups, k))
        b = self.param("b", nn.initializers.zeros, (co,))
        w_mat = w.reshape(co, -1)
        # torch legacy spectral_norm semantics: sigma = u . (W v) from STORED
        # u, v; one power iteration (v then u) before sigma in training mode.
        rs = np.random.RandomState(0)
        u_var = self.variable(
            "spectral", "u",
            lambda: (lambda x_: x_ / np.linalg.norm(x_))(
                rs.randn(co).astype(np.float32)
            ),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: (lambda x_: x_ / np.linalg.norm(x_))(
                rs.randn(w_mat.shape[1]).astype(np.float32)
            ),
        )
        u, v = u_var.value, v_var.value
        if update_stats:
            wm = jax.lax.stop_gradient(w_mat)
            v = wm.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), self.eps)
            u = wm @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), self.eps)
            if not self.is_initializing():
                u_var.value = u
                v_var.value = v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.dot(u, w_mat @ v)
        w_sn = w / sigma
        kernel = jnp.transpose(w_sn, (2, 1, 0))
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
            preferred_element_type=_accum_dtype(x.dtype),
        ).astype(x.dtype)
        return y + b.astype(x.dtype)


class ResBlock1(nn.Module):
    """MRF residual block (reference models.py:26-64).

    use_pallas=True routes each residual unit through the fused Pallas TPU
    kernel (`ops/pallas/resblock.py`): both convs + leaky-ReLUs + residual
    add execute in one VMEM-resident kernel, eliminating the intermediate
    HBM round-trip that makes the late (small-channel, huge-T) vocoder
    stages bandwidth-bound under stock XLA lowering.
    """

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    use_pallas: bool = False
    # >1: input/output are space-to-depth packed (B, T/packed,
    # packed*channels); the whole block runs in packed layout
    # (see _stage_pack_factor).
    packed: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, weights_only: bool = False
    ):
        if weights_only:
            # Param-tree-identical weight collection for the whole-stage
            # fused Pallas kernel (ops/pallas/packed_stage.py): the parent
            # generator gathers every unit's folded (w1, b1, w2, b2) and
            # runs all three resblock chains in one pallas_call; this
            # branch creates the exact same WNConv1d scopes as the compute
            # branches so checkpoints are unchanged.
            c, k = self.channels, self.kernel_size
            return tuple(
                (
                    (s1 := WNConv1d(c, c, k, dilation=d,
                                    name=f"convs1_{i}")).folded_hio(),
                    s1.b,
                    (s2 := WNConv1d(c, c, k, dilation=1,
                                    name=f"convs2_{i}")).folded_hio(),
                    s2.b,
                )
                for i, d in enumerate(self.dilations)
            )
        if self.use_pallas:
            return self._pallas_forward(x)
        if self.packed > 1:
            return self._packed_forward(x)
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = WNConv1d(
                self.channels, self.channels, self.kernel_size, dilation=d,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = WNConv1d(
                self.channels, self.channels, self.kernel_size, dilation=1,
                name=f"convs2_{i}",
            )(xt)
            x = x + xt
        return x

    def _packed_forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Same math, packed layout: params are the ordinary WNConv1d
        (g, v, b) tensors (checkpoints unchanged); only the lowering packs
        the kernel (ops/s2d_conv.py:pack_weight) and tiles the bias."""
        c, k, s = self.channels, self.kernel_size, self.packed
        for i, d in enumerate(self.dilations):
            sub1 = WNConv1d(c, c, k, dilation=d, name=f"convs1_{i}")
            sub2 = WNConv1d(c, c, k, dilation=1, name=f"convs2_{i}")
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = s2d_conv_packed(xt, sub1.folded_hio().astype(x.dtype), d, s)
            xt = xt + jnp.tile(sub1.b.astype(x.dtype), s)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = s2d_conv_packed(xt, sub2.folded_hio().astype(x.dtype), 1, s)
            xt = xt + jnp.tile(sub2.b.astype(x.dtype), s)
            x = x + xt
        return x

    def _pallas_forward(self, x: jnp.ndarray) -> jnp.ndarray:
        from emotivoice_tpu.ops.pallas.resblock import fused_residual_unit

        c, k = self.channels, self.kernel_size
        # Time tile sized to VMEM: Mosaic materializes ~k shifted copies of
        # the activation tile per conv stage (unrolled taps), and the lane
        # dim pads to 128, so the live-buffer footprint is roughly
        # (k+2) * block_t * max(c,128) * 4 bytes. A ~10 MB budget keeps the
        # double-buffered pipeline under the 16 MB VMEM on every
        # (c, k, d) the HiFi-GAN MRF uses (verified on v5e: c=256 k=11
        # compiles at 1024 rows but not 2048).
        c_eff = max(c, 128)
        budget = 10 * 1024 * 1024
        block_t = budget // (4 * c_eff * (k + 2)) // 256 * 256
        block_t = max(512, min(8192, block_t))
        for i, d in enumerate(self.dilations):
            sub1 = WNConv1d(c, c, k, dilation=d, name=f"convs1_{i}")
            sub2 = WNConv1d(c, c, k, dilation=1, name=f"convs2_{i}")
            x = fused_residual_unit(
                x,
                sub1.folded_hio().astype(x.dtype), sub1.b.astype(x.dtype),
                sub2.folded_hio().astype(x.dtype), sub2.b.astype(x.dtype),
                k, d, block_t,
            )
        return x


class ResBlock2(nn.Module):
    """Lighter MRF variant (reference models.py:67-89)."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = WNConv1d(
                self.channels, self.channels, self.kernel_size, dilation=d,
                name=f"convs_{i}",
            )(xt)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    """Reference Generator (models.py:90-140). Input (B, T, n_mels) mel,
    output (B, T * prod(upsample_rates)) waveform in (-1, 1)."""

    cfg: VocoderConfig
    use_pallas: bool = False  # fused MRF kernels (TPU only)
    use_s2d: bool = True  # measured space-to-depth MRF lowering (exact)
    # Whole-stage fused Pallas kernel for the packed stages: all 18 MRF
    # convs + activations + residual/merge in one VMEM-resident pallas_call
    # (ops/pallas/packed_stage.py). ISOLATED whole-MRF timings (v5e bf16,
    # batch 16 x 384 frames, `tools/exp_fused_stage.py --iters 40`, r5 @
    # HEAD): stage3 s2d 12.39 -> fused 8.66 ms, stage4 s2d 8.53 -> fused
    # 8.01 ms (stock XLA: 12.86 / 25.98 ms). These are kernel-only numbers;
    # the in-model per-stage deltas (which include each stage's tconv and
    # XLA fusion context) are the `tools/exp_vocoder_stages.py` rows in
    # docs/PERFORMANCE.md's roofline table — the two harnesses are labeled
    # there and agree within noise. Inference-only (no VJP) — training
    # keeps the differentiable s2d lowering; SynthesisEngine turns this on
    # automatically on TPU backends.
    use_fused_stage: bool = False
    fused_block_rows: int = 1024
    fused_interpret: bool = False  # CPU tests only
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(
        self, mel: jnp.ndarray, *, stages: Optional[int] = None
    ) -> jnp.ndarray:
        """stages: run only the first N upsample levels and return the raw
        activation — profiling/bench use only (tools/exp_vocoder_stages.py)."""
        c = self.cfg
        if self.dtype is not None:
            mel = mel.astype(self.dtype)
        num_kernels = len(c.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if c.resblock == "1" else ResBlock2

        x = WNConv1d(
            c.initial_channel, c.upsample_initial_channel, 7, padding=3,
            name="conv_pre",
        )(mel)
        if stages == 0:
            return x
        in_ch = c.upsample_initial_channel
        # pack_cur: space-to-depth factor of x's CURRENT layout (1 =
        # unpacked). Packed layout is carried ACROSS stages: the transposed
        # conv lowers packed-in/packed-out (ops/s2d_conv.py:tconv_packed)
        # whenever the stride ratio allows, so consecutive small-channel
        # stages chain without any unpack->repack relayout between them,
        # and conv_post consumes the packed layout directly.
        pack_cur = 1
        t_global = mel.shape[1]  # unpacked time length of x
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            out_ch = c.upsample_initial_channel // (2 ** (i + 1))
            t_out = t_global * u
            s2d_on = (
                self.use_s2d and not self.use_pallas
                and resblock_cls is ResBlock1
            )
            pack = _stage_pack_factor(out_ch, t_out) if s2d_on else 0
            pack = pack or 1
            x = nn.leaky_relu(x, c.lrelu_slope)
            tconv = WNConvTranspose1d(
                in_ch, out_ch, k, stride=u, padding=(k - u) // 2, name=f"ups_{i}"
            )
            if (pack > 1 or pack_cur > 1) and pack % (u * pack_cur) == 0:
                # Fold the stage-entry relayout into the tconv: emit the
                # upsampled activation directly in the target packed layout.
                x = tconv(x, s_in=pack_cur, s_out=pack)
            else:
                if pack_cur > 1:  # unpack (relayout) — ratio doesn't fold
                    b_ = x.shape[0]
                    x = x.reshape(b_, t_global, in_ch)
                x = tconv(x)
                if pack > 1:
                    b_ = x.shape[0]
                    x = x.reshape(b_, t_out // pack, pack * out_ch)
            pack_cur = pack
            t_global = t_out
            b_, t_ = x.shape[0], t_out // pack if pack > 1 else t_out
            if pack > 1 and self.use_fused_stage:
                from emotivoice_tpu.ops.pallas.packed_stage import (
                    fused_mrf_stage,
                )

                weights = tuple(
                    ResBlock1(
                        out_ch, rk, rd,
                        name=f"resblocks_{i * num_kernels + j}",
                    )(x, weights_only=True)
                    for j, (rk, rd) in enumerate(
                        zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
                    )
                )
                x = fused_mrf_stage(
                    x, weights, pack,
                    tuple(c.resblock_kernel_sizes),
                    tuple(tuple(d) for d in c.resblock_dilation_sizes),
                    block_rows=self.fused_block_rows,
                    interpret=self.fused_interpret,
                )
            else:
                acc = None
                for j, (rk, rd) in enumerate(
                    zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
                ):
                    kw = (
                        {"use_pallas": self.use_pallas, "packed": pack}
                        if resblock_cls is ResBlock1
                        else {}
                    )
                    r = resblock_cls(
                        out_ch, rk, rd,
                        name=f"resblocks_{i * num_kernels + j}", **kw
                    )(x)
                    acc = r if acc is None else acc + r
                x = acc / num_kernels
            in_ch = out_ch
            if stages is not None and i + 1 >= stages:
                # Profiling path returns the unpacked activation so stage
                # deltas stay comparable across lowerings.
                return x.reshape(b_, t_out, out_ch) if pack > 1 else x
        # NOTE: reference uses default slope 0.01 for the final activation
        # (models.py:133 F.leaky_relu without slope arg).
        x = nn.leaky_relu(x, 0.01)
        conv_post = WNConv1d(in_ch, 1, 7, padding=3, name="conv_post")
        if pack_cur > 1:
            # conv_post consumes the packed stage-4 layout directly
            # ((B,T/s,s*C) -> (B,T/s,s)); the stage-exit relayout of the
            # ~100 MB activation never happens — only the tiny 1-channel
            # output gets reshaped back to time-major.
            y = conv_post.packed(x, pack_cur)
            y = y.reshape(y.shape[0], t_global, 1)
        else:
            y = conv_post(x)
        # Waveform always leaves in f32 (host int16 conversion downstream).
        return jnp.tanh(y.astype(jnp.float32))[..., 0]


class DiscriminatorP(nn.Module):
    """Period sub-discriminator (reference models.py:143-177)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Sequence[int] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        # wav: (B, T)
        b, t = wav.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            wav = jnp.pad(wav, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = wav.reshape(b, t // p, p, 1)  # (B, H=T/p, W=p, C=1)

        fmap = []
        pad = (self.kernel_size - 1) // 2
        widths = list(self.channels)
        chans = list(zip([1] + widths[:-1], widths))
        for i, (ci, co) in enumerate(chans):
            x = WNConv2d(
                ci, co, (self.kernel_size, 1), (self.stride, 1), (pad, 0),
                name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        last = widths[-1]
        x = WNConv2d(
            last, last, (self.kernel_size, 1), (1, 1), (pad, 0),
            name=f"convs_{len(chans)}",
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = WNConv2d(last, 1, (3, 1), (1, 1), (1, 0), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


_MSD_LAYERS = (
    # (out_ch, kernel, stride, groups, pad) — reference models.py:210-218
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)


class DiscriminatorS(nn.Module):
    """Scale sub-discriminator (reference models.py:206-233)."""

    use_spectral_norm: bool = False
    layers: Sequence[Tuple[int, int, int, int, int]] = _MSD_LAYERS

    @nn.compact
    def __call__(self, wav: jnp.ndarray, update_stats: bool = False):
        x = wav[..., None]  # (B, T, 1)
        fmap = []
        ci = 1
        for i, (co, k, s, g, pad) in enumerate(self.layers):
            if self.use_spectral_norm:
                x = SNConv1d(ci, co, k, s, g, pad, name=f"convs_{i}")(x, update_stats)
            else:
                x = WNConv1d(ci, co, k, stride=s, groups=g, padding=pad,
                             name=f"convs_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
            ci = co
        if self.use_spectral_norm:
            x = SNConv1d(ci, 1, 3, 1, 1, 1, name="conv_post")(x, update_stats)
        else:
            x = WNConv1d(ci, 1, 3, padding=1, name="conv_post")(x)
        fmap.append(x)
        b = x.shape[0]
        return x.reshape(b, -1), fmap


def _avg_pool1d(x: jnp.ndarray, window: int = 4, stride: int = 2, pad: int = 2):
    """torch AvgPool1d(4, 2, padding=2) semantics (count_include_pad=True)."""
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, window), (1, stride), "VALID"
    )
    return summed / window


class Discriminator(nn.Module):
    """MPD + MSD combined (reference pretrained_discriminator.py:21-40).

    Topology comes from ``DiscriminatorConfig`` (defaults == reference);
    tests/dryruns pass a shrunken config — same code path, tiny graph.
    """

    cfg: DiscriminatorConfig = DiscriminatorConfig()
    # Compute dtype (e.g. jnp.bfloat16): inputs are cast once at entry and
    # every conv follows the activation dtype; params stay f32 and the
    # LSGAN/FM losses accumulate in f32 (losses cast outputs back).
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray, update_stats: bool = False):
        """y, y_hat: (B, T) waveforms. Returns (real_outs, fake_outs,
        real_fmaps, fake_fmaps) across all sub-discriminators."""
        c = self.cfg
        if self.dtype is not None:
            y = y.astype(self.dtype)
            y_hat = y_hat.astype(self.dtype)
        real_outs: List[jnp.ndarray] = []
        fake_outs: List[jnp.ndarray] = []
        real_fmaps: List[List[jnp.ndarray]] = []
        fake_fmaps: List[List[jnp.ndarray]] = []

        for p in c.periods:
            d = DiscriminatorP(
                p,
                kernel_size=c.period_kernel_size,
                stride=c.period_stride,
                channels=c.period_channels,
                name=f"mpd_{p}",
            )
            ro, rf = d(y)
            fo, ff = d(y_hat)
            real_outs.append(ro)
            fake_outs.append(fo)
            real_fmaps.append(rf)
            fake_fmaps.append(ff)

        ys, yhs = y, y_hat
        for i in range(c.n_scales):
            if i != 0:
                ys = _avg_pool1d(ys)
                yhs = _avg_pool1d(yhs)
            d = DiscriminatorS(
                use_spectral_norm=(i == 0), layers=c.scale_layers,
                name=f"msd_{i}",
            )
            ro, rf = d(ys, update_stats)
            fo, ff = d(yhs, update_stats)
            real_outs.append(ro)
            fake_outs.append(fo)
            real_fmaps.append(rf)
            fake_fmaps.append(ff)

        return real_outs, fake_outs, real_fmaps, fake_fmaps


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """x2-weighted feature-matching L1 (reference models.py:279-285)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(
                jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32))
            )
    return loss * 2.0


def discriminator_loss(real_outs, fake_outs) -> jnp.ndarray:
    """LSGAN D loss (reference models.py:288-300)."""
    loss = 0.0
    for dr, dg in zip(real_outs, fake_outs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_loss(fake_outs) -> jnp.ndarray:
    """LSGAN G adversarial loss (reference models.py:303-310)."""
    loss = 0.0
    for dg in fake_outs:
        loss += jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
    return loss
