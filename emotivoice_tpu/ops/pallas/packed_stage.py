"""Pallas TPU kernel: fused space-to-depth-packed HiFi-GAN MRF stage.

One upsample stage of the HiFi-GAN generator (reference
models/hifigan/models.py:90-133) applies a Multi-Receptive-Field block after
the transposed conv: three independent ResBlock1 chains (kernel sizes
3/7/11, dilations (1,3,5) on the first conv of each residual unit), summed
and divided by 3. At the late stages (C=64, C=32) this is 18 convs over a
huge-T, small-C activation — the two structural problems on TPU are

  1. lane underfill: C < 128 wastes MXU output lanes. The round-2 fix
     (ops/s2d_conv.py) packs s = 128/C time steps into lanes and runs a
     dense block-structured packed conv — full lanes, but the dense packed
     kernel pays a K'*s/K FLOP overhead (2.3-2.9x across the stage: every
     tap computes all s output slots even where the weight block is zero).
  2. HBM traffic: XLA materializes every intermediate between the 18 convs
     (~500 MB/residual-unit at stage 4), so the stage is bandwidth-bound
     even after packing.

This kernel fixes both at once. The whole MRF stage runs in one
`pallas_call`: a time tile (plus halo) is loaded once, all 3 resblock
chains (18 convs + leaky-ReLUs + residual adds + the /3 merge) execute in
VMEM, and one tile is written back. Convs use a *chunked gather* lowering
that is FLOP-minimal at full lane width:

  The packed output row r holds output slots j = 0..s-1; slot j of tap i
  reads flat input r*s + j + (i-c)*d. The union of input offsets
  {(i-c)*d + j} is covered by chunks of s *consecutive* flat offsets; a
  chunk with base offset o = q*s + m gathers, per lane block u, from packed
  row r+q (u >= m) or r+q+1 (u < m) — implemented as a lane-mask select
  between the row-q slice and a once-per-conv sublane-rolled copy (Mosaic
  cannot concat vectors at mismatched sublane offsets), with the lane-block
  rotation FOLDED INTO the host-packed chunk weight (a row roll of W).
  Each chunk contributes one (tile, 128) @ (128, 128) MXU matmul.
  Dense-packed FLOP factor K'*s/K drops to |union|/K (e.g. stage 4 K=11
  d=1: 1.82x -> 1.27x).

Exactness: algebraically identical to the stock lax.conv lowering
(zero-padding semantics preserved by masking out-of-bounds rows before
every conv — haloed tiles recompute the halo region from x, so tile joins
are seamless). Parity-tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# Static planning (host-side, pure Python)
# ---------------------------------------------------------------------------

def _conv_plan(k: int, d: int, s: int, aligned: bool = False) -> dict:
    """Chunk plan for one conv (kernel k, dilation d, pack factor s).

    aligned=False: FLOP-minimal chunking — each contiguous offset run is
    chopped greedily; a non-multiple tail becomes one chunk overlapping
    backwards, whose base is misaligned (m != 0) and costs a lane-mask
    select against a sublane-rolled copy of the tile in the kernel.

    aligned=True: every chunk base is a multiple of s (m == 0 for all
    chunks) — slots with no live offset just carry zero weight rows. More
    chunk matmuls (+40% stage3 / +23% stage4), but the kernel needs NO
    rotate and NO per-chunk select: every gather is a static sublane slice
    feeding the MXU directly. Measured and REJECTED as the default
    (tools/exp_fused_stage.py; docs/PERFORMANCE.md fused-stage table): the
    kernel is MXU-bound, not VPU-bound, so the extra dead-row matmuls cost
    more than the rotate/select traffic they remove — aligned LOSES at
    stage3 (10.25 vs 8.43 ms) and ties at stage4 (7.74 vs 7.82 ms).
    Greedy FLOP-minimal chunking stays the default; the aligned plan is
    kept for measurement (and as the fallback shape family where a future
    topology is elementwise-bound).

    Returns dict with:
      chunks: list of (q, m) — chunk base offset o = q*s + m
      w_assign: per chunk, list of (tap_i, out_slot_j, chunk_slot_t)
      A: packed rows consumed on the left (output extent shrink)
      B: packed rows consumed on the right
    """
    c = (k - 1) // 2
    taps = [(i, (i - c) * d) for i in range(k)]
    offsets = sorted({e + j for _, e in taps for j in range(s)})
    if aligned:
        live = set(offsets)
        bases = sorted({(o // s) * s for o in offsets})
        bases = [b for b in bases if any(b + t in live for t in range(s))]
    else:
        # maximal contiguous runs (each run has length >= s: every tap
        # spans s consecutive offsets)
        runs = []
        run = [offsets[0]]
        for o in offsets[1:]:
            if o == run[-1] + 1:
                run.append(o)
            else:
                runs.append(run)
                run = [o]
        runs.append(run)
        bases = []
        for run in runs:
            for t in range(len(run) // s):
                bases.append(run[0] + t * s)
            if len(run) % s:
                bases.append(run[-1] - s + 1)
    place = {}
    for ci, base in enumerate(bases):
        for t in range(s):
            place.setdefault(base + t, (ci, t))
    w_assign = [[] for _ in bases]
    for i, e in taps:
        for j in range(s):
            ci, t = place[e + j]
            w_assign[ci].append((i, j, t))
    chunks = [(base // s, base - (base // s) * s) for base in bases]
    a_need = max(0, -min(q for q, _ in chunks))
    b_need = max(0, max(q + (1 if m else 0) for q, m in chunks))
    return {"chunks": chunks, "w_assign": w_assign, "A": a_need, "B": b_need}


def build_stage_plan(
    s: int,
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    aligned: bool = False,
) -> dict:
    """Full-stage plan: per resblock, per residual unit, (conv1, conv2)."""
    blocks = []
    for k, dils in zip(kernel_sizes, dilation_sizes):
        units = [
            (_conv_plan(k, d, s, aligned), _conv_plan(k, 1, s, aligned))
            for d in dils
        ]
        blocks.append(units)
    halos = []
    for units in blocks:
        hl = sum(cp["A"] for c1, c2 in units for cp in (c1, c2))
        hr = sum(cp["B"] for c1, c2 in units for cp in (c1, c2))
        halos.append((hl, hr))
    n_chunks = sum(
        len(cp["chunks"]) for units in blocks for c1, c2 in units
        for cp in (c1, c2)
    )
    return {
        "blocks": blocks,
        "halos": halos,
        "halo_l": max(h for h, _ in halos),
        "halo_r": max(h for _, h in halos),
        "n_chunks": n_chunks,
        "n_convs": 2 * sum(len(u) for u in blocks),
    }


def _plan_key(s, kernel_sizes, dilation_sizes, aligned=False):
    return (s, tuple(kernel_sizes), tuple(tuple(d) for d in dilation_sizes),
            aligned)


@functools.lru_cache(maxsize=32)
def _cached_plan(key):
    s, ks, ds, aligned = key
    return build_stage_plan(s, ks, ds, aligned)


# ---------------------------------------------------------------------------
# Weight packing (trace-time, jnp — tiny vs the conv work)
# ---------------------------------------------------------------------------

def pack_stage_weights(plan: dict, weights, s: int, c: int):
    """weights: per resblock, per unit, (w1_hio (K,C,C), b1 (C,), w2, b2).
    Returns (W_all (n_chunks, s*C, s*C), B_all (n_convs, s*C))."""
    n_lanes = s * c
    w_list, b_list = [], []
    for units_plan, units_w in zip(plan["blocks"], weights):
        for (cp1, cp2), (w1, b1, w2, b2) in zip(units_plan, units_w):
            for cp, w, b in ((cp1, w1, b1), (cp2, w2, b2)):
                for (_, m), assign in zip(cp["chunks"], cp["w_assign"]):
                    wm = jnp.zeros((n_lanes, n_lanes), w.dtype)
                    for (i, j, t) in assign:
                        wm = jax.lax.dynamic_update_slice(
                            wm, w[i], (t * c, j * c)
                        )
                    if m:
                        # fold the chunk's lane-block rotation into the
                        # weight: in-kernel lanes stay in place, lane block
                        # u maps to chunk slot (u - m) mod s
                        wm = jnp.roll(wm, m * c, axis=0)
                    w_list.append(wm)
                b_list.append(jnp.tile(b, s))
    return jnp.stack(w_list), jnp.stack(b_list)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _gather_chunk(a, a_next, st: int, ext: int, m: int, c: int):
    """Chunk of s consecutive flat offsets from packed tile `a`: lane block
    u reads packed row st+l (u >= m) or st+1+l (u < m, via `a_next`, the
    rows-shifted-by-one copy). The lane-block rotation that puts offsets in
    ascending chunk-slot order is folded into the chunk weight."""
    if m == 0:
        return a[st : st + ext, :]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (ext, a.shape[1]), 1)
    return jnp.where(
        lanes >= m * c, a[st : st + ext, :], a_next[st : st + ext, :]
    )


def _mrf_stage_kernel(
    x_ref, w_ref, b_ref, o_ref, *,
    plan: dict, block: int, tp_real: int, s: int, c: int,
):
    ti = pl.program_id(1)
    halo_l, halo_r = plan["halo_l"], plan["halo_r"]
    x0 = x_ref[:]
    dtype = x0.dtype
    n_lanes = s * c
    # Zero-pad conv semantics: rows outside the real array enter every conv
    # as zeros (haloed tiles cross the array edges; intermediates carry
    # bias-polluted values there). The row-validity mask is computed ONCE
    # for the full haloed tile; each conv input slices it — one select per
    # conv instead of an iota+compare+and chain.
    rows = ti * block - halo_l + jax.lax.broadcasted_iota(
        jnp.int32, (x0.shape[0], 1), 0
    )
    valid_full = (rows >= 0) & (rows < tp_real)

    def masked_lrelu(v, off, ext):
        a = jnp.maximum(v, v * LRELU_SLOPE)
        return jnp.where(
            valid_full[off : off + ext], a, jnp.zeros_like(a)
        )

    def conv(a, off, ext, cp, wi, bi):
        ext_out = ext - cp["A"] - cp["B"]
        if any(m for _, m in cp["chunks"]):
            # rows-shifted-by-one copy (circular; the wrapped row is never
            # selected — every chunk's st+1+ext stays within the extent).
            # Mosaic only implements sublane rotate for 32-bit data
            # (tpu.dynamic_rotate: "not implemented: Rotate with non-32-bit
            # data" on bf16), so narrow dtypes round-trip through f32 for
            # the rotate — a once-per-conv VPU copy, negligible next to the
            # chunk matmuls.
            if a.dtype.itemsize == 4:
                a_next = pltpu.roll(a, ext - 1, axis=0)
            else:
                a_next = pltpu.roll(
                    a.astype(jnp.float32), ext - 1, axis=0
                ).astype(a.dtype)
        else:
            a_next = a
        acc = jnp.zeros((ext_out, n_lanes), jnp.float32)
        for ci, (q, m) in enumerate(cp["chunks"]):
            g = _gather_chunk(a, a_next, cp["A"] + q, ext_out, m, c)
            acc = acc + jnp.dot(
                g, w_ref[wi + ci], preferred_element_type=jnp.float32
            )
        y = acc + b_ref[bi][None, :].astype(jnp.float32)
        return y.astype(dtype), off + cp["A"], ext_out

    acc_out = jnp.zeros((block, n_lanes), jnp.float32)
    wi = bi = 0
    for units, (hl_b, hr_b) in zip(plan["blocks"], plan["halos"]):
        off = halo_l - hl_b
        ext = block + hl_b + hr_b
        xk = x0[off : off + ext, :]
        for cp1, cp2 in units:
            a = masked_lrelu(xk, off, ext)
            y1, off1, ext1 = conv(a, off, ext, cp1, wi, bi)
            wi += len(cp1["chunks"]); bi += 1
            a2 = masked_lrelu(y1, off1, ext1)
            y2, off2, ext2 = conv(a2, off1, ext1, cp2, wi, bi)
            wi += len(cp2["chunks"]); bi += 1
            lo = off2 - off
            xk = xk[lo : lo + ext2, :] + y2
            off, ext = off2, ext2
        # each chain lands exactly on the tile center
        acc_out = acc_out + xk.astype(jnp.float32)
    o_ref[:] = (acc_out / len(plan["blocks"])).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("s", "kernel_sizes", "dilation_sizes", "block_rows",
                     "interpret", "aligned"),
)
def fused_mrf_stage(
    xp: jnp.ndarray,  # (B, Tp, s*C) space-to-depth packed stage activation
    weights,          # per resblock: per unit: (w1_hio, b1, w2_hio, b2)
    s: int,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    block_rows: int = 512,
    interpret: bool = False,
    aligned: bool = False,
) -> jnp.ndarray:
    b, tp, n_lanes = xp.shape
    c = n_lanes // s
    plan = _cached_plan(_plan_key(s, kernel_sizes, dilation_sizes, aligned))
    halo_l, halo_r = plan["halo_l"], plan["halo_r"]

    block = min(block_rows, max(8, tp))
    n_tiles = -(-tp // block)
    tail = n_tiles * block - tp
    xpad = jnp.pad(xp, ((0, 0), (halo_l, tail + halo_r), (0, 0)))
    r0 = block + halo_l + halo_r
    # overlapping haloed tiles, materialized (the 2*halo/block duplication
    # is a few % of x; Pallas Blocked specs then auto-pipeline the DMA)
    tiles = jnp.stack(
        [xpad[:, t * block : t * block + r0] for t in range(n_tiles)], axis=1
    )

    w_all, b_all = pack_stage_weights(plan, weights, s, c)
    w_all = w_all.astype(xp.dtype)
    b_all = b_all.astype(jnp.float32)
    n_chunks, n_convs = plan["n_chunks"], plan["n_convs"]

    out = pl.pallas_call(
        functools.partial(
            _mrf_stage_kernel, plan=plan, block=block, tp_real=tp, s=s, c=c,
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((None, None, r0, n_lanes),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, n_lanes, n_lanes),
                         lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, n_lanes), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block, n_lanes),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * block, n_lanes),
                                       xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_tiles * block * n_lanes * n_lanes * n_chunks,
            bytes_accessed=2 * (2 * b * tp * n_lanes
                                + n_chunks * n_lanes * n_lanes),
            transcendentals=0,
        ),
        interpret=interpret,
    )(tiles, w_all, b_all)
    return out[:, :tp, :]


# ---------------------------------------------------------------------------
# Plain-XLA reference (tests / acceptance baseline)
# ---------------------------------------------------------------------------

def mrf_stage_reference(x, weights, kernel_sizes, dilation_sizes):
    """Stock lowering of the full MRF block over UNPACKED (B, T, C) input:
    matches ResBlock1 + the /3 merge in models/hifigan.py exactly."""
    def lrelu(v):
        return jnp.maximum(v, v * LRELU_SLOPE)

    def conv(a, w, bias, dil):
        k = w.shape[0]
        pad = (k - 1) // 2 * dil
        y = jax.lax.conv_general_dilated(
            a, w.astype(a.dtype), (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        ).astype(a.dtype)
        return y + bias.astype(a.dtype)

    acc = None
    for (k, dils), units in zip(
        zip(kernel_sizes, dilation_sizes), weights
    ):
        xk = x
        for d, (w1, b1, w2, b2) in zip(dils, units):
            xt = conv(lrelu(xk), w1, b1, d)
            xt = conv(lrelu(xt), w2, b2, 1)
            xk = xk + xt
        acc = xk if acc is None else acc + xk
    return acc / len(kernel_sizes)
