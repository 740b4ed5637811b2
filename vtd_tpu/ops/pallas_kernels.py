"""Pallas TPU kernels for the postprocess hot path.

``neighbor_min_sweeps``: the connected-components inner loop — repeated
8-neighbor minimum propagation over the label image. The XLA version
writes the full label map back to HBM after every sweep; a 320x320
int32 map is only 400 KB, so the Pallas kernel keeps labels + binary
mask resident in VMEM and runs all ``iters`` sweeps back-to-back,
cutting HBM traffic by ~iters x. Pointer-jumping (global gathers)
stays in XLA between kernel invocations.

Falls back to interpreter mode off-TPU (the CPU test mesh).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False


def _shift_min(masked: jnp.ndarray, big) -> jnp.ndarray:
    """min over the 8-neighborhood (and self) with BIG border padding,
    built from static slices + concats (VPU-friendly, no gathers)."""
    h, w = masked.shape
    col = jnp.full((h, 1), big, masked.dtype)
    left = jnp.concatenate([masked[:, 1:], col], axis=1)
    right = jnp.concatenate([col, masked[:, :-1]], axis=1)
    horiz = jnp.minimum(jnp.minimum(left, right), masked)
    row = jnp.full((1, w), big, masked.dtype)
    up = jnp.concatenate([horiz[1:, :], row], axis=0)
    down = jnp.concatenate([row, horiz[:-1, :]], axis=0)
    return jnp.minimum(jnp.minimum(up, down), horiz)


def _sweep_kernel(binary_ref, labels_ref, out_ref, *, iters: int):
    big = jnp.int32(2 ** 30)
    binary = binary_ref[:]
    lbl = labels_ref[:]
    for _ in range(iters):
        masked = jnp.where(binary, lbl, big)
        m = _shift_min(masked, big)
        lbl = jnp.where(binary, m, lbl)
    out_ref[:] = lbl


@partial(jax.jit, static_argnames=("iters", "interpret"))
def neighbor_min_sweeps(
    binary: jnp.ndarray,
    labels2d: jnp.ndarray,
    iters: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """binary [H, W] bool, labels2d [H, W] int32 -> labels after
    ``iters`` 8-neighbor min sweeps (masked to foreground)."""
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["in_specs"] = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        kwargs["out_specs"] = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_sweep_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct(labels2d.shape, labels2d.dtype),
        interpret=interpret,
        **kwargs,
    )(binary, labels2d)


def _seg_round_kernel(binary_ref, labels_ref, out_ref, *, diag: bool):
    """One segmented-propagation round, fully VMEM-resident.

    min8 seed (8-neighborhood minimum, so corner-only adjacency
    propagates) followed by reach-doubling along rows then columns:
    r_d[i] marks d consecutive foreground cells ending at i and L_d[i]
    the label minimum over that window, with
        L_2d[i] = r_d[i] ? min(L_d[i], L_d[i-d]) : L_d[i]
        r_2d[i] = r_d[i] & r_d[i-d]
    so one log2(W)-step ladder propagates labels across an entire
    foreground run. All steps are rolls + elementwise VPU ops on the
    VMEM-resident map — no gathers, no scans, no HBM round trips
    (the XLA associative_scan formulation of the same recurrence costs
    a full-array relayout copy per level).
    """
    big = jnp.int32(2 ** 30)
    fg = binary_ref[:]
    h, w = fg.shape
    lbl = labels_ref[:]

    def min8(m):
        masked = jnp.where(fg, m, big)
        out = _shift_min(masked, big)
        return jnp.where(fg, jnp.minimum(m, out), m)

    def axis_pass(lbl, axis):
        n = w if axis == 1 else h
        idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), axis)
        seed = jnp.where(fg, lbl, big)
        fg_i = fg.astype(jnp.int32)  # mosaic can't rotate i1 vectors
        for reverse in (False, True):
            lf, rf = seed, fg_i
            d = 1
            while d < n:
                if reverse:
                    valid = idx < n - d
                    sh = n - d  # circular: roll by n-d == roll by -d
                else:
                    valid = idx >= d
                    sh = d
                lsh = jnp.where(
                    valid, pltpu.roll(lf, sh, axis=axis), big
                )
                rsh = jnp.where(
                    valid, pltpu.roll(rf, sh, axis=axis), 0
                )
                lf = jnp.where(rf > 0, jnp.minimum(lf, lsh), lf)
                rf = rf * rsh
                d *= 2
            lbl = jnp.where(fg, jnp.minimum(lbl, lf), lbl)
        return lbl

    def diag_pass(lbl):
        # Segmented ladders along both diagonals: a thin 45-degree
        # stroke is a contiguous diagonal run of cells, so one ladder
        # merges it end-to-end where axis passes advance only one
        # short H/V run per round (the 500x14px -45-degree banner
        # fragmented at IoU 0.54 without this).
        ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        fg_i = fg.astype(jnp.int32)
        for sr, sc in ((1, 1), (-1, -1), (1, -1), (-1, 1)):
            lf, rf = jnp.where(fg, lbl, big), fg_i
            d = 1
            while d < min(h, w):
                valid = (
                    (ri >= d if sr > 0 else ri < h - d)
                    & (ci >= d if sc > 0 else ci < w - d)
                )
                rsh_r = d if sr > 0 else h - d
                rsh_c = d if sc > 0 else w - d

                def dshift(x, fill):
                    y = pltpu.roll(x, rsh_r, axis=0)
                    y = pltpu.roll(y, rsh_c, axis=1)
                    return jnp.where(valid, y, fill)

                lsh = dshift(lf, big)
                rsh = dshift(rf, 0)
                lf = jnp.where(rf > 0, jnp.minimum(lf, lsh), lf)
                rf = rf * rsh
                d *= 2
            lbl = jnp.where(fg, jnp.minimum(lbl, lf), lbl)
        return lbl

    lbl = min8(lbl)
    lbl = axis_pass(lbl, 1)
    lbl = min8(lbl)
    lbl = axis_pass(lbl, 0)
    if diag:
        lbl = diag_pass(lbl)
    out_ref[:] = lbl


@partial(jax.jit, static_argnames=("diag", "interpret"))
def segmented_cc_round(
    binary: jnp.ndarray,
    labels2d: jnp.ndarray,
    diag: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """binary [H, W] bool, labels2d [H, W] int32 -> labels after one
    full segmented-propagation round (TPU, or interpret=True for CPU
    tests; callers pointer-jump between rounds in XLA). ``diag`` adds
    ladders along both diagonals for thin rotated strokes."""
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["in_specs"] = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        kwargs["out_specs"] = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_seg_round_kernel, diag=diag),
        out_shape=jax.ShapeDtypeStruct(labels2d.shape, labels2d.dtype),
        interpret=interpret,
        **kwargs,
    )(binary, labels2d)


def pallas_supported() -> bool:
    """True when running on a real TPU backend (mosaic compile path)."""
    try:
        return jax.default_backend() in ("tpu", "axon") and _HAVE_PLTPU
    except Exception:  # pragma: no cover
        return False
