"""On-device DB probability-map postprocessing.

Replaces the reference's CPU OpenCV chain — binarize ->
``cv2.findContours`` -> ``cv2.minAreaRect`` -> ``cv2.boxPoints`` ->
area/size filters -> rescale (reference
``app/ml/models/text_detector.py:143-178``) — with a fully vectorized,
static-shape XLA program that runs on the TPU right after the detector
forward pass, so probability maps never cross back to the host.

TPU-first design notes (what makes this fast on the VPU/HBM):
  * All component work happens on a ``work_stride``-downsampled binary
    map (default 2x: 320x320 for a 640 map). The DB head upsamples from
    stride-4 features, so the full-res map carries no extra component
    geometry; this cuts every gather by 4x. Confidences still integrate
    the full-res probability map.
  * **No scatters OR gathers in the hot path.** Component selection
    (areas + top-K) and boundary grouping share ONE key-value sort of
    the n strided cells (key packs label + has-boundary); per-component
    full-res geometry rides a compact [K, M] boundary-pixel table
    (min/max projections are attained on 4-boundary pixels for every
    direction), so the caliper sweep costs O(A*K*M) instead of
    O(A*K*N) — M=1024 vs N≈400k.
  * Connected components: segmented reach-doubling ladders (whole
    foreground runs merge per scan; VMEM-resident Pallas kernel on
    TPU, associative_scan fallback elsewhere) with diagonal ladders
    for thin rotated strokes. The pointer jump — a [H*W] random
    gather, 6.5 ms/batch vs 0.3 ms for the propagation kernel — only
    exists in the opt-in exact mode (see connected_components_scan).
  * Min-area rotated rect via rotating calipers: coarse angle sweep in
    [0, 90°) then 3-stage per-detection refinement (~0.03° resolution;
    angle error costs IoU proportional to box aspect ratio), extents
    measured to pixel centers exactly like ``cv2.minAreaRect``.

Everything is fixed-shape: outputs are [K] arrays with a ``valid`` mask.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

_NEIGHBOR_SHIFTS = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def _segmented_min_scan(
    vals: jnp.ndarray, fg: jnp.ndarray, axis: int, reverse: bool
) -> jnp.ndarray:
    """Per-run minimum along ``axis``: background cells reset the run.

    Classic segmented-scan monoid (v,f)+(w,g) = (g ? w : min(v,w), f|g);
    log-depth on TPU via associative_scan. Measured alternatives that
    LOST on TPU v5e (device-timeline profiling, tools/profile_device.py,
    [8,320,320] maps): packing (run_id, value) into int32 keys driven by
    native lax.cummax/cumsum (~1.7x slower in the full program), and
    Hillis-Steele shift-doubling with static slice+concat steps (~2x
    slower — every step is a full-array relayout copy). XLA's odd/even
    associative_scan recursion wins because its levels fuse.
    """
    big = jnp.int32(2 ** 30)

    def comb(a, b):
        am, ar = a
        bm, br = b
        return jnp.where(br, bm, jnp.minimum(am, bm)), ar | br

    m, _ = jax.lax.associative_scan(
        comb, (jnp.where(fg, vals, big), ~fg), axis=axis, reverse=reverse
    )
    return m


def connected_components_scan(
    binary: jnp.ndarray, min_rounds: int = 3, max_rounds: int = 3
) -> jnp.ndarray:
    """8-connected component labels via segmented run scans.

    Where the sweep kernel moves labels one pixel per iteration, a
    segmented cummin moves them across an entire foreground RUN in one
    log-depth scan, so each H+V round covers arbitrary row/column spans
    and the round count only needs to cover the zigzag depth of a
    component (2-3 for text-like blobs). 8-connectivity comes from
    seeding each scan with the full 8-neighborhood minimum, so corner-
    only adjacency propagates even across background gaps. A
    pointer jump (``label <- label[label]``) after each round gives the
    usual logarithmic path compression for snake-shaped components.

    ``min_rounds`` are unrolled unconditionally; when
    ``max_rounds > min_rounds`` further rounds run under a
    lax.while_loop until a fixed point. Stability under a full round
    implies stability under single-step 8-neighbor min propagation,
    which forces labels constant across every component edge — i.e.
    the exact labeling (validated vs cv2.connectedComponents on
    spiral/staircase/noise maps in tests/test_db_postprocess.py with
    ``max_rounds=32``). The production default is 3 unrolled rounds +
    a stability-seeded repair loop (see inline comment): converged
    batches skip it entirely, so it costs ~0.2 ms/batch in the common
    case while guaranteeing the exact labeling for adversarial shapes
    (thin rotated banners fragment under any fixed round count).

    Same contract as :func:`connected_components`.
    """
    h, w = binary.shape
    hw = h * w
    big = jnp.int32(2 ** 30)
    fg = binary
    labels = jnp.arange(hw, dtype=jnp.int32).reshape(h, w)

    def seg_min(vals, axis, reverse):
        return _segmented_min_scan(vals, fg, axis, reverse)

    col = jnp.full((h, 1), big, jnp.int32)
    row = jnp.full((1, w), big, jnp.int32)

    def min8(m):
        # min over the full 8-neighborhood + self (separable shifts).
        # The seed for each scan must include DIAGONAL neighbors: a
        # 3-wide cross-axis min misses corner-only adjacency when the
        # in-between cell is background (the staircase test case).
        lt = jnp.concatenate([m[:, 1:], col], axis=1)
        rt = jnp.concatenate([col, m[:, :-1]], axis=1)
        horiz = jnp.minimum(jnp.minimum(lt, rt), m)
        up = jnp.concatenate([horiz[1:], row], axis=0)
        dn = jnp.concatenate([row, horiz[:-1]], axis=0)
        return jnp.minimum(jnp.minimum(up, dn), horiz)

    from .pallas_kernels import pallas_supported, segmented_cc_round

    use_pallas = pallas_supported()

    def xla_diag_ladder(lbl):
        # Diagonal segmented doubling (XLA fallback of the kernel's
        # diag_pass): thin rotated strokes are contiguous DIAGONAL cell
        # runs, which H/V passes only cross one short run per round.
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
                lsh = jnp.where(
                    valid, jnp.roll(lf, (sr * d, sc * d), (0, 1)), big
                )
                rsh = jnp.where(
                    valid, jnp.roll(rf, (sr * d, sc * d), (0, 1)), 0
                )
                lf = jnp.where(rf > 0, jnp.minimum(lf, lsh), lf)
                rf = rf * rsh
                d *= 2
            lbl = jnp.where(fg, jnp.minimum(lbl, lf), lbl)
        return lbl

    def one_round(lbl, diag=False, jump=True):
        if use_pallas:
            # same recurrence, VMEM-resident (ops/pallas_kernels.py)
            lbl = segmented_cc_round(fg, lbl, diag=diag)
        else:
            masked = jnp.where(fg, lbl, big)
            pre = min8(masked)
            f = seg_min(pre, axis=1, reverse=False)
            b = seg_min(pre, axis=1, reverse=True)
            lbl = jnp.where(
                fg, jnp.minimum(lbl, jnp.minimum(f, b)), lbl
            )
            masked = jnp.where(fg, lbl, big)
            pre = min8(masked)
            f = seg_min(pre, axis=0, reverse=False)
            b = seg_min(pre, axis=0, reverse=True)
            lbl = jnp.where(
                fg, jnp.minimum(lbl, jnp.minimum(f, b)), lbl
            )
            if diag:
                lbl = xla_diag_ladder(lbl)
        if not jump:
            return lbl
        flat = lbl.reshape(-1)
        return flat[flat].reshape(h, w)  # pointer jump

    lbl = labels
    for i in range(min_rounds):  # unrolled fast path, no change checks
        # Diagonal ladders ride the middle round: by then H/V passes
        # have consolidated per-run fragments, and one diagonal ladder
        # merges thin rotated strokes end-to-end. The fast path never
        # pointer-jumps: a [H*W] random gather costs 6.5 ms/batch on TPU
        # vs 0.3 ms for a whole propagation round, and the scans/ladders
        # propagate label VALUES transitively, so grouping only needs
        # per-component label consistency, not the canonical minimum.
        lbl = one_round(lbl, diag=(i == 1), jump=False)

    if max_rounds > min_rounds:
        # Convergence-checked repair loop. The unrolled fast path covers
        # text-like blobs (zigzag depth <= min_rounds), but a long thin
        # banner rotated to an angle where neither row, column, nor
        # 45-degree cell runs are long fragments into many labels — an
        # adversarial sweep (tests/test_db_postprocess.py banner cases)
        # measured up to 38 boxes where cv2 finds 1. The repair loop
        # runs change-checked diag+jump rounds until the labeling is
        # stable. The crucial part is the SEED: stability under one
        # 8-neighbor min step (min8 fixed point <=> labels constant
        # across every component edge <=> exact labeling) is evaluated
        # on the fast-path result, so a converged batch — the common
        # case by far — pays one fused VPU check (~0.2 ms/batch) and
        # ZERO repair rounds. (The earlier exact mode seeded
        # changed=True, forcing every batch through one extra
        # round + [H*W]-gather jump — the 91 -> 59 fps regression that
        # kept it opt-in.) Only pathological frames pay repair rounds,
        # and they are exactly the frames the fixed schedule mislabels.
        def stable(cur):
            masked = jnp.where(fg, cur, big)
            return jnp.all(jnp.where(fg, min8(masked) >= cur, True))

        def cond(carry):
            i, _, changed = carry
            return changed & (i < max_rounds)

        def body(carry):
            i, cur, _ = carry
            nxt = one_round(cur, diag=True)
            return i + 1, nxt, jnp.any(nxt != cur)

        _, lbl, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(min_rounds), lbl, ~stable(lbl))
        )
    return lbl.reshape(-1)


def connected_components(
    binary: jnp.ndarray,
    dense_iters: int = 8,
    jump_rounds: int = 4,
    backend: str = "auto",
    exact: bool = False,
) -> jnp.ndarray:
    """8-connected component labels for a [H, W] bool map.

    Returns flat int32 labels [H*W]; each foreground pixel holds the min
    flat index of its component; background pixels hold their own index.

    Schedule: ``jump_rounds`` rounds of (``dense_iters`` 8-neighbor min
    sweeps + one pointer jump). Dense sweeps are pure VPU shifts (cheap);
    pointer jumps (``label <- label[label]``) are 1-D gathers (the
    expensive op on TPU), so the schedule uses many sweeps per jump.
    Label reach grows ~2x per round after the sweeps, so (8, 4) covers
    components up to ~350 px across — a full-width 320-strided map.
    """
    if backend in ("auto", "scan"):
        # Segmented-scan propagation beats iterated sweeps on every
        # backend (run-length reach per op instead of one pixel).
        # 3 unrolled rounds converge text-like blobs; the repair loop
        # (seeded by a stability check, so it costs one fused VPU
        # compare when already converged) covers adversarial shapes —
        # thin rotated banners fragment under any fixed schedule.
        # ``exact`` only raises the repair-round budget (32 covers
        # spiral/noise worst cases; 16 is already ~2x any observed
        # text/banner need).
        return connected_components_scan(
            binary, max_rounds=32 if exact else 16
        )

    h, w = binary.shape
    hw = h * w
    big = jnp.int32(hw)
    labels = jnp.arange(hw, dtype=jnp.int32)  # self-labels

    from .pallas_kernels import neighbor_min_sweeps, pallas_supported

    use_pallas = pallas_supported() if backend == "pallas-auto" else (
        backend == "pallas"
    )

    def neighbor_min(lbl_flat):
        l2d = jnp.where(binary, lbl_flat.reshape(h, w), big)
        padded = jnp.pad(l2d, 1, constant_values=hw)
        m = l2d
        for dy, dx in _NEIGHBOR_SHIFTS:
            m = jnp.minimum(m, padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w])
        out = jnp.where(binary, m, lbl_flat.reshape(h, w))
        return out.reshape(-1)

    def round_body(_, lbl):
        if use_pallas:
            # all dense sweeps stay in VMEM (ops/pallas_kernels.py)
            lbl = neighbor_min_sweeps(
                binary, lbl.reshape(h, w), iters=dense_iters
            ).reshape(-1)
        else:
            lbl = jax.lax.fori_loop(
                0, dense_iters, lambda i, l: neighbor_min(l), lbl
            )
        return lbl[lbl]  # pointer jump (path compression)

    return jax.lax.fori_loop(0, jump_rounds, round_body, labels)


@partial(
    jax.jit,
    static_argnames=(
        "max_dets", "min_area", "max_box_frac", "num_angles",
        "refine_steps", "cc_iters", "work_stride", "stage", "cc_exact",
        "m_cells",
    ),
)
def db_postprocess(
    prob_map: jnp.ndarray,
    bin_thresh: jnp.ndarray | float = 0.5,
    *,
    max_dets: int = 64,
    min_area: float = 100.0,
    max_box_frac: float = 0.95,
    num_angles: int = 45,
    refine_steps: int = 9,
    cc_iters: int = 8,
    work_stride: int = 2,
    stage: str = "full",
    cc_exact: bool = False,
    m_cells: int | None = None,
) -> Dict[str, jnp.ndarray]:
    """[H, W] float prob map -> fixed-size detection arrays.

    Returns dict with (all in full-resolution map coordinates, e.g.
    640x640):
      boxes:    [K, 4] f32 AABB (x1, y1, x2, y2), clamped to map bounds
      polygons: [K, 4, 2] f32 rotated min-area rect corners
      scores:   [K] f32 mean probability inside the AABB
      areas:    [K] f32 component pixel areas (full-res px^2)
      valid:    [K] bool
    """
    h, w = prob_map.shape
    k = max_dets
    st = work_stride

    binary_full = prob_map > bin_thresh
    # stride-reduce with max-pool semantics (any hit survives)
    hs, ws = h // st, w // st
    binary = binary_full[: hs * st, : ws * st].reshape(hs, st, ws, st).any(
        axis=(1, 3)
    )
    n = hs * ws

    labels = connected_components(
        binary, dense_iters=cc_iters, jump_rounds=4, exact=cc_exact
    )
    if stage == "cc":  # profiling cut point (tools/profile_device.py)
        return {"labels": labels}

    # ---- full-resolution boundary, folded to per-cell pixel bits -------
    # For ANY projection direction, a component's min/max projection is
    # attained on a 4-boundary pixel (an interior pixel always has a
    # neighbor with a strictly larger projection along one axis sign),
    # so the caliper sweeps only need boundary pixels — at native
    # resolution (the stride-2 cell quantization capped box parity at
    # IoU≈0.93; full-res boundary restores ≥0.95). Boundary pixels fold
    # into their strided CC cell: bnd4[cell, j] is the boundary bit of
    # the cell's j-th pixel, so the grouping below runs entirely on the
    # n strided cells — never on the nf full-res pixels.
    hf, wf = hs * st, ws * st
    bin_f = binary_full[:hf, :wf]
    padded_b = jnp.pad(bin_f, 1)
    interior = (
        padded_b[:-2, 1:-1] & padded_b[2:, 1:-1]
        & padded_b[1:-1, :-2] & padded_b[1:-1, 2:]
    )
    bnd4 = (
        (bin_f & ~interior)
        .reshape(hs, st, ws, st)
        .transpose(0, 2, 1, 3)
        .reshape(n, st * st)
    )
    cell_has_b = bnd4.any(axis=1)

    # ---- ONE key-value sort serves both area top-K and grouping --------
    # Key = label*2 + (no-boundary bit): cells sort label-major with each
    # component's boundary-carrying cells first, and the cell index rides
    # along as the sort payload. This replaces the round-1 full-res
    # argsort of nf pixels (the measured 39 ms/batch hot spot) with one
    # n-cell sort. The cell's boundary-pixel bits ride the SAME payload
    # word (idx * 2^(st*st) + bits) so the exact-extents scan after the
    # angle refinement can read per-pixel boundary membership in sorted
    # order arithmetically — a separate bnd4[cell_sorted] row gather
    # costs ~0.8 ms/frame.
    stsq = st * st
    idx = jnp.arange(n, dtype=jnp.int32)
    key = labels * 2 + (~cell_has_b).astype(jnp.int32)
    jj = jnp.arange(stsq, dtype=jnp.int32)
    exact_extents = n * (1 << stsq) < 2 ** 31  # payload packing fits i32
    if exact_extents:
        bnd_bits = jnp.sum(
            bnd4.astype(jnp.int32) * (1 << jj)[None, :], axis=1
        )
        payload = idx * (1 << stsq) + bnd_bits
    else:
        payload = idx
    ls_key, payload_sorted = jax.lax.sort((key, payload), num_keys=1)
    cell_sorted = (
        payload_sorted // (1 << stsq) if exact_extents else payload_sorted
    )
    ls = ls_key // 2  # label-major order preserved

    # component areas + top-K roots via segmented run-length scans
    # (dense cumulative ops; no scatters)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), ls[1:] != ls[:-1]]
    )
    # next run start after each position (exclusive), via reverse cummin
    nxt_start = jnp.roll(jnp.where(is_start, idx, n), -1).at[-1].set(n)
    nxt = jax.lax.cummin(nxt_start, reverse=True)
    run_len = jnp.where(is_start, nxt - idx, 0)
    # Only runs of length >1 count: background cells are singleton runs
    # in this sort order, and length is the only signal separating them
    # from a genuine single-cell component. Consequence: a component
    # occupying ONE strided cell (area <= st*st px^2) is never detected
    # regardless of min_area — far below the reference's 100 px^2 area
    # and 10 px side filters, so unreachable at parity settings, but a
    # documented floor for custom min_area < 2*st*st.
    scores_for_topk = jnp.where(run_len > 1, run_len, 0)
    top_lens, top_pos = jax.lax.top_k(scores_for_topk, k)
    top_roots = ls[top_pos]
    areas = top_lens.astype(jnp.float32) * (st * st)
    valid = areas >= min_area

    # Filler top-K slots (fewer components than K) carry arbitrary
    # in-run labels that can collide with a real root — point them at
    # the sentinel label so they never alias a real component.
    safe_roots = jnp.where(valid, top_roots, n)
    if stage == "topk":  # profiling cut point
        return {"roots": safe_roots, "areas": areas, "valid": valid}

    # ---- per-component boundary cells -> full-res pixel coordinates ----
    # Default sizes the pixel table at 1024 entries regardless of
    # stride: 256 cells at stride 2 = up to 1024 boundary pixels exact
    # per component; larger boundaries subsample uniformly (a
    # full-width 580px banner has ~330 boundary cells -> ~1.3:1
    # subsample, parity unaffected). 512 cells measured +2 ms/batch of
    # gathers for no IoU gain.
    if m_cells is None:
        m_cells = max(1024 // (st * st), 32)
    starts = jnp.searchsorted(
        ls_key, safe_roots * 2, side="left"
    ).astype(jnp.int32)
    ends = jnp.searchsorted(
        ls_key, safe_roots * 2 + 1, side="left"
    ).astype(jnp.int32)
    blen = jnp.maximum(ends - starts, 1)
    mm = jnp.arange(m_cells, dtype=jnp.int32)
    # exact when the boundary fits in m_cells; uniform subsample beyond
    sel = jnp.where(
        (blen > m_cells)[:, None],
        (mm[None, :] * blen[:, None]) // m_cells,
        jnp.minimum(mm[None, :], blen[:, None] - 1),
    )
    cells = cell_sorted[jnp.clip(starts[:, None] + sel, 0, n - 1)]  # [K,M]
    xs_c = (
        (cells % ws)[:, :, None] * st + (jj % st)[None, None, :]
    ).astype(jnp.float32).reshape(k, m_cells * stsq)
    ys_c = (
        (cells // ws)[:, :, None] * st + (jj // st)[None, None, :]
    ).astype(jnp.float32).reshape(k, m_cells * stsq)
    cell_mask = mm[None, :] < blen[:, None]
    pmask = (cell_mask[:, :, None] & bnd4[cells]).reshape(
        k, m_cells * stsq
    )

    if stage == "boundary":  # profiling cut point
        return {"xs": xs_c, "ys": ys_c, "pmask": pmask, "valid": valid}

    def _cal_minmax(vals):  # [K, M] masked min+max
        vmin = jnp.min(jnp.where(pmask, vals, jnp.inf), axis=1)
        vmax = jnp.max(jnp.where(pmask, vals, -jnp.inf), axis=1)
        return vmin, vmax

    # ---- coarse angle search (rotating calipers on compact boundary) ---
    def coarse_body(j, carry):
        best_area, best_theta = carry
        theta = (jnp.pi / 2) * j / num_angles
        c, s = jnp.cos(theta), jnp.sin(theta)
        umin, umax = _cal_minmax(xs_c * c + ys_c * s)
        vmin, vmax = _cal_minmax(-xs_c * s + ys_c * c)
        a = (umax - umin) * (vmax - vmin)
        better = a < best_area
        return (
            jnp.where(better, a, best_area),
            jnp.where(better, theta, best_theta),
        )

    init = (jnp.full((k,), jnp.inf), jnp.zeros((k,)))
    _, best_theta = jax.lax.fori_loop(0, num_angles, coarse_body, init)

    # ---- per-detection hierarchical refinement around the coarse angle --
    # Each stage searches best +- span in refine_steps points, then the
    # next stage narrows span by (refine_steps-1)/2. Three stages at 9
    # steps reach ~0.03 deg; angle error costs IoU proportional to the
    # box aspect ratio, so long thin banners (aspect ~35) need this —
    # one 0.5-deg stage capped them at IoU ~0.93 vs cv2's exact hull
    # angle.
    coarse_step = (jnp.pi / 2) / num_angles
    theta = best_theta
    span = coarse_step
    for _stage in range(3):
        def refine_body(r, carry, span=span, center=theta):
            best_area, best_t = carry
            frac = (r / max(refine_steps - 1, 1)) * 2.0 - 1.0  # [-1, 1]
            cand = center + frac * span  # [K]
            c, s = jnp.cos(cand)[:, None], jnp.sin(cand)[:, None]
            umin, umax = _cal_minmax(xs_c * c + ys_c * s)
            vmin, vmax = _cal_minmax(-xs_c * s + ys_c * c)
            a = (umax - umin) * (vmax - vmin)
            better = a < best_area
            return (
                jnp.where(better, a, best_area),
                jnp.where(better, cand, best_t),
            )

        _, theta = jax.lax.fori_loop(
            0, refine_steps, refine_body,
            (jnp.full((k,), jnp.inf), theta),
        )
        span = span * 2.0 / max(refine_steps - 1, 1)

    # ---- final extents + corners at the refined angle ------------------
    c, s = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    # Boundary coords are full-res pixel indices. cv2.minAreaRect
    # measures to contour pixel CENTERS, so parity demands NO half-pixel
    # expansion: +0.5 per side costs ~1px per dimension, which is ~7%
    # IoU on a 14px-thin banner (caught by the thin-banner parity test).
    half = 0.0
    umin, umax = _cal_minmax(xs_c * c + ys_c * s)
    vmin, vmax = _cal_minmax(-xs_c * s + ys_c * c)
    umin, umax = umin - half, umax + half
    vmin, vmax = vmin - half, vmax + half
    ex_aabb = None
    if exact_extents:
        # ---- exact extents over ALL boundary pixels at the final angle.
        # The subsampled table nails the ANGLE (measured <=0.002 deg off
        # cv2's hull angle on thin banners — refinement resolution is
        # ~0.03 deg anyway) but can truncate the EXTENTS: the support
        # pixels along the box's own axis are staircase hull vertices a
        # uniform subsample misses by ~0.5 px, which is ~7% IoU at
        # aspect ~35 (tests/test_db_postprocess.py banner cases). One
        # segmented min-scan over the label-sorted cells re-measures
        # min/max of (u, v, x, y) projections over every boundary pixel
        # at each component's refined angle. Per-position angles come
        # from a one-hot [n, K] matmul (a K-entry table gather costs
        # ~0.8 ms/frame on TPU; the matmul fuses); boundary bits unpack
        # from the sort payload, so the pass adds NO gathers.
        slot_by_start = jnp.argsort(starts).astype(jnp.int32)
        sstarts = starts[slot_by_start]
        sends = ends[slot_by_start]  # runs are disjoint: also sorted
        rank_raw = jnp.searchsorted(
            sstarts, idx, side="right"
        ).astype(jnp.int32) - 1
        # Position p is inside a run iff the number of runs fully ended
        # at or before p equals p's start-rank — an all-integer test.
        # (Comparing p against a run-end fetched through the one-hot
        # matmul below broke on TPU: matmuls run at bf16 default
        # precision, and run-end indices up to n round to +-n/256.)
        ended = jnp.searchsorted(sends, idx, side="right").astype(
            jnp.int32
        )
        in_run = (ended == rank_raw) & (rank_raw >= 0)
        rank = jnp.clip(rank_raw, 0, k - 1)
        tab = jnp.stack(
            [
                jnp.cos(theta)[slot_by_start],
                jnp.sin(theta)[slot_by_start],
            ],
            axis=1,
        )  # [K, 2] aligned to sorted-start rank
        onehot = (
            rank[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        # HIGHEST: the default TPU bf16 matmul costs ~0.4% on cos/sin,
        # which is ~2 px of extent on a 500 px banner — the very error
        # this pass exists to remove.
        mapped = jnp.matmul(
            onehot, tab, precision=jax.lax.Precision.HIGHEST
        )  # [n, 2]
        c_p, s_p = mapped[:, 0], mapped[:, 1]

        cxf = ((cell_sorted % ws) * st).astype(jnp.float32)
        cyf = ((cell_sorted // ws) * st).astype(jnp.float32)
        bits = payload_sorted % (1 << stsq)
        inf = jnp.float32(jnp.inf)
        per_pix = []
        for j in range(stsq):
            on = ((bits >> j) % 2 == 1) & in_run
            xj, yj = cxf + (j % st), cyf + (j // st)
            u = xj * c_p + yj * s_p
            v = yj * c_p - xj * s_p
            vals_j = jnp.stack(
                [u, -u, v, -v, xj, -xj, yj, -yj], axis=1
            )
            per_pix.append(jnp.where(on[:, None], vals_j, inf))
        red = jnp.min(jnp.stack(per_pix, axis=1), axis=1)  # [n, 8]

        def comb(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, jnp.minimum(av, bv))

        _, red_s = jax.lax.associative_scan(
            comb, (is_start[:, None], red), axis=0
        )
        run_end = jnp.clip(
            jnp.searchsorted(ls, safe_roots, side="right").astype(
                jnp.int32
            ) - 1,
            0, n - 1,
        )
        g = red_s[run_end]  # [K, 8]
        have = jnp.isfinite(g[:, 0])
        umin = jnp.where(have, g[:, 0], umin)
        umax = jnp.where(have, -g[:, 1], umax)
        vmin = jnp.where(have, g[:, 2], vmin)
        vmax = jnp.where(have, -g[:, 3], vmax)
        ex_aabb = (
            jnp.where(have, g[:, 4], 0.0),
            jnp.where(have, -g[:, 5], 0.0),
            jnp.where(have, g[:, 6], 0.0),
            jnp.where(have, -g[:, 7], 0.0),
            have,
        )
    c, s = c[:, 0], s[:, 0]

    uu = jnp.stack([umin, umax, umax, umin], axis=1)  # [K, 4]
    vv = jnp.stack([vmin, vmin, vmax, vmax], axis=1)
    px = uu * c[:, None] - vv * s[:, None]
    py = uu * s[:, None] + vv * c[:, None]
    polygons = jnp.stack([px, py], axis=-1)  # [K, 4, 2]

    # AABB from polygon corners, clamped (text_detector.py:158-162).
    bx1 = jnp.clip(jnp.min(px, axis=1), 0, w)
    by1 = jnp.clip(jnp.min(py, axis=1), 0, h)
    bx2 = jnp.clip(jnp.max(px, axis=1), 0, w)
    by2 = jnp.clip(jnp.max(py, axis=1), 0, h)
    boxes = jnp.stack([bx1, by1, bx2, by2], axis=1)

    # ---- confidence: mean prob inside AABB via full-res integral image --
    # The map may arrive bf16 (inference); the integral image sums up to
    # ~h*w values, far past bf16's 8 mantissa bits — accumulate in f32
    # or box means drift above 1.0.
    ii = jnp.cumsum(jnp.cumsum(prob_map.astype(jnp.float32), 0), 1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))
    ix1 = jnp.clip(bx1.astype(jnp.int32), 0, w - 1)
    iy1 = jnp.clip(by1.astype(jnp.int32), 0, h - 1)
    ix2 = jnp.clip(jnp.ceil(bx2).astype(jnp.int32), ix1 + 1, w)
    iy2 = jnp.clip(jnp.ceil(by2).astype(jnp.int32), iy1 + 1, h)
    box_sum = ii[iy2, ix2] - ii[iy1, ix2] - ii[iy2, ix1] + ii[iy1, ix1]
    npix = ((ix2 - ix1) * (iy2 - iy1)).astype(jnp.float32)
    scores = box_sum / jnp.maximum(npix, 1.0)

    # Frame-filling components are border artifacts, not text: the DB
    # head can fire on the background plate's outline, yielding one box
    # that spans the whole map (measured: a [0,0,635,635] track on the
    # demo checkpoints whose garbage transcript polluted summaries and
    # burned one recognition-budget crop slot per frame). Real text
    # spanning >=95% of BOTH axes of the detector input does not occur;
    # drop on-device so the slot is never cropped. max_box_frac >= 1
    # disables the filter.
    if max_box_frac < 1.0:
        frame_filling = jnp.logical_and(
            bx2 - bx1 >= max_box_frac * w,
            by2 - by1 >= max_box_frac * h,
        )
        valid = jnp.logical_and(valid, jnp.logical_not(frame_filling))

    # Empty top-K slots carry inf extents; zero them with `where` (a
    # multiply would propagate inf * 0 = nan).
    def _mask(x):
        m = valid.reshape((k,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, 0.0)

    # AABB extents (full-res space) for callers that need them; the
    # exact-extents scan measured these over every boundary pixel, with
    # the compact table as fallback.
    xmin, xmax = _cal_minmax(xs_c)
    ymin, ymax = _cal_minmax(ys_c)
    if ex_aabb is not None:
        exmin, exmax, eymin, eymax, have = ex_aabb
        xmin = jnp.where(have, exmin, xmin)
        xmax = jnp.where(have, exmax, xmax)
        ymin = jnp.where(have, eymin, ymin)
        ymax = jnp.where(have, eymax, ymax)

    return {
        "boxes": _mask(boxes),
        "polygons": _mask(polygons),
        "scores": _mask(scores),
        "areas": areas,
        "valid": valid,
        "xmin": _mask(xmin), "xmax": _mask(xmax),
        "ymin": _mask(ymin), "ymax": _mask(ymax),
    }


def db_postprocess_batch(
    prob_maps: jnp.ndarray, bin_thresh: jnp.ndarray | float = 0.5, **kw
) -> Dict[str, jnp.ndarray]:
    """Batched [B, H, W] variant (kwargs as in :func:`db_postprocess`)."""
    fn = partial(db_postprocess, **kw)
    return jax.vmap(lambda p: fn(p, bin_thresh))(prob_maps)


def extract_detections(
    post: Dict[str, np.ndarray],
    orig_width: int,
    orig_height: int,
    map_size: int = 640,
    min_box_px: int = 10,
) -> List[Dict[str, Any]]:
    """Host-side: fixed-size arrays for ONE frame -> detection dicts.

    Output format matches reference ``TextDetector.detect``
    (``text_detector.py:171-176``): bbox ints in original-frame space
    (truncating scale, as the reference does), polygon ints in map
    (640) space, and the >10px min-size filter applied in original
    coordinates (``text_detector.py:166``).
    """
    boxes = np.asarray(post["boxes"])
    polys = np.asarray(post["polygons"])
    scores = np.asarray(post["scores"])
    valid = np.asarray(post["valid"])

    out: List[Dict[str, Any]] = []
    sx = orig_width / map_size
    sy = orig_height / map_size
    for i in range(boxes.shape[0]):
        if not valid[i]:
            continue
        x1 = int(boxes[i, 0] * sx)
        y1 = int(boxes[i, 1] * sy)
        x2 = int(boxes[i, 2] * sx)
        y2 = int(boxes[i, 3] * sy)
        if x2 - x1 <= min_box_px or y2 - y1 <= min_box_px:
            continue
        out.append(
            {
                "bbox": [x1, y1, x2, y2],
                "confidence": float(scores[i]),
                "polygon": np.round(polys[i]).astype(int).tolist(),
            }
        )
    return out
