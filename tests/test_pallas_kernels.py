"""Pallas kernel parity tests (interpreter mode on the CPU test mesh)."""
import numpy as np
import pytest


def _xla_sweeps(binary, labels2d, iters):
    import jax.numpy as jnp

    h, w = binary.shape
    big = jnp.int32(h * w)
    lbl = labels2d
    for _ in range(iters):
        masked = jnp.where(binary, lbl, big)
        padded = jnp.pad(masked, 1, constant_values=h * w)
        m = masked
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                m = jnp.minimum(
                    m, padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                )
        lbl = jnp.where(binary, m, lbl)
    return lbl


def test_neighbor_min_sweeps_matches_xla():
    import jax.numpy as jnp
    from vtd_tpu.ops.pallas_kernels import neighbor_min_sweeps

    rng = np.random.default_rng(0)
    binary = jnp.asarray(rng.random((32, 32)) > 0.5)
    labels = jnp.arange(32 * 32, dtype=jnp.int32).reshape(32, 32)

    ours = np.asarray(
        neighbor_min_sweeps(binary, labels, iters=4, interpret=True)
    )
    ref = np.asarray(_xla_sweeps(binary, labels, 4))
    np.testing.assert_array_equal(ours, ref)


def test_cc_backend_parity():
    import jax.numpy as jnp
    from vtd_tpu.ops.db_postprocess import connected_components

    m = np.zeros((64, 64), bool)
    m[5:15, 5:25] = True
    m[40:50, 30:60] = True
    xla = np.asarray(
        connected_components(jnp.asarray(m), backend="xla")
    )
    fg = xla.reshape(64, 64)[m]
    assert len(np.unique(fg)) == 2


def test_segmented_cc_round_interpret_matches_cv2():
    """The VMEM segmented-propagation kernel (interpret mode) converges
    to cv2.connectedComponents labels when iterated with pointer jumps,
    including a pure-diagonal staircase (needs the diag ladders)."""
    import cv2
    import jax.numpy as jnp

    from vtd_tpu.ops.pallas_kernels import segmented_cc_round

    size = 48
    maps = []
    m = np.zeros((size, size), bool)
    m[4:10, 4:30] = True
    m[20:30, 10:40] = True
    maps.append(m)
    stairs = np.zeros((size, size), bool)
    for i in range(0, size - 2, 2):
        stairs[i:i + 2, i:i + 2] = True
    maps.append(stairs)

    for m in maps:
        ref, _ = cv2.connectedComponents(
            m.astype(np.uint8), connectivity=8
        )
        lbl = jnp.arange(size * size, dtype=jnp.int32).reshape(size, size)
        for _ in range(6):
            lbl = segmented_cc_round(
                jnp.asarray(m), lbl, diag=True, interpret=True
            )
            flat = lbl.reshape(-1)
            lbl = flat[flat].reshape(size, size)
        ours = len(np.unique(np.asarray(lbl)[m]))
        assert ours == ref - 1, (ours, ref - 1)
