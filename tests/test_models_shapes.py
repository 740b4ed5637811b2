"""Model construction / shape tests (reference tests/test_models.py style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dbnet_forward_shapes():
    from vtd_tpu.models import DBNet

    model = DBNet(dtype=jnp.float32)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert set(out) == {"probability", "threshold"}
    assert out["probability"].shape == (1, 160, 160, 1)
    assert out["threshold"].shape == (1, 160, 160, 1)
    p = np.asarray(out["probability"])
    assert np.all(p >= 0) and np.all(p <= 1)


def test_resnet_pyramid_shapes():
    from vtd_tpu.models import ResNet50

    model = ResNet50(dtype=jnp.float32)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    c2, c3, c4, c5 = model.apply(variables, x)
    assert c2.shape == (1, 40, 40, 256)
    assert c3.shape == (1, 20, 20, 512)
    assert c4.shape == (1, 10, 10, 1024)
    assert c5.shape == (1, 5, 5, 2048)


def test_crnn_logits_shape_and_vocab():
    from vtd_tpu.models import CRNN, CRNN_VOCAB

    assert len(CRNN_VOCAB) == 97  # 95 chars + blank + unk
    assert CRNN_VOCAB["<blank>"] == 0
    assert CRNN_VOCAB["<unk>"] == 96
    assert CRNN_VOCAB["0"] == 1

    model = CRNN(dtype=jnp.float32)
    x = jnp.zeros((2, 32, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 31, 97)


def test_dbnet_binary_map():
    from vtd_tpu.models import DBNet

    model = DBNet(dtype=jnp.float32)
    out = {
        "probability": jnp.full((1, 8, 8, 1), 0.9),
        "threshold": jnp.full((1, 8, 8, 1), 0.3),
    }
    b = model.binary(out)
    assert np.all(np.asarray(b) > 0.99)  # sigmoid(50 * 0.6)


def test_s2d_stem_matches_strided_conv():
    """The space-to-depth stem is numerically identical to the
    canonical 7x7/stride-2 convolution it replaces (exact weight
    transform; float32 to keep the comparison tight)."""
    import jax
    import jax.numpy as jnp

    from vtd_tpu.models.resnet import _S2DStem

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    stem = _S2DStem(features=8, dtype=jnp.float32)
    params = stem.init(jax.random.PRNGKey(0), x)
    out = stem.apply(params, x)
    ref = jax.lax.conv_general_dilated(
        x, params["params"]["kernel"],
        window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert out.shape == ref.shape == (2, 32, 32, 8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # odd spatial size falls back to the strided conv
    x_odd = jnp.asarray(
        rng.standard_normal((1, 33, 33, 3)).astype(np.float32)
    )
    out_odd = stem.apply(params, x_odd)
    assert out_odd.shape == (1, 17, 17, 8)
