"""Offline torch-weight importer parity against COMMITTED goldens.

tests/goldens/*.npz hold fixed-seed reference-architecture torch state
dicts plus the torch forward activations computed from those exact
weights (tools/gen_import_goldens.py). These tests run the importers
and the flax forward passes against the stored activations — importer
parity is provable with no torch in the loop, independent of the torch
install, forever (round-4 verdict item 5; reference checkpoint
contract: app/ml/models/text_detector.py:106-113).

The f16-stored CRNN golden is exact: the torch activations were
computed FROM the f16-rounded weights, so both sides of the comparison
consume identical values and only compute-order error remains.
"""
import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens")


def _load(name):
    path = os.path.join(GOLDENS, name)
    if not os.path.exists(path):
        pytest.fail(f"missing committed golden {path} — run "
                    "tools/gen_import_goldens.py")
    z = np.load(path)
    sd = {k[len("sd:"):]: np.asarray(z[k]).astype(
        np.float32 if z[k].dtype == np.float16 else z[k].dtype
    ) for k in z.files if k.startswith("sd:")}
    rest = {k: np.asarray(z[k]) for k in z.files if not k.startswith("sd:")}
    return sd, rest


def test_crnn_golden_parity():
    import jax.numpy as jnp

    from vtd_tpu.models.crnn import CRNN
    from vtd_tpu.models.import_torch import import_crnn_state

    sd, g = _load("crnn_golden.npz")
    variables = import_crnn_state(sd)
    model = CRNN(dtype=jnp.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(g["x"])))
    assert ours.shape == g["ref"].shape == (2, 31, 97)
    np.testing.assert_allclose(ours, g["ref"], atol=2e-3, rtol=1e-3)


def test_dbhead_golden_parity():
    import jax
    import jax.numpy as jnp

    from vtd_tpu.models.dbnet import _HeadBranch
    from vtd_tpu.models.import_torch import _bn, _conv, _convT_to_d2s

    sd, g = _load("dbhead_golden.npz")
    branch = _HeadBranch(256, dtype=jnp.float32)
    x = jnp.asarray(g["x"])
    variables = branch.init(jax.random.PRNGKey(0), x)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    params["conv"] = {"kernel": _conv(sd, "h.0.weight")}
    params["bn1"], stats["bn1"] = _bn(sd, "h.1")
    params["up1"] = {"conv": _convT_to_d2s(sd, "h.3.weight")}
    params["bn2"], stats["bn2"] = _bn(sd, "h.4")
    params["up2"] = {"conv": _convT_to_d2s(sd, "h.6.weight")}
    ours = np.asarray(
        branch.apply({"params": params, "batch_stats": stats}, x)
    )
    assert ours.shape == g["ref"].shape == (1, 32, 32, 1)
    np.testing.assert_allclose(ours, g["ref"], atol=2e-3, rtol=1e-3)


def test_bottleneck_golden_parity():
    import jax.numpy as jnp

    from vtd_tpu.models.import_torch import import_resnet50
    from vtd_tpu.models.resnet import Bottleneck

    sd, g = _load("bottleneck_golden.npz")
    # minimal stem + copied blocks so the full stage walker completes
    # (same synthesis as the live-torch test)
    full = dict(sd)
    full["conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    for stat in ("weight", "bias", "running_mean", "running_var"):
        full[f"bn1.{stat}"] = (
            np.ones(64, np.float32)
            if stat in ("weight", "running_var")
            else np.zeros(64, np.float32)
        )
    base = {k: v for k, v in sd.items() if k.startswith("layer1.0.")}
    for s, n in {1: 3, 2: 4, 3: 6, 4: 3}.items():
        for b in range(n):
            if s == 1 and b == 0:
                continue
            for k, v in base.items():
                full[k.replace("layer1.0.", f"layer{s}.{b}.")] = v
    tree = import_resnet50(full)
    block = Bottleneck(64, strides=2, dtype=jnp.float32)
    variables = {
        "params": tree["params"]["layer1_0"],
        "batch_stats": tree["batch_stats"]["layer1_0"],
    }
    ours = np.asarray(block.apply(variables, jnp.asarray(g["x"])))
    np.testing.assert_allclose(ours, g["ref"], atol=2e-3, rtol=1e-3)


VOCAB, MAX_LEN = 53, 12


@pytest.fixture(scope="module")
def trocr_golden_pair():
    from vtd_tpu.models.import_torch import import_trocr_state
    from vtd_tpu.models.trocr import TrOCR, hf_config

    sd, g = _load("trocr_golden.npz")
    cfg = hf_config(
        vocab_size=VOCAB, image_size=32, patch_size=16,
        enc_dim=32, enc_layers=2, enc_heads=4, enc_mlp=64,
        dec_dim=32, dec_layers=2, dec_heads=4, dec_mlp=64,
        max_len=MAX_LEN,
    )
    return TrOCR(cfg), import_trocr_state(sd, cfg), g


def test_trocr_golden_logits_parity(trocr_golden_pair):
    import jax

    model, variables, g = trocr_golden_pair
    ours = np.asarray(
        jax.jit(model.apply)(variables, g["images"], g["tokens"]),
        np.float32,
    )
    assert ours.shape == g["logits_ref"].shape
    np.testing.assert_allclose(ours, g["logits_ref"], atol=2e-4, rtol=2e-3)


def test_trocr_golden_greedy_parity(trocr_golden_pair):
    from vtd_tpu.models.trocr import greedy_generate

    model, variables, g = trocr_golden_pair
    toks, conf = greedy_generate(
        model, variables, g["gen_images"], bos_id=1, eos_id=2
    )
    toks = np.asarray(toks)
    assert conf.shape == (3,)
    for b in range(3):
        ref_row = list(g["gen_ref"][b][1:])  # drop decoder_start
        for r, o in zip(ref_row, list(toks[b])):
            assert r == o, (b, ref_row, list(toks[b]))
            if r == 2:  # eos — rest is padding in both
                break
