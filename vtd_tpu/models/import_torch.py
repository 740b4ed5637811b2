"""Torch checkpoint importers.

The reference loads ``.pth`` checkpoints with a ``model_state_dict`` key
(reference ``text_detector.py:106-113``, ``text_recognizer.py:93-100``).
These importers map those state dicts onto the flax parameter trees so
trained reference weights carry over:

  * conv weights: torch [O, I, kh, kw] -> flax kernel [kh, kw, I, O]
  * conv-transpose: torch [I, O, kh, kw] -> flax [kh, kw, I, O]
  * batchnorm: weight/bias -> scale/bias params; running_mean/var ->
    batch_stats
  * LSTM: torch gate order (i, f, g, o) is preserved verbatim — our
    BiLSTM (models/crnn.py) uses identical layout/naming
    (weight_ih_l{k}[_reverse] etc.), so those tensors copy through
  * linear: torch [O, I] -> flax kernel [I, O]

torch is only needed to unpickle ``.pth`` files; state dicts may also be
passed directly as numpy mappings (used by tests).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: _t(v) for k, v in sd.items()}


def _conv(sd, name):
    return np.transpose(sd[name], (2, 3, 1, 0))


def _convT_to_d2s(sd, name):
    """torch ConvTranspose2d(k=2, s=2) weight [I, O, 2, 2] -> the
    equivalent depth-to-space 1x1 conv kernel [1, 1, I, 4O] with channel
    layout (a*2+b)*O + o (models/dbnet.py _Upsample2x)."""
    w = sd[name]
    i, o = w.shape[0], w.shape[1]
    kernel = np.transpose(w, (0, 2, 3, 1)).reshape(i, 4 * o)[None, None]
    bias = np.tile(sd[name.replace(".weight", ".bias")], 4)
    return {"kernel": kernel, "bias": bias}


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def _dense(sd, prefix):
    return {
        "kernel": np.transpose(sd[f"{prefix}.weight"]),
        "bias": sd[f"{prefix}.bias"],
    }


# ---------------------------------------------------------------------------
# ResNet-50 backbone (torchvision layout)
# ---------------------------------------------------------------------------
def import_resnet50(
    sd: Mapping[str, np.ndarray], prefix: str = ""
) -> Dict[str, Any]:
    """torchvision resnet50 state dict -> {'params', 'batch_stats'} trees
    for models.resnet.ResNet50."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    p["conv1"] = {"kernel": _conv(sd, f"{prefix}conv1.weight")}
    p["bn1"], bs["bn1"] = _bn(sd, f"{prefix}bn1")

    stage_sizes = (3, 4, 6, 3)
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            tname = f"{prefix}layer{stage + 1}.{block}"
            fname = f"layer{stage + 1}_{block}"
            bp: Dict[str, Any] = {}
            bb: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {"kernel": _conv(sd, f"{tname}.conv{i}.weight")}
                bp[f"bn{i}"], bb[f"bn{i}"] = _bn(sd, f"{tname}.bn{i}")
            if f"{tname}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd, f"{tname}.downsample.0.weight")
                }
                bp["downsample_bn"], bb["downsample_bn"] = _bn(
                    sd, f"{tname}.downsample.1"
                )
            p[fname] = bp
            bs[fname] = bb
    return {"params": p, "batch_stats": bs}


def import_dbnet_pth(path: str) -> Dict[str, Any]:
    """Reference DBNet checkpoint -> flax variables.

    Backbone and DBHead weights map 1:1. The reference FPN is broken
    (it feeds C5 to every lateral; SURVEY.md §0) and its lateral shapes
    are incompatible with a correct FPN, so FPN weights stay at their
    initialized values — backbone + head carry the trained signal.
    """
    import jax
    import jax.numpy as jnp

    from .dbnet import DBNet

    sd = load_state_dict(path)
    model = DBNet()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    # torchvision backbone wrapped in nn.Sequential -> keys 'backbone.0.*'
    # (conv1), 'backbone.1.*' (bn1), 'backbone.4.*'..'backbone.7.*'
    # (layer1..4) per nn.Sequential(*children[:-2]).
    remap = {}
    for k, v in sd.items():
        if not k.startswith("backbone."):
            continue
        parts = k.split(".")
        idx = int(parts[1])
        rest = ".".join(parts[2:])
        if idx == 0:
            remap[f"conv1.{rest}"] = v
        elif idx == 1:
            remap[f"bn1.{rest}"] = v
        elif 4 <= idx <= 7:
            remap[f"layer{idx - 3}.{rest}"] = v
    if remap:
        bb = import_resnet50(remap)
        params["backbone"] = bb["params"]
        stats["backbone"] = bb["batch_stats"]

    # DBHead branches: probability_head / threshold_head sequentials:
    # 0 conv, 1 bn, 3 convT, 4 bn, 6 convT  (text_detector.py:60-86)
    for tname, fname in (
        ("head.probability_head", "probability"),
        ("head.threshold_head", "threshold"),
    ):
        if f"{tname}.0.weight" not in sd:
            continue
        branch = params["head"][fname]
        bstats = stats["head"][fname]
        branch["conv"] = {"kernel": _conv(sd, f"{tname}.0.weight")}
        branch["bn1"], bstats["bn1"] = _bn(sd, f"{tname}.1")
        branch["up1"] = {"conv": _convT_to_d2s(sd, f"{tname}.3.weight")}
        branch["bn2"], bstats["bn2"] = _bn(sd, f"{tname}.4")
        branch["up2"] = {"conv": _convT_to_d2s(sd, f"{tname}.6.weight")}

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# CRNN
# ---------------------------------------------------------------------------
# reference CRNN nn.Sequential conv indices (text_recognizer.py:16-25)
_CRNN_CONVS = [
    (0, "conv0", 1, "bn0"),
    (4, "conv1", 5, "bn1"),
    (8, "conv2", 9, "bn2"),
    (11, "conv3", 12, "bn3"),
    (15, "conv4", 16, "bn4"),
    (18, "conv5", 19, "bn5"),
    (22, "conv6", 23, "bn6"),
]


def import_crnn_state(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference CRNN state dict -> flax variables for models.crnn.CRNN."""
    import jax
    import jax.numpy as jnp

    from .crnn import CRNN

    model = CRNN()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3), jnp.float32)
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    for tconv, fconv, tbn, fbn in _CRNN_CONVS:
        params[fconv] = {
            "kernel": _conv(sd, f"cnn.{tconv}.weight"),
            "bias": sd[f"cnn.{tconv}.bias"],
        }
        params[fbn], stats[fbn] = _bn(sd, f"cnn.{tbn}")

    rnn = params["rnn"]
    for layer in (0, 1):
        for suffix in ("", "_reverse"):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                tkey = f"rnn.{kind}_l{layer}{suffix}"
                fkey = f"{kind}_l{layer}{suffix}"
                rnn[fkey] = sd[tkey]

    params["classifier"] = _dense(sd, "classifier")
    return {"params": params, "batch_stats": stats}


def import_crnn_pth(path: str) -> Dict[str, Any]:
    return import_crnn_state(load_state_dict(path))


# ---------------------------------------------------------------------------
# TrOCR (HF VisionEncoderDecoder layout)
# ---------------------------------------------------------------------------
def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _attn(sd, prefix):
    """HF {q,k,v,out}_proj -> flax Attention {q,k,v,o}."""
    return {
        "q": _dense(sd, f"{prefix}.q_proj"),
        "k": _dense(sd, f"{prefix}.k_proj"),
        "v": _dense(sd, f"{prefix}.v_proj"),
        "o": _dense(sd, f"{prefix}.out_proj"),
    }


def import_trocr_state(sd: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    """HF VisionEncoderDecoder (TrOCR) state dict -> flax variables for
    models.trocr.TrOCR built with ``hf_config(...)`` (post-norm decoder,
    embedding LN, +2 position offset — the HF graph exactly).

    HF layout: ViT encoder under ``encoder.*``
    (vit/modeling_vit.py taxonomy) and a TrOCRForCausalLM under
    ``decoder.model.decoder.*`` + ``decoder.output_projection``.
    """
    assert cfg.post_norm_decoder and cfg.pos_offset == 2, (
        "import_trocr_state requires an hf_config()-built TrOCRConfig"
    )
    p: Dict[str, Any] = {}

    # ---- ViT encoder ----
    e: Dict[str, Any] = {
        "cls_token": sd["encoder.embeddings.cls_token"],
        "pos_embed": sd["encoder.embeddings.position_embeddings"],
        "patch_embed": {
            "kernel": _conv(
                sd, "encoder.embeddings.patch_embeddings.projection.weight"
            ),
            "bias": sd["encoder.embeddings.patch_embeddings.projection.bias"],
        },
        "ln_f": _ln(sd, "encoder.layernorm"),
    }
    for i in range(cfg.enc_layers):
        layer = f"encoder.encoder.layer.{i}"
        e[f"block{i}"] = {
            "ln1": _ln(sd, f"{layer}.layernorm_before"),
            "attn": {
                "q": _dense(sd, f"{layer}.attention.attention.query"),
                "k": _dense(sd, f"{layer}.attention.attention.key"),
                "v": _dense(sd, f"{layer}.attention.attention.value"),
                "o": _dense(sd, f"{layer}.attention.output.dense"),
            },
            "ln2": _ln(sd, f"{layer}.layernorm_after"),
            "mlp": {
                "fc1": _dense(sd, f"{layer}.intermediate.dense"),
                "fc2": _dense(sd, f"{layer}.output.dense"),
            },
        }
    p["encoder"] = e

    # ---- TrOCR decoder ----
    pre = "decoder.model.decoder."
    n_pos = cfg.max_len + cfg.pos_offset
    d: Dict[str, Any] = {
        "tok_embed": {"embedding": sd[f"{pre}embed_tokens.weight"]},
        "pos_embed": sd[f"{pre}embed_positions.weight"][None, :n_pos],
        "ln_emb": _ln(sd, f"{pre}layernorm_embedding"),
    }
    for i in range(cfg.dec_layers):
        layer = f"{pre}layers.{i}"
        d[f"block{i}"] = {
            "self_attn": _attn(sd, f"{layer}.self_attn"),
            "ln1": _ln(sd, f"{layer}.self_attn_layer_norm"),
            "cross_attn": _attn(sd, f"{layer}.encoder_attn"),
            "ln2": _ln(sd, f"{layer}.encoder_attn_layer_norm"),
            "mlp": {
                "fc1": _dense(sd, f"{layer}.fc1"),
                "fc2": _dense(sd, f"{layer}.fc2"),
            },
            "ln3": _ln(sd, f"{layer}.final_layer_norm"),
        }
    head_w = sd.get(
        "decoder.output_projection.weight", sd[f"{pre}embed_tokens.weight"]
    )
    d["lm_head"] = {"kernel": np.transpose(head_w)}
    p["decoder"] = d
    return {"params": p}


def import_trocr_pth(path: str, cfg) -> Dict[str, Any]:
    """Load an HF-layout TrOCR ``.pth``/``.pt`` checkpoint (a torch state
    dict, or a dict with ``model_state_dict``) into flax variables.

    Parity evidence vs the reference's ``microsoft/trocr-base-printed``
    download (text_recognizer.py:44-50): this build environment has no
    network egress and ships no cached HF weights, so the importer is
    validated against randomly-initialized ``transformers`` TrOCR
    modules — the SAME modeling graph the hub checkpoint instantiates —
    with logits matched to ~1e-4 (tests/test_import_trocr.py). Weight
    import is layout + numerics; a real checkpoint exercises no code
    path that a random state dict of the same layout does not. Known
    limitation: no recorded end-to-end transcription check against the
    actual hub weights has been run in this image."""
    return import_trocr_state(load_state_dict(path), cfg)
