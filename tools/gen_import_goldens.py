"""Generate committed golden vectors for torch-weight importer parity.

Builds the reference-architecture torch modules (CRNN from the
reference ``text_recognizer.py:12-37``; ResNet bottleneck + DBHead
branch per ``text_detector.py``; a tiny HF VisionEncoderDecoder TrOCR
per ``text_recognizer.py:39-69``) with fixed seeds, saves their state
dicts AND torch forward activations to ``tests/goldens/*.npz``. The
golden tests (tests/test_import_goldens.py) then prove importer parity
offline forever — no live torch model construction in the loop.

Storage: the full-scale CRNN state dict is ~22 MB in f32, so float
arrays are stored f16 and the torch reference outputs are recomputed
FROM the f16-rounded weights — both sides of the parity check consume
identical values, so the rounding cancels. Small goldens stay f32.

Run once (torch + transformers required): python tools/gen_import_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "tests", "goldens")


def _reference_crnn(vocab_size=97, hidden_size=256, num_layers=2):
    """Same architecture as the reference CRNN (text_recognizer.py:12-37)
    and tests/test_import_torch.py::_reference_crnn."""
    class CRNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = nn.Sequential(
                nn.Conv2d(3, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(True), nn.MaxPool2d(2, 2),
                nn.Conv2d(64, 128, 3, 1, 1), nn.BatchNorm2d(128), nn.ReLU(True), nn.MaxPool2d(2, 2),
                nn.Conv2d(128, 256, 3, 1, 1), nn.BatchNorm2d(256), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, 1, 1), nn.BatchNorm2d(256), nn.ReLU(True), nn.MaxPool2d((2, 1), (2, 1)),
                nn.Conv2d(256, 512, 3, 1, 1), nn.BatchNorm2d(512), nn.ReLU(True),
                nn.Conv2d(512, 512, 3, 1, 1), nn.BatchNorm2d(512), nn.ReLU(True), nn.MaxPool2d((2, 1), (2, 1)),
                nn.Conv2d(512, 512, 2, 1, 0), nn.BatchNorm2d(512), nn.ReLU(True),
            )
            self.rnn = nn.LSTM(
                512, hidden_size, num_layers, batch_first=True,
                bidirectional=True,
            )
            self.classifier = nn.Linear(hidden_size * 2, vocab_size)

        def forward(self, x):
            conv = self.cnn(x)
            b, c, h, w = conv.size()
            conv = conv.view(b, c * h, w).permute(0, 2, 1)
            out, _ = self.rnn(conv)
            return self.classifier(out)

    return CRNN()


def _randomize_bn(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _round_f16_inplace(model):
    """Round every float parameter/buffer through f16 so the stored f16
    state dict and the reference activations agree exactly."""
    with torch.no_grad():
        for t in list(model.parameters()) + list(model.buffers()):
            if t.is_floating_point():
                t.copy_(t.half().float())


def _save(name: str, sd: dict, f16: bool, **arrays) -> None:
    os.makedirs(OUT, exist_ok=True)
    pack = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if f16 and v.dtype == np.float32:
            v = v.astype(np.float16)
        pack[f"sd:{k}"] = v
    pack.update(arrays)
    path = os.path.join(OUT, name)
    np.savez_compressed(path, **pack)
    print(f"{name}: {os.path.getsize(path)/1e6:.2f} MB,",
          f"{len(sd)} sd entries")


def gen_crnn():
    torch.manual_seed(0)
    m = _reference_crnn().eval()
    _randomize_bn(m, 17)
    _round_f16_inplace(m)
    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 128, 3), np.float32)
    cnn_ref = {}

    def hook(_m, _i, out):
        cnn_ref["y"] = out.detach().numpy()

    m.cnn.register_forward_hook(hook)
    with torch.no_grad():
        ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    _save("crnn_golden.npz", sd, f16=True, x=x, ref=ref,
          cnn_ref=cnn_ref["y"])


def gen_dbhead():
    torch.manual_seed(3)
    t = nn.Sequential(
        nn.Conv2d(256, 64, 3, padding=1),
        nn.BatchNorm2d(64),
        nn.ReLU(True),
        nn.ConvTranspose2d(64, 64, 2, stride=2),
        nn.BatchNorm2d(64),
        nn.ReLU(True),
        nn.ConvTranspose2d(64, 1, 2, stride=2),
        nn.Sigmoid(),
    ).eval()
    _randomize_bn(t, 23)
    with torch.no_grad():
        t[0].bias.zero_()  # ours is bias-free by design
    x = np.random.default_rng(0).normal(size=(1, 8, 8, 256)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = (
            t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
            .numpy().transpose(0, 2, 3, 1)
        )
    sd = {f"h.{k}": v.numpy() for k, v in t.state_dict().items()}
    _save("dbhead_golden.npz", sd, f16=False, x=x, ref=ref)


def gen_bottleneck():
    class TorchBottleneck(nn.Module):
        def __init__(self, cin, width, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                nn.BatchNorm2d(width * 4),
            )
            self.relu = nn.ReLU()

        def forward(self, x):
            idt = self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    torch.manual_seed(1)
    tb = TorchBottleneck(64, 64, 2).eval()
    _randomize_bn(tb, 29)
    rng = np.random.default_rng(0)
    x = rng.random((1, 16, 16, 64), np.float32)
    with torch.no_grad():
        ref = (
            tb(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
            .numpy().transpose(0, 2, 3, 1)
        )
    sd = {f"layer1.0.{k}": v.numpy() for k, v in tb.state_dict().items()}
    _save("bottleneck_golden.npz", sd, f16=False, x=x, ref=ref)


def gen_trocr():
    from transformers import (
        TrOCRConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
        ViTConfig,
    )

    VOCAB, MAX_LEN = 53, 12
    enc = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16, num_channels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    dec = TrOCRConfig(
        d_model=32, decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=64, vocab_size=VOCAB, max_position_embeddings=64,
        scale_embedding=False, activation_function="gelu",
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        layernorm_embedding=True, use_learned_position_embeddings=True,
        decoder_start_token_id=1, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    cfg = VisionEncoderDecoderConfig.from_encoder_decoder_configs(enc, dec)
    torch.manual_seed(0)
    model = VisionEncoderDecoderModel(config=cfg).eval()
    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(0, VOCAB, (2, 7)).astype(np.int32)
    with torch.no_grad():
        logits_ref = model(
            pixel_values=torch.from_numpy(
                np.transpose(images, (0, 3, 1, 2))
            ),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
        gen_images = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
        gen_ref = model.generate(
            pixel_values=torch.from_numpy(
                np.transpose(gen_images, (0, 3, 1, 2))
            ),
            max_length=MAX_LEN + 1, num_beams=1, do_sample=False,
        ).numpy()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    _save("trocr_golden.npz", sd, f16=False, images=images, tokens=tokens,
          logits_ref=logits_ref, gen_images=gen_images, gen_ref=gen_ref)


if __name__ == "__main__":
    gen_crnn()
    gen_dbhead()
    gen_bottleneck()
    gen_trocr()
    print("goldens written to", os.path.abspath(OUT))
    sys.exit(0)
