"""Torch weight-import parity tests.

Builds torch modules with the reference architectures (CRNN from
text_recognizer.py:12-37; a ResNet bottleneck stage), exports their
state dicts, imports into flax, and asserts numerical parity of the
forward passes — the "weight parity" hard part from SURVEY.md §7.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _reference_crnn(vocab_size=97, hidden_size=256, num_layers=2):
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


def test_crnn_import_forward_parity():
    import jax.numpy as jnp

    from vtd_tpu.models.crnn import CRNN
    from vtd_tpu.models.import_torch import import_crnn_state

    torch.manual_seed(0)
    tmodel = _reference_crnn().eval()
    # randomize BN stats so the test exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = import_crnn_state(sd)

    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 128, 3), np.float32)
    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ).numpy()

    model = CRNN(dtype=jnp.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    assert ours.shape == ref.shape == (2, 31, 97)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_dbhead_branch_import_parity():
    """torch DBHead branch (Conv-BN-ReLU-ConvT-BN-ReLU-ConvT-Sigmoid,
    text_recognizer-style sequential) vs the imported depth-to-space
    flax branch."""
    import jax
    import jax.numpy as jnp

    from vtd_tpu.models.dbnet import _HeadBranch
    from vtd_tpu.models.import_torch import _bn, _conv, _convT_to_d2s

    torch.manual_seed(3)
    tbranch = nn.Sequential(
        nn.Conv2d(256, 64, 3, padding=1),
        nn.BatchNorm2d(64),
        nn.ReLU(True),
        nn.ConvTranspose2d(64, 64, 2, stride=2),
        nn.BatchNorm2d(64),
        nn.ReLU(True),
        nn.ConvTranspose2d(64, 1, 2, stride=2),
        nn.Sigmoid(),
    ).eval()
    with torch.no_grad():
        for m in tbranch.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    sd = {f"h.{k}": v.numpy() for k, v in tbranch.state_dict().items()}

    # the torch sequential uses a biased first conv; ours is bias-free
    # by design — zero it for the comparison
    with torch.no_grad():
        tbranch[0].bias.zero_()
    sd = {f"h.{k}": v.numpy() for k, v in tbranch.state_dict().items()}

    branch = _HeadBranch(256, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 8, 8, 256)).astype(
        np.float32
    )
    variables = branch.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    params["conv"] = {"kernel": _conv(sd, "h.0.weight")}
    params["bn1"], stats["bn1"] = _bn(sd, "h.1")
    params["up1"] = {"conv": _convT_to_d2s(sd, "h.3.weight")}
    params["bn2"], stats["bn2"] = _bn(sd, "h.4")
    params["up2"] = {"conv": _convT_to_d2s(sd, "h.6.weight")}

    ours = np.asarray(
        branch.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x)
        )
    )
    with torch.no_grad():
        ref = (
            tbranch(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    assert ours.shape == ref.shape == (1, 32, 32, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_resnet_bottleneck_import_parity():
    """One bottleneck block with downsample: conv/bn mapping + layout."""
    import jax
    import jax.numpy as jnp

    from vtd_tpu.models.import_torch import import_resnet50
    from vtd_tpu.models.resnet import Bottleneck

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
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    # wrap keys as layer1.0.* so import_resnet50's stage walker finds it
    sd = {}
    for k, v in tb.state_dict().items():
        k = k.replace("downsample.0", "downsample.0").replace(
            "downsample.1", "downsample.1"
        )
        sd[f"layer1.0.{k}"] = v.numpy()
    # minimal stem so the importer doesn't fail
    sd["conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{stat}"] = (
            np.ones(64, np.float32)
            if stat in ("weight", "running_var")
            else np.zeros(64, np.float32)
        )
    # fill remaining blocks with copies so the full walker completes
    stage_sizes = {1: 3, 2: 4, 3: 6, 4: 3}
    base = {k: v for k, v in sd.items() if k.startswith("layer1.0.")}
    for s, n in stage_sizes.items():
        for b in range(n):
            if s == 1 and b == 0:
                continue
            for k, v in base.items():
                sd[k.replace("layer1.0.", f"layer{s}.{b}.")] = v

    tree = import_resnet50(sd)
    rng = np.random.default_rng(0)
    x = rng.random((1, 16, 16, 64), np.float32)

    with torch.no_grad():
        ref = (
            tb(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    block = Bottleneck(64, strides=2, dtype=jnp.float32)
    variables = {
        "params": tree["params"]["layer1_0"],
        "batch_stats": tree["batch_stats"]["layer1_0"],
    }
    ours = np.asarray(block.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
