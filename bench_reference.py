"""Measure the reference pipeline's actual throughput (torch, CPU).

The reference (`/root/reference`, malak29/video-text-detection-system)
publishes no benchmark numbers and its checked-in code cannot run as-is
(SURVEY.md §0). This harness loads the reference's own modules from
/root/reference (nothing is copied into this repo) and applies exactly
the documented intended-behavior fixes so its pipeline can execute:

  1. missing `Tuple` import in text_recognizer.py (SURVEY §0)
  2. missing `Optional` import in preprocessing.py (SURVEY §0)
  3. `resnet50(pretrained=...)` -> `weights=None` (zero-egress host; also
     the deprecated kwarg is gone from modern torchvision)
  4. `np.int0` -> `np.intp` (removed in numpy 2)
  5. the broken FPN (text_detector.py:43-56 applies every lateral conv to
     the same 2048-ch tensor): replaced with the *intended* ResNet-FPN —
     taps C2..C5 at strides 4/8/16/32, top-down pathway per its channel
     spec at :38 — implemented below, not in the reference's words.

Everything else (detector wrapper, postprocess, CRNN, pipeline loop,
video decode) runs the reference's own code. The recognizer runs the
CRNN path: the TrOCR path needs an HF hub download this host cannot
make, and random-weight CRNN matches how the TPU-side bench measures.

Usage: python bench_reference.py [--config N|all] [--out FILE]
Writes per-config fps to BASELINE_measured.json.
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile
import time
import types

import numpy as np

REF = "/root/reference"

# -- fix 4: numpy 2 removed int0 ------------------------------------------
if not hasattr(np, "int0"):
    np.int0 = np.intp  # type: ignore[attr-defined]


def _install_torchvision_shim():
    """The bench image ships torch but not torchvision. Provide the two
    pieces the reference uses — `transforms` (ToPILImage/Resize/ToTensor/
    Normalize/Compose) and `models.resnet50` (standard bottleneck
    ResNet-50, identical layer plan/FLOPs, matching children() order) —
    so the reference code runs unmodified."""
    if "torchvision" in sys.modules:
        return
    import torch
    import torch.nn as nn
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tfm = types.ModuleType("torchvision.transforms")
    mdl = types.ModuleType("torchvision.models")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToPILImage:
        def __call__(self, x):
            return Image.fromarray(np.asarray(x))

    class Resize:
        def __init__(self, size):
            self.size = size if isinstance(size, tuple) else (size, size)

        def __call__(self, img):
            return img.resize(self.size[::-1], Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(arr).permute(2, 0, 1)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    for cls in (Compose, ToPILImage, Resize, ToTensor, Normalize):
        setattr(tfm, cls.__name__, cls)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, cin, width, stride=1, down=None):
            super().__init__()
            cout = width * self.expansion
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(
                width, width, 3, stride, padding=1, bias=False
            )
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = down

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.relu(self.bn2(self.conv2(x)))
            x = self.bn3(self.conv3(x))
            return self.relu(x + idt)

    class ResNet50(nn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, padding=1)
            cin = 64
            for i, (blocks, width, stride) in enumerate(
                [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)], 1
            ):
                layers = []
                for b in range(blocks):
                    s = stride if b == 0 else 1
                    down = None
                    if s != 1 or cin != width * 4:
                        down = nn.Sequential(
                            nn.Conv2d(cin, width * 4, 1, s, bias=False),
                            nn.BatchNorm2d(width * 4),
                        )
                    layers.append(Bottleneck(cin, width, s, down))
                    cin = width * 4
                setattr(self, f"layer{i}", nn.Sequential(*layers))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(2048, num_classes)

        def forward(self, x):  # pragma: no cover - reference strips head
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet50(weights=None, pretrained=False):
        return ResNet50()

    mdl.resnet50 = resnet50
    tv.transforms = tfm
    tv.models = mdl
    tv.__version__ = "0.0-shim"
    # transformers probes torchvision via importlib.util.find_spec,
    # which requires a non-None __spec__ on an already-imported module.
    import importlib.machinery

    for m in (tv, tfm, mdl):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tfm
    sys.modules["torchvision.models"] = mdl


def _load_module(fqname: str, path: str, package: str, patches=()):
    """Exec a reference source file as module `fqname` with textual
    patches applied (missing imports / offline weights only)."""
    src = open(path).read()
    for old, new in patches:
        assert old in src, f"patch target not found in {path}: {old!r}"
        src = src.replace(old, new)
    mod = types.ModuleType(fqname)
    mod.__file__ = path
    mod.__package__ = package
    sys.modules[fqname] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_reference():
    """Build the `refapp.ml` package tree from /root/reference."""
    if "refapp.ml.inference.pipeliine" in sys.modules:
        return sys.modules["refapp.ml.inference.pipeliine"]
    _install_torchvision_shim()

    for pkg in ("refapp", "refapp.ml", "refapp.ml.models",
                "refapp.ml.utils", "refapp.ml.inference"):
        m = types.ModuleType(pkg)
        m.__path__ = []  # mark as package for relative imports
        m.__package__ = pkg
        sys.modules.setdefault(pkg, m)

    base = os.path.join(REF, "app", "ml")
    _load_module(
        "refapp.ml.utils.preprocessing",
        os.path.join(base, "utils", "preprocessing.py"),
        "refapp.ml.utils",
        patches=[
            # fix 2: Optional used at :86 but never imported
            ("from typing import Generator, Tuple, Dict, Any, List, AsyncGenerator",
             "from typing import Generator, Tuple, Dict, Any, List, AsyncGenerator, Optional"),
        ],
    )
    det = _load_module(
        "refapp.ml.models.text_detector",
        os.path.join(base, "models", "text_detector.py"),
        "refapp.ml.models",
        patches=[
            # fix 3: no hub access; kwarg removed in modern torchvision
            ("self.backbone = resnet50(pretrained=pretrained)",
             "self.backbone = resnet50(weights=None)"),
        ],
    )
    _load_module(
        "refapp.ml.models.text_recognizer",
        os.path.join(base, "models", "text_recognizer.py"),
        "refapp.ml.models",
        patches=[
            # fix 1: Tuple used at :142 but never imported
            ("from typing import List, Dict, Any, Optional",
             "from typing import List, Dict, Any, Optional, Tuple"),
        ],
    )
    pipe = _load_module(
        "refapp.ml.inference.pipeliine",
        os.path.join(base, "inference", "pipeliine.py"),
        "refapp.ml.inference",
    )

    _fix_fpn(det)
    return pipe


def _fix_fpn(det_mod):
    """Fix 5: the intended ResNet-FPN (SURVEY §0). The checked-in forward
    feeds the single 2048-ch C5 tensor to every lateral conv (channel
    spec 2048/1024/512/256 at text_detector.py:38) and crashes; tap
    C2..C5 instead and run the standard top-down pathway."""
    import torch.nn as nn
    import torch.nn.functional as F

    class TappedBackbone(nn.Module):
        """Wraps the reference's stripped-resnet Sequential; returns
        [C5, C4, C3, C2] matching the lateral-conv channel order."""

        def __init__(self, seq: nn.Sequential):
            super().__init__()
            self.seq = seq  # conv1,bn1,relu,maxpool,layer1..layer4

        def forward(self, x):
            taps = []
            for i, m in enumerate(self.seq):
                x = m(x)
                if i >= 4:  # layer1..layer4 outputs = C2..C5
                    taps.append(x)
            return taps[::-1]

    def dbnet_init(self, backbone="resnet50", pretrained=True):
        nn.Module.__init__(self)
        from torchvision.models import resnet50

        seq = nn.Sequential(*list(resnet50(weights=None).children())[:-2])
        self.backbone = TappedBackbone(seq)
        self.fpn = det_mod.FeaturePyramidNetwork(2048)
        self.head = det_mod.DBHead(256)

    def fpn_forward(self, feats):
        last = self.inner_blocks[0](feats[0])
        out = self.layer_blocks[0](last)
        for i in range(1, len(self.inner_blocks)):
            lateral = self.inner_blocks[i](feats[i])
            last = lateral + F.interpolate(
                last, scale_factor=2, mode="nearest"
            )
            out = self.layer_blocks[i](last)
        return out  # finest level (stride 4); head upsamples 4x -> input res

    det_mod.DBNet.__init__ = dbnet_init
    det_mod.DBNet.forward = lambda self, x: self.head(
        self.fpn(self.backbone(x))
    )
    det_mod.FeaturePyramidNetwork.forward = fpn_forward


# -- the same clips bench.py uses ------------------------------------------
from bench import make_clip  # noqa: E402


def make_1080p_clip(path: str) -> None:
    import cv2

    w, h = 1920, 1080
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (w, h)
    )
    yy, xx = np.mgrid[0:h, 0:w]
    base = (90 + 50 * np.sin(xx / 300.0) + 40 * np.cos(yy / 200.0)).astype(
        np.uint8
    )
    for i in range(8 * 30):
        frame = np.stack([base, base + 15, base + 30], axis=-1).astype(
            np.uint8
        )
        cv2.putText(
            frame, "PERSISTENT TEXT", (300, 540),
            cv2.FONT_HERSHEY_SIMPLEX, 3.0, (0, 0, 0), 8,
        )
        writer.write(frame)
    writer.release()


def bench_config1(pipe_mod) -> dict:
    """Single 640x640-frame detection latency (reference detect API)."""
    det_mod = sys.modules["refapp.ml.models.text_detector"]
    detector = det_mod.TextDetector()
    frame = np.random.default_rng(0).integers(
        0, 255, (640, 640, 3), np.uint8
    )
    detector.detect(frame)  # warm
    n = 10
    t0 = time.time()
    for _ in range(n):
        detector.detect(frame)
    fps = n / (time.time() - t0)
    return {"metric": "dbnet_single_frame_detect_fps", "value": fps}


def bench_config2(pipe_mod) -> dict:
    """CRNN recognition over pre-cropped text lines (reference batch API)."""
    rec_mod = sys.modules["refapp.ml.models.text_recognizer"]
    rec = rec_mod.TextRecognizer(None, use_transformer=False)
    rng = np.random.default_rng(0)
    crops = [
        rng.integers(0, 255, (32, rng.integers(60, 200), 3), np.uint8)
        for _ in range(512)
    ]
    rec.recognize_batch(crops[:64])  # warm
    t0 = time.time()
    for i in range(0, 512, 64):
        rec.recognize_batch(crops[i:i + 64])
    cps = 512 / (time.time() - t0)
    return {"metric": "crnn_ctc_crops_per_sec", "value": cps}


def _run_pipeline_on(pipe_mod, clip: str) -> dict:
    pipeline = pipe_mod.VideoTextPipeline(
        use_transformer_ocr=False, batch_size=16
    )
    t0 = time.time()
    result = asyncio.run(pipeline.process_video(clip, ""))
    elapsed = time.time() - t0
    assert result["status"] == "success", result.get("error")
    frames = result["summary"]["total_frames"]
    return {
        "frames": frames,
        "elapsed": elapsed,
        "fps": frames / elapsed,
        "detections": result["summary"]["total_detections"],
    }


def bench_config3(pipe_mod) -> dict:
    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "bench_720p.mp4")
        make_clip(clip)
        r = _run_pipeline_on(pipe_mod, clip)
    return {
        "metric": "e2e_720p_ocr_frames_per_sec", "value": r["fps"],
        "detail": r,
    }


def bench_config4(pipe_mod) -> dict:
    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "bench_1080p.mp4")
        make_1080p_clip(clip)
        r = _run_pipeline_on(pipe_mod, clip)
    return {
        "metric": "e2e_1080p_ocr_frames_per_sec", "value": r["fps"],
        "detail": r,
    }


def bench_config5(pipe_mod) -> dict:
    """3 concurrent videos through the reference pipeline (its
    intra-process concurrency: one pipeline, asyncio + 4-thread pool)."""
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(3):
            p = os.path.join(td, f"s{i}.mp4")
            make_clip(p, seconds=4)
            paths.append(p)
        pipeline = pipe_mod.VideoTextPipeline(
            use_transformer_ocr=False, batch_size=16
        )

        async def run_all():
            return await asyncio.gather(
                *[pipeline.process_video(p, "") for p in paths]
            )

        t0 = time.time()
        results = asyncio.run(run_all())
        elapsed = time.time() - t0
    total = sum(r["summary"]["total_frames"] for r in results)
    return {
        "metric": "multistream_aggregate_fps",
        "value": total / elapsed,
        "detail": {"frames": total, "elapsed": elapsed},
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="all")
    parser.add_argument("--out", default="BASELINE_measured.json")
    args = parser.parse_args()

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    pipe_mod = load_reference()

    benches = {
        "1": bench_config1, "2": bench_config2, "3": bench_config3,
        "4": bench_config4, "5": bench_config5,
    }
    todo = benches.keys() if args.config == "all" else [args.config]

    out = {}
    if os.path.exists(args.out):
        out = json.load(open(args.out))
    out.setdefault("hardware", "CPU (%d core(s), torch %s)" % (
        os.cpu_count() or 1, torch.__version__))
    results = out.setdefault("configs", {})
    for key in todo:
        t0 = time.time()
        r = benches[key](pipe_mod)
        r["measured_wall_s"] = round(time.time() - t0, 1)
        results[key] = r
        print(json.dumps({key: r}), flush=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
