from .config import Settings, settings
from .schemas import (
    Detection,
    FrameResult,
    PipelineSummary,
    RecognizedRegion,
    VideoResult,
)

__all__ = [
    "Settings",
    "settings",
    "Detection",
    "RecognizedRegion",
    "FrameResult",
    "PipelineSummary",
    "VideoResult",
]
