from .detector import TextDetector
from .recognizer import TextRecognizer
from .pipeline import VideoTextPipeline

__all__ = ["TextDetector", "TextRecognizer", "VideoTextPipeline"]
