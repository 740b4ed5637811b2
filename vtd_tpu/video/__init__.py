from .processor import VideoProcessor, ImageProcessor, AnnotationProcessor

__all__ = ["VideoProcessor", "ImageProcessor", "AnnotationProcessor"]
