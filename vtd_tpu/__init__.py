"""vtd_tpu — TPU-native video text detection & recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``malak29/video-text-detection-system`` (reference mounted read-only at
/root/reference): a production video-OCR service with a DBNet text
detector (ResNet50-FPN + differentiable-binarization head), CRNN+CTC and
transformer (TrOCR-class) recognizers, a batched inference runtime, a
training stack, and a REST serving layer with job queueing, storage,
metrics and health monitoring.

Design principles (TPU-first, not a port):
  * Static shapes everywhere: fixed max-detections with masking, bucketed
    variable-width recognizer batches.
  * Fused on-device preprocessing (resize/normalize) and postprocessing
    (threshold -> connected components -> rotated-rect fit) instead of
    per-frame OpenCV on the host.
  * bfloat16 matmuls on the MXU; NHWC layouts; XLA-friendly control flow.
  * Scale-out via ``jax.sharding.Mesh`` + collectives over ICI, not a
    message queue per GPU.
"""

__version__ = "0.1.0"
