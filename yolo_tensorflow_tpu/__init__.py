"""yolo_tensorflow_tpu — a TPU-native (JAX/XLA/Pallas/pjit) YOLO detection framework.

A from-scratch re-design of the capabilities of Robinatp/YOLO_Tensorflow
(TF-1.x/TF-Slim + Darknet C/CUDA) as one functional, jit-compiled framework:

  * darknet ``.weights`` byte streams parse directly into JAX pytrees with
    batch-norm folded into convolutions at load time
    (replaces /root/reference .../src/parser.c:1241 and every per-model
    ``_load_weights`` Python twin),
  * six model variants (YOLOv1, YOLOv1-tiny, YOLOv2, YOLOv2-tiny-VOC,
    YOLOv3, YOLOv3-tiny) expressed as declarative layer specs over a single
    functional apply engine (replaces the reference's five copy-paste
    pipelines, e.g. YOLO_V3/.../YOLOV3.py:274),
  * anchor decode, scoring, thresholding and batched class-aware NMS run
    entirely on device with static shapes (replaces tf.boolean_mask +
    tf.image.non_max_suppression dynamic-shape graphs),
  * a pjit/shard_map data-parallel training loop with psum gradient
    all-reduce over ICI (replaces src/network.c:1091 ``train_networks`` /
    ``sync_nets`` pthread weight averaging),
  * ``jax.export`` serialized inference artifacts (replaces frozen-pb
    export, e.g. yOLO_v2_export_graph.py:22-27).
"""

__version__ = "0.1.0"

from yolo_tensorflow_tpu.config import ModelConfig, get_config, MODEL_NAMES

__all__ = ["ModelConfig", "get_config", "MODEL_NAMES", "__version__"]
