"""TPU-native multimodal deepfake-detection framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the PyTorch
reference ``Tonmoy1321/Multimodal-DeepFake-Detection`` (see ``SURVEY.md``):

* :mod:`.models` — Xception backbone, LSTM temporal heads (video + audio MFCC),
  AU-patch attention model, cross-modal face+AU fusion detector, ArcFace head.
* :mod:`.ops` — TPU-first building blocks: NHWC convolutions, scan-LSTM,
  bilinear resize, on-device MFCC frontend, Pallas kernels for hot paths.
* :mod:`.data` — npy-tree datasets (filename label contract), bucketed padded
  batching with masks, synthetic dataset generators, offline preprocessing.
* :mod:`.metrics` — ROC/AUC/pAUC/EER/AP suite (both metric variants used by the
  reference eval harnesses).
* :mod:`.train` — sharded train loop: grad accumulation, clipping, EMA,
  plateau/one-cycle schedules, early stopping, best-checkpoint policy.
* :mod:`.parallel` — mesh construction and NamedSharding placement for
  data/model-parallel execution over a TPU slice.
"""

__version__ = "0.1.0"
