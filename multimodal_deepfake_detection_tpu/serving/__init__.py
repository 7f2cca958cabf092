"""Online serving: dynamic micro-batching + an HTTP scoring daemon.

The torch reference has no serving at all — its eval scripts are offline
batch loops (/root/reference/test_visual.py:572-646 etc.). This subpackage is
a beyond-parity production-serving layer over the engines in
``models/serve.py``: single-clip requests are coalesced into TPU-shaped
micro-batches whose (batch, time) axes are padded to a small fixed bucket
grid, so a live daemon compiles a bounded program set no matter what traffic
looks like.
"""
from .batcher import (
    AudioAdapter,
    AUFaceAdapter,
    AUPatchAdapter,
    AVAdapter,
    MicroBatcher,
    VisualAdapter,
)
from .daemon import ServingDaemon

__all__ = [
    "MicroBatcher",
    "VisualAdapter",
    "AudioAdapter",
    "AUFaceAdapter",
    "AUPatchAdapter",
    "AVAdapter",
    "ServingDaemon",
]
