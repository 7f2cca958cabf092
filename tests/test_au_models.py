"""AU subsystem: ResNet-18 torch parity, AU-patch classifier, cross detector."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.au_face import (
    au_face_detector_apply,
    au_face_detector_init,
)
from multimodal_deepfake_detection_tpu.models.resnet import (
    resnet18_apply,
    resnet18_init,
    resnet18_params_from_torch,
)
from multimodal_deepfake_detection_tpu.models.resnet_lstm import (
    au_patch_classifier_apply,
    au_patch_classifier_init,
)


# --- compact torch resnet18 mirror (torchvision is not installed here);
# key names follow torchvision so resnet18_params_from_torch is tested against
# the real checkpoint format ---
class _TorchBasic(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))
            if (stride != 1 or cin != cout)
            else None
        )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idn)


class _TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (cout, stride) in enumerate(((64, 1), (128, 2), (256, 2), (512, 2)), start=1):
            setattr(self, f"layer{i}", nn.Sequential(_TorchBasic(cin, cout, stride), _TorchBasic(cout, cout, 1)))
            cin = cout

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)


def test_resnet18_parity_with_torch():
    torch.manual_seed(0)
    mirror = _TorchResNet18().eval()
    for m in mirror.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.3)
            m.running_var.data.uniform_(0.5, 1.5)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = mirror(x).numpy()
    params, state = resnet18_params_from_torch(mirror.state_dict())
    out, _ = resnet18_apply(params, state, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


def test_au_patch_classifier_shapes_and_weight_blend():
    params, state = au_patch_classifier_init(jax.random.PRNGKey(0), hidden_dim=8, lstm_hidden=4)
    B, T, A = 2, 3, 4
    patches = jax.random.uniform(jax.random.PRNGKey(1), (B, T, A, 16, 16, 3))
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (B, T, A)), -1)
    logits, new_state = au_patch_classifier_apply(params, state, patches, w)
    assert logits.shape == (B, 1)
    # weights must change the output
    logits2, _ = au_patch_classifier_apply(params, state, patches, None)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))
    # pooled tap
    pooled, _ = au_patch_classifier_apply(params, state, patches, w, return_pooled=True)
    assert pooled.shape == (B, 2 * 4)


def test_au_face_detector_contract():
    """ctor + forward contract of train_au_face.py:594,656."""
    params, state = au_face_detector_init(
        jax.random.PRNGKey(0), num_aus=5, face_dim=32, au_dim=32, lstm_hidden=16
    )
    B, T, A = 2, 3, 5
    videos = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 24, 24, 3))
    patches = jax.random.uniform(jax.random.PRNGKey(2), (B, T, A, 16, 16, 3))
    mask = jnp.ones((B, T, A))
    weight = jnp.full((B, T, A), 0.2)
    logits, v_tokens, au_tokens, new_state = au_face_detector_apply(
        params, state, videos, patches, mask, weight
    )
    assert logits.shape == (B, 1)
    assert v_tokens.shape == (B, T, 32)
    assert au_tokens.shape == (B, T, 32)
    assert np.isfinite(np.asarray(logits)).all()
    # masking out all but one AU changes the AU stream
    mask2 = mask.at[:, :, 1:].set(0.0)
    _, _, au_tokens2, _ = au_face_detector_apply(params, state, videos, patches, mask2, weight)
    assert not np.allclose(np.asarray(au_tokens), np.asarray(au_tokens2), atol=1e-6)


def test_au_face_grad_flows():
    params, state = au_face_detector_init(
        jax.random.PRNGKey(0), num_aus=3, face_dim=16, au_dim=16, lstm_hidden=8
    )
    videos = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 16, 16, 3))
    patches = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 3, 8, 8, 3))

    def loss(p):
        logits, v, a, _ = au_face_detector_apply(p, state, videos, patches, train=True)
        return jnp.sum(logits) + jnp.mean(v**2) + jnp.mean(a**2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.8  # grads reach ~all params
