"""Torch-checkpoint migration: .pth flavors -> npz bundles, logits preserved."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.cli import import_torch
from multimodal_deepfake_detection_tpu.core.checkpoint import load_bundle, merge_params
from multimodal_deepfake_detection_tpu.models.heads import (
    xception_lstm_head_apply,
    xception_lstm_init,
)
from multimodal_deepfake_detection_tpu.models.xception import xception_apply, xception_init

from torch_mirror import MirrorXception


class _MirrorLSTMHead(torch.nn.Module):
    """Reference XceptionLSTMV layout (feature_extractor/lstm/fc_layers/fc_out)."""

    def __init__(self, hidden=8):
        super().__init__()
        self.feature_extractor = MirrorXception(num_classes=None)
        self.lstm = torch.nn.LSTM(2048, hidden, batch_first=True)
        layers = []
        dims = [hidden, 1024, 1024, 1024, 1024]
        for a, b in zip(dims[:-1], dims[1:]):
            layers += [torch.nn.Linear(a, b), torch.nn.ReLU(), torch.nn.Dropout(0.3)]
        self.fc_layers = torch.nn.Sequential(*layers)
        self.fc_out = torch.nn.Linear(1024, 1)


def test_import_plain_xception(tmp_path):
    torch.manual_seed(0)
    mirror = MirrorXception(num_classes=5).eval()
    src, dst = str(tmp_path / "x.pth"), str(tmp_path / "x.npz")
    torch.save(mirror.state_dict(), src)
    import_torch.main(["--src", src, "--dst", dst], log=lambda s: None)

    bundle = load_bundle(dst)
    params, state = xception_init(jax.random.PRNGKey(0), num_classes=5)
    params = merge_params(params, bundle["model"], strict=True)
    state = merge_params(state, bundle["state"], strict=True)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = mirror(x).numpy()
    out, _ = xception_apply(params, state, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


def test_embed_head_conversion(tmp_path):
    torch.manual_seed(3)
    embed = torch.nn.Sequential(
        torch.nn.Linear(32, 16), torch.nn.ReLU(), torch.nn.Dropout(0.2), torch.nn.Linear(16, 8)
    ).eval()
    from multimodal_deepfake_detection_tpu.models.heads import embed_head_apply
    from multimodal_deepfake_detection_tpu.utils.torch_port import embed_head_params_from_torch

    params = embed_head_params_from_torch({k: v for k, v in embed.state_dict().items()})
    x = torch.randn(3, 32)
    with torch.no_grad():
        ref = embed(x).numpy()
    got = embed_head_apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_import_lstm_head_and_arcface_bundle(tmp_path):
    torch.manual_seed(1)
    m = _MirrorLSTMHead(hidden=8).eval()
    af_w = torch.randn(2, 8)
    src, dst = str(tmp_path / "v.pth"), str(tmp_path / "v.npz")
    torch.save({"model": m.state_dict(), "arcface": {"weight": af_w}}, src)
    import_torch.main(["--src", src, "--dst", dst], log=lambda s: None)

    bundle = load_bundle(dst)
    init_params, init_state = xception_lstm_init(jax.random.PRNGKey(0), 8)
    params = merge_params(init_params, bundle["model"], strict=True)
    state = merge_params(init_state, bundle["state"], strict=True)
    np.testing.assert_allclose(np.asarray(bundle["arcface"]["w"]), af_w.numpy())

    # head-path parity on shared random features (backbone covered above)
    feats = torch.randn(2, 3, 2048)
    with torch.no_grad():
        lstm_out, _ = m.lstm(feats)
        ref = torch.sigmoid(m.fc_out(m.fc_layers(lstm_out[:, -1]))).numpy()
    got = xception_lstm_head_apply(params, jnp.asarray(feats.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)
