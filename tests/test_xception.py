"""Xception backbone: shape contract + fp32 logit parity vs the torch oracle
(the BASELINE.md 'per-frame logits within fp32 tolerance' requirement)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.xception import xception_init, xception_apply
from multimodal_deepfake_detection_tpu.utils.torch_port import xception_params_from_torch

from torch_mirror import MirrorXception


def test_init_shapes():
    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)
    assert params["conv1"]["w"].shape == (3, 3, 3, 32)
    assert len(params["blocks"]) == 12
    assert params["blocks"][0]["units"][0]["sep"]["depthwise"]["w"].shape == (3, 3, 1, 64)
    assert params["blocks"][11]["units"][1]["sep"]["pointwise"]["w"].shape == (1, 1, 728, 1024)
    assert params["fc"]["w"].shape == (2048, 2)
    # middle-flow blocks have no skip projection
    assert "skip" not in params["blocks"][3]
    assert "skip" in params["blocks"][0]


def test_forward_shapes_and_features_only():
    params, state = xception_init(jax.random.PRNGKey(1), num_classes=None)
    x = jnp.zeros((2, 64, 64, 3))
    feats, new_state = xception_apply(params, state, x)
    assert feats.shape == (2, 2048)
    assert jax.tree_util.tree_structure(new_state) == jax.tree_util.tree_structure(state)


def test_fp32_parity_with_torch_eval():
    torch.manual_seed(0)
    mirror = MirrorXception(num_classes=4).eval()
    # randomize BN stats so eval-mode normalization is actually exercised
    for m in mirror.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.5)
            m.running_var.data.uniform_(0.5, 1.5)

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = mirror(x).numpy()

    params, state = xception_params_from_torch(mirror.state_dict())
    out, _ = xception_apply(params, state, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


def test_fp32_parity_features_train_mode_bn():
    """Train-mode batch-stat BN must also agree (unfrozen-backbone fine-tuning)."""
    torch.manual_seed(1)
    mirror = MirrorXception(num_classes=None).train()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = mirror(x, features_only=True).numpy()
    # mirror forward updated torch running stats; rebuild converter inputs fresh
    torch.manual_seed(1)
    mirror2 = MirrorXception(num_classes=None)
    params, state = xception_params_from_torch(mirror2.state_dict())
    out, new_state = xception_apply(
        params, state, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=True
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)
    # running stats updated toward torch's post-forward values
    np.testing.assert_allclose(
        np.asarray(new_state["bn1"]["mean"]), mirror.bn1.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
