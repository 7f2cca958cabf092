"""BN folding must be numerically exact vs unfolded eval forward (fp32)."""
import numpy as np

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn, folded_xception_apply
from multimodal_deepfake_detection_tpu.models.xception import xception_apply, xception_init


def test_folded_matches_eval_forward():
    rng = jax.random.PRNGKey(0)
    params, state = xception_init(rng, num_classes=3)
    # randomize BN stats so folding is non-trivial
    ks = jax.random.split(rng, 4)
    state = jax.tree_util.tree_map(
        lambda x: x + 0.3 * jax.random.normal(ks[0], x.shape) if x.ndim else x, state
    )
    state = jax.tree_util.tree_map(lambda x: jnp.where(x <= 0.05, 0.6, x) if x.ndim else x, state)

    x = jax.random.uniform(ks[1], (2, 64, 64, 3))
    ref, _ = xception_apply(params, state, x, train=False)
    folded = fold_xception_bn(params, state)
    out = folded_xception_apply(folded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_folded_features_only():
    params, state = xception_init(jax.random.PRNGKey(1), num_classes=None)
    folded = fold_xception_bn(params, state)
    out = folded_xception_apply(folded, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2048)


def test_folded_resnet18_matches_eval_forward():
    from multimodal_deepfake_detection_tpu.models.fold import (
        fold_resnet18_bn,
        folded_resnet18_apply,
    )
    from multimodal_deepfake_detection_tpu.models.resnet import resnet18_apply, resnet18_init

    rng = jax.random.PRNGKey(2)
    params, state = resnet18_init(rng)
    ks = jax.random.split(rng, 2)
    state = jax.tree_util.tree_map(
        lambda x: jnp.abs(x + 0.3 * jax.random.normal(ks[0], x.shape)) + 0.05 if x.ndim else x,
        state,
    )
    x = jax.random.uniform(ks[1], (2, 64, 64, 3))
    ref, _ = resnet18_apply(params, state, x, train=False)
    out = folded_resnet18_apply(fold_resnet18_bn(params, state), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
