"""Position-major (POS, B, C) middle-flow kernel: interpret-mode parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_block import middle_block_pallas_v2
from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_pos import (
    from_pos_layout,
    middle_block_pos_pallas,
    to_pos_layout,
)


def test_pos_kernel_matches_v2_interpret():
    rng = np.random.default_rng(0)
    B, H, W, C = 4, 8, 8, 128
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    dw = jnp.asarray(rng.normal(0, 0.2, (3, 9, C)), jnp.float32)
    pw = jnp.asarray(rng.normal(0, 0.08, (3, C, C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (3, C)), jnp.float32)

    ref = middle_block_pallas_v2(
        x, dw, pw, b, interpret=True, precise=True, per_image_dot=True, images_per_step=2
    )
    out = middle_block_pos_pallas(
        to_pos_layout(x), dw, pw, b, interpret=True, batch_tile=2, pos_chunks=4
    )
    got = from_pos_layout(out, H, W)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pos_layout_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 5, 7, 16)), jnp.float32)
    xp = to_pos_layout(x)
    assert xp.shape == (35, 3, 16)
    np.testing.assert_array_equal(np.asarray(from_pos_layout(xp, 5, 7)), np.asarray(x))


def test_pos_routing_in_folded_net(monkeypatch):
    """MDFD_MIDDLE_LAYOUT=pos routes the middle run through the pos kernel
    with outputs equal to the standard pallas path."""
    monkeypatch.setenv("MDFD_MIDDLE_LAYOUT", "pos")
    from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn, folded_xception_apply
    from multimodal_deepfake_detection_tpu.models.xception import xception_init

    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)
    folded = fold_xception_bn(params, state)
    x = jnp.asarray(np.random.default_rng(0).random((2, 128, 128, 3)), jnp.float32)
    ref = folded_xception_apply(folded, x, compute_dtype=jnp.float32, use_pallas=False)
    got = folded_xception_apply(
        folded, x, compute_dtype=jnp.float32, use_pallas=True, pallas_interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
