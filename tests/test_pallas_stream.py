"""Streamed sepconv-pair kernel: interpret-mode parity (hardware runs are in
PERF.md; the op is not in the default serving path — measured slower than
XLA at entry shapes — but must stay correct)."""
import numpy as np

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_stream import (
    pack_pair,
    sepconv_pair_stream_pallas,
)


def _ref(x, dw0, pw0, b0, dw1, pw1, b1, relu0):
    Cin, Cmid = pw0.shape
    h = jnp.maximum(x, 0) if relu0 else x
    h = jax.lax.conv_general_dilated(
        h, dw0.reshape(3, 3, 1, Cin), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=Cin,
    )
    h = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", h, pw0) + b0, 0)
    h = jax.lax.conv_general_dilated(
        h, dw1.reshape(3, 3, 1, Cmid), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=Cmid,
    )
    return jnp.einsum("bhwc,cd->bhwd", h, pw1) + b1


def test_stream_pair_matches_reference_all_stripe_layouts():
    rng = jax.random.PRNGKey(0)
    B, H, W, Cin, Cmid, Cout = 3, 11, 7, 8, 16, 24
    ks = jax.random.split(rng, 7)
    x = jax.random.normal(ks[0], (B, H, W, Cin), jnp.float32)
    dw0 = jax.random.normal(ks[1], (9, Cin)) * 0.2
    pw0 = jax.random.normal(ks[2], (Cin, Cmid)) * 0.1
    b0 = jax.random.normal(ks[3], (Cmid,)) * 0.3
    dw1 = jax.random.normal(ks[4], (9, Cmid)) * 0.2
    pw1 = jax.random.normal(ks[5], (Cmid, Cout)) * 0.1
    b1 = jax.random.normal(ks[6], (Cout,)) * 0.3
    for relu0 in (False, True):
        ref = _ref(x, dw0, pw0, b0, dw1, pw1, b1, relu0)
        for stripes in (4, 11, 32):  # partial last stripe / single stripe / oversize
            got = sepconv_pair_stream_pallas(
                x, dw0, pw0, b0, dw1, pw1, b1,
                leading_relu0=relu0, stripe_rows=stripes, interpret=True,
            )
            # bf16 staging inside the kernel bounds the tolerance
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.15, atol=0.15)
            d = np.abs(np.asarray(got) - np.asarray(ref))
            assert d.mean() < 0.02, f"relu0={relu0} stripes={stripes} mean diff {d.mean()}"


def test_pack_pair_shapes():
    from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn
    from multimodal_deepfake_detection_tpu.models.xception import xception_init

    params, state = xception_init(jax.random.PRNGKey(1), num_classes=None)
    folded = fold_xception_bn(params, state)
    dw0, pw0, b0, dw1, pw1, b1 = pack_pair(folded["blocks"][0])  # block1: 64->128->128
    assert dw0.shape == (9, 64) and pw0.shape == (64, 128) and b0.shape == (128,)
    assert dw1.shape == (9, 128) and pw1.shape == (128, 128) and b1.shape == (128,)
