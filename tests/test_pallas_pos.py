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


def _emulate_w8_block(x, dw, pw_q, s_w, s_in, s_dq, b):
    """numpy reference of middle_block_pos_pallas_w8: bf16 relu pad, fp32
    taps, per-channel round/clip int8 requant, integer matmul, fused scalar
    dequant + bias, residual on the last rep, bf16 inter-rep storage."""
    import numpy as onp

    B, H, W, C = x.shape
    reps = dw.shape[0]
    h = onp.asarray(x, onp.float32)
    x0 = onp.asarray(jnp.asarray(x, jnp.bfloat16), onp.float32)
    for r in range(reps):
        a = onp.asarray(jnp.asarray(onp.maximum(h, 0), jnp.bfloat16), onp.float32)
        ap = onp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = onp.zeros((B, H, W, C), onp.float32)
        for dy in range(3):
            for dx in range(3):
                acc += ap[:, dy : dy + H, dx : dx + W, :] * dw[r, dy * 3 + dx][None, None, None, :]
        qa = onp.clip(onp.round(acc / s_in[r][None, None, None, :]), -127, 127).astype(onp.int64)
        o = qa @ onp.asarray(pw_q[r], onp.int64)
        o = o.astype(onp.float32) * (s_dq[r] * onp.asarray(s_w[r]))[None, None, None, :] + b[r]
        if r + 1 == reps:
            o = o + x0
        h = onp.asarray(jnp.asarray(o, jnp.bfloat16), onp.float32)
    return h


def test_pos_w8_kernel_matches_integer_emulation():
    from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_pos import (
        middle_block_pos_pallas_w8,
    )

    rng = np.random.default_rng(2)
    B, H, W, C = 2, 4, 4, 128
    reps = 3
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    dw = jnp.asarray(rng.normal(0, 0.2, (reps, 9, C)), jnp.float32)
    pw = rng.normal(0, 0.08, (reps, C, C)).astype(np.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (reps, C)), jnp.float32)
    # per-rep per-output-channel weight quantization + per-input-channel
    # activation scales with a scalar dequant factor (the act_scales="channel"
    # folded form; a per-tensor tree is the s_in == s_dq special case)
    s_w = np.abs(pw).max(axis=1) / 127.0
    pw_q = np.clip(np.round(pw / s_w[:, None, :]), -127, 127).astype(np.int8)
    s_dq = np.asarray([2.5 / 127.0] * reps, np.float32)
    s_in = (s_dq[:, None] * rng.uniform(0.5, 2.0, (reps, C))).astype(np.float32)

    out = middle_block_pos_pallas_w8(
        to_pos_layout(x),
        dw,
        jnp.asarray(pw_q),
        jnp.asarray(s_w),
        jnp.asarray(s_in),
        jnp.asarray(s_dq),
        b,
        interpret=True,
        batch_tile=2,
        pos_chunks=4,
    )
    got = np.asarray(from_pos_layout(out, H, W), np.float32)
    ref = _emulate_w8_block(
        np.asarray(x, np.float32), np.asarray(dw), pw_q, s_w, s_in, s_dq, np.asarray(b)
    )
    # fp32 tap order + the 1/s_in tap folding differ slightly from the
    # emulation's divide-at-the-end; both are then rounded to int8, so any
    # disagreement is a +/-1 LSB flip on values near .5 boundaries
    lsb = (s_in[:, None] * s_w).max() * C  # worst case: every lane flips
    np.testing.assert_allclose(got, ref, atol=float(lsb) * 0.05 + 0.05, rtol=0.02)
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9)
    assert cos > 0.999, cos


def test_pos_kernels_pad_odd_batches():
    """Mosaic needs sublane blocks in multiples of 8: odd batch axes (e.g.
    B*T=22 from a 2-clip x 11-frame audio batch) pad UP to the tile instead
    of the tile shrinking below 8 (which Mosaic rejects). Outputs equal the
    per-image math regardless of padding."""
    from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_block import (
        middle_block_pallas_v2,
    )

    rng = np.random.default_rng(3)
    B, H, W, C = 3, 4, 4, 128  # B=3: pads to one 8-wide tile
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    dw = jnp.asarray(rng.normal(0, 0.2, (3, 9, C)), jnp.float32)
    pw = jnp.asarray(rng.normal(0, 0.08, (3, C, C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (3, C)), jnp.float32)

    ref = middle_block_pallas_v2(
        x, dw, pw, b, interpret=True, precise=True, per_image_dot=True, images_per_step=1
    )
    out = middle_block_pos_pallas(
        to_pos_layout(x), dw, pw, b, interpret=True, batch_tile=8, pos_chunks=4
    )
    assert out.shape == (H * W, B, C)
    np.testing.assert_array_equal(np.asarray(from_pos_layout(out, H, W)), np.asarray(ref))
