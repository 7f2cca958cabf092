"""Fused middle-flow Pallas kernel: numerical parity vs the XLA folded path
(interpret mode on CPU; the real Mosaic compile is exercised on TPU by
bench.py --pallas)."""
import numpy as np

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn, folded_xception_apply
from multimodal_deepfake_detection_tpu.models.xception import xception_init
from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_block import (
    is_middle_block,
    middle_block_pallas,
    pack_middle_block,
)


def _ref_block(x, dw, pw, b):
    """XLA reference of the fused block on (B, H, W, C)."""
    h = x.astype(jnp.float32)
    reps, _, C = dw.shape
    for r in range(reps):
        h = jax.nn.relu(h)
        taps = dw[r].reshape(3, 3, 1, C)
        h = jax.lax.conv_general_dilated(
            h, taps, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        )
        h = jnp.einsum("bhwc,cd->bhwd", h, pw[r].astype(jnp.float32)) + b[r]
    return h + x.astype(jnp.float32)


def test_middle_block_kernel_matches_reference():
    rng = jax.random.PRNGKey(0)
    B, H, W, C, reps = 2, 8, 8, 16, 3
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    dw = jax.random.normal(ks[1], (reps, 9, C)) * 0.2
    pw = jax.random.normal(ks[2], (reps, C, C)) * 0.1
    b = jax.random.normal(ks[3], (reps, C)) * 0.05
    ref = _ref_block(x, dw, pw, b)
    out = middle_block_pallas(x, dw, pw, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_middle_block_kernel_v2_variants_match_v1():
    """v2 (round-2 rewrite) must be bit-identical to v1 in precise mode and
    within bf16-accumulation tolerance otherwise, across grid/packing configs
    (multi-step grids exercise the zero-margins-once scratch reuse)."""
    from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_block import middle_block_pallas_v2

    rng = jax.random.PRNGKey(7)
    B, H, W, C, reps = 8, 8, 8, 16, 3
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    dw = jax.random.normal(ks[1], (reps, 9, C)) * 0.2
    pw = jax.random.normal(ks[2], (reps, C, C)) * 0.1
    b = jax.random.normal(ks[3], (reps, C)) * 0.05
    v1 = np.asarray(middle_block_pallas(x, dw, pw, b, interpret=True))
    for kwargs in (
        dict(precise=True, images_per_step=1),
        dict(precise=True, images_per_step=4),
        dict(precise=True, images_per_step=4, per_image_dot=True),
        dict(precise=True, images_per_step=2, pad_fp32=True),
    ):
        v2 = np.asarray(middle_block_pallas_v2(x, dw, pw, b, interpret=True, **kwargs))
        np.testing.assert_allclose(v2, v1, rtol=2e-2, atol=2e-2, err_msg=str(kwargs))
    # bf16 accumulation: inference-grade tolerance
    v2f = np.asarray(middle_block_pallas_v2(x, dw, pw, b, interpret=True, precise=False))
    np.testing.assert_allclose(v2f, v1, rtol=6e-2, atol=6e-2)


def test_folded_apply_with_pallas_matches_plain():
    params, state = xception_init(jax.random.PRNGKey(1), num_classes=3)
    folded = fold_xception_bn(params, state)
    assert sum(is_middle_block(bp) for bp in folded["blocks"]) == 8
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    ref = folded_xception_apply(folded, x)
    out = folded_xception_apply(folded, x, use_pallas=True, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-3)


def test_sepconv_unit_kernel_matches_reference():
    from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_unit import sepconv_unit_pallas

    rng = jax.random.PRNGKey(4)
    B, H, W, Cin, Cout = 2, 9, 7, 8, 16  # odd dims exercise stripe remainders
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (B, H, W, Cin), jnp.float32)
    dw = jax.random.normal(ks[1], (9, Cin)) * 0.2
    pw = jax.random.normal(ks[2], (Cin, Cout)) * 0.1
    b = jax.random.normal(ks[3], (Cout,)) * 0.05

    h = jax.nn.relu(x)
    taps = dw.reshape(3, 3, 1, Cin)
    ref = jax.lax.conv_general_dilated(
        h, taps, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=Cin,
    )
    ref = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", ref, pw) + b, 0.0)
    out = sepconv_unit_pallas(
        x, dw, pw, b, leading_relu=True, trailing_relu=True, row_tile=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_pack_middle_block_shapes():
    params, state = xception_init(jax.random.PRNGKey(3), num_classes=None)
    folded = fold_xception_bn(params, state)
    middle = [bp for bp in folded["blocks"] if is_middle_block(bp)][0]
    dw, pw, b = pack_middle_block(middle)
    assert dw.shape == (3, 9, 728) and pw.shape == (3, 728, 728) and b.shape == (3, 728)


def test_fused_entry_blocks_match_plain(monkeypatch):
    """Whole-block entry fusion (sepconv_entry.py) incl. the padded-boundary
    chaining between consecutive fused blocks: force fusion of the block
    shapes a 64^2 input produces (H = 29, 15 — below the TPU perf gate) and
    compare against the plain folded path."""
    monkeypatch.setenv("MDFD_ENTRY_FUSE_H", "29,15")
    params, state = xception_init(jax.random.PRNGKey(3), num_classes=3)
    folded = fold_xception_bn(params, state)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    ref = folded_xception_apply(folded, x)
    out = folded_xception_apply(folded, x, use_pallas=True, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-3)


def test_fused_entry_block_op_matches_xla():
    """entry_block_pallas vs XLA pair+pool+skip on odd/even H, Cmid != Cout,
    and lane-unaligned channels (the pad path)."""
    from multimodal_deepfake_detection_tpu.ops.conv import conv2d, max_pool2d
    from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_entry import entry_block

    rng = np.random.default_rng(0)
    for (H, Cin, Cmid, Cout, lead) in [
        (12, 64, 128, 128, False), (13, 128, 256, 256, True), (10, 16, 40, 40, True),
        (9, 40, 16, 32, False),
    ]:
        B = 2
        x = jnp.asarray(rng.standard_normal((B, H, H, Cin)) * 0.5, jnp.bfloat16)
        dw0 = jnp.asarray(rng.standard_normal((9, Cin)) * 0.1, jnp.float32)
        pw0 = jnp.asarray(rng.standard_normal((Cin, Cmid)) * 0.02, jnp.float32)
        b0 = jnp.asarray(rng.standard_normal((Cmid,)) * 0.01, jnp.float32)
        dw1 = jnp.asarray(rng.standard_normal((9, Cmid)) * 0.1, jnp.float32)
        pw1 = jnp.asarray(rng.standard_normal((Cmid, Cout)) * 0.02, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)
        skw = jnp.asarray(rng.standard_normal((Cin, Cout)) * 0.02, jnp.float32)
        skb = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)

        h = x.astype(jnp.float32)
        if lead:
            h = jax.nn.relu(h)
        hb = h.astype(jnp.bfloat16)
        hb = conv2d({"w": dw0.reshape(3, 3, 1, Cin).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cin)
        hb = conv2d({"w": pw0.reshape(1, 1, Cin, Cmid).astype(jnp.bfloat16)}, hb.astype(jnp.bfloat16)) + b0
        hb = jax.nn.relu(hb).astype(jnp.bfloat16)
        hb = conv2d({"w": dw1.reshape(3, 3, 1, Cmid).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cmid)
        hb = conv2d({"w": pw1.reshape(1, 1, Cmid, Cout).astype(jnp.bfloat16)}, hb.astype(jnp.bfloat16)) + b1
        u = max_pool2d(hb.astype(jnp.bfloat16), 3, 2, 1)
        skip = conv2d({"w": skw.reshape(1, 1, Cin, Cout).astype(jnp.bfloat16)}, x.astype(jnp.bfloat16), stride=2, padding=0) + skb
        want = u.astype(jnp.float32) + skip.astype(jnp.float32)

        got = entry_block(
            x, dw0, pw0, b0, dw1, pw1, b1, skw, skb,
            leading_relu0=lead, row_chunk=96, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=3e-2, atol=3e-2, err_msg=f"H={H} {Cin}->{Cmid}->{Cout}",
        )


def test_striped_entry_block_matches_xla():
    """entry_block_striped_pallas: multi-stripe pooling carry, odd/even H,
    ragged pooled-row emission, Cmid != Cout (interpret mode)."""
    from multimodal_deepfake_detection_tpu.ops.conv import conv2d, max_pool2d
    from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_entry_striped import entry_block_striped

    rng = np.random.default_rng(1)
    for (H, Cin, Cmid, Cout, lead, SH) in [
        (15, 8, 16, 16, False, 5), (12, 8, 8, 24, True, 4), (9, 16, 8, 16, True, 3),
    ]:
        B = 2
        x = jnp.asarray(rng.standard_normal((B, H, H, Cin)) * 0.5, jnp.bfloat16)
        dw0 = jnp.asarray(rng.standard_normal((9, Cin)) * 0.1, jnp.float32)
        pw0 = jnp.asarray(rng.standard_normal((Cin, Cmid)) * 0.02, jnp.float32)
        b0 = jnp.asarray(rng.standard_normal((Cmid,)) * 0.01, jnp.float32)
        dw1 = jnp.asarray(rng.standard_normal((9, Cmid)) * 0.1, jnp.float32)
        pw1 = jnp.asarray(rng.standard_normal((Cmid, Cout)) * 0.02, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)
        skw = jnp.asarray(rng.standard_normal((Cin, Cout)) * 0.02, jnp.float32)
        skb = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)

        h = x.astype(jnp.float32)
        if lead:
            h = jax.nn.relu(h)
        hb = h.astype(jnp.bfloat16)
        hb = conv2d({"w": dw0.reshape(3, 3, 1, Cin).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cin)
        hb = conv2d({"w": pw0.reshape(1, 1, Cin, Cmid).astype(jnp.bfloat16)}, hb.astype(jnp.bfloat16)) + b0
        hb = jax.nn.relu(hb).astype(jnp.bfloat16)
        hb = conv2d({"w": dw1.reshape(3, 3, 1, Cmid).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cmid)
        hb = conv2d({"w": pw1.reshape(1, 1, Cmid, Cout).astype(jnp.bfloat16)}, hb.astype(jnp.bfloat16)) + b1
        u = max_pool2d(hb.astype(jnp.bfloat16), 3, 2, 1)
        skip = conv2d({"w": skw.reshape(1, 1, Cin, Cout).astype(jnp.bfloat16)}, x.astype(jnp.bfloat16), stride=2, padding=0) + skb
        want = u.astype(jnp.float32) + skip.astype(jnp.float32)

        got = entry_block_striped(
            x, dw0, pw0, b0, dw1, pw1, b1, skw, skb,
            leading_relu0=lead, stripe_rows=SH, row_chunk=96, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=3e-2, atol=3e-2, err_msg=f"H={H} SH={SH}",
        )


def test_striped_then_fused_entry_chain_matches_plain(monkeypatch):
    """Striped block1 chained into whole-image fused block2/3 (the
    MDFD_ENTRY_FUSE_H=125,63,32 serving experiment at 256^2): the striped
    kernel's storage pad is NOT the whole-image kernel's bordered valid_w
    layout, so fold.py must densify between them (regression for the
    mis-shaped-BlockSpec chaining bug, PERF.md r3 small-batch study).
    210^2 input -> block1 H=102 (striped: > whole-image VMEM cap),
    block2 H=51, block3 H=26 (whole-image)."""
    monkeypatch.setenv("MDFD_ENTRY_FUSE_H", "102,51,26")
    params, state = xception_init(jax.random.PRNGKey(5), num_classes=3)
    folded = fold_xception_bn(params, state)
    # bf16 activations as on the serving path (the striped kernel's stripe
    # scratch is bf16)
    x = jnp.asarray(
        jax.random.uniform(jax.random.PRNGKey(6), (1, 210, 210, 3)), jnp.bfloat16
    )
    ref = folded_xception_apply(folded, x, compute_dtype=jnp.bfloat16)
    out = folded_xception_apply(
        folded, x, compute_dtype=jnp.bfloat16, use_pallas=True, pallas_interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=6e-2, atol=2e-2
    )
