"""One-train-step gradient parity against the PyTorch reference semantics.

VERDICT r3 item 3: eval parity is covered end-to-end
(tests/test_auc_parity_e2e.py), but training semantics — the ArcFace/CE
backward and the custom fused BN VJP (ops/conv.py) — had no external oracle.
This test closes that: ONE identical train step (same imported weights, same
batch, plain SGD, backbone UNFROZEN, BN in batch-stats mode) runs through

* a torch mirror of the reference's live ArcFace step
  (/root/reference/train_visual.py:567-577: embed -> ArcFace-with-margin ->
  cross-entropy -> backward -> optimizer step), and
* this stack's real step machinery (train.steps.make_train_step over the same
  forward train_visual.build composes),

then the POST-STEP parameters from both stacks are converted through the
tested import path (cli/import_torch.convert) and compared. Since the initial
weights are bit-identical after conversion, parameter differences are exactly
lr * (grad_torch - grad_jax): agreement certifies the whole backward pass —
conv/sepconv VJPs, the custom batch-stats BN VJP, LSTM-scan backward, ArcFace
acos/cos backward, CE softmax backward — against torch autograd.

Both stacks run in FLOAT64 (torch ``.double()``, jax ``enable_x64``; the
framework's precision-sensitive casts are ``at_least_f32`` so fp64 flows
through). fp32 would be a mush oracle here: the gradient itself is
ill-conditioned in fp32 — measured jax-fp32 vs jax-fp64 disagreement of the
IDENTICAL forward reaches 1e-2 of per-tensor scale in middle blocks and 2.7x
relative on deep BN biases (whose true grads nearly cancel: a bias shift is
removed by the next BN's mean subtraction). In fp64 the two stacks agree to
~1e-9, which pins the SEMANTICS exactly.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import contextlib  # noqa: E402

import optax  # noqa: E402


@contextlib.contextmanager
def enable_x64():
    """Scoped jax_enable_x64 (this jax build has no public context manager;
    the compilation cache is keyed on the config value, so flipping it back
    cannot poison other tests' traced programs)."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

from multimodal_deepfake_detection_tpu.cli import import_torch  # noqa: E402
from multimodal_deepfake_detection_tpu.models.heads import (  # noqa: E402
    arcface_apply,
    xception_lstm_embed,
    xception_lstm_features,
)
from multimodal_deepfake_detection_tpu.models.losses import cross_entropy_loss  # noqa: E402

pytestmark = pytest.mark.slow  # fp64 full-model grad-step parity vs torch (~2.5 min)
from multimodal_deepfake_detection_tpu.train import TrainState  # noqa: E402
from multimodal_deepfake_detection_tpu.train.steps import make_train_step  # noqa: E402
from test_auc_parity_e2e import _TorchVisualRef  # noqa: E402

HIDDEN = 8
S, M = 30.0, 0.5
LR = 0.05
B, T, SIZE = 4, 2, 32


def _torch_arcface_margin_logits(emb, w, labels):
    """ArcFaceHead.forward with labels (/root/reference/train_visual.py:464-474)."""
    x = emb / emb.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    wn = w / w.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    cos = x @ wn.T
    theta = torch.acos(torch.clamp(cos, -1 + 1e-7, 1 - 1e-7))
    target = torch.cos(theta + M)
    one_hot = torch.nn.functional.one_hot(labels, 2).to(cos.dtype)
    return S * (cos * (1 - one_hot) + target * one_hot)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def test_one_sgd_step_matches_torch():
    torch.manual_seed(0)
    model = _TorchVisualRef(hidden=HIDDEN).double()
    model.train()
    af_w = torch.nn.Parameter(torch.randn(2, HIDDEN, dtype=torch.float64))

    rng = np.random.default_rng(0)
    video = rng.uniform(0, 1, (B, T, SIZE, SIZE, 3))  # float64
    labels = np.array([0, 1, 0, 1], np.int64)
    lengths = np.full((B,), T, np.int32)

    # --- import the SAME initial weights into this stack -------------------
    # (convert under x64 — jnp.asarray truncates fp64 to fp32 otherwise)
    raw0 = {
        "model": {k: v.detach().clone() for k, v in model.state_dict().items()},
        "arcface": {"weight": af_w.detach().clone()},
    }
    with enable_x64():
        bundle0 = import_torch.convert(raw0, "auto", log=lambda s: None)

    # --- torch: one train step (SGD, fp64, unfrozen) -----------------------
    opt = torch.optim.SGD(list(model.parameters()) + [af_w], lr=LR)
    x = torch.from_numpy(video).permute(0, 1, 4, 2, 3).contiguous()
    t_labels = torch.from_numpy(labels)
    emb = model.embed(x)  # BN batch-stats mode + running-stat update
    logits = _torch_arcface_margin_logits(emb, af_w, t_labels)
    t_loss = torch.nn.functional.cross_entropy(logits, t_labels)
    opt.zero_grad()
    t_loss.backward()
    opt.step()
    raw1 = {
        "model": {k: v.detach().clone() for k, v in model.state_dict().items()},
        "arcface": {"weight": af_w.detach().clone()},
    }
    with enable_x64():
        bundle1 = import_torch.convert(raw1, "auto", log=lambda s: None)
    t_params = dict(bundle1["model"])
    t_params["arcface"] = bundle1["arcface"]

    # --- this stack: the same step through the real step machinery ---------
    with enable_x64():
        params = jax.tree_util.tree_map(jnp.asarray, dict(bundle0["model"]))
        params["arcface"] = jax.tree_util.tree_map(jnp.asarray, bundle0["arcface"])
        bn_state = jax.tree_util.tree_map(jnp.asarray, bundle0["state"])
        assert jax.tree_util.tree_leaves(params)[0].dtype == jnp.float64

        def train_forward(p, bn, rng, batch):
            vid, lab, lens = batch
            feats, new_bn = xception_lstm_features(
                p, bn, vid, mode="video", train=True, compute_dtype=jnp.float64
            )
            e = xception_lstm_embed(p, feats, lengths=lens, mask_padding=True, compute_dtype=jnp.float64)
            lg = arcface_apply(p["arcface"], e, lab.astype(jnp.int32), s=S, m=M)
            loss = cross_entropy_loss(lg, lab.astype(jnp.int32))
            return loss, (new_bn, jax.nn.softmax(lg, axis=-1)[:, 1])

        tx = optax.sgd(LR)
        p0_flat = _flatten(params)  # snapshot: the train step donates its buffers
        state = TrainState(jnp.zeros((), jnp.int32), params, bn_state, tx.init(params))
        step = make_train_step(train_forward, tx)
        new_state, j_loss, _probs = step(
            state, (jnp.asarray(video), jnp.asarray(labels), jnp.asarray(lengths)), 0, ()
        )

        # --- compare --------------------------------------------------------
        np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-12)

        j_flat = _flatten(new_state.params)
        t_flat = _flatten(t_params)
        assert set(j_flat) == set(t_flat)
        deltas = {k: (j_flat[k] - p0_flat[k], t_flat[k] - p0_flat[k]) for k in j_flat}
        # global scale floor: two tensors (blocks.11 bn biases) have grads that
        # are mathematically ZERO (the next BN's mean subtraction cancels any
        # constant channel shift) — both stacks produce ~1e-14 roundoff there,
        # and a pure per-tensor normalization would compare roundoff/roundoff
        global_scale = max(np.abs(dt).max() for _dj, dt in deltas.values())
        for k in sorted(deltas):
            dj, dt = deltas[k]
            scale = max(np.abs(dt).max(), np.abs(dj).max(), 1e-6 * global_scale)
            np.testing.assert_allclose(dj / scale, dt / scale, rtol=0, atol=1e-9, err_msg=k)

        # running BN stats updated with identical torch momentum semantics
        j_bn = _flatten(new_state.bn_state)
        t_bn = _flatten(bundle1["state"])
        assert set(j_bn) == set(t_bn)
        for k in sorted(j_bn):
            np.testing.assert_allclose(j_bn[k], t_bn[k], rtol=1e-10, atol=1e-12, err_msg=k)
