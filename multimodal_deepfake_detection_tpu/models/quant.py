"""w8a8 post-training-quantized Xception serving forward.

An opt-in quantized serving mode on top of the BN-folded inference tree
(models/fold.py): every MXU-bound convolution (stem convs, block skips, all
pointwise 1x1s) runs as an int8xint8->int32 conv with per-output-channel
weight scales and a static per-tensor activation scale calibrated offline;
depthwise 3x3s (VPU-bound, ~3% of FLOPs) and the fc head stay floating.

The reference framework has no quantization (pure fp torch scripts,
/root/reference/Xception.py) — this is a capability beyond parity, so its
contract is accuracy-vs-throughput, not bit-parity: calibration amaxes come
from real data, and tests bound the quantized logit drift against the fp32
folded forward (tests/test_quant.py).

One structural walker serves three modes so the calibration pass, the fp
reference pass, and the quantized pass can never drift apart:

* ``observe=True``  — fp forward that also returns per-site input amaxes
  (jit-able; reduce over a calibration batch).
* ``quant=False``   — plain fp folded forward (equals
  ``fold.folded_xception_apply(use_pallas=False)``; pinned by test).
* ``quant=True``    — the w8a8 forward over a tree built by
  ``quantize_folded_xception``.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d, global_avg_pool, linear, max_pool2d
from ..ops.quant import conv2d_w8a8, depthwise_conv2d_w8a8, quantize_weight
from .xception import XCEPTION_BLOCK_SPECS

# Walk-order site keys of every quantized convolution (13 blocks: 12 spec
# blocks + the exit sepconvs), used by calibration and tree building alike.


def _sites(params, *, depthwise: bool = False):
    yield "conv1"
    yield "conv2"
    for k, bp in enumerate(params["blocks"]):
        for i in range(len(bp["units"])):
            if depthwise:
                yield f"blocks/{k}/units/{i}/depthwise"
            yield f"blocks/{k}/units/{i}/pointwise"
        if "skip" in bp:
            yield f"blocks/{k}/skip"
    for site in ("conv3", "conv4"):
        if depthwise:
            yield f"{site}/depthwise"
        yield f"{site}/pointwise"


def xception_quant_walk(
    params,
    x,
    *,
    quant: bool = False,
    observe: bool = False,
    compute_dtype=jnp.bfloat16,
    features_only: bool = False,
    middle_pallas: bool = False,
    pallas_interpret: bool = False,
    upto: str = None,
    tap=None,
    shadow=None,
):
    """Shared structural forward (see module docstring for the three modes).

    ``upto`` ("stem", "block<k>", "exit") early-returns that stage's output —
    the same truncated-prefix contract as fold.folded_xception_apply, so
    tools/netbench.py can attribute per-stage device time on the quantized
    path too.

    ``middle_pallas=True`` routes middle-flow blocks whose sepconv units are
    *unquantized* (fp nodes in the tree — build with
    ``quantize_folded_xception(..., skip_middle=True)``) through the
    position-major fused Pallas kernel, giving the hybrid serving config:
    int8 entry/exit (bandwidth-bound, halved bytes) + bf16 VMEM-resident
    Pallas middle flow.

    ``tap`` (callable ``tap(site, value)``) is invoked with every convolution
    *output* (pre-activation, post-bias; depthwise outputs under
    ``.../depthwise``) in whichever mode runs — the hook
    :func:`refine_quantized_xception` uses to pair fp-teacher and quantized
    activations site-by-site inside one jit. Not supported together with
    ``middle_pallas`` (the fused kernel does not expose per-site outputs).

    ``shadow`` (a second param tree, same structure) additionally applies the
    shadow tree's node to the SAME input at every conv site and calls
    ``tap(site, y_main, y_shadow)`` instead — the main stream continues with
    its own output. With main=folded fp tree and shadow=w8a8 tree this yields
    per-site (teacher, local-quantized) pairs whose discrepancy is each
    conv's OWN quantization error, free of accumulated upstream error.
    """
    if tap is not None and middle_pallas:
        raise ValueError("tap= requires the XLA path (middle_pallas=False)")
    if shadow is not None and tap is None:
        raise ValueError("shadow= needs a tap= to report the paired outputs to")
    obs = {} if observe else None
    if middle_pallas:
        from ..ops.pallas.sepconv_block import is_middle_block, pack_middle_block
        from ..ops.pallas.sepconv_pos import (
            from_pos_layout,
            is_middle_block_q,
            middle_block_pos_pallas,
            middle_block_pos_pallas_w8,
            pack_middle_block_q,
            to_pos_layout,
        )
    pos_hw = None

    def apply_conv(p, h, stride, padding):
        if "w_q" in p:
            return conv2d_w8a8(p, h, stride=stride, padding=padding, out_dtype=compute_dtype)
        return conv2d(p, h, stride=stride, padding=padding, compute_dtype=compute_dtype)

    def apply_dw(p, h):
        if "w_q" in p:
            return depthwise_conv2d_w8a8(p, h, padding=1, out_dtype=compute_dtype)
        return conv2d(
            {"w": p["w"]}, h, stride=1, padding=1, groups=h.shape[-1],
            compute_dtype=compute_dtype,
        )

    def report(site, h_in, y, stride, padding, dw=False):
        if tap is None:
            return
        if shadow is None:
            tap(site, y)
        else:
            sp = _resolve_site(shadow, site)
            ys = apply_dw(sp, h_in) if dw else apply_conv(sp, h_in, stride, padding)
            tap(site, y, ys)

    def reg(site, p, h, stride, padding):
        if obs is not None:
            obs[site] = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=(0, 1, 2))
        if quant and "w_q" in p:  # mixed trees carry fp nodes (skip_middle)
            y = conv2d_w8a8(p, h, stride=stride, padding=padding, out_dtype=compute_dtype)
        else:
            y = conv2d(p, h, stride=stride, padding=padding, compute_dtype=compute_dtype)
        report(site, h, y, stride, padding)
        return y

    def sep(site, p, h):
        if obs is not None:
            obs[f"{site}/depthwise"] = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=(0, 1, 2))
        if quant and "w_q" in p["depthwise"]:
            y = depthwise_conv2d_w8a8(p["depthwise"], h, padding=1, out_dtype=compute_dtype)
        else:
            c = h.shape[-1]
            y = conv2d(
                {"w": p["depthwise"]["w"]}, h, stride=1, padding=1, groups=c,
                compute_dtype=compute_dtype,
            )
        report(f"{site}/depthwise", h, y, 1, 1, dw=True)
        return reg(f"{site}/pointwise", p["pointwise"], y, 1, 0)

    h = jax.nn.relu(reg("conv1", params["conv1"], x, 2, 0))
    h = jax.nn.relu(reg("conv2", params["conv2"], h, 1, 0))
    if upto == "stem":
        return h
    for k, (spec, bp) in enumerate(zip(XCEPTION_BLOCK_SPECS, params["blocks"])):
        _in, _out, _reps, stride, start_with_relu, _grow = spec
        # degenerate trunks (W < 4, tiny eval inputs) route to XLA — the pos
        # kernels are designed for the production 16^2 trunk (see fold.py)
        mid_ok = pos_hw is not None or (h.shape[1] >= 4 and h.shape[2] >= 4)
        pos_fp = (
            middle_pallas
            and mid_ok
            and stride == 1
            and start_with_relu
            and "w" in bp["units"][0]["pointwise"]  # fp node (skip_middle tree)
            and is_middle_block(bp)
        )
        # fully quantized middle block: int8-pointwise pos kernel (MXU int8
        # at 2x the bf16 rate; taps stay fp32 on the bf16 pad)
        pos_q = (
            middle_pallas
            and quant
            and not pos_fp
            and mid_ok
            and stride == 1
            and start_with_relu
            and "w_q" in bp["units"][0]["pointwise"]
            and is_middle_block_q(bp)
        )
        if pos_hw is not None and not (pos_fp or pos_q):  # leaving the pos run
            h = from_pos_layout(h, *pos_hw)
            pos_hw = None
        if pos_fp or pos_q:
            if pos_hw is None:
                pos_hw = (h.shape[1], h.shape[2])
                h = to_pos_layout(h)
            if pos_fp:
                dw, pw, bb = pack_middle_block(bp)
                h = middle_block_pos_pallas(h, dw, pw, bb, interpret=pallas_interpret)
            else:
                dw, pw_q, s_w, s_in, s_dq, bb = pack_middle_block_q(bp)
                h = middle_block_pos_pallas_w8(
                    h, dw, pw_q, s_w, s_in, s_dq, bb, interpret=pallas_interpret
                )
            if upto == f"block{k + 1}":
                return from_pos_layout(h, *pos_hw)
            continue
        inp = h
        for i, unit in enumerate(bp["units"]):
            if i > 0 or start_with_relu:
                h = jax.nn.relu(h)
            h = sep(f"blocks/{k}/units/{i}", unit, h)
        if stride != 1:
            h = max_pool2d(h, 3, stride, 1)
        skip = reg(f"blocks/{k}/skip", bp["skip"], inp, stride, 0) if "skip" in bp else inp
        h = h + skip
        if upto == f"block{k + 1}":
            return h
    if pos_hw is not None:
        h = from_pos_layout(h, *pos_hw)
    h = jax.nn.relu(sep("conv3", params["conv3"], h))
    h = jax.nn.relu(sep("conv4", params["conv4"], h))
    if upto == "exit":
        return h
    feats = global_avg_pool(h)
    if features_only or "fc" not in params:
        out = feats
    else:
        out = linear(params["fc"], feats, compute_dtype=compute_dtype)
    return (out, obs) if observe else out


@lru_cache(maxsize=None)
def _calibrate_xception_fn(compute_dtype):
    # module-cached: repeated scorer.calibrate() calls (e.g. the refine=0 and
    # refine=1 variants of a dAUC comparison) reuse one compiled observe walk
    return jax.jit(
        partial(
            xception_quant_walk, observe=True, quant=False,
            compute_dtype=compute_dtype, features_only=True,
        )
    )


def calibrate_amax(folded_params, calib_x, *, compute_dtype=jnp.bfloat16) -> dict:
    """Per-site, per-input-channel amaxes of the fp folded forward over a
    calibration batch.

    ``calib_x`` is one representative (B, H, W, 3) batch (serving-normalized,
    i.e. /255). Returns {site: fp32 (Ci,) amax vector} in walk order — the
    per-tensor amax is the vector max, so both act_scales modes of
    :func:`quantize_folded_xception` build from the same calibration.
    """
    _, obs = _calibrate_xception_fn(compute_dtype)(folded_params, calib_x)
    return {k: np.asarray(jax.device_get(v), np.float32) for k, v in obs.items()}


def _quant_conv_node(
    conv, a_vec, *, headroom: float, act_scales: str, smooth_alpha: float,
    depthwise: bool = False,
):
    """Quantize one conv node against its calibrated input-amax vector.

    ``act_scales="tensor"``: classic per-tensor activation scale
    (``s_in = amax/127``), dequant ``s_in * s_w``.

    ``act_scales="channel"``: SmoothQuant-style per-input-channel
    activation-scale folding. Round-4/5 lesson (measured,
    tools/quant_dauc.py r5): a trained net can concentrate its informative
    activation variance in channels whose range is a sliver of the
    per-tensor amax — per-tensor int8 then rounds the signal away entirely
    (the visual micro fixture collapsed to constant features, AUC 1.0 ->
    0.5). Folding ``s_fold[c] = a_c^alpha / w_c^(1-alpha)`` into the
    weights BEFORE quantizing them equalizes channel ranges (every channel
    uses its full int8 budget) and commutes exactly with any convolution
    (per-input-channel scaling = scaling w[..., c, :]); the quantize op
    becomes a per-channel vector multiply (same VPU cost) and the dequant
    epilogue keeps a scalar ``s_dq``. For depthwise convs the fold lands on
    the output-channel axis, where the per-output ``s_w`` absorbs it.
    """
    w = conv["w"]
    a_vec = np.atleast_1d(np.asarray(jax.device_get(a_vec), np.float32))
    if act_scales == "tensor" or (act_scales == "channel" and a_vec.size == 1):
        w_q, s_w = quantize_weight(w)
        q = {
            "w_q": w_q,
            "s_w": s_w,
            "s_in": jnp.float32(max(float(a_vec.max()), 1e-12) * headroom / 127.0),
        }
    elif act_scales == "channel":
        red = (0, 1, 2) if depthwise else (0, 1, 3)  # HWIO; depthwise folds on O
        w_c = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red), 1e-8)
        a_c = jnp.maximum(jnp.asarray(a_vec), 1e-8)
        s_fold = a_c ** smooth_alpha / w_c ** (1.0 - smooth_alpha)
        shape = [1, 1, 1, 1]
        shape[3 if depthwise else 2] = -1
        w_q, s_w = quantize_weight(w.astype(jnp.float32) * s_fold.reshape(shape))
        s_act = jnp.maximum(jnp.max(a_c / s_fold), 1e-12) * headroom / 127.0
        q = {
            "w_q": w_q,
            "s_w": s_w,
            "s_in": (s_fold * s_act).astype(jnp.float32),
            "s_dq": s_act.astype(jnp.float32),
        }
    else:
        raise ValueError(f"act_scales must be 'tensor' or 'channel', got {act_scales!r}")
    if "b" in conv:
        q["b"] = conv["b"].astype(jnp.float32)
    return q


def quantize_folded_xception(
    folded_params, amaxes: dict, *, headroom: float = 1.0, quant_depthwise: bool = False,
    skip_middle: bool = False, act_scales: str = "channel", smooth_alpha: float = 0.5,
):
    """Build the w8a8 tree from a BN-folded fp tree + calibrated amaxes.

    ``headroom`` scales every activation amax (>1 guards against clip on
    inputs hotter than the calibration batch, at the cost of resolution).
    Quantized conv nodes become {"w_q" int8, "s_w" fp32[O], "s_in" fp32
    scalar or fp32[Ci], "s_dq" fp32, "b" fp32}; fc stays fp.
    ``quant_depthwise`` also quantizes the depthwise 3x3s so the activation
    chain through each sepconv unit stays int8 end-to-end (halves the HBM
    traffic of the bandwidth-bound entry blocks); off, they stay fp.
    ``skip_middle`` leaves the middle-flow blocks (stride-1, start-with-relu)
    entirely fp so the walker's ``middle_pallas`` mode can route them through
    the fused pos kernel. ``act_scales``/``smooth_alpha``: see
    :func:`_quant_conv_node` — "channel" (default) folds per-input-channel
    activation scales into the weights, which rescues nets whose informative
    activation variance is narrow relative to the per-tensor amax.
    """

    missing = [s for s in _sites(folded_params, depthwise=quant_depthwise) if s not in amaxes]
    if missing:
        raise ValueError(f"calibration amaxes missing sites: {missing}")

    middle_idx = {
        k for k, spec in enumerate(XCEPTION_BLOCK_SPECS) if spec[3] == 1 and spec[4]
    } if skip_middle else set()

    def qconv(conv, site, depthwise=False):
        return _quant_conv_node(
            conv, amaxes[site], headroom=headroom, act_scales=act_scales,
            smooth_alpha=smooth_alpha, depthwise=depthwise,
        )

    def qsep(sep, site):
        if quant_depthwise:
            dw = qconv(sep["depthwise"], f"{site}/depthwise", depthwise=True)
        else:
            dw = {"w": sep["depthwise"]["w"]}
        return {
            "depthwise": dw,
            "pointwise": qconv(sep["pointwise"], f"{site}/pointwise"),
        }

    out = {
        "conv1": qconv(folded_params["conv1"], "conv1"),
        "conv2": qconv(folded_params["conv2"], "conv2"),
        "blocks": [],
        "conv3": qsep(folded_params["conv3"], "conv3"),
        "conv4": qsep(folded_params["conv4"], "conv4"),
    }
    for k, bp in enumerate(folded_params["blocks"]):
        if k in middle_idx:
            out["blocks"].append(bp)  # fp node, pallas-routable
            continue
        fb = {
            "units": [qsep(u, f"blocks/{k}/units/{i}") for i, u in enumerate(bp["units"])]
        }
        if "skip" in bp:
            fb["skip"] = qconv(bp["skip"], f"blocks/{k}/skip")
        out["blocks"].append(fb)
    if "fc" in folded_params:
        out["fc"] = folded_params["fc"]
    return out


def quantize_xception(
    params, state, calib_x, *, compute_dtype=jnp.bfloat16, headroom: float = 1.0,
    quant_depthwise: bool = False,
):
    """fold -> calibrate -> quantize in one call; returns the w8a8 tree."""
    from .fold import fold_xception_bn

    folded = fold_xception_bn(params, state)
    amaxes = calibrate_amax(folded, calib_x, compute_dtype=compute_dtype)
    return quantize_folded_xception(
        folded, amaxes, headroom=headroom, quant_depthwise=quant_depthwise
    )


def quantized_xception_apply(qparams, x, *, compute_dtype=jnp.bfloat16, features_only: bool = False):
    """The w8a8 serving forward (jit this)."""
    return xception_quant_walk(
        qparams, x, quant=True, compute_dtype=compute_dtype, features_only=features_only
    )


def _resolve_site(tree, site: str):
    """Walk-order site key ('blocks/3/units/1/pointwise', 'conv1', ...) -> node."""
    node = tree
    for part in site.split("/"):
        node = node[int(part)] if part.isdigit() else node[part]
    return node


def _fit_affine(mom, node, *, shrink: float = 1.0):
    """Per-channel LS fit (f ~ gamma*q + beta) -> corrected node (s_w, b).

    ``mom`` = (var_q, cov, qm, fm, qq, qf) per-channel fp32 arrays. Bias-less
    nodes (depthwise) get a through-origin gain only — any mean shift is
    absorbed by the following pointwise's intercept. ``shrink`` in (0, 1]
    damps the correction toward identity (small-sample regularization).
    """
    var_q, cov, qm, fm, qq, qf = (jnp.asarray(m, jnp.float32) for m in mom)
    node = dict(node)
    if "b" in node:
        ok = var_q > 1e-10
        gamma = jnp.where(ok, cov / jnp.where(ok, var_q, 1.0), 1.0)
        gamma = 1.0 + shrink * (jnp.clip(gamma, 0.5, 2.0) - 1.0)
        beta = shrink * (fm - gamma * qm)
        node["b"] = gamma * node["b"] + beta
    else:
        ok = qq > 1e-10
        gamma = jnp.where(ok, qf / jnp.where(ok, qq, 1.0), 1.0)
        gamma = 1.0 + shrink * (jnp.clip(gamma, 0.5, 2.0) - 1.0)
    node["s_w"] = node["s_w"] * gamma
    return node


def refine_quantized_xception(
    qtree,
    folded_params,
    calib_x,
    *,
    passes: int = 1,
    output_sites=("conv3/pointwise", "conv4/pointwise"),
    shrink_n0: float = 64.0,
    compute_dtype=jnp.float32,
    log=None,
):
    """Closed-form per-channel affine refinement of a w8a8 tree (zero-cost PTQ+).

    Least-squares-fit the fp-teacher conv output on a quantized conv output
    per output channel (``f ~ gamma*q + beta`` over the calibration batch) and
    fold the correction into the node's existing dequant epilogue
    (``s_w *= gamma``, ``b = gamma*b + beta``) — the refined tree serves at
    exactly the PTQ tree's cost. Two fit scopes, applied in order:

    1. **Local fits, all sites** (``passes`` iterations, one jitted paired
       forward each): the walker's ``shadow`` mode applies each quantized node
       to the SAME fp input as its teacher, so the fitted discrepancy is that
       conv's OWN quantization error (weight-rounding gain bias + requant
       noise). Same-input pairing keeps the regressions well-conditioned, and
       local corrections compose safely in one simultaneous application.
    2. **Output touch-up** (``output_sites``, strictly sequential true-paired
       fits): the exit pointwises absorb the *accumulated* network error right
       at the feature boundary. Sample-count shrinkage ``N/(N + shrink_n0)``
       damps these fits where the calibration batch is thin (the exit sees
       only ``B*(H/32)^2`` samples/channel).

    Two rejected designs, both by measurement (PERF.md round-3 "quantization
    refinement" note): (a) gradient QAT (STE self-distillation) random-walks —
    from an exact-match student the objective sits at the rounding-noise
    floor, where even a 1e-4-norm step along the STE gradient raises the true
    loss; (b) joint true-paired fits at ALL sites overcorrect — each site's
    affine absorbs the accumulated upstream error, so simultaneous application
    corrects the same error once per downstream site (measured 2.2x/5.1x/7.7x
    end-to-end error over three joint passes), and strictly sequential
    application (74 paired forwards/pass) overfits thin calibration batches.

    ``qtree``/``folded_params`` must come from the same weights; ``calib_x``
    is a representative serving-normalized (B, H, W, 3) batch. Returns a new
    tree (inputs untouched). No reference counterpart (the reference has no
    quantization, /root/reference/Xception.py) — beyond-parity capability.
    """
    walk = partial(xception_quant_walk, features_only=True)
    return _refine_tree(
        qtree, folded_params, calib_x, walk=walk,
        sites=_sites(folded_params, depthwise=True), output_sites=output_sites,
        passes=passes, shrink_n0=shrink_n0, compute_dtype=compute_dtype, log=log,
    )


def _refine_tree(
    qtree, folded_params, calib_x, *, walk, sites, output_sites,
    passes, shrink_n0, compute_dtype, log,
):
    """Backbone-agnostic core of the affine refinement (see
    :func:`refine_quantized_xception` for the scheme and its measured
    rationale). ``walk(tree, x, quant=, compute_dtype=, tap=, shadow=)`` must
    support the tap/shadow hooks; ``sites`` is the walk-order site iterable.
    """
    qtree = jax.tree_util.tree_map(lambda a: a, qtree)  # fresh containers
    qsites = [s for s in sites if "w_q" in _resolve_site(qtree, s)]
    qset = set(qsites)
    nsamp = {}

    def _mom(site, q, f, mom):
        q, f = q.astype(jnp.float32), f.astype(jnp.float32)
        ax = tuple(range(q.ndim - 1))
        qm, fm = jnp.mean(q, ax), jnp.mean(f, ax)
        # centered moments computed directly (E[q^2]-E[q]^2 cancels
        # catastrophically in fp32 on high-mean/low-variance channels)
        var_q = jnp.mean((q - qm) ** 2, ax)
        cov = jnp.mean((q - qm) * (f - fm), ax)
        nsamp[site] = int(np.prod(q.shape[:-1]))
        mom[site] = (var_q, cov, qm, fm, jnp.mean(q * q, ax), jnp.mean(q * f, ax))

    @jax.jit
    def local_moments(qt, fp, x):
        mom = {}

        def tap(site, y_f, y_q):
            if site in qset:
                _mom(site, y_q, y_f, mom)

        walk(fp, x, quant=False, compute_dtype=compute_dtype, tap=tap, shadow=qt)
        return mom

    @jax.jit
    def paired_moments(qt, fp, x):
        fp_taps = {}
        walk(
            fp, x, quant=False, compute_dtype=compute_dtype,
            tap=lambda s, v: fp_taps.__setitem__(s, v),
        )
        mom = {}

        def qtap(site, v):
            if site in qset:
                _mom(site, v, fp_taps[site], mom)

        walk(qt, x, quant=True, compute_dtype=compute_dtype, tap=qtap)
        return mom

    def apply(site, node):
        parent = _resolve_site(qtree, site.rsplit("/", 1)[0]) if "/" in site else qtree
        parent[site.rsplit("/", 1)[-1]] = node

    x = jnp.asarray(calib_x)
    for it in range(passes):
        mom = jax.device_get(local_moments(qtree, folded_params, x))
        for site in qsites:
            apply(site, _fit_affine(mom[site], _resolve_site(qtree, site)))
        if log is not None:
            log(f"refine local pass {it + 1}/{passes} ({len(qsites)} sites)")
    for site in output_sites:  # sequential: re-measure after each correction
        if site not in qset:
            continue
        mom = jax.device_get(paired_moments(qtree, folded_params, x)[site])
        shrink = nsamp[site] / (nsamp[site] + shrink_n0)
        apply(site, _fit_affine(mom, _resolve_site(qtree, site), shrink=shrink))
        if log is not None:
            log(f"refine output fit {site} (shrink {shrink:.2f})")
    return qtree


# ---------------------------------------------------------------------------
# ResNet-18 (the AU-stream backbone, models/resnet.py) — same scheme
# ---------------------------------------------------------------------------


def resnet18_quant_walk(
    params, x, *, quant: bool = False, observe: bool = False,
    compute_dtype=jnp.bfloat16, tap=None, shadow=None,
):
    """Shared structural forward over a folded (fold.fold_resnet18_bn) or
    quantized ResNet-18 tree; fp mode equals fold.folded_resnet18_apply
    (pinned in tests/test_quant.py). Every conv is a regular MXU conv, so all
    are quantized — the activation chain stays int8 end-to-end between the
    relu/pool/residual seams.

    ``tap``/``shadow``: the same refinement hooks as
    :func:`xception_quant_walk` (conv outputs per site; shadow applies the
    second tree's node to the same input and taps the pair)."""
    from .resnet import RESNET18_STAGES

    if shadow is not None and tap is None:
        raise ValueError("shadow= needs a tap= to report the paired outputs to")
    obs = {} if observe else None

    def reg(site, p, h, stride, padding):
        if obs is not None:
            obs[site] = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=(0, 1, 2))
        if quant and "w_q" in p:
            y = conv2d_w8a8(p, h, stride=stride, padding=padding, out_dtype=compute_dtype)
        else:
            y = conv2d(p, h, stride=stride, padding=padding, compute_dtype=compute_dtype)
        if tap is not None:
            if shadow is None:
                tap(site, y)
            else:
                sp = _resolve_site(shadow, site)
                if "w_q" in sp:
                    ys = conv2d_w8a8(sp, h, stride=stride, padding=padding, out_dtype=compute_dtype)
                else:
                    ys = conv2d(sp, h, stride=stride, padding=padding, compute_dtype=compute_dtype)
                tap(site, y, ys)
        return y

    h = jax.nn.relu(reg("conv1", params["conv1"], x, 2, 3))
    h = max_pool2d(h, 3, 2, 1)
    for i, ((_out_ch, stride), stage) in enumerate(zip(RESNET18_STAGES, params["stages"])):
        for b, bp in enumerate(stage):
            s = stride if b == 0 else 1
            r = jax.nn.relu(reg(f"stages/{i}/{b}/conv1", bp["conv1"], h, s, 1))
            r = reg(f"stages/{i}/{b}/conv2", bp["conv2"], r, 1, 1)
            idn = (
                reg(f"stages/{i}/{b}/downsample", bp["downsample"], h, s, 0)
                if "downsample" in bp
                else h
            )
            h = jax.nn.relu(r + idn)
    out = global_avg_pool(h)
    return (out, obs) if observe else out


@lru_cache(maxsize=None)
def _calibrate_resnet18_fn(compute_dtype):
    return jax.jit(
        partial(resnet18_quant_walk, observe=True, quant=False, compute_dtype=compute_dtype)
    )


def calibrate_resnet18_amax(folded_params, calib_x, *, compute_dtype=jnp.bfloat16) -> dict:
    _, obs = _calibrate_resnet18_fn(compute_dtype)(folded_params, calib_x)
    return {k: np.asarray(jax.device_get(v), np.float32) for k, v in obs.items()}


def quantize_folded_resnet18(
    folded_params, amaxes: dict, *, headroom: float = 1.0,
    act_scales: str = "channel", smooth_alpha: float = 0.5,
):
    """Build the w8a8 ResNet-18 tree from a BN-folded fp tree + amaxes.

    ``act_scales``/``smooth_alpha``: see :func:`_quant_conv_node`."""

    def qconv(conv, site):
        if site not in amaxes:
            raise ValueError(f"calibration amaxes missing site: {site}")
        return _quant_conv_node(
            conv, amaxes[site], headroom=headroom, act_scales=act_scales,
            smooth_alpha=smooth_alpha,
        )

    out = {"conv1": qconv(folded_params["conv1"], "conv1"), "stages": []}
    for i, stage in enumerate(folded_params["stages"]):
        qstage = []
        for b, bp in enumerate(stage):
            fb = {
                "conv1": qconv(bp["conv1"], f"stages/{i}/{b}/conv1"),
                "conv2": qconv(bp["conv2"], f"stages/{i}/{b}/conv2"),
            }
            if "downsample" in bp:
                fb["downsample"] = qconv(bp["downsample"], f"stages/{i}/{b}/downsample")
            qstage.append(fb)
        out["stages"].append(qstage)
    return out


def quantize_resnet18(params, state, calib_x, *, compute_dtype=jnp.bfloat16, headroom: float = 1.0):
    """fold -> calibrate -> quantize for the AU-stream ResNet-18."""
    from .fold import fold_resnet18_bn

    folded = fold_resnet18_bn(params, state)
    amaxes = calibrate_resnet18_amax(folded, calib_x, compute_dtype=compute_dtype)
    return quantize_folded_resnet18(folded, amaxes, headroom=headroom)


def _resnet18_sites(params):
    yield "conv1"
    for i, stage in enumerate(params["stages"]):
        for b, bp in enumerate(stage):
            yield f"stages/{i}/{b}/conv1"
            yield f"stages/{i}/{b}/conv2"
            if "downsample" in bp:
                yield f"stages/{i}/{b}/downsample"


def refine_quantized_resnet18(
    qtree,
    folded_params,
    calib_x,
    *,
    passes: int = 1,
    output_sites=("stages/3/1/conv2",),
    shrink_n0: float = 64.0,
    compute_dtype=jnp.float32,
    log=None,
):
    """Affine refinement of a w8a8 ResNet-18 tree — the same local-shadow +
    shrunk-output-touch-up scheme as :func:`refine_quantized_xception` (see
    its docstring for the measured design rationale). The default output site
    is the last block's conv2, the residual-branch conv closest to the
    pooled features."""
    return _refine_tree(
        qtree, folded_params, calib_x, walk=resnet18_quant_walk,
        sites=_resnet18_sites(folded_params), output_sites=output_sites,
        passes=passes, shrink_n0=shrink_n0, compute_dtype=compute_dtype, log=log,
    )
