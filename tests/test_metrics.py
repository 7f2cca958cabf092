"""Metric-suite parity vs scikit-learn and vs the reference's local formulas."""
import numpy as np
import pytest
import sklearn.metrics as skm

from multimodal_deepfake_detection_tpu import metrics as M

RNG = np.random.default_rng(0)


def _case(n=200, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    s = np.clip(y * 0.3 + rng.normal(0.4, 0.25, n), 0, 1)
    return y, s


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roc_curve_matches_sklearn(seed):
    y, s = _case(seed=seed)
    fpr, tpr, thr = M.roc_curve(y, s, drop_intermediate=False)
    fpr_r, tpr_r, thr_r = skm.roc_curve(y, s, drop_intermediate=False)
    np.testing.assert_allclose(fpr, fpr_r, atol=1e-12)
    np.testing.assert_allclose(tpr, tpr_r, atol=1e-12)
    np.testing.assert_allclose(thr[1:], thr_r[1:], atol=1e-12)


@pytest.mark.parametrize("seed", [0, 3])
def test_auc_ap_match_sklearn(seed):
    y, s = _case(seed=seed)
    assert abs(M.roc_auc_score(y, s) - skm.roc_auc_score(y, s)) < 1e-10
    assert abs(M.average_precision_score(y, s) - skm.average_precision_score(y, s)) < 1e-10


def test_compute_eer_auc_variant_a():
    """Matches the train_au_face.py:462-473 composition built on sklearn."""
    y, s = _case(seed=5)
    auc_score, pauc, eer, (fpr, tpr) = M.compute_eer_auc(y, s)

    fpr_r, tpr_r, _ = skm.roc_curve(y, s, drop_intermediate=False)
    fnr_r = 1 - tpr_r
    assert abs(auc_score - skm.auc(fpr_r, tpr_r)) < 1e-10
    mask = fpr_r <= 0.1
    assert abs(pauc - skm.auc(fpr_r[mask], tpr_r[mask]) / 0.1) < 1e-10
    idx = int(np.nanargmin(np.abs(fpr_r - fnr_r)))
    assert abs(eer - (fpr_r[idx] + fnr_r[idx]) / 2.0) < 1e-10


def test_compute_metrics_interp_variant_b():
    """Matches the test_visual.py:515-565 interpolated formulas."""
    y, s = _case(seed=7)
    got = M.compute_metrics_interp(y, s)

    fpr, tpr, thresholds = skm.roc_curve(y, s)
    alpha = 0.1
    grid = np.linspace(0.0, alpha, 2001)
    tpr_i = np.interp(grid, fpr, tpr)
    pauc_raw = skm.auc(grid, tpr_i)
    pauc_norm = (pauc_raw - alpha**2 / 2) / (alpha - alpha**2 / 2)
    assert abs(got["pAUC"] - pauc_norm) < 1e-9

    fnr = 1 - tpr
    diff = fpr - fnr
    idx = np.where(np.diff(np.sign(diff)) != 0)[0]
    j = idx[0]
    x1, y1_, x2, y2_ = fpr[j], fnr[j], fpr[j + 1], fnr[j + 1]
    w = np.clip((y1_ - x1) / ((x2 - x1) - (y2_ - y1_) + 1e-12), 0, 1)
    assert abs(got["EER"] - (x1 + w * (x2 - x1))) < 1e-9

    j_ix = np.argmax(tpr - fpr)
    acc_j = (((s >= thresholds[j_ix]).astype(int)) == y).mean()
    assert abs(got["ACC@J"] - acc_j) < 1e-12


def test_degenerate_single_class():
    y = np.zeros(10, int)
    s = RNG.random(10)
    got = M.compute_metrics_interp(y, s)
    assert got == {"AUC": 0.0, "pAUC": 0.0, "AP": 0.0, "EER": 1.0}


def test_pick_threshold_and_counts():
    y, s = _case(seed=9)
    thr, fpr, tpr = M.pick_threshold(y, s, mode="youden")
    fpr_r, tpr_r, thr_r = skm.roc_curve(y, s, drop_intermediate=False)
    j = int(np.argmax(tpr_r - fpr_r))
    assert thr == pytest.approx(thr_r[j] if np.isfinite(thr_r[j]) else np.inf)

    thr_f, fpr_f, _ = M.pick_threshold(y, s, mode="fpr", fpr_target=0.05)
    assert fpr_f <= 0.05 + 1e-12

    acc, ap, cr, tr, cf, tf = M.compute_acc_ap_and_counts(y, s, 0.5)
    preds = (s >= 0.5).astype(int)
    assert acc == pytest.approx((preds == y).mean())
    assert cr + cf == (preds == y).sum()
    assert tr == (y == 0).sum() and tf == (y == 1).sum()
    assert ap == pytest.approx(skm.average_precision_score(y, s))
