from .roc import (
    roc_curve,
    auc_trapezoid,
    roc_auc_score,
    average_precision_score,
    compute_eer_auc,
    compute_metrics_interp,
    pick_threshold,
    compute_acc_ap_and_counts,
)
