"""Host-facing metric API (reference: src/pd_fusion/utils/metrics.py:10-36).

``compute_metrics`` keeps the reference signature and return dict but the
computation runs as a single fused XLA program (see pd_fusion.ops.metrics).
Returns plain Python floats so results.yaml serialization is clean.
"""
from typing import Dict

import numpy as np

from pd_fusion.ops import metrics as dev_metrics


def compute_metrics(y_true, y_prob, threshold: float = 0.5) -> Dict[str, float]:
    y_true = np.asarray(y_true)
    y_prob = np.asarray(y_prob, dtype=np.float32)
    if np.unique(y_true[~np.isnan(y_prob)]).size < 2:
        # sklearn raises here; we keep an explicit error for parity
        raise ValueError("compute_metrics requires both classes present in y_true")
    out = dev_metrics.binary_metrics(
        np.asarray(y_true, dtype=np.float32), y_prob, None, threshold
    )
    return {k: float(v) for k, v in out.items()}


def compute_ece(y_true, y_prob, n_bins: int = 10) -> float:
    y_true = np.asarray(y_true, dtype=np.float32)
    y_prob = np.asarray(y_prob, dtype=np.float32)
    return float(dev_metrics.expected_calibration_error(y_true, y_prob, None, n_bins))
