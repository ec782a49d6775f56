"""Feature preprocessing.

Reference contract (src/pd_fusion/data/preprocess.py:5-70):
- ``NaNRobustScaler``: per-column median / IQR computed ignoring NaNs,
  zero IQR replaced with 1.
- ``preprocess_features(df, feature_cols, imputer, scaler)``: select the
  columns in order, add missing columns as NaN, scale; the imputer slot is
  always returned as None.

Documented deviation: the reference returns NaNs from the scaler and its
docstring states "downstream ... uses NaNs to generate MASKS, then fills
with 0", but no downstream fill exists, so reference training crashes on
NaN-bearing data (verified: BCELoss "all elements of input should be
between 0 and 1" on the quickstart). We implement the *stated intent* —
scaled values with NaN->0 — which exactly reproduces the reference's own
committed run artifacts (runs/run_20260201_210705/results.yaml,
full_observation ROC-AUC 0.7121). A zeroed entry equals "feature at its
median", i.e. the same thing modality masking produces.

TPU notes: fit (nanmedian/nanpercentile) is host-side numpy over the
training set (runs once); transform is a jitted elementwise kernel that
XLA fuses into the consuming model's input pipeline.
"""
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


@jax.jit
def _scale_transform(X, medians, iqrs):
    scaled = (X - medians) / iqrs
    return jnp.where(jnp.isnan(scaled), 0.0, scaled)


class NaNRobustScaler:
    """Median/IQR scaler that ignores NaNs when fitting and zero-fills
    NaNs on transform (see module docstring for the deviation note)."""

    def __init__(self):
        self.medians = None
        self.iqrs = None

    def fit(self, X: np.ndarray):
        with np.errstate(all="ignore"):
            self.medians = np.nanmedian(X, axis=0)
            # one batched call: numpy shares the partition across quantiles
            # (bit-identical to separate q75/q25 calls, tested); nanmedian
            # stays separate because its even-count mean (a+b)/2 is NOT
            # bitwise nanpercentile(50)'s a+(b-a)*0.5
            q25, q75 = np.nanpercentile(X, [25, 75], axis=0)
        # all-NaN columns: nanmedian/nanpercentile return NaN; treat as 0/1
        self.medians = np.where(np.isnan(self.medians), 0.0, self.medians)
        iqrs = q75 - q25
        iqrs = np.where(np.isnan(iqrs), 1.0, iqrs)
        iqrs[iqrs == 0] = 1.0
        self.iqrs = iqrs
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        # numpy on purpose: these matrices are tiny (hundreds x tens) and a
        # standalone device call costs a host<->device round trip that
        # dwarfs the arithmetic; the jitted _scale_transform above exists
        # for fusing the same math INTO device programs.
        if self.medians is None:
            raise ValueError("Scaler not fitted")
        out = (np.asarray(X, np.float32) - np.float32(self.medians)) / np.float32(self.iqrs)
        return np.where(np.isnan(out), np.float32(0.0), out)


def preprocess_features(
    df: pd.DataFrame,
    feature_cols: List[str],
    imputer=None,
    scaler=None,
    strategy: str = "robust",
) -> Tuple[np.ndarray, object, object]:
    """Select columns (missing ones become NaN -> scaled to 0), fit the
    scaler if not given, and return (X_scaled, None, scaler)."""
    existing = [c for c in feature_cols if c in df.columns]
    if not existing:
        # whole modality absent: all-zero block (reference returned all-NaN,
        # which under the intended NaN->0 semantics is the same thing)
        return np.zeros((len(df), len(feature_cols)), dtype=np.float32), imputer, scaler

    X = np.full((len(df), len(feature_cols)), np.nan, dtype=np.float64)
    present = [(j, c) for j, c in enumerate(feature_cols) if c in df.columns]
    if all(pd.api.types.is_numeric_dtype(df[c]) for _, c in present):
        # fast path: one block gather — to_numeric is the identity on
        # already-numeric dtypes, and the per-column loop costs ~35
        # pandas calls per fold on the CV hot path
        X[:, [j for j, _ in present]] = df[[c for _, c in present]].to_numpy(np.float64)
    else:
        for j, col in present:
            X[:, j] = pd.to_numeric(df[col], errors="coerce").to_numpy(dtype=np.float64)

    if scaler is None:
        scaler = NaNRobustScaler()
        scaler.fit(X)

    X_scaled = scaler.transform(X)
    return X_scaled, None, scaler
