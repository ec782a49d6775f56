"""Tabular MRI feature helpers (reference: features/mri.py — unused by the
reference pipeline; kept for API completeness): keep non-metadata columns
and normalize volumetrics by intracranial volume when present."""
import pandas as pd

_META_COLS = {"patno", "event_id", "date"}


def get_mri_features(df: pd.DataFrame) -> pd.DataFrame:
    subset = df[[c for c in df.columns if c not in _META_COLS]].copy()
    if "icv" in subset.columns:
        icv = subset["icv"]
        for col in subset.columns:
            if col != "icv" and pd.api.types.is_numeric_dtype(subset[col]):
                subset[col] = subset[col] / (icv + 1e-6)
    return subset
