"""Tabular MRI feature helpers (reference: features/mri.py — unused by the
reference pipeline; kept for API completeness).

Input columns are assumed canonical (post column-mapper). Drops metadata
columns and expresses volumetric measures as fractions of intracranial
volume when an ``icv`` column exists.
"""
import pandas as pd

_META_COLS = frozenset({"patno", "event_id", "date"})
_ICV_EPS = 1e-6


def get_mri_features(df: pd.DataFrame) -> pd.DataFrame:
    feats = df.drop(columns=[c for c in df.columns if c in _META_COLS]).copy()
    if "icv" not in feats.columns:
        return feats
    denom = feats["icv"] + _ICV_EPS
    numeric = [
        c for c in feats.columns
        if c != "icv" and pd.api.types.is_numeric_dtype(feats[c])
    ]
    feats[numeric] = feats[numeric].div(denom, axis=0)
    return feats
