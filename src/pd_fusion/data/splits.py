"""Dataset splitting.

Fold-assignment parity with the reference is a hard requirement for
metric parity under CV (SURVEY §7 "hard parts"), so splitting delegates
to the same host-side sklearn primitives with the same arguments
(reference: src/pd_fusion/data/splits.py:12-102 — train_test_split /
StratifiedKFold / StratifiedGroupKFold, shuffle=True, random_state=seed).
Only the wrapper layer differs: all K-fold variants funnel through one
row-slicing generator, and missing StratifiedGroupKFold degrades loudly
to GroupKFold instead of silently yielding nothing.
"""
from typing import Dict, Generator, Tuple

import pandas as pd
from sklearn.model_selection import GroupKFold, StratifiedKFold, train_test_split

from pd_fusion.data.schema import TARGET_COL

try:
    from sklearn.model_selection import StratifiedGroupKFold
except Exception:  # pragma: no cover - old sklearn
    StratifiedGroupKFold = None

FrameSplits = Generator[Tuple[pd.DataFrame, pd.DataFrame], None, None]


def _iter_row_splits(splitter, df: pd.DataFrame, y=None, groups=None) -> FrameSplits:
    """Yield (train_df, val_df) row slices for every fold of ``splitter``."""
    for train_idx, val_idx in splitter.split(df, y, groups):
        yield df.iloc[train_idx], df.iloc[val_idx]


def _group_splitter(n_splits: int, seed: int):
    """Stratified-group K-fold, or plain GroupKFold on old sklearn."""
    if StratifiedGroupKFold is not None:
        return StratifiedGroupKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return GroupKFold(n_splits=n_splits)  # pragma: no cover


def stratified_split(
    df: pd.DataFrame, test_size: float = 0.2, val_size: float = 0.1, seed: int = 42
):
    """70/10/20 stratified train/val/test split (two chained holdouts)."""
    train_val, test = train_test_split(
        df, test_size=test_size, stratify=df[TARGET_COL], random_state=seed
    )
    train, val = train_test_split(
        train_val,
        test_size=val_size / (1 - test_size),
        stratify=train_val[TARGET_COL],
        random_state=seed,
    )
    return train, val, test


def get_kfold_splits(df: pd.DataFrame, n_splits: int = 5, seed: int = 42) -> FrameSplits:
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return _iter_row_splits(skf, df, y=df[TARGET_COL])


def get_group_kfold_splits(
    df: pd.DataFrame,
    n_splits: int = 5,
    seed: int = 42,
    group_col: str = "subject_id",
) -> FrameSplits:
    splitter = _group_splitter(n_splits, seed)
    return _iter_row_splits(splitter, df, y=df[TARGET_COL], groups=df[group_col])


def split_train_calibration(
    df: pd.DataFrame,
    calib_size: float = 0.2,
    seed: int = 42,
    group_col: str = None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Nested train/calibration split, group-aware when ``group_col`` given."""
    if not 0 < calib_size < 1:
        raise ValueError("calib_size must be between 0 and 1.")
    if group_col and group_col in df.columns:
        # first fold of a group K-fold whose fold count approximates calib_size
        splitter = _group_splitter(max(2, int(round(1.0 / calib_size))), seed)
        return next(_iter_row_splits(splitter, df, y=df[TARGET_COL], groups=df[group_col]))
    return train_test_split(
        df, test_size=calib_size, stratify=df[TARGET_COL], random_state=seed
    )


def get_subset_masks(maskdict: Dict, indices: pd.Index) -> Dict:
    """Positional mask slicing: mask arrays are aligned with the original
    dataframe's RangeIndex, so df.index values double as positions
    (reference: splits.py:90-102)."""
    return {k: v[indices] for k, v in maskdict.items()}
