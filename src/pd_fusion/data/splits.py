"""Dataset splitting.

Delegates to sklearn on the host so fold assignments are *identical* to the
reference for the same seed (reference: src/pd_fusion/data/splits.py:12-102
uses train_test_split / StratifiedKFold / StratifiedGroupKFold with
shuffle=True and random_state=seed). Fold-assignment parity is a hard
requirement for metric parity under CV (SURVEY §7 "hard parts").
"""
from typing import Dict, Generator, Tuple

import pandas as pd
from sklearn.model_selection import GroupKFold, StratifiedKFold, train_test_split

from pd_fusion.data.schema import TARGET_COL

try:
    from sklearn.model_selection import StratifiedGroupKFold

    _HAS_SGK = True
except Exception:  # pragma: no cover
    _HAS_SGK = False


def stratified_split(
    df: pd.DataFrame, test_size: float = 0.2, val_size: float = 0.1, seed: int = 42
):
    """70/10/20 stratified train/val/test split."""
    train_val_df, test_df = train_test_split(
        df, test_size=test_size, stratify=df[TARGET_COL], random_state=seed
    )
    rel_val_size = val_size / (1 - test_size)
    train_df, val_df = train_test_split(
        train_val_df,
        test_size=rel_val_size,
        stratify=train_val_df[TARGET_COL],
        random_state=seed,
    )
    return train_df, val_df, test_df


def get_kfold_splits(
    df: pd.DataFrame, n_splits: int = 5, seed: int = 42
) -> Generator[Tuple[pd.DataFrame, pd.DataFrame], None, None]:
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    y = df[TARGET_COL]
    for train_idx, val_idx in skf.split(df, y):
        yield df.iloc[train_idx], df.iloc[val_idx]


def get_group_kfold_splits(
    df: pd.DataFrame,
    n_splits: int = 5,
    seed: int = 42,
    group_col: str = "subject_id",
) -> Generator[Tuple[pd.DataFrame, pd.DataFrame], None, None]:
    y = df[TARGET_COL]
    groups = df[group_col]
    if _HAS_SGK:
        splitter = StratifiedGroupKFold(n_splits=n_splits, shuffle=True, random_state=seed)
        for train_idx, val_idx in splitter.split(df, y, groups):
            yield df.iloc[train_idx], df.iloc[val_idx]
    else:  # pragma: no cover - old sklearn; don't silently yield zero folds
        splitter = GroupKFold(n_splits=n_splits)
        for train_idx, val_idx in splitter.split(df, y, groups):
            yield df.iloc[train_idx], df.iloc[val_idx]


def split_train_calibration(
    df: pd.DataFrame,
    calib_size: float = 0.2,
    seed: int = 42,
    group_col: str = None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Nested train/calibration split, group-aware when group_col given."""
    if calib_size <= 0 or calib_size >= 1:
        raise ValueError("calib_size must be between 0 and 1.")
    if group_col and group_col in df.columns:
        y = df[TARGET_COL]
        groups = df[group_col]
        n_splits = max(2, int(round(1.0 / calib_size)))
        if _HAS_SGK:
            splitter = StratifiedGroupKFold(n_splits=n_splits, shuffle=True, random_state=seed)
            train_idx, calib_idx = next(splitter.split(df, y, groups))
        else:  # pragma: no cover
            splitter = GroupKFold(n_splits=n_splits)
            train_idx, calib_idx = next(splitter.split(df, y, groups))
        return df.iloc[train_idx], df.iloc[calib_idx]
    train_df, calib_df = train_test_split(
        df, test_size=calib_size, stratify=df[TARGET_COL], random_state=seed
    )
    return train_df, calib_df


def get_subset_masks(maskdict: Dict, indices: pd.Index) -> Dict:
    """Positional mask slicing: mask arrays are aligned with the original
    dataframe's RangeIndex, so df.index values double as positions
    (reference: splits.py:90-102)."""
    return {k: v[indices] for k, v in maskdict.items()}
