"""UCI Telemonitoring dataset -> canonical format.

Reference contract (src/pd_fusion/data/dev_datasets/uci_telemonitoring.py:
7-53): the dataset is PD-only, so the binary target is a severity proxy —
median split on total_UPDRS (falling back to motor_UPDRS); voice+demo
features become ``clinical_*``; masks clinical=1, others=0.
"""
from typing import Dict, Tuple

import numpy as np
import pandas as pd

from pd_fusion.data.schema import ID_COL, TARGET_COL


def load_uci_telemonitoring() -> Tuple[pd.DataFrame, Dict[str, np.ndarray]]:
    from pd_fusion.paths import DEV_DATA_DIR

    data_path = DEV_DATA_DIR / "uci" / "parkinsons_updrs.data"
    if not data_path.exists():
        raise FileNotFoundError(
            f"UCI Telemonitoring data not found at {data_path}. "
            "Run 'python -m pd_fusion.cli download-dev' first."
        )

    df = pd.read_csv(data_path)
    df = df.rename(columns={"subject#": ID_COL})

    severity_col = "total_UPDRS" if "total_UPDRS" in df.columns else "motor_UPDRS"
    if severity_col not in df.columns:
        raise ValueError("Telemonitoring dataset missing UPDRS columns for severity proxy.")
    df[TARGET_COL] = (df[severity_col] >= df[severity_col].median()).astype(int)

    exclude = [ID_COL, TARGET_COL, "motor_UPDRS", "total_UPDRS"]
    feature_cols = [c for c in df.columns if c not in exclude]
    df = df.rename(columns={c: f"clinical_{c}" for c in feature_cols})

    n = len(df)
    masks = {
        "clinical": np.ones(n, dtype=int),
        "datspect": np.zeros(n, dtype=int),
        "mri": np.zeros(n, dtype=int),
    }
    return df, masks
