"""UCI Parkinsons voice dataset -> canonical multimodal format.

Reference contract (src/pd_fusion/data/dev_datasets/uci_parkinsons.py:7-46):
all voice features become ``clinical_*`` columns; masks: clinical=1,
datspect=0, mri=0.
"""
from typing import Dict, Tuple

import numpy as np
import pandas as pd

from pd_fusion.data.schema import ID_COL, TARGET_COL


def load_uci_parkinsons() -> Tuple[pd.DataFrame, Dict[str, np.ndarray]]:
    from pd_fusion.paths import DEV_DATA_DIR

    data_path = DEV_DATA_DIR / "uci" / "parkinsons.data"
    if not data_path.exists():
        raise FileNotFoundError(
            f"UCI Parkinsons data not found at {data_path}. "
            "Run 'python -m pd_fusion.cli download-dev' first."
        )

    df = pd.read_csv(data_path)
    df = df.rename(columns={"status": TARGET_COL, "name": ID_COL})
    feature_cols = [c for c in df.columns if c not in (TARGET_COL, ID_COL)]
    df = df.rename(columns={c: f"clinical_{c}" for c in feature_cols})

    n = len(df)
    masks = {
        "clinical": np.ones(n, dtype=int),
        "datspect": np.zeros(n, dtype=int),
        "mri": np.zeros(n, dtype=int),
    }
    return df, masks
