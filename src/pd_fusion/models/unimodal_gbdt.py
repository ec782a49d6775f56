"""Unimodal gradient-boosted trees (reference: src/pd_fusion/models/
unimodal_gbdt.py:6-26 wraps LGBMClassifier).

Backend chain: the reference's own fallback chain extended — lightgbm ->
xgboost -> sklearn HistGradientBoostingClassifier (the chain the
reference uses in scripts/ppmi_train_tabular.py:109-142). In this image
lightgbm/xgboost are absent, so HistGB is the active default; its params
are translated from the lgbm naming.

The backend resolves via ``pd_fusion.nn.gbdt.resolve_gbdt_backend``:
``backend: auto`` (the default) picks the TPU-native histogram boosting
trainer (pd_fusion.nn.gbdt.DeviceHistGBDT — the whole ensemble trains as
one compiled XLA program) on an accelerator and the host chain on CPU;
``backend: device``/``host`` or PD_FUSION_GBDT_BACKEND force either.
AUC parity between backends is pinned in tests/test_device_gbdt.py.
"""
import os
from pd_fusion.models.base import BaseModel
from pd_fusion.utils.io import load_pickle, save_pickle

try:  # pragma: no cover - not present in this image
    import lightgbm as lgb

    _BACKEND = "lightgbm"
except Exception:
    lgb = None
    try:  # pragma: no cover
        import xgboost as xgb

        _BACKEND = "xgboost"
    except Exception:
        xgb = None
        _BACKEND = "histgb"


def _translate_params_histgb(params):
    """Map the lgbm-style config params onto HistGradientBoosting."""
    out = {}
    if "n_estimators" in params:
        out["max_iter"] = int(params["n_estimators"])
    if "learning_rate" in params:
        out["learning_rate"] = float(params["learning_rate"])
    if "max_depth" in params:
        out["max_depth"] = int(params["max_depth"])
    if "random_state" in params:
        out["random_state"] = int(params["random_state"])
    return out


_DEVICE_PARAM_KEYS = (
    "n_estimators",
    "learning_rate",
    "max_depth",
    "num_leaves",
    "reg_lambda",
    "min_child_samples",
    "min_child_weight",
    "random_state",
    "hist_mode",
)


class UnimodalGBDT(BaseModel):
    def __init__(self, mod_name, params=None):
        self.mod_name = mod_name
        self.params = dict(params or {})
        from pd_fusion.nn.gbdt import resolve_gbdt_backend

        if resolve_gbdt_backend(self.params.pop("backend", None)) == "device":
            from pd_fusion.nn.gbdt import DeviceHistGBDT

            self.backend = "device"
            self.model = DeviceHistGBDT(
                **{k: v for k, v in self.params.items() if k in _DEVICE_PARAM_KEYS}
            )
        elif _BACKEND == "lightgbm":  # pragma: no cover
            self.backend = _BACKEND
            self.model = lgb.LGBMClassifier(**self.params)
        elif _BACKEND == "xgboost":  # pragma: no cover
            self.backend = _BACKEND
            self.model = xgb.XGBClassifier(**self.params)
        else:
            from sklearn.ensemble import HistGradientBoostingClassifier

            self.backend = _BACKEND
            self.model = HistGradientBoostingClassifier(**_translate_params_histgb(self.params))

    def train(self, X, y, val_data=None):
        if self.backend == "lightgbm" and val_data:  # pragma: no cover
            self.model.fit(X, y, eval_set=[val_data])
        else:
            self.model.fit(X, y)

    def predict_proba(self, X, masks=None):
        return self.model.predict_proba(X)[:, 1]

    def prepare_eval_bins(self, X):
        """Device-backend capability hook for the fused single-run
        scenario eval (evaluation/evaluate.py:_eval_scenarios_fused_gbdt):
        scenario-zeroed matrix -> int32 bin codes under the fitted edges.
        Only meaningful when backend == 'device'."""
        import numpy as np

        from pd_fusion.nn.gbdt import bin_features

        return bin_features(np.asarray(X, np.float32), self.model.edges_)

    def save(self, path):
        save_pickle(self, path)

    @classmethod
    def load(cls, path):
        return load_pickle(path)
