"""Probability calibration wrapper (reference: src/pd_fusion/models/
calibrate.py:7-56): isotonic (default) or Platt over the base model's
predictions; ``__getattr__`` delegates to the base model so the
``mask_dim`` runtime type-tag survives wrapping.

The isotonic fit is host-side sklearn PAV (runs once on a small
calibration set); the transform is a monotone piecewise-linear interp.
"""
import pickle

import numpy as np
from sklearn.isotonic import IsotonicRegression
from sklearn.linear_model import LogisticRegression


class CalibratedModel:
    def __init__(self, base_model, method="isotonic"):
        self.base_model = base_model
        self.method = method
        self.calibrator = None

    def fit(self, X_val, y_val, masks_val=None):
        if not hasattr(self.base_model, "predict_proba"):
            raise ValueError("Base model must have predict_proba")
        preds = np.asarray(self.base_model.predict_proba(X_val, masks_val)).ravel()

        if self.method == "isotonic":
            self.calibrator = IsotonicRegression(out_of_bounds="clip")
            self.calibrator.fit(preds, y_val)
        else:
            self.calibrator = LogisticRegression()
            self.calibrator.fit(preds.reshape(-1, 1), y_val)

    def predict_proba(self, X, masks=None):
        preds = np.asarray(self.base_model.predict_proba(X, masks)).ravel()
        if self.calibrator is None:
            return preds
        if self.method == "isotonic":
            return self.calibrator.transform(preds)
        return self.calibrator.predict_proba(preds.reshape(-1, 1))[:, 1]

    def __getattr__(self, name):
        # delegate e.g. mask_dim to the wrapped model — but never dunders,
        # and never before __init__/__setstate__ populated __dict__
        # (pickle probes attributes on a bare instance; unconditional
        # delegation recurses forever through self.base_model).
        if name.startswith("__") or "base_model" not in self.__dict__:
            raise AttributeError(name)
        return getattr(self.base_model, name)

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load(cls, path):
        with open(path, "rb") as f:
            return pickle.load(f)
