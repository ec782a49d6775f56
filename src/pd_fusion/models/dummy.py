"""Constant-probability baseline (reference: src/pd_fusion/models/dummy.py:
6-25): predicts train prevalence; used when a modality has no features."""
import numpy as np

from pd_fusion.models.base import BaseModel
from pd_fusion.utils.io import load_pickle, save_pickle


class ConstantProbabilityModel(BaseModel):
    def __init__(self, p: float = 0.5):
        self.p = float(p)

    def train(self, X, y, val_data=None):
        self.p = float(np.mean(y)) if len(y) > 0 else 0.5

    def predict_proba(self, X, masks=None):
        return np.full(len(X), self.p)

    def save(self, path):
        save_pickle(self, path)

    @classmethod
    def load(cls, path):
        return load_pickle(path)
