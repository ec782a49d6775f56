"""Model protocol (reference: src/pd_fusion/models/base.py:4-20).

Same four-method surface: train / predict_proba / save / load. Concrete
models hold a JAX params pytree and delegate compute to the jitted
functions in pd_fusion.nn.
"""
from abc import ABC, abstractmethod


class BaseModel(ABC):
    @abstractmethod
    def train(self, X, y, val_data=None):
        ...

    @abstractmethod
    def predict_proba(self, X, masks=None):
        ...

    @abstractmethod
    def save(self, path):
        ...

    @classmethod
    @abstractmethod
    def load(cls, path):
        ...
