"""Model protocol (reference: src/pd_fusion/models/base.py:4-20).

Every model family implements the same four-method surface —
``train`` / ``predict_proba`` / ``save`` / ``load`` — which is what the
experiment runner, the calibration/conformal wrappers, and the
serialization loader program against. Concrete models in this rebuild
hold a JAX params pytree and delegate compute to jitted functions in
``pd_fusion.nn``.
"""
import abc


class BaseModel(abc.ABC):
    @abc.abstractmethod
    def train(self, X, y, val_data=None):
        """Fit on features ``X`` / labels ``y`` (optional validation tuple)."""

    @abc.abstractmethod
    def predict_proba(self, X, masks=None):
        """Return P(y=1) per row; ``masks`` carries modality presence."""

    @abc.abstractmethod
    def save(self, path):
        """Persist enough state for ``load`` to reconstruct the model."""

    @classmethod
    @abc.abstractmethod
    def load(cls, path):
        """Inverse of ``save``."""
