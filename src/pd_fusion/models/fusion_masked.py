"""Mask-aware fusion: the [N, M] modality-availability matrix is appended
to the feature vector (reference: src/pd_fusion/models/fusion_masked.py).

The ``mask_dim`` attribute is load-bearing: downstream code dispatches on
``hasattr(model, "mask_dim")`` to decide whether to pass the mask matrix
(reference evaluate.py:79, run_experiment.py:157,234).
"""
import numpy as np

from pd_fusion.models.fusion_late import LateFusionModel


class MaskedFusionModel(LateFusionModel):
    def __init__(self, input_dim, mask_dim, params):
        super().__init__(input_dim + mask_dim, params)
        self.mask_dim = mask_dim

    def predict_proba(self, X, masks=None):
        if masks is not None:
            X = np.concatenate([np.asarray(X, np.float32), np.asarray(masks, np.float32)], axis=1)
        return super().predict_proba(X)

    def prepare_eval_matrix(self, X, masks=None):
        if masks is None:
            return np.asarray(X, np.float32)
        from pd_fusion.data.missingness import get_modality_mask_matrix

        mm = get_modality_mask_matrix(masks).astype(np.float32)
        return np.concatenate([np.asarray(X, np.float32), mm], axis=1)

    def save(self, path):
        from pd_fusion.utils.io import save_pickle
        import jax

        save_pickle(
            {
                "kind": "fusion_masked",
                "input_dim": self.input_dim - self.mask_dim,
                "mask_dim": self.mask_dim,
                "params": self.params,
                "net_params": jax.device_get(self.net_params),
            },
            path,
        )

    @classmethod
    def load(cls, path, input_dim=None, params=None):
        from pd_fusion.utils.io import load_pickle

        state = load_pickle(path)
        inst = cls(state["input_dim"], state["mask_dim"], state["params"])
        inst.net_params = state["net_params"]
        return inst
