"""Fusion-ModDrop — the flagship tabular model.

Reference behavior (src/pd_fusion/models/fusion_moddrop.py):
- features are the concatenation of modality blocks; block boundaries come
  from ``modality_dims`` in sorted-name order (:17-28);
- training: minibatch Adam; per BATCH, each modality is dropped whole with
  prob ``moddrop_rate`` — one Bernoulli draw per modality per batch shared
  by all samples (:44-53, 77-91). The per-SAMPLE variant used by the
  stress-test suite (ppmi_stress_test.py:192-199) is available via
  ``moddrop_per_sample: true``.
- inference: user-provided masks zero the missing modality blocks
  (:103-112).

TPU design: the modality-drop mask is fused into the jitted train step
(nn/trainer.train_minibatch_moddrop) — the whole multi-epoch minibatch
loop is one XLA program; no host RNG in the loop.
"""
import jax
import numpy as np

from pd_fusion.data.feature_utils import apply_modality_masks_np
from pd_fusion.models.base import BaseModel
from pd_fusion.nn.mlp import mlp_init
from pd_fusion.nn.trainer import predict_proba_jit, train_minibatch_moddrop
from pd_fusion.utils.io import load_pickle, save_pickle
from pd_fusion.utils.seed import fresh_key


def _assignment_matrix(modality_dims):
    """[F, M] one-hot feature->modality map for the sorted-name block
    layout (matches get_all_feature_cols concatenation order: the three
    canonical modality names sort alphabetically into MODALITIES order)."""
    mods = sorted(modality_dims.keys())
    F = sum(modality_dims.values())
    A = np.zeros((F, len(mods)), dtype=np.float32)
    start = 0
    for mi, mod in enumerate(mods):
        d = modality_dims[mod]
        A[start : start + d, mi] = 1.0
        start += d
    return A, mods


class ModalityDropoutModel(BaseModel):
    def __init__(self, modality_dims, params):
        self.params = params
        self.modality_dims = dict(modality_dims)
        self.assign, self.mod_names = _assignment_matrix(self.modality_dims)
        input_dim = int(self.assign.shape[0])
        dims = [input_dim, *params["hidden_dims"], 1]
        self.net_params = mlp_init(fresh_key(), dims)

    def train(self, X, y, val_data=None):
        n = len(X)
        batch_size = int(self.params.get("batch_size", 32))
        self.net_params = train_minibatch_moddrop(
            self.net_params,
            np.asarray(X, np.float32),
            np.asarray(y, np.float32),
            np.ones(n, np.float32),
            self.assign,
            fresh_key(),
            float(self.params["lr"]),
            int(self.params["epochs"]),
            min(batch_size, n),
            float(self.params.get("dropout", 0.2)),
            float(self.params.get("weight_decay", 0.0)),
            float(self.params.get("moddrop_rate", 0.2)),
            bool(self.params.get("moddrop_per_sample", False)),
        )
        jax.block_until_ready(self.net_params)

    def predict_proba(self, X, masks=None):
        X = np.asarray(X, np.float32)
        if masks is not None:
            # zero the feature blocks of missing modalities per sample
            mask_mat = np.stack(
                [
                    np.asarray(masks[m], np.float32)
                    if m in masks
                    else np.ones(len(X), np.float32)
                    for m in self.mod_names
                ],
                axis=1,
            )
            X = apply_modality_masks_np(X, mask_mat, self.assign)
        return np.asarray(predict_proba_jit(self.net_params, X))

    def prepare_eval_matrix(self, X, masks=None):
        X = np.asarray(X, np.float32)
        if masks is None:
            return X
        mask_mat = np.stack(
            [
                np.asarray(masks[m], np.float32) if m in masks else np.ones(len(X), np.float32)
                for m in self.mod_names
            ],
            axis=1,
        )
        return apply_modality_masks_np(X, mask_mat, self.assign)

    def save(self, path):
        save_pickle(
            {
                "kind": "fusion_moddrop",
                "modality_dims": self.modality_dims,
                "params": self.params,
                "net_params": jax.device_get(self.net_params),
            },
            path,
        )

    @classmethod
    def load(cls, path, input_dim=None, params=None):
        state = load_pickle(path)
        inst = cls(state["modality_dims"], state["params"])
        inst.net_params = state["net_params"]
        return inst
