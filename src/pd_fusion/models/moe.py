"""MoE model wrapper (reference: src/pd_fusion/models/moe.py:49-84).

Train signature matches the reference: ``train(X_dict, y, mask, val_data)``
with per-modality preprocessed inputs and an [N, M] mask tensor; the
validation tuple is accepted and ignored (reference :60-70). Compute runs
through the stacked-expert einsum program in pd_fusion.nn.moe.
"""
import jax
import numpy as np

from pd_fusion.models.base import BaseModel
from pd_fusion.nn.moe import moe_init, moe_predict, train_moe
from pd_fusion.utils.io import load_pickle, save_pickle
from pd_fusion.utils.seed import fresh_key


class MoEModel(BaseModel):
    def __init__(self, modality_dims, params):
        self.params = params
        self.modality_dims = dict(modality_dims)
        self.mods = sorted(self.modality_dims.keys())
        self.f_max = max(self.modality_dims[m] for m in self.mods)
        self.net_params = moe_init(
            fresh_key(),
            self.modality_dims,
            params["expert_hidden_dims"],
            params["router_hidden_dims"],
        )

    def _stack_inputs(self, X_dict):
        n = len(next(iter(X_dict.values())))
        x = np.zeros((len(self.mods), n, self.f_max), np.float32)
        for mi, mod in enumerate(self.mods):
            Xm = np.asarray(X_dict[mod], np.float32)
            x[mi, :, : Xm.shape[1]] = Xm
        return x

    def train(self, X_dict, y, mask, val_data=None):
        x_stack = self._stack_inputs(X_dict)
        self.net_params = train_moe(
            self.net_params,
            x_stack,
            np.asarray(mask, np.float32),
            np.asarray(y, np.float32),
            float(self.params["lr"]),
            int(self.params["epochs"]),
            float(self.params.get("weight_decay", 0.0)),
        )
        jax.block_until_ready(self.net_params)

    def predict_proba(self, X_dict, mask=None):
        x_stack = self._stack_inputs(X_dict)
        if mask is None:
            mask = np.ones((x_stack.shape[1], len(self.mods)), np.float32)
        return np.asarray(moe_predict(self.net_params, x_stack, np.asarray(mask, np.float32)))

    def save(self, path):
        save_pickle(
            {
                "kind": "moe",
                "modality_dims": self.modality_dims,
                "params": self.params,
                "net_params": jax.device_get(self.net_params),
            },
            path,
        )

    @classmethod
    def load(cls, path, modality_dims=None, params=None):
        state = load_pickle(path)
        inst = cls(state["modality_dims"], state["params"])
        inst.net_params = state["net_params"]
        return inst
