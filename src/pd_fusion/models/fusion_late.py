"""Late-fusion MLP over concatenated modality features.

Reference behavior (src/pd_fusion/models/fusion_late.py:24-60): full-batch
Adam + BCE for ``epochs`` steps, no minibatching, no early stopping; the
same class doubles as the ``unimodal_mlp`` backbone (training/train.py:
127-144). Here training is one jitted lax.scan program (nn/trainer.py).
"""
import jax
import numpy as np

from pd_fusion.models.base import BaseModel
from pd_fusion.nn.mlp import mlp_init
from pd_fusion.nn.trainer import predict_proba_jit, train_fullbatch
from pd_fusion.utils.io import load_pickle, save_pickle
from pd_fusion.utils.seed import fresh_key


class LateFusionModel(BaseModel):
    def __init__(self, input_dim, params):
        self.params = params
        self.input_dim = int(input_dim)
        dims = [self.input_dim, *params["hidden_dims"], 1]
        self.net_params = mlp_init(fresh_key(), dims)

    def train(self, X, y, val_data=None):
        self.net_params = train_fullbatch(
            self.net_params,
            np.asarray(X, np.float32),
            np.asarray(y, np.float32),
            None,
            fresh_key(),
            float(self.params["lr"]),
            int(self.params["epochs"]),
            float(self.params.get("dropout", 0.2)),
            float(self.params.get("weight_decay", 0.0)),
        )
        # block so training time is attributable and params are materialized
        jax.block_until_ready(self.net_params)

    def predict_proba(self, X, masks=None):
        return np.asarray(predict_proba_jit(self.net_params, np.asarray(X, np.float32)))

    def prepare_eval_matrix(self, X, masks=None):
        """Final matrix fed to the MLP for the given availability masks —
        lets evaluate_model stack all scenarios into ONE device program."""
        return np.asarray(X, np.float32)

    def save(self, path):
        save_pickle(
            {
                "kind": "fusion_late",
                "input_dim": self.input_dim,
                "params": self.params,
                "net_params": jax.device_get(self.net_params),
            },
            path,
        )

    @classmethod
    def load(cls, path, input_dim=None, params=None):
        state = load_pickle(path)
        inst = cls(state["input_dim"], state["params"])
        inst.net_params = state["net_params"]
        return inst
