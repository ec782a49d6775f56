"""MIL attention model over precomputed per-slice embedding bags.

Reference surface (models/mil_attention.py:66-187): params hidden_dim /
attn_dim / dropout / gated / missing_prob / lr / weight_decay /
batch_size / epochs / max_grad_norm / early_stopping_patience /
class_weight ("balanced" -> pos_weight = neg/pos) / pos_weight; missing
bags (None, or masks["mri"] == 0) predict the constant ``missing_prob``.

TPU differences (documented):
- bags pad to a static max length (rounded up to a multiple of 8 for TPU
  sublane alignment) shared by train/val/predict — one compiled program;
  masked softmax makes the padding exact.
- early stopping runs inside one fixed-shape lax.scan: a ``stopped``
  carry flag freezes params/optimizer once val AUC has stalled for
  ``early_stopping_patience`` epochs — exactly the reference's
  patience-break + best-state restore, including the case where AUC
  would have recovered after the window (nn/mil.py:train_mil_impl).
- prediction is one batched program over all bags (the reference loops
  bags in Python one at a time, :255-278).
"""
import jax
import numpy as np

from pd_fusion.models.base import BaseModel
from pd_fusion.nn.mil import mil_init, mil_predict, pad_bags, train_mil
from pd_fusion.utils.io import load_pickle, save_pickle
from pd_fusion.utils.seed import fresh_key


def _round_up(x, m=8):
    return ((x + m - 1) // m) * m


class MilAttentionModel(BaseModel):
    def __init__(self, input_dim: int, params: dict):
        self.params = params or {}
        self.input_dim = int(input_dim)
        self.hidden_dim = int(self.params.get("hidden_dim", 128))
        self.attn_dim = int(self.params.get("attn_dim", 64))
        self.dropout = float(self.params.get("dropout", 0.3))
        self.gated = bool(self.params.get("gated", False))
        self.missing_prob = float(self.params.get("missing_prob", 0.5))
        self.max_len = int(self.params["max_len"]) if "max_len" in self.params else None
        self.net_params = mil_init(
            fresh_key(), self.input_dim, self.hidden_dim, self.attn_dim, self.gated
        )

    def _resolve_pos_weight(self, y):
        if self.params.get("class_weight") == "balanced":
            pos = float((np.asarray(y) == 1).sum())
            neg = float((np.asarray(y) == 0).sum())
            return neg / pos if pos > 0 else 1.0
        if self.params.get("pos_weight") is not None:
            return float(self.params["pos_weight"])
        return 1.0

    def train(self, bags, y, val_data=None):
        # drop missing bags together with their labels (the reference
        # would crash on a None bag, :54-63; silently dropping only the
        # bag would misalign labels)
        kept = [i for i, b in enumerate(bags) if b is not None]
        real = [np.asarray(bags[i], np.float32) for i in kept]
        y = np.asarray(y, np.float32)[kept]
        lens = [b.shape[0] for b in real]
        if self.max_len is None:
            self.max_len = _round_up(max(lens))
            if val_data is not None:
                v_lens = [
                    np.asarray(b).shape[0] for b in val_data[0] if b is not None
                ]
                if v_lens:
                    self.max_len = max(self.max_len, _round_up(max(v_lens)))
        elif self.max_len < max(lens):
            raise ValueError(
                f"config max_len={self.max_len} would truncate training bags "
                f"(longest bag has {max(lens)} instances)"
            )

        X, bag_mask = pad_bags(real, self.max_len)
        y_arr = np.asarray(y, np.float32)

        patience = int(self.params.get("early_stopping_patience", 0))
        track_best = bool(val_data is not None and patience > 0)
        vmiss = None
        if track_best:
            # the reference scores the ENTIRE val set through
            # predict_proba each epoch (mil_attention.py:139-143), so a
            # None bag contributes the constant missing_prob with its
            # true label — it must stay in the per-epoch AUC, not be
            # dropped. Val bags longer than a configured max_len widen
            # the val pad locally (the reference pads per-batch and
            # never truncates); train/val pad lengths are independent.
            val_bags, y_val = val_data
            nv = len(val_bags)
            v_real = [i for i, b in enumerate(val_bags) if b is not None]
            vlen = self.max_len
            if v_real:
                vlen = max(vlen, _round_up(
                    max(np.asarray(val_bags[i]).shape[0] for i in v_real)
                ))
            Xv = np.zeros((nv, vlen, self.input_dim), np.float32)
            # all-ones mask on missing rows: finite logits through the
            # masked softmax (overridden by vmiss before the AUC)
            mv = np.ones((nv, vlen), np.float32)
            if v_real:
                xr, mr = pad_bags(
                    [np.asarray(val_bags[i], np.float32) for i in v_real], vlen
                )
                Xv[v_real], mv[v_real] = xr, mr
            yv = np.asarray(y_val, np.float32)
            wv = np.ones(nv, np.float32)
            vmiss = np.array(
                [0.0 if b is not None else 1.0 for b in val_bags], np.float32
            )
        else:
            Xv = np.zeros((1, self.max_len, self.input_dim), np.float32)
            mv = np.ones((1, self.max_len), np.float32)
            yv = np.zeros(1, np.float32)
            wv = np.zeros(1, np.float32)

        max_grad_norm = self.params.get("max_grad_norm")
        self.net_params = train_mil(
            self.net_params,
            X,
            bag_mask,
            y_arr,
            Xv,
            mv,
            yv,
            wv,
            fresh_key(),
            float(self.params.get("lr", 1e-3)),
            np.float32(self._resolve_pos_weight(y_arr)),
            np.float32(max_grad_norm if max_grad_norm else 1.0),
            int(self.params.get("epochs", 30)),
            min(int(self.params.get("batch_size", 16)), len(real)),
            self.gated,
            self.dropout,
            float(self.params.get("weight_decay", 0.0)),
            bool(max_grad_norm),
            track_best,
            patience=patience if track_best else 0,
            vmiss=vmiss,
            missing_prob=self.missing_prob,
        )
        jax.block_until_ready(self.net_params)

    def predict_proba(self, bags, masks=None):
        mri_mask = masks.get("mri") if isinstance(masks, dict) else None
        n = len(bags)
        missing = np.array(
            [
                bags[i] is None or (mri_mask is not None and mri_mask[i] == 0)
                for i in range(n)
            ]
        )
        out = np.full(n, self.missing_prob, np.float32)
        present = np.where(~missing)[0]
        if len(present):
            # never truncate: a held-out bag longer than anything seen at
            # train time widens the pad (attention pooling is L-agnostic;
            # the wider shape just compiles one more predict program)
            max_len = max(
                self.max_len or 0,
                _round_up(max(np.asarray(bags[i]).shape[0] for i in present)),
            )
            X, bag_mask = pad_bags(
                [np.asarray(bags[i], np.float32) for i in present], max_len
            )
            probs = np.asarray(mil_predict(self.net_params, X, bag_mask, self.gated))
            out[present] = probs
        return out

    def save(self, path):
        save_pickle(
            {
                "kind": "mil_attention",
                "input_dim": self.input_dim,
                "params": self.params,
                "max_len": self.max_len,
                "net_params": jax.device_get(self.net_params),
            },
            path,
        )

    @classmethod
    def load(cls, path, input_dim=None, params=None):
        state = load_pickle(path)
        inst = cls(state["input_dim"], state["params"])
        inst.max_len = state["max_len"]
        inst.net_params = state["net_params"]
        return inst
