"""End-to-end MIL fine-tune: ResNet2D backbone over slice bags + attention
pooling head.

Reference surface (models/mil_attention_finetune.py): bags are NIfTI file
paths or precomputed slice arrays; per bag: load -> percentile-normalize
-> multi-axis slice select -> (train-time augment) -> 224² 3-channel
ImageNet prep -> backbone -> zero-pad bags -> MIL attention head;
backbone frozen for the first ``freeze_backbone_epochs``; separate LRs
for backbone/head with global weight decay; balanced batch sampling
option; focal or pos-weighted BCE; early stopping on val AUC with
best-state restore; TTA at inference; save = dict of the two state trees.

TPU design:
- ONE jitted train step per bag-batch covering augment -> resize ->
  backbone over all B*L slices at once -> MIL head -> loss -> grads ->
  two-group Adam update. The backbone-freeze phase is a traced 0/1
  gradient gate, so a single compiled program serves frozen and unfrozen
  epochs.
- volume loading runs on host prefetch threads between steps; slices are
  cached per subject after the first epoch (the reference re-reads and
  re-zooms every NIfTI every epoch — a large share of its wall-clock).
- BatchNorm uses batch statistics during training and EMA-updates the
  running stats every step (torch .train() behavior, reference
  models/mil_attention_finetune.py:147-151); the updated stats are
  carried in the params pytree and used at eval. Weight decay is masked
  off the running-stat buffers and gated off the backbone while frozen,
  matching torch Adam's handling of buffers / requires_grad=False.
"""
import os
from collections import OrderedDict
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pd_fusion.models.base import BaseModel
from pd_fusion.nn.mil import mil_apply, mil_init
from pd_fusion.nn.resnet import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    bn_buffer_mask,
    load_backbone,
    merge_bn_stats,
    resnet_apply,
    resnet_apply_train,
)
from pd_fusion.ops.image import (
    affine2d_batch,
    percentile_normalize,
    resize3d,
    slices_to_imagenet_batch,
    take_slices,
)
from pd_fusion.utils.io import load_pickle, save_pickle
from pd_fusion.utils.seed import fresh_key


class _SliceCache:
    """Byte-budgeted LRU of prepped slice bags, shared ACROSS model
    instances (and therefore across CV folds).

    A CV run constructs a fresh MilAttentionFineTuneModel per fold, so an
    instance-local cache makes every fold re-read + re-prep every NIfTI
    from scratch — K x N host prep passes for N fold-invariant arrays
    (the reference re-loads per epoch AND per fold,
    reference models/mil_attention_finetune.py:114-125,183). The prepped
    slices are a pure function of (path, target_shape, axes, counts), so
    sharing them across folds is exact. NOTE the backbone EMBEDDINGS are
    NOT cacheable across steps even while the backbone is frozen: the
    reference keeps BN in train mode (`self.backbone.train()`,
    reference :181) and augments every train-time load (:122-124), so
    frozen-epoch embeddings depend on the batch composition and the
    augmentation draw — in the reference too. Budget via
    PD_FUSION_SLICE_CACHE_MB (default 8192; 0 disables sharing and
    restores the per-instance behavior)."""

    def __init__(self):
        self._d: OrderedDict = OrderedDict()
        self._bytes = 0

    def _budget(self) -> int:
        return int(float(os.environ.get("PD_FUSION_SLICE_CACHE_MB", "8192")) * 2**20)

    def get(self, key):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def put(self, key, arr) -> None:
        budget = self._budget()
        if budget <= 0 or arr.nbytes > budget:
            return
        old = self._d.pop(key, None)
        if old is not None:
            self._bytes -= old.nbytes
        self._d[key] = arr
        self._bytes += arr.nbytes
        while self._bytes > budget and self._d:
            _, ev = self._d.popitem(last=False)
            self._bytes -= ev.nbytes

    def clear(self) -> None:
        self._d.clear()
        self._bytes = 0


SLICE_CACHE = _SliceCache()


@lru_cache(maxsize=32)
def _build_tx(max_grad_norm, weight_decay, lr_backbone, lr):
    """Optimizer chain, shared across model instances with equal
    hyperparams.

    The transform is stateless (init/update are pure), and its ``update``
    callable is a STATIC jit argument of _ft_step/_ft_scan — a fresh chain
    per CV fold gives every fold a distinct static-arg identity, forcing a
    ~20 s retrace of the resnet fwd+bwd program per fold on this host.
    Sharing one chain per hyperparam tuple makes folds 2..K pure jit-cache
    hits (measured 20.2 s -> 0.2 s per fold)."""
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay > 0:
        # decay parameters only — torch Adam(weight_decay=..) never
        # touches BN running-stat buffers
        chain.append(optax.add_decayed_weights(weight_decay, mask=bn_buffer_mask))
    chain.append(
        optax.multi_transform(
            {
                "backbone": optax.adam(lr_backbone),
                "head": optax.adam(lr),
            },
            {"backbone": "backbone", "head": "head"},
        )
    )
    return optax.chain(*chain)


def _ft_update(
    backbone_params,
    head_params,
    opt_state,
    slices,  # [B, L, h, w] normalized [0,1] slices
    bag_mask,  # [B, L]
    y,  # [B]
    valid,  # [B] 1.0 for real samples, 0.0 for rows padding a ragged batch
    bn_mask,  # [B, L] 1.0 where the (bag, slice) position existed in the
    # unpadded batch — BN batch statistics are restricted to these images
    aug_angle,  # [B]
    aug_translate,  # [B, 2]
    aug_scale,  # [B]
    aug_shift,  # [B]
    noise,  # [B, L, h, w]
    mean,
    std,
    pos_weight,
    focal_gamma,
    focal_alpha,
    backbone_gate,  # 0.0 while frozen, 1.0 when trainable
    dropout_key,
    tx_update,
    arch: str,
    gated: bool,
    input_size: int,
    loss_type: str,
    train_bn: bool,
    head_dropout: float = 0.0,
):
    """One augment->backbone->MIL-head->loss->update step (trace-level).

    The per-sample ``valid`` weights make a ragged final batch exact under
    a fixed padded shape: sum(x*valid)/sum(valid) over a zero-padded batch
    equals the reference's mean over the real rows (adding exact zeros and
    dividing by the true count), and ``bn_mask`` restricts the train-mode
    BN batch statistics to the images the unpadded batch contained — so
    ONE program shape serves every batch of an epoch, padding-exactly:
    the prerequisite for scanning whole epochs into a single dispatch
    (the reference loops python-side per batch,
    reference models/mil_attention_finetune.py:164-249)."""
    B, L = slices.shape[:2]

    def loss_fn(bp, hp):
        aug = jax.vmap(affine2d_batch)(slices, aug_angle, aug_translate)
        aug = jnp.clip(aug * aug_scale[:, None, None, None] + aug_shift[:, None, None, None] + noise, 0.0, 1.0)
        batch = slices_to_imagenet_batch(aug.reshape(B * L, *aug.shape[2:]), input_size, mean, std)
        if train_bn:
            # torch .train() semantics: batch-stat normalization AND an EMA
            # running-stat update every forward (even while the backbone's
            # weights are gradient-frozen)
            emb, bp_with_stats = resnet_apply_train(
                bp, batch, arch, sample_weight=bn_mask.reshape(B * L)
            )
        else:
            emb = resnet_apply(bp, batch, arch, train=False)
            bp_with_stats = bp
        emb = emb.reshape(B, L, -1)
        logits = mil_apply(
            hp, emb, bag_mask, gated=gated, dropout_rate=head_dropout, dropout_key=dropout_key
        )
        p = jax.nn.sigmoid(logits)
        bce = jax.nn.softplus(logits) - y * logits
        denom = jnp.sum(valid)
        denom = jnp.where(denom > 0, denom, 1.0)
        if loss_type == "focal":
            pt = jnp.where(y >= 0.5, p, 1.0 - p)
            focal = (1.0 - pt) ** focal_gamma
            alpha = jnp.where(y >= 0.5, focal_alpha, 1.0 - focal_alpha)
            return jnp.sum(alpha * focal * bce * valid) / denom, bp_with_stats
        w = jnp.where(y >= 0.5, pos_weight, 1.0)
        return jnp.sum(bce * w * valid) / denom, bp_with_stats

    grads, bp_stats = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
        backbone_params, head_params
    )
    gb = jax.tree_util.tree_map(lambda g: g * backbone_gate, grads[0])
    params = {"backbone": backbone_params, "head": head_params}
    # decay reference: gating the backbone side makes the weight-decay
    # addend vanish while frozen (torch skips requires_grad=False params
    # entirely, so a frozen backbone must be bit-frozen)
    decay_ref = {
        "backbone": jax.tree_util.tree_map(lambda p_: p_ * backbone_gate, backbone_params),
        "head": head_params,
    }
    updates, opt_state = tx_update({"backbone": gb, "head": grads[1]}, opt_state, decay_ref)
    params = optax.apply_updates(params, updates)
    new_backbone = merge_bn_stats(params["backbone"], bp_stats) if train_bn else params["backbone"]
    return new_backbone, params["head"], opt_state


@partial(
    jax.jit,
    static_argnames=("arch", "gated", "input_size", "loss_type", "train_bn", "tx_update", "head_dropout"),
    donate_argnums=(0, 1, 2),  # params/opt_state buffers are dead after the update
)
def _ft_step(
    backbone_params,
    head_params,
    opt_state,
    slices,
    bag_mask,
    y,
    aug_angle,
    aug_translate,
    aug_scale,
    aug_shift,
    noise,
    mean,
    std,
    pos_weight,
    focal_gamma,
    focal_alpha,
    backbone_gate,
    dropout_key,
    tx_update,
    arch: str,
    gated: bool,
    input_size: int,
    loss_type: str,
    train_bn: bool,
    head_dropout: float = 0.0,
):
    """Single-batch train step (full batch: valid/bn_mask == ones, so the
    masked sum/count in _ft_update reduces to the same mean)."""
    return _ft_update(
        backbone_params, head_params, opt_state, slices, bag_mask, y,
        jnp.ones(slices.shape[0], slices.dtype),
        jnp.ones(slices.shape[:2], slices.dtype), aug_angle, aug_translate,
        aug_scale, aug_shift, noise, mean, std, pos_weight, focal_gamma,
        focal_alpha, backbone_gate, dropout_key, tx_update, arch, gated,
        input_size, loss_type, train_bn, head_dropout,
    )


@partial(
    jax.jit,
    static_argnames=("arch", "gated", "input_size", "loss_type", "train_bn", "tx_update", "head_dropout"),
    donate_argnums=(0, 1, 2),
)
def _ft_scan(
    backbone_params,
    head_params,
    opt_state,
    slices,  # [S, B, L, h, w]
    bag_mask,  # [S, B, L]
    y,  # [S, B]
    valid,  # [S, B]
    bn_mask,  # [S, B, L]
    aug_angle,  # [S, B]
    aug_translate,  # [S, B, 2]
    aug_scale,  # [S, B]
    aug_shift,  # [S, B]
    noise,  # [S, B, L, h, w]
    gates,  # [S] 0/1 backbone gradient gate per step
    dropout_keys,  # [S, 2]
    mean,
    std,
    pos_weight,
    focal_gamma,
    focal_alpha,
    tx_update,
    arch: str,
    gated: bool,
    input_size: int,
    loss_type: str,
    train_bn: bool,
    head_dropout: float = 0.0,
):
    """S sequential train steps in ONE program (lax.scan over the batch
    axis).

    The reference dispatches per bag-batch from python
    (models/mil_attention_finetune.py:183-218); per-step device round
    trips cost ~RTT each, which dominates the fine-tune wall at small
    shapes. Scanning the stacked epoch turns O(steps) dispatches into
    O(1) per sync point (val-eval / checkpoint epoch boundaries) with
    bit-identical math per step."""

    def body(carry, xs):
        bp, hp, opt = carry
        (sl, bm, yb, vd, bnm, aa, at, asc, ash, nz, gate, key) = xs
        bp, hp, opt = _ft_update(
            bp, hp, opt, sl, bm, yb, vd, bnm, aa, at, asc, ash, nz, mean,
            std, pos_weight, focal_gamma, focal_alpha, gate, key, tx_update,
            arch, gated, input_size, loss_type, train_bn, head_dropout,
        )
        return (bp, hp, opt), None

    (backbone_params, head_params, opt_state), _ = jax.lax.scan(
        body,
        (backbone_params, head_params, opt_state),
        (slices, bag_mask, y, valid, bn_mask, aug_angle, aug_translate,
         aug_scale, aug_shift, noise, gates, dropout_keys),
    )
    return backbone_params, head_params, opt_state


@partial(jax.jit, static_argnames=("arch", "gated", "input_size"))
def _ft_predict(backbone_params, head_params, slices, bag_mask, mean, std, arch, gated, input_size):
    B, L = slices.shape[:2]
    batch = slices_to_imagenet_batch(slices.reshape(B * L, *slices.shape[2:]), input_size, mean, std)
    emb = resnet_apply(backbone_params, batch, arch, train=False).reshape(B, L, -1)
    return jax.nn.sigmoid(mil_apply(head_params, emb, bag_mask, gated=gated))


class MilAttentionFineTuneModel(BaseModel):
    def __init__(self, params: dict):
        self.params = params or {}
        p = self.params
        self.backbone_name = p.get("backbone", "resnet50")
        self.target_shape = tuple(p.get("target_shape", (160, 160, 160)))
        if p.get("slice_axes") and p.get("slice_counts"):
            self.axes = [int(a) for a in p["slice_axes"]]
            self.counts = [int(c) for c in p["slice_counts"]]
        else:
            self.axes = [int(p.get("slice_axis", 2))]
            self.counts = [int(p.get("slice_count", 48))]
        self.n_slices = sum(self.counts)
        self.input_size = int(p.get("input_size", 224))
        self.bag_batch_size = int(p.get("batch_size", 4))
        self.tta_inference = int(p.get("tta_inference", 1))
        self.max_rotation = float(p.get("max_rotation_deg", 5.0))
        self.max_translation = float(p.get("max_translation", 0.05))
        self.intensity_scale = float(p.get("intensity_scale", 0.1))
        self.intensity_shift = float(p.get("intensity_shift", 0.1))
        self.noise_std = float(p.get("noise_std", 0.01))
        self.missing_prob = float(p.get("missing_prob", 0.5))
        self.freeze_backbone_epochs = int(p.get("freeze_backbone_epochs", 2))
        self.train_aug = bool(p.get("train_aug", True))
        self.balanced_batches = bool(p.get("balanced_batches", False))
        self.loss_type = str(p.get("loss_type", "bce")).lower()
        self.focal_gamma = float(p.get("focal_gamma", 2.0))
        self.focal_alpha = p.get("focal_alpha")
        self.gated = bool(p.get("gated", False))

        weights_path = p.get("weights_path") if bool(p.get("pretrained", True)) else None
        self.backbone_params, self.emb_dim, self.pretrained = load_backbone(
            self.backbone_name, weights_path=weights_path, seed=int(p.get("seed", 0))
        )
        if self.pretrained:
            self.mean, self.std = IMAGENET_MEAN, IMAGENET_STD
        else:
            self.mean = np.array([0.5, 0.5, 0.5], np.float32)
            self.std = np.array([0.5, 0.5, 0.5], np.float32)

        self.head_params = mil_init(
            fresh_key(),
            self.emb_dim,
            int(p.get("hidden_dim", 256)),
            int(p.get("attn_dim", 128)),
            self.gated,
        )

        self.tx = _build_tx(
            float(max_grad_norm) if (max_grad_norm := p.get("max_grad_norm")) else None,
            float(p.get("weight_decay", 1e-3)),
            float(p.get("lr_backbone", 1e-4)),
            float(p.get("lr", 3e-4)),
        )
        self.opt_state = None
        self._slice_cache = {}

    # ---- bag -> normalized slices [n_slices, h, w] -----------------------
    def _load_bag_slices(self, bag) -> Optional[np.ndarray]:
        if bag is None:
            return None
        if isinstance(bag, np.ndarray):
            return bag.astype(np.float32, copy=False)
        key = (str(bag), self.target_shape, tuple(self.axes), tuple(self.counts))
        cached = self._slice_cache.get(key)
        if cached is None:
            cached = SLICE_CACHE.get(key)  # cross-fold: prior folds' preps
        if cached is not None:
            return cached
        from pd_fusion.imaging import native
        from pd_fusion.imaging.pipeline import load_volume

        slices = native.prep_slices_native(bag, self.target_shape, self.axes, self.counts)
        if slices is None:
            vol = jnp.asarray(load_volume(bag, self.target_shape))
            vol = percentile_normalize(vol)
            parts = [take_slices(vol, ax, ct) for ax, ct in zip(self.axes, self.counts)]
            slices = np.asarray(jnp.concatenate(parts, axis=0))
        self._slice_cache[key] = slices  # instance-local: survives a 0 budget
        SLICE_CACHE.put(key, slices)
        return slices

    def _pad_batch(self, slice_list):
        """list of [L_i, h, w] or None -> padded [B, L, h, w] + mask."""
        real = [s for s in slice_list if s is not None]
        L = max(s.shape[0] for s in real)
        h, w = real[0].shape[1:]
        B = len(slice_list)
        X = np.zeros((B, L, h, w), np.float32)
        mask = np.zeros((B, L), np.float32)
        for i, s in enumerate(slice_list):
            if s is None:
                continue
            X[i, : s.shape[0]] = s
            mask[i, : s.shape[0]] = 1.0
        return X, mask

    def _aug_params(self, B, L, h, w, rng, enabled: bool):
        if enabled:
            angle = rng.uniform(-self.max_rotation, self.max_rotation, size=B)
            translate = rng.uniform(-self.max_translation, self.max_translation, size=(B, 2))
            translate = translate * np.array([h, w])
            scale = 1.0 + rng.uniform(-self.intensity_scale, self.intensity_scale, size=B)
            shift = rng.uniform(-self.intensity_shift, self.intensity_shift, size=B)
            noise = (
                rng.normal(0.0, self.noise_std, size=(B, L, h, w)).astype(np.float32)
                if self.noise_std > 0
                else np.zeros((B, L, h, w), np.float32)
            )
        else:
            angle = np.zeros(B)
            translate = np.zeros((B, 2))
            scale = np.ones(B)
            shift = np.zeros(B)
            noise = np.zeros((B, L, h, w), np.float32)
        return (
            np.float32(angle),
            np.float32(translate),
            np.float32(scale),
            np.float32(shift),
            noise,
        )

    def _resolve_pos_weight(self, y):
        if self.params.get("class_weight") == "balanced":
            pos = float((y == 1).sum())
            neg = float((y == 0).sum())
            return neg / pos if pos > 0 else 1.0
        if self.params.get("pos_weight") is not None:
            return float(self.params["pos_weight"])
        return 1.0

    def train(self, bags, y, val_data=None):
        from pd_fusion.training.callbacks import MetricEarlyStopping
        from pd_fusion.utils.checkpoint import latest_step, load_checkpoint, save_checkpoint

        y = np.asarray(y, np.float32)
        n = len(bags)
        epochs = int(self.params.get("epochs", 20))
        patience = int(self.params.get("early_stopping_patience", 0))
        pos_weight = np.float32(self._resolve_pos_weight(y))
        focal_alpha = np.float32(self.focal_alpha if self.focal_alpha is not None else 0.5)
        rng = np.random.default_rng()

        params = {"backbone": self.backbone_params, "head": self.head_params}
        self.opt_state = self.tx.init(params)

        # mid-training checkpoint/resume (orbax with pickle fallback)
        ckpt_dir = self.params.get("checkpoint_dir")
        ckpt_every = int(self.params.get("checkpoint_every", 0))
        start_epoch = 0
        if ckpt_dir:
            step = latest_step(ckpt_dir)
            if step is not None:
                state = load_checkpoint(ckpt_dir, step)
                if state is not None:
                    self.backbone_params = state["backbone"]
                    self.head_params = state["head"]
                    self.opt_state = state["opt_state"]
                    start_epoch = int(state["epoch"]) + 1

        # ---- epoch-scan dispatch plumbing --------------------------------
        # Steps accumulate host-side (batch tensors padded to the program
        # shape AND their augmentation draws, taken in per-batch order so
        # the RNG stream is identical at every flush granularity) and
        # flush as ONE _ft_scan program per sync point (val-eval epoch,
        # checkpoint epoch, byte budget, end of training). Per-batch
        # dispatch cost ~relay-RTT each made the fine-tune wall
        # dispatch-bound (43 s vs the reference emulation's 31 s at the
        # mil-ft oracle shapes); scanning the same math into one program
        # removes O(steps) round trips. PD_FUSION_FT_NO_SCAN=1 flushes
        # after every batch (per-batch dispatch, same math).
        no_scan = os.environ.get("PD_FUSION_FT_NO_SCAN", "0") == "1"
        budget_bytes = float(os.environ.get("PD_FUSION_FT_SCAN_MB", "512")) * 2**20
        pending = []  # (bidx, slice_list, gate) in step order
        pending_bytes = 0
        bs = self.bag_batch_size
        step_kw = dict(
            tx_update=self.tx.update,
            arch=self.backbone_name,
            gated=self.gated,
            input_size=self.input_size,
            loss_type=self.loss_type,
            train_bn=True,
            head_dropout=float(self.params.get("dropout", 0.2)),
        )
        scalars = (
            jnp.asarray(self.mean), jnp.asarray(self.std), pos_weight,
            np.float32(self.focal_gamma), focal_alpha,
        )

        def _flush():
            nonlocal pending, pending_bytes
            if not pending:
                return
            S = len(pending)
            # steps were padded to [bs, L_i] at append time (batch-exact
            # shapes, same RNG draw order as per-batch stepping); here the
            # slice axis is zero-padded to the flush max — bn_mask stays
            # zero there, so the extra padding is statistics-inert
            L = max(st["X"].shape[1] for st in pending)
            h, w = pending[0]["X"].shape[2:]
            X = np.zeros((S, bs, L, h, w), np.float32)
            bag_mask = np.zeros((S, bs, L), np.float32)
            bn_mask = np.zeros((S, bs, L), np.float32)
            noise = np.zeros((S, bs, L, h, w), np.float32)
            yb = np.zeros((S, bs), np.float32)
            valid = np.zeros((S, bs), np.float32)
            gates = np.zeros(S, np.float32)
            angle = np.zeros((S, bs), np.float32)
            trans = np.zeros((S, bs, 2), np.float32)
            scale = np.zeros((S, bs), np.float32)
            shift = np.zeros((S, bs), np.float32)
            for si, st in enumerate(pending):
                Li = st["X"].shape[1]
                X[si, :, :Li] = st["X"]
                bag_mask[si, :, :Li] = st["mask"]
                bn_mask[si, :, :Li] = st["valid"][:, None]
                noise[si, :, :Li] = st["noise"]
                yb[si] = st["y"]
                valid[si] = st["valid"]
                gates[si] = st["gate"]
                angle[si] = st["angle"]
                trans[si] = st["trans"]
                scale[si] = st["scale"]
                shift[si] = st["shift"]
            keys = jnp.stack([st["key"] for st in pending])
            self.backbone_params, self.head_params, self.opt_state = _ft_scan(
                self.backbone_params, self.head_params, self.opt_state,
                X, bag_mask, yb, valid, bn_mask, angle, trans, scale, shift,
                noise, gates, keys, *scalars, **step_kw,
            )
            pending = []
            pending_bytes = 0

        # initial_best -1.0: exception epochs (auc -> -1.0) never improve,
        # so a never-valid val set keeps stop-time params (reference
        # mil_attention_finetune.py:169-252 best_state-is-None path)
        stopper = MetricEarlyStopping(patience=patience, initial_best=-1.0)
        for epoch in range(start_epoch, epochs):
            gate = np.float32(1.0 if epoch >= self.freeze_backbone_epochs else 0.0)

            if self.balanced_batches:
                pos_idx = np.where(y >= 0.5)[0]
                neg_idx = np.where(y < 0.5)[0]
                if len(pos_idx) == 0 or len(neg_idx) == 0:
                    perm = rng.permutation(n)
                    batches = [perm[i : i + self.bag_batch_size] for i in range(0, n, self.bag_batch_size)]
                else:
                    half = max(1, self.bag_batch_size // 2)
                    n_batches = max(1, int(np.ceil(n / self.bag_batch_size)))
                    batches = [
                        np.concatenate(
                            [
                                rng.choice(pos_idx, half, replace=len(pos_idx) < half),
                                rng.choice(
                                    neg_idx,
                                    self.bag_batch_size - half,
                                    replace=len(neg_idx) < (self.bag_batch_size - half),
                                ),
                            ]
                        )
                        for _ in range(n_batches)
                    ]
            else:
                perm = rng.permutation(n)
                batches = [perm[i : i + self.bag_batch_size] for i in range(0, n, self.bag_batch_size)]

            for bidx in batches:
                slice_list = [self._load_bag_slices(bags[i]) for i in bidx]
                if all(s is None for s in slice_list):
                    continue
                # every batch runs at the [bs, L_i] program shape: ragged
                # final batches pad rows (valid mask keeps the loss mean
                # and — via bn_mask — the BN statistics batch-exact), so
                # one shape serves the epoch and `no_scan` differs from
                # scanning ONLY in dispatch granularity
                Xb, maskb = self._pad_batch(slice_list)
                B, L_i, h, w = Xb.shape
                if B < bs:
                    Xb = np.concatenate(
                        [Xb, np.zeros((bs - B, L_i, h, w), np.float32)]
                    )
                    maskb = np.concatenate(
                        [maskb, np.zeros((bs - B, L_i), np.float32)]
                    )
                validb = np.zeros(bs, np.float32)
                validb[:B] = 1.0  # None bags count toward the mean too
                yb = np.zeros(bs, np.float32)
                yb[:B] = y[bidx]
                aug = self._aug_params(bs, L_i, h, w, rng, self.train_aug)
                pending.append(
                    dict(
                        X=Xb, mask=maskb, valid=validb, y=yb, angle=aug[0],
                        trans=aug[1], scale=aug[2], shift=aug[3],
                        noise=aug[4], gate=gate, key=fresh_key(),
                    )
                )
                pending_bytes += 2 * Xb.nbytes
                if no_scan or pending_bytes >= budget_bytes:
                    _flush()

            needs_ckpt = ckpt_dir and ckpt_every and (epoch + 1) % ckpt_every == 0
            needs_val = val_data is not None and patience > 0
            if needs_ckpt or needs_val or epoch == epochs - 1:
                _flush()

            if needs_ckpt:
                save_checkpoint(
                    ckpt_dir,
                    {"backbone": self.backbone_params, "head": self.head_params,
                     "opt_state": self.opt_state, "epoch": epoch},
                    step=epoch,
                )

            if needs_val:
                val_bags, y_val = val_data
                try:
                    from sklearn.metrics import roc_auc_score

                    auc = float(roc_auc_score(y_val, self.predict_proba(val_bags)))
                except Exception:
                    auc = -1.0
                if stopper.update(
                    auc,
                    lambda: (
                        jax.device_get(self.backbone_params),
                        jax.device_get(self.head_params),
                    ),
                ):
                    break

        _flush()  # safety: no-op unless a loop path skipped its sync flush
        if stopper.best_state is not None:
            self.backbone_params, self.head_params = stopper.best_state

    def predict_proba(self, bags, masks=None):
        mri_mask = masks.get("mri") if isinstance(masks, dict) else None
        n = len(bags)
        out = np.full(n, self.missing_prob, np.float32)
        present = [
            i
            for i in range(n)
            if bags[i] is not None and not (mri_mask is not None and mri_mask[i] == 0)
        ]
        if not present:
            return out

        rng = np.random.default_rng()
        for start in range(0, len(present), self.bag_batch_size):
            chunk = present[start : start + self.bag_batch_size]
            slice_list = [self._load_bag_slices(bags[i]) for i in chunk]
            X, bag_mask = self._pad_batch(slice_list)
            if self.tta_inference > 1:
                B, L, h, w = X.shape
                acc = np.zeros(len(chunk), np.float32)
                for _ in range(self.tta_inference):
                    aug = self._aug_params(B, L, h, w, rng, True)
                    Xa = np.asarray(
                        jnp.clip(
                            jax.vmap(affine2d_batch)(X, jnp.asarray(aug[0]), jnp.asarray(aug[1]))
                            * aug[2][:, None, None, None]
                            + aug[3][:, None, None, None]
                            + aug[4],
                            0.0,
                            1.0,
                        )
                    )
                    acc += np.asarray(
                        _ft_predict(
                            self.backbone_params, self.head_params, Xa, bag_mask,
                            jnp.asarray(self.mean), jnp.asarray(self.std),
                            self.backbone_name, self.gated, self.input_size,
                        )
                    )
                probs = acc / self.tta_inference
            else:
                probs = np.asarray(
                    _ft_predict(
                        self.backbone_params, self.head_params, X, bag_mask,
                        jnp.asarray(self.mean), jnp.asarray(self.std),
                        self.backbone_name, self.gated, self.input_size,
                    )
                )
            out[np.asarray(chunk)] = probs
        return out

    def save(self, path):
        save_pickle(
            {
                "kind": "mil_attention_ft",
                "params": self.params,
                "backbone": jax.device_get(self.backbone_params),
                "attn": jax.device_get(self.head_params),
            },
            path,
        )

    @classmethod
    def load(cls, path, params=None):
        state = load_pickle(path)
        inst = cls(state["params"])
        inst.backbone_params = state["backbone"]
        inst.head_params = state["attn"]
        return inst
