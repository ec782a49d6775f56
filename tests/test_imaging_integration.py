"""Imaging-plane integration: synthetic NIfTI dataset -> feature/embedding
builders -> ds001907 loader modes -> MIL fine-tune smoke. Uses tiny shapes
to keep compiles cheap."""
import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from pd_fusion.imaging.nifti import write_nifti


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """12 subjects; PD subjects have a bright blob (signal)."""
    root = tmp_path_factory.mktemp("nifti_ds")
    rng = np.random.RandomState(0)
    rows = []
    for i in range(12):
        label = i % 2
        vol = rng.rand(24, 28, 26).astype(np.float32) * 0.3
        vol[2:22, 2:26, 2:24] += 0.4  # foreground
        if label:
            vol[8:16, 8:16, 8:16] += 1.5
        p = root / f"sub-{i:02d}_T1w.nii.gz"
        write_nifti(p, vol)
        rows.append(
            {
                "subject_id": f"sub-{i:02d}",
                "session": 1,
                "label": label,
                "t1wbrain_path": str(p),
            }
        )
    manifest = root / "manifest.csv"
    pd.DataFrame(rows).to_csv(manifest, index=False)
    return root, manifest


def test_simple_features_build_and_cache(synthetic_dataset):
    from pd_fusion.data.openneuro_features import build_simple_features

    root, manifest = synthetic_dataset
    cfg = {"target_shape": (16, 16, 16), "hist_bins": 10, "grid_size": 4}
    df = build_simple_features(manifest, root / "feat", cfg)
    assert len(df) == 12
    feat_cols = [c for c in df.columns if c.startswith("mri_feat_")]
    assert len(feat_cols) == 7 + 10 + 64  # stats + hist + 4³ grid
    assert df[feat_cols].notna().all().all()
    # second call hits the parquet cache (same object content)
    df2 = build_simple_features(manifest, root / "feat", cfg)
    pd.testing.assert_frame_equal(df, df2)


def test_simple_features_match_numpy_oracle(synthetic_dataset):
    """Stats features equal a direct numpy transcription of the reference
    semantics (data/openneuro_features.py:34-73) on the resized volume."""
    import jax.numpy as jnp

    from pd_fusion.imaging.nifti import read_nifti
    from pd_fusion.ops.image import resize3d
    from pd_fusion.ops.volume_stats import simple_volume_features

    root, manifest = synthetic_dataset
    df = pd.read_csv(manifest)
    vol = np.asarray(resize3d(jnp.asarray(read_nifti(df["t1wbrain_path"][0])), (16, 16, 16)))
    got = np.asarray(simple_volume_features(jnp.asarray(vol), 10, 0, False))

    mask = vol > 0
    vals = vol[mask] if mask.sum() else vol.ravel()
    expect = [vals.mean(), vals.std(), vals.min(), vals.max(), np.median(vals),
              np.percentile(vals, 10), np.percentile(vals, 90)]
    np.testing.assert_allclose(got[:7], expect, rtol=2e-4)
    lo, hi = np.percentile(vals, 1), np.percentile(vals, 99)
    hist, _ = np.histogram(np.clip(vals, lo, hi), bins=10, range=(lo, hi), density=True)
    np.testing.assert_allclose(got[7:17], hist, rtol=2e-3, atol=1e-4)


def test_resnet2d_embeddings_build(synthetic_dataset):
    from pd_fusion.data.openneuro_features import (
        build_resnet2d_embeddings,
        load_resnet2d_embeddings,
    )

    root, manifest = synthetic_dataset
    cfg = {
        "backbone": "resnet18",
        "target_shape": (16, 16, 16),
        "slice_axis": 2,
        "slice_count": 4,
        "input_size": 32,
        "tta": 1,
    }
    df = build_resnet2d_embeddings(manifest, root / "emb", cfg)
    assert len(df) == 12
    emb_cols = [c for c in df.columns if c.startswith("mri_resnet_")]
    assert len(emb_cols) == 512
    # loader finds the cached artifact
    df2 = load_resnet2d_embeddings(manifest, root / "emb", cfg)
    pd.testing.assert_frame_equal(df, df2)
    # meta json records pretrained status
    metas = list((root / "emb").glob("resnet2d_*.json"))
    assert metas and "pretrained" in json.load(open(metas[0]))


def test_pretrained_weights_e2e_export_build_embed(synthetic_dataset, tmp_path):
    """Closes the ported-weights loop (VERDICT r1 item 6): torch state_dict
    -> scripts/export_backbone_weights.py .npz -> builder weights_path
    config knob -> cache metadata records pretrained: true -> embeddings
    match a direct conversion of the same weights."""
    import subprocess
    import sys as _sys

    import torch

    from pd_fusion.data.openneuro_features import build_resnet2d_embeddings
    from pd_fusion.utils.torch_utils import build_torch_resnet18

    root, manifest = synthetic_dataset

    # "pretrained" torch checkpoint (random weights stand in for ImageNet
    # in this zero-egress image; the export/convert path is identical)
    torch.manual_seed(7)
    sd = build_torch_resnet18().state_dict()
    pth = tmp_path / "resnet18.pth"
    torch.save(sd, pth)

    npz = tmp_path / "resnet18.npz"
    repo = Path(__file__).resolve().parent.parent
    res = subprocess.run(
        [_sys.executable, str(repo / "scripts" / "export_backbone_weights.py"),
         "--arch", "resnet18", "--src", str(pth), "--out", str(npz)],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-1000:]
    assert npz.exists()

    cfg = {
        "backbone": "resnet18",
        "weights_path": str(npz),
        "target_shape": (16, 16, 16),
        "slice_axis": 2,
        "slice_count": 4,
        "input_size": 32,
        "tta": 1,
    }
    df = build_resnet2d_embeddings(manifest, root / "emb_pretrained", cfg)
    assert len(df) == 12

    meta = json.load(open(next((root / "emb_pretrained").glob("resnet2d_*.json"))))
    assert meta["pretrained"] is True

    # same manifest embedded with the weights converted directly — the
    # export/reload path must be numerically identical
    from pd_fusion.nn.resnet import IMAGENET_MEAN, IMAGENET_STD, convert_torch_state_dict
    from pd_fusion.imaging.pipeline import run_resnet_embedding_pipeline

    params = convert_torch_state_dict(sd, "resnet18")
    man_df = pd.read_csv(manifest)
    # pretrained backbones use the ImageNet preprocessing constants
    # (reference openneuro_features.py:215-222 reads them off weights.meta)
    direct = run_resnet_embedding_pipeline(
        [Path(p) for p in man_df["t1wbrain_path"]],
        man_df["subject_id"].tolist(),
        params,
        IMAGENET_MEAN,
        IMAGENET_STD,
        arch="resnet18",
        target_shape=(16, 16, 16),
        axes=[2],
        counts=[4],
        input_size=32,
        tta=1,
        per_slice=False,
        progress=False,
    )
    emb_cols = [c for c in df.columns if c.startswith("mri_resnet_")]
    np.testing.assert_allclose(
        df[emb_cols].values, np.stack([np.asarray(e) for e in direct]), atol=1e-4
    )


def test_resnet2d_mil_embeddings_multiaxis(synthetic_dataset):
    from pd_fusion.data.openneuro_features import (
        build_resnet2d_mil_embeddings,
        load_resnet2d_mil_embeddings,
    )

    root, manifest = synthetic_dataset
    cfg = {
        "backbone": "resnet18",
        "target_shape": (16, 16, 16),
        "slice_axes": [0, 2],
        "slice_counts": [3, 4],
        "input_size": 32,
        "tta": 2,  # exercises the augmented path
    }
    build_resnet2d_mil_embeddings(manifest, root / "mil", cfg)
    df = load_resnet2d_mil_embeddings(manifest, root / "mil", cfg)
    assert len(df) == 12
    bag = df["mri_mil"].iloc[0]
    assert bag.shape == (7, 512)  # 3 + 4 slices, resnet18 dim


def test_cnn3d_autoencoder_learns_and_embeds():
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.cnn3d import cnn3d_apply, cnn3d_embed, cnn3d_init, train_cnn3d

    rng = np.random.RandomState(0)
    vols = rng.rand(6, 16, 16, 16, 1).astype(np.float32)
    params = cnn3d_init(jax.random.PRNGKey(0), (16, 16, 16), 8)
    recon0, emb0 = cnn3d_apply(params, jnp.asarray(vols), (16, 16, 16))
    assert recon0.shape == vols.shape
    loss0 = float(np.mean((np.asarray(recon0) - vols) ** 2))
    params = train_cnn3d(params, jnp.asarray(vols), jax.random.PRNGKey(1), 3e-3, (16, 16, 16), 15, 3)
    recon1, _ = cnn3d_apply(params, jnp.asarray(vols), (16, 16, 16))
    loss1 = float(np.mean((np.asarray(recon1) - vols) ** 2))
    assert loss1 < loss0  # reconstruction improves
    emb = np.asarray(cnn3d_embed(params, jnp.asarray(vols), (16, 16, 16)))
    assert emb.shape == (6, 8)


def test_ds001907_loader_modes(synthetic_dataset, monkeypatch):
    from pd_fusion.data.openneuro_ds001907 import load_openneuro_ds001907

    root, manifest = synthetic_dataset
    monkeypatch.setenv("PD_FUSION_DS001907_MANIFEST", str(manifest))

    cfg = {
        "feature_mode": "simple",
        "feature_cache_dir": str(root / "feat"),
        "feature_config": {"target_shape": (16, 16, 16), "hist_bins": 10, "grid_size": 4},
    }
    df, masks = load_openneuro_ds001907(cfg)
    assert masks["mri"].sum() == 12
    assert (masks["clinical"] == 0).all()
    assert "diagnosis" in df.columns

    cfg_ft = {"feature_mode": "resnet2d_mil_ft"}
    df_ft, masks_ft = load_openneuro_ds001907(cfg_ft)
    assert "mri_mil" in df_ft.columns
    assert masks_ft["mri"].sum() == 12


def test_mil_finetune_smoke(synthetic_dataset):
    from sklearn.metrics import roc_auc_score

    from pd_fusion.models.mil_attention_finetune import MilAttentionFineTuneModel
    from pd_fusion.utils.seed import set_seed

    root, manifest = synthetic_dataset
    df = pd.read_csv(manifest)
    bags = df["t1wbrain_path"].tolist()
    y = df["label"].values

    set_seed(0)
    m = MilAttentionFineTuneModel(
        {
            "backbone": "resnet18",
            "pretrained": False,
            "target_shape": (16, 16, 16),
            "slice_axis": 2,
            "slice_count": 4,
            "input_size": 32,
            "batch_size": 4,
            "epochs": 2,
            "freeze_backbone_epochs": 1,
            "hidden_dim": 32,
            "attn_dim": 16,
            "train_aug": True,
            "max_grad_norm": 5.0,
        }
    )
    m.train(bags, y, (bags, y))
    p = m.predict_proba(bags, {"mri": np.ones(len(bags), int)})
    assert p.shape == (12,)
    assert np.isfinite(p).all()

    # missing bags -> constant
    p2 = m.predict_proba([bags[0], None], {"mri": np.array([1, 0])})
    assert p2[1] == pytest.approx(m.missing_prob)


def test_mil_finetune_scan_matches_per_batch(synthetic_dataset, monkeypatch):
    """The epoch-scan dispatch (_ft_scan, one lax.scan program per sync
    point) must reproduce per-batch stepping (PD_FUSION_FT_NO_SCAN=1)
    step-for-step: same math, only the dispatch granularity differs.

    batch_size 5 over 12 bags makes every epoch end in a RAGGED batch —
    row padding + valid/bn_mask must keep the loss mean AND the BN batch
    statistics exact, and augmentation draws happen at append time in
    per-batch order, so the RNG stream is identical between modes.
    default_rng is pinned so both runs draw the same permutations/
    augmentations. Bands are loose-ulp only (program-shape fusion
    differences between scan lengths), not semantic."""
    import pd_fusion.models.mil_attention_finetune as mft
    from pd_fusion.utils.seed import set_seed

    root, manifest = synthetic_dataset
    df = pd.read_csv(manifest)
    bags = df["t1wbrain_path"].tolist()
    y = df["label"].values
    assert len(bags) % 5 != 0  # ragged final batch is the point

    cfg = {
        "backbone": "resnet18",
        "pretrained": False,
        "target_shape": (16, 16, 16),
        "slice_axis": 2,
        "slice_count": 4,
        "input_size": 32,
        "batch_size": 5,
        "epochs": 2,
        "freeze_backbone_epochs": 1,  # gate flips mid-scan
        "hidden_dim": 32,
        "attn_dim": 16,
        "train_aug": True,
        "max_grad_norm": 5.0,
    }

    def run(no_scan: bool):
        monkeypatch.setenv("PD_FUSION_FT_NO_SCAN", "1" if no_scan else "0")
        monkeypatch.setattr(
            mft.np.random, "default_rng", lambda *a: np.random.Generator(np.random.PCG64(7))
        )
        set_seed(0)
        m = mft.MilAttentionFineTuneModel(dict(cfg))
        m.train(bags, y)
        probs = m.predict_proba(bags, {"mri": np.ones(len(bags), int)})
        return m, probs

    m_scan, p_scan = run(no_scan=False)
    m_step, p_step = run(no_scan=True)

    import jax

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(m_scan.head_params)[0],
        jax.tree_util.tree_flatten_with_path(m_step.head_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4, err_msg=str(path)
        )
    np.testing.assert_allclose(p_scan, p_step, atol=5e-5)


def test_mil_finetune_cross_fold_slice_cache(synthetic_dataset, monkeypatch):
    """VERDICT r3 #4: prepped slice bags are shared ACROSS model instances
    (CV creates a fresh model per fold; before this each fold re-read and
    re-prepped every NIfTI). Exactness: the cache returns the same arrays,
    so a second "fold" triggers ZERO loads and produces identical slices.
    Keyed by (path, target_shape, axes, counts) — a different prep config
    must NOT hit. PD_FUSION_SLICE_CACHE_MB=0 restores per-instance
    behavior. (Backbone EMBEDDINGS are deliberately NOT cached: the
    reference augments train-time loads and keeps BN in train mode even
    while frozen — reference models/mil_attention_finetune.py:122-124,181
    — so frozen-epoch embeddings are batch-dependent by spec.)"""
    import pd_fusion.models.mil_attention_finetune as mft

    root, manifest = synthetic_dataset
    df = pd.read_csv(manifest)
    bags = df["t1wbrain_path"].tolist()

    cfg = {"backbone": "resnet18", "pretrained": False,
           "target_shape": (16, 16, 16), "slice_axis": 2, "slice_count": 4,
           "input_size": 32}

    calls = {"n": 0}
    real_load = mft.MilAttentionFineTuneModel._load_bag_slices

    def counting_load(self, bag):
        if bag is not None and not isinstance(bag, np.ndarray):
            key = (str(bag), self.target_shape, tuple(self.axes), tuple(self.counts))
            if key not in self._slice_cache and mft.SLICE_CACHE.get(key) is None:
                calls["n"] += 1
        return real_load(self, bag)

    monkeypatch.setattr(mft.MilAttentionFineTuneModel, "_load_bag_slices", counting_load)
    mft.SLICE_CACHE.clear()

    m1 = mft.MilAttentionFineTuneModel(cfg)
    s1 = [m1._load_bag_slices(b) for b in bags]
    assert calls["n"] == len(bags)

    m2 = mft.MilAttentionFineTuneModel(cfg)  # "fold 2"
    s2 = [m2._load_bag_slices(b) for b in bags]
    assert calls["n"] == len(bags), "fold 2 must not re-prep any volume"
    for a, b in zip(s1, s2):
        assert a is b  # exact: same array object via the shared cache

    # different prep config -> different key -> real loads
    m3 = mft.MilAttentionFineTuneModel({**cfg, "slice_count": 3})
    m3._load_bag_slices(bags[0])
    assert calls["n"] == len(bags) + 1

    # budget 0 disables sharing (per-instance cache still works)
    monkeypatch.setenv("PD_FUSION_SLICE_CACHE_MB", "0")
    mft.SLICE_CACHE.clear()
    m4 = mft.MilAttentionFineTuneModel(cfg)
    m4._load_bag_slices(bags[0])
    n_after = calls["n"]
    m5 = mft.MilAttentionFineTuneModel(cfg)
    m5._load_bag_slices(bags[0])
    assert calls["n"] == n_after + 1  # no cross-instance sharing
    m4._load_bag_slices(bags[0])
    assert calls["n"] == n_after + 1  # instance-local cache unaffected

    # LRU eviction respects the byte budget
    monkeypatch.setenv("PD_FUSION_SLICE_CACHE_MB", str(2 * s1[0].nbytes / 2**20))
    mft.SLICE_CACHE.clear()
    m6 = mft.MilAttentionFineTuneModel(cfg)
    for b in bags[:3]:
        m6._load_bag_slices(b)
    k0 = (str(bags[0]), m6.target_shape, tuple(m6.axes), tuple(m6.counts))
    k2 = (str(bags[2]), m6.target_shape, tuple(m6.axes), tuple(m6.counts))
    assert mft.SLICE_CACHE.get(k0) is None  # evicted
    assert mft.SLICE_CACHE.get(k2) is not None
    mft.SLICE_CACHE.clear()


def test_mil_finetune_bn_stats_and_freeze_semantics(synthetic_dataset):
    """torch-.train() parity: BN running stats EMA-update every step (even
    while the backbone is gradient-frozen), and a frozen backbone's
    weights are bit-identical after the frozen epoch."""
    import jax

    from pd_fusion.models.mil_attention_finetune import MilAttentionFineTuneModel
    from pd_fusion.utils.seed import set_seed

    root, manifest = synthetic_dataset
    df = pd.read_csv(manifest)
    bags = df["t1wbrain_path"].tolist()
    y = df["label"].values

    set_seed(0)
    cfg = {
        "backbone": "resnet18",
        "pretrained": False,
        "target_shape": (16, 16, 16),
        "slice_axis": 2,
        "slice_count": 4,
        "input_size": 32,
        "batch_size": 4,
        "epochs": 1,
        "freeze_backbone_epochs": 1,  # the whole run is frozen
        "hidden_dim": 32,
        "attn_dim": 16,
        "train_aug": False,
        "weight_decay": 1e-2,  # large so decay leakage would be visible
    }
    m = MilAttentionFineTuneModel(cfg)
    before = jax.tree_util.tree_map(np.array, m.backbone_params)
    m.train(bags, y)
    after = m.backbone_params

    def leaves_with_paths(tree):
        return jax.tree_util.tree_flatten_with_path(tree)[0]

    stat_moved, weight_frozen = 0, True
    for (path, b), (_, a) in zip(leaves_with_paths(before), leaves_with_paths(after)):
        key = getattr(path[-1], "key", None)
        if key in ("mean", "var"):
            if not np.allclose(b, np.asarray(a)):
                stat_moved += 1
        else:
            if not np.array_equal(b, np.asarray(a)):
                weight_frozen = False
    assert stat_moved > 0, "BN running stats never updated during fine-tune"
    assert weight_frozen, "frozen backbone weights changed (decay leaked through the gate)"


def test_mil_finetune_checkpoint_resume(synthetic_dataset, tmp_path):
    """Mid-training checkpoint/resume: a fresh model pointed at the same
    checkpoint_dir with the same total epochs resumes past the completed
    epochs (here: skips training entirely) and carries the checkpointed
    params — the production crash-recovery path."""
    import jax
    import numpy as np

    from pd_fusion.models.mil_attention_finetune import MilAttentionFineTuneModel
    from pd_fusion.utils.checkpoint import latest_step
    from pd_fusion.utils.seed import set_seed

    root, manifest = synthetic_dataset
    df = pd.read_csv(manifest)
    bags = df["t1wbrain_path"].tolist()[:6]
    y = df["label"].values[:6]

    cfg = {
        "backbone": "resnet18",
        "pretrained": False,
        "target_shape": (16, 16, 16),
        "slice_axis": 2,
        "slice_count": 4,
        "input_size": 32,
        "batch_size": 3,
        "epochs": 2,
        "freeze_backbone_epochs": 99,  # head-only: fast
        "hidden_dim": 16,
        "attn_dim": 8,
        "train_aug": False,
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "checkpoint_every": 1,
    }
    set_seed(1)
    m1 = MilAttentionFineTuneModel(dict(cfg))
    m1.train(bags, y)
    assert latest_step(str(tmp_path / "ckpt")) == 1  # epochs 0 and 1 saved

    set_seed(1)
    m2 = MilAttentionFineTuneModel(dict(cfg))
    m2.train(bags, y)  # start_epoch = 2 == epochs -> pure resume, no steps
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        {"b": m1.backbone_params, "h": m1.head_params},
        {"b": m2.backbone_params, "h": m2.head_params},
    )


def test_pipeline_tail_split_flush_equivalence(synthetic_dataset, monkeypatch):
    """The tail-flush split (variable-width batched programs + cumulative-
    offset stitching, pipeline.run_resnet_embedding_pipeline) must be
    invisible in the results: with SUBJECTS_PER_CALL=8 an 11-subject run
    flushes [8-wide, 1-in-2-wide (padded), 2-wide]; it must match the
    single-flush 11-wide run subject for subject (TTA path included)."""
    import jax

    from pd_fusion.imaging import pipeline
    from pd_fusion.nn.resnet import init_resnet

    _, manifest = synthetic_dataset
    man = pd.read_csv(manifest)
    paths = [Path(p) for p in man["t1wbrain_path"]][:11]
    sids = man["subject_id"].tolist()[:11]
    params = init_resnet(jax.random.PRNGKey(3), "resnet18")
    mean = np.float32([0.5, 0.5, 0.5])
    std = np.float32([0.5, 0.5, 0.5])
    kw = dict(arch="resnet18", target_shape=(16, 16, 16), axes=[2], counts=[4],
              input_size=32, per_slice=True, progress=False, tta=2)

    single = pipeline.run_resnet_embedding_pipeline(paths, sids, params, mean, std, **kw)
    monkeypatch.setattr(pipeline, "SUBJECTS_PER_CALL", 8)
    split = pipeline.run_resnet_embedding_pipeline(paths, sids, params, mean, std, **kw)
    # grouped-put mode ([g, ...] blocks, one put per group; 11 subjects
    # at g=2 exercise the incomplete-final-group padding) must be
    # value-identical
    monkeypatch.setenv("PD_FUSION_PUT_GROUP", "2")
    grouped = pipeline.run_resnet_embedding_pipeline(paths, sids, params, mean, std, **kw)
    assert len(single) == len(split) == len(grouped) == 11
    for s, t, v in zip(single, split, grouped):
        np.testing.assert_allclose(np.asarray(s), np.asarray(t), atol=5e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(v), atol=5e-5, rtol=1e-5)
    # f16 wire mode quantizes the [0,1] slice payloads to half precision
    # (eps ~1e-3) before the relay; embeddings must agree within a
    # quantization-scaled band, not bit-exactly
    monkeypatch.delenv("PD_FUSION_PUT_GROUP")
    monkeypatch.setenv("PD_FUSION_PUT_DTYPE", "f16")
    f16 = pipeline.run_resnet_embedding_pipeline(paths, sids, params, mean, std, **kw)
    # combined f16 + grouped-put arm (ab_stacked_put's f16_grouped4)
    monkeypatch.setenv("PD_FUSION_PUT_GROUP", "2")
    f16g = pipeline.run_resnet_embedding_pipeline(paths, sids, params, mean, std, **kw)
    assert len(f16) == len(f16g) == 11
    for t, w, g in zip(split, f16, f16g):
        t, w, g = np.asarray(t), np.asarray(w), np.asarray(g)
        denom = max(float(np.abs(t).max()), 1e-6)
        assert float(np.abs(t - w).max()) / denom < 2e-2
        # same f16 quantization -> the two f16 transfer modes agree to
        # accumulation-order noise only
        np.testing.assert_allclose(w, g, atol=5e-5, rtol=1e-5)
