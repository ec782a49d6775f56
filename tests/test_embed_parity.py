"""End-to-end embedding parity vs the reference pipeline.

Runs a faithful torch/scipy emulation of the reference's
build_resnet2d_embeddings chain (scipy zoom -> percentile clip -> slice
select -> torch bilinear 3-channel normalize -> resnet18 -> mean-pool)
and our streaming TPU pipeline on the SAME volumes with the SAME
(converted) weights: per-subject embeddings must match closely. This
chains every imaging kernel parity result into one end-to-end check.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pd_fusion.imaging.nifti import read_nifti, write_nifti


def _reference_embed(path, torch_model, target, slice_axis, slice_count, input_size, mean, std):
    from scipy import ndimage

    data = read_nifti(path)
    zoom = [t / s for t, s in zip(target, data.shape)]
    data = ndimage.zoom(data, zoom, order=1)
    mask = data > 0
    vals = data[mask] if mask.sum() else data.ravel()
    lo, hi = np.percentile(vals, 1), np.percentile(vals, 99)
    vol = np.clip(data, lo, hi)
    vol = (vol - lo) / (hi - lo + 1e-6)
    other = tuple(i for i in range(3) if i != slice_axis)
    nz = np.any(vol > 0, axis=other)
    idxs = np.where(nz)[0]
    indices = np.linspace(idxs[0], idxs[-1], slice_count).astype(int)
    slices = np.take(vol, indices, axis=slice_axis)
    if slice_axis == 1:
        slices = slices.transpose(1, 0, 2)
    elif slice_axis == 2:
        slices = slices.transpose(2, 0, 1)
    t = torch.from_numpy(slices.astype(np.float32)).unsqueeze(1)
    t = F.interpolate(t, size=(input_size, input_size), mode="bilinear", align_corners=False)
    t = t.repeat(1, 3, 1, 1)
    t = (t - torch.tensor(mean).view(1, 3, 1, 1)) / torch.tensor(std).view(1, 3, 1, 1)
    with torch.no_grad():
        return torch_model(t).mean(0).numpy()


def test_embed_pipeline_matches_torch_reference(tmp_path):
    import jax

    from pd_fusion.imaging.pipeline import run_resnet_embedding_pipeline
    from pd_fusion.nn.resnet import convert_torch_state_dict

    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        import sys

        sys.path.insert(0, str(tmp_path.parent))  # noop, keeps isort quiet
        from test_resnet import _TorchResNet18

        torch.manual_seed(0)
        model = _TorchResNet18().eval()
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.8, 1.2)
        params = convert_torch_state_dict(model.state_dict(), "resnet18")

        rng = np.random.RandomState(0)
        paths = []
        for i in range(2):
            vol = (rng.rand(40, 44, 38) * 0.3).astype(np.float32)
            vol[4:36, 4:40, 4:34] += 0.5
            p = tmp_path / f"v{i}.nii.gz"
            write_nifti(p, vol)
            paths.append(p)

        target, axis, count, size = (32, 32, 32), 2, 6, 64
        mean = [0.5, 0.5, 0.5]
        std = [0.5, 0.5, 0.5]
        expect = [
            _reference_embed(p, model, target, axis, count, size, mean, std) for p in paths
        ]

        ours = run_resnet_embedding_pipeline(
            paths, ["a", "b"], params,
            np.float32(mean), np.float32(std),
            arch="resnet18", target_shape=target, axes=[axis], counts=[count],
            input_size=size, tta=1, per_slice=False, progress=False,
        )
        for e, o in zip(expect, ours):
            cos = np.dot(e, o) / (np.linalg.norm(e) * np.linalg.norm(o) + 1e-9)
            assert cos > 0.999, cos
            np.testing.assert_allclose(o, e, atol=5e-2)
    finally:
        jax.config.update("jax_default_matmul_precision", None)
