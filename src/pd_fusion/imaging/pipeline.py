"""Streaming volume -> embedding pipeline — the throughput-critical path.

The reference's embedding builders are Python-serial per subject: nibabel
load -> scipy zoom -> percentile clip -> slice select -> torch interpolate
-> ResNet in minibatch chunks (reference scripts/
build_resnet2d_mil_embeddings.py:112-158; SURVEY §3.4). The ≥10× target
comes from restructuring, not translation:

  host threads                device (one jitted program per subject)
  ───────────────             ──────────────────────────────────────────
  NIfTI read (prefetch        raw volume -> trilinear resize ->
  pool, N subjects ahead) --> percentile-normalize -> multi-axis slice
                              gather -> [affine/intensity augment] ->
                              bilinear 224² + 3-chan + ImageNet norm ->
                              ResNet forward over ALL slices at once
                              (no chunking: 48-72 slices fit easily)

Because jax dispatch is asynchronous, the host thread that feeds subject
i+1 overlaps the device computing subject i — double buffering without
explicit machinery. Everything after the raw volume is ONE fused XLA
program with static shapes (resize target, slice counts, input size), so
there is exactly one compile per config.
"""
import concurrent.futures as cf
from functools import partial
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pd_fusion.imaging.nifti import read_nifti
from pd_fusion.nn.resnet import resnet_apply
from pd_fusion.ops.image import (
    affine2d_batch,
    percentile_normalize,
    resize3d,
    slices_to_imagenet_batch,
    take_slices,
)


def load_volume(path, target_shape=(96, 96, 96)) -> np.ndarray:
    """Host NIfTI read + trilinear resize (reference _load_volume: nibabel
    + ndimage.zoom, data/openneuro_features.py:22-32). Uses the fused
    native C++ read+resample (imaging.native) when built — GIL-free and
    thread-parallel, and only the resized volume ever crosses to device —
    with a python-read + device-resize fallback."""
    from pd_fusion.imaging import native

    if target_shape is not None:
        nat = native.read_resize_nifti_native(path, tuple(int(t) for t in target_shape))
        if nat is not None:
            return nat
    data = read_nifti(path)
    if target_shape is not None:
        data = np.asarray(resize3d(jnp.asarray(data), tuple(target_shape)))
    return data


def make_volume_loader(target_shape):
    """Loader for VolumePrefetcher: returns volumes already at
    target_shape (native fused path when available)."""
    shape = tuple(int(t) for t in target_shape)

    def _load(path):
        return load_volume(path, shape)

    return _load


class VolumePrefetcher:
    """Threaded read-ahead over manifest paths: hides NIfTI IO + gunzip
    behind device compute. (The reference's loop does IO serially between
    model calls; SURVEY §6 flags host IO as the true bottleneck.)"""

    def __init__(self, paths: Sequence, loader, depth: int = 4):
        self.paths = list(paths)
        self.loader = loader
        self.depth = depth

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        with cf.ThreadPoolExecutor(max_workers=self.depth) as pool:
            futures = {}
            n = len(self.paths)
            for i in range(min(self.depth, n)):
                futures[i] = pool.submit(self.loader, self.paths[i])
            for i in range(n):
                vol = futures.pop(i).result()
                nxt = i + self.depth
                if nxt < n:
                    futures[nxt] = pool.submit(self.loader, self.paths[nxt])
                yield i, vol


@partial(
    jax.jit,
    static_argnames=("arch", "axes", "counts", "input_size", "per_slice"),
)
def embed_volume(
    backbone_params,
    raw_vol,
    mean,
    std,
    arch: str,
    axes: Tuple[int, ...],
    counts: Tuple[int, ...],
    input_size: int,
    per_slice: bool,
):
    """Normalized volume -> ResNet embeddings in ONE fused program.

    raw_vol is already resized to the target shape. Returns [n_slices,
    emb_dim] when per_slice (MIL bags) else mean-pooled [emb_dim].
    """
    vol = percentile_normalize(raw_vol)
    slices = jnp.concatenate(
        [take_slices(vol, ax, ct) for ax, ct in zip(axes, counts)], axis=0
    )
    batch = slices_to_imagenet_batch(slices, input_size, mean, std)
    emb = resnet_apply(backbone_params, batch, arch, train=False)
    return emb if per_slice else jnp.mean(emb, axis=0)


@partial(
    jax.jit,
    static_argnames=("arch", "axes", "counts", "input_size", "per_slice"),
)
def embed_volume_augmented(
    backbone_params,
    raw_vol,
    mean,
    std,
    angle_deg,
    translate,
    intensity_scale,
    intensity_shift,
    noise,
    arch: str,
    axes: Tuple[int, ...],
    counts: Tuple[int, ...],
    input_size: int,
    per_slice: bool,
):
    """TTA variant: affine + intensity + additive noise on the slices
    before embedding (reference augment chain, scripts/
    build_resnet2d_mil_embeddings.py:124-140). The random draws happen on
    the host with the reference's exact per-subject rng so TTA parity
    holds; only the (cheap) scalars and the noise field cross to device.
    """
    vol = percentile_normalize(raw_vol)
    slices = jnp.concatenate(
        [take_slices(vol, ax, ct) for ax, ct in zip(axes, counts)], axis=0
    )
    slices = affine2d_batch(slices, angle_deg, translate)
    slices = slices * intensity_scale + intensity_shift
    slices = jnp.clip(slices + noise, 0.0, 1.0)
    batch = slices_to_imagenet_batch(slices, input_size, mean, std)
    emb = resnet_apply(backbone_params, batch, arch, train=False)
    return emb if per_slice else jnp.mean(emb, axis=0)


def run_resnet_embedding_pipeline(
    paths: Sequence,
    subject_ids: Sequence,
    backbone_params,
    mean_vals,
    std_vals,
    *,
    arch: str,
    target_shape: Tuple[int, int, int],
    axes: Sequence[int],
    counts: Sequence[int],
    input_size: int,
    tta: int = 1,
    max_rotation: float = 5.0,
    max_translation: float = 0.05,
    intensity_scale: float = 0.1,
    intensity_shift: float = 0.1,
    noise_std: float = 0.01,
    per_slice: bool = False,
    prefetch_depth: int = 4,
    progress: bool = True,
) -> List[np.ndarray]:
    """Stream all subjects through the device pipeline. Returns a list of
    embeddings ([emb_dim] or [n_slices, emb_dim] per subject)."""
    mean = jnp.asarray(mean_vals, jnp.float32)
    std = jnp.asarray(std_vals, jnp.float32)
    axes_t, counts_t = tuple(int(a) for a in axes), tuple(int(c) for c in counts)
    n_slices_total = sum(counts_t)

    loader = make_volume_loader(target_shape)
    it = VolumePrefetcher(paths, loader, depth=prefetch_depth)
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(iter(it), total=len(paths), desc=f"{arch} embeddings")
        except Exception:  # pragma: no cover
            it = iter(it)

    results: List[Optional[jax.Array]] = [None] * len(paths)
    for i, vol in it:
        vol = jnp.asarray(vol)
        if tta <= 1:
            results[i] = embed_volume(
                backbone_params, vol, mean, std, arch, axes_t, counts_t, input_size, per_slice
            )
        else:
            # reference TTA rng: per-subject default_rng(abs(hash(sid)) % 2**32)
            rng = np.random.default_rng(abs(hash(str(subject_ids[i]))) % (2**32))
            acc = None
            h_dim = target_shape[1]  # translate scales by slice H, W
            w_dim = target_shape[2]
            for _ in range(tta):
                angle = rng.uniform(-max_rotation, max_rotation)
                translate = rng.uniform(-max_translation, max_translation, size=2)
                translate = translate * np.array([h_dim, w_dim])
                scale = 1.0 + rng.uniform(-intensity_scale, intensity_scale)
                shift = rng.uniform(-intensity_shift, intensity_shift)
                shape = (n_slices_total, h_dim, w_dim)
                noise = (
                    rng.normal(0.0, noise_std, size=shape).astype(np.float32)
                    if noise_std > 0
                    else np.zeros(shape, np.float32)
                )
                emb = embed_volume_augmented(
                    backbone_params,
                    vol,
                    mean,
                    std,
                    jnp.float32(angle),
                    jnp.asarray(translate, jnp.float32),
                    jnp.float32(scale),
                    jnp.float32(shift),
                    jnp.asarray(noise),
                    arch,
                    axes_t,
                    counts_t,
                    input_size,
                    per_slice,
                )
                acc = emb if acc is None else acc + emb
            results[i] = acc / tta
    return [np.asarray(r) for r in results]
