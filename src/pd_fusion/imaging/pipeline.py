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

Transfer economics: shipping whole resized volumes to device costs ~16 MB
per subject over the host<->TPU link; the normalize + slice-select stages
only need cheap host arithmetic, so the pipeline runs them host-side
(native/numpy, mirroring the device kernels bit-for-bit — equality is
tested) and ships only the selected slices (~2.4 MB for 24x160², a 6.7x
reduction), batched SUBJECTS_PER_CALL at a time so the MXU sees large
batches and per-call dispatch latency amortizes.

Tail-flush split: async dispatch hides every flush's device time under
the host prep of the subjects that FOLLOW it — the only exposed device
time is the final flush's program plus the readback. The pipeline peels
the last SUBJECTS_PER_CALL//4 subjects into their own small-width
program (widths quantized to {B//4, B//2, B} so at most three batch
variants ever compile), so the exposed tail program and its result are
as small as possible. Measured effect on the 16-volume bench leg is
modest (~0-0.1 s: the 384-image program itself is only ~17 ms of device
time — the leg is host-prep-bound on this 1-core box), but the split
costs nothing and matters when device programs are heavier (resnet50,
TTA). Equivalence vs single-width flushing is pinned in
tests/test_imaging_integration.py.
"""
import concurrent.futures as cf
import hashlib
import time
from functools import partial
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pd_fusion.imaging.nifti import read_nifti
from pd_fusion.nn.resnet import fold_bn_inference, resnet_apply_folded
from pd_fusion.ops.image import (
    affine2d_batch,
    resize3d,
    slices_to_imagenet_batch,
)


# Consume-loop attribution from the most recent run_resnet_embedding_
# pipeline call (VERDICT r3 #7: the bench's embed residual — wall minus
# measured host-prep minus measured device program — needs a stage-level
# owner). Keys: iter_wait_s (blocked on the prefetch iterator, i.e. host
# prep not yet overlapped away), device_put_s (host-side relay
# serialization of subject payloads), dispatch_s (flush() trace-lookup +
# async dispatch + TTA param synthesis), final_fetch_s (the one
# device->host readback, which also absorbs the exposed tail program).
LAST_PROFILE: dict = {}


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


# ---------------------------------------------------------------------------
# host-side mirrors of the device normalize/slice kernels (numpy; identical
# numerics — see tests/test_imaging_integration.test_host_prep_matches_device)
# ---------------------------------------------------------------------------


def normalize_volume_host(vol: np.ndarray) -> np.ndarray:
    """1-99 percentile clip over the nonzero mask -> [0,1] (host mirror of
    ops.image.percentile_normalize)."""
    mask = vol > 0
    if mask.sum() > 0:
        vals = vol[mask]
        lo = np.percentile(vals, 1)
        hi = np.percentile(vals, 99)
    else:
        lo, hi = float(vol.min()), float(vol.max())
    out = np.clip(vol, lo, hi)
    return ((out - lo) / (hi - lo + 1e-6)).astype(np.float32)


def select_slices_host(vol: np.ndarray, axis: int, count: int) -> np.ndarray:
    """Nonzero-extent linspace slice gather (host mirror of
    ops.image.take_slices, static count with duplicate indices allowed)."""
    other = tuple(i for i in range(3) if i != axis)
    nz = np.any(vol > 0, axis=other)
    idxs = np.where(nz)[0]
    if len(idxs) == 0:
        lo, hi = 0, vol.shape[axis] - 1
    else:
        lo, hi = int(idxs[0]), int(idxs[-1])
    indices = np.linspace(lo, hi, count).astype(int)
    out = np.take(vol, indices, axis=axis)
    if axis == 1:
        out = out.transpose(1, 0, 2)
    elif axis == 2:
        out = out.transpose(2, 0, 1)
    return np.ascontiguousarray(out)


def make_slices_loader(target_shape, axes, counts, out_dtype=None):
    """Loader producing ready-to-embed [n_slices, h, w] normalized slices:
    native read+resize, host normalize + multi-axis slice select. Only the
    slices cross to device. out_dtype=np.float16 emits wire-ready half
    payloads (natively in the C++ gather epilogue when available; astype
    in this worker-thread loader otherwise — never in the consume loop)."""
    shape = tuple(int(t) for t in target_shape)
    axes = [int(a) for a in axes]
    counts = [int(c) for c in counts]
    dtype = np.dtype(out_dtype) if out_dtype is not None else np.float32

    def _load(path):
        from pd_fusion.imaging import native

        nat = native.prep_slices_native(path, shape, axes, counts, out_dtype=dtype)
        if nat is not None:
            return nat
        if dtype != np.float32:
            f32 = native.prep_slices_native(path, shape, axes, counts)
            if f32 is not None:
                return f32.astype(dtype)
        vol = normalize_volume_host(load_volume(path, shape))
        out = np.concatenate(
            [select_slices_host(vol, ax, ct) for ax, ct in zip(axes, counts)], axis=0
        )
        return out.astype(dtype) if out.dtype != dtype else out

    return _load


class VolumePrefetcher:
    """Threaded read-ahead over manifest paths: hides NIfTI IO + gunzip
    behind device compute. (The reference's loop does IO serially between
    model calls; SURVEY §6 flags host IO as the true bottleneck.)

    Worker count is clamped to the available cores + 1: on a single-core
    host extra threads only add GIL/context-switch thrash."""

    def __init__(self, paths: Sequence, loader, depth: int = 4):
        import os

        self.paths = list(paths)
        self.loader = loader
        cores = len(os.sched_getaffinity(0)) if hasattr(os, "sched_getaffinity") else (os.cpu_count() or 1)
        self.depth = max(1, min(depth, cores + 1))

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


SUBJECTS_PER_CALL = 32  # device batch: amortizes dispatch + transfer latency
# (scripts/ab_embed_width.py, interleaved reps on the live v5e: bf16 MFU
# 40.3% @8 / 49.5% @16 / 51.4% @32 / 50.8% @48 subjects x 24 slices —
# bigger batches amortize weight loads until ~768 images/program, then
# flatten; 32 x 24 x 224px f32 is ~51 MB per flush, comfortable in HBM.
# Runs smaller than SUBJECTS_PER_CALL clamp to n, so small cohorts are
# unchanged; the tail split quantizes widths to {B//4, B//2, B})


@jax.jit
def _concat_rows(chunks):
    """Stitch per-flush embedding blocks into one array on device so the
    pipeline's final readback is a single transfer."""
    return jnp.concatenate(chunks, axis=0)


@partial(jax.jit, static_argnames=("arch", "input_size", "per_slice", "compute_dtype"))
def embed_slices_batch(backbone_params, slices, mean, std, arch: str, input_size: int,
                       per_slice: bool, compute_dtype: str = "float32"):
    """[B, L, h, w] normalized slices -> [B, L, E] (per_slice) or mean-
    pooled [B, E]; one fused resize+normalize+ResNet program with a B*L
    slice batch on the MXU. compute_dtype="bfloat16" runs the backbone in
    bf16 (2x MXU throughput; accumulation stays f32 via
    preferred_element_type) — embeddings are returned in f32.

    ``slices`` may also be a TUPLE of B [L, h, w] arrays (the pipeline
    ships each subject to the device asynchronously as host prep finishes
    and stacks on-device here, so relay transfer hides behind prep) or a
    tuple of [g, L, h, w] group blocks (grouped-put transfer mode)."""
    if isinstance(slices, tuple):
        slices = jnp.stack(slices) if slices[0].ndim == 3 else jnp.concatenate(slices, axis=0)
    if slices.dtype != jnp.float32:
        # f16 wire mode (PD_FUSION_PUT_DTYPE=f16): payloads cross the
        # relay at half width and widen on device before any math
        slices = slices.astype(jnp.float32)
    B, L = slices.shape[:2]
    batch = slices_to_imagenet_batch(slices.reshape(B * L, *slices.shape[2:]), input_size, mean, std)
    # fold BN in f32 (rsqrt in bf16 would cost precision), then cast
    folded = fold_bn_inference(backbone_params, arch)
    if compute_dtype == "bfloat16":
        folded = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), folded)
        batch = batch.astype(jnp.bfloat16)
    emb = resnet_apply_folded(folded, batch, arch)
    emb = emb.astype(jnp.float32).reshape(B, L, -1)
    return emb if per_slice else jnp.mean(emb, axis=1)


@partial(jax.jit, static_argnames=("arch", "input_size", "per_slice"))
def embed_slices_batch_augmented(backbone_params, slices, mean, std, angle, translate,
                                 scale, shift, noise, arch: str, input_size: int,
                                 per_slice: bool):
    """TTA variant over a subject batch: per-subject affine + intensity +
    noise fused ahead of the ResNet."""
    if isinstance(slices, tuple):
        slices = jnp.stack(slices) if slices[0].ndim == 3 else jnp.concatenate(slices, axis=0)
    if slices.dtype != jnp.float32:
        slices = slices.astype(jnp.float32)
    B, L = slices.shape[:2]
    aug = jax.vmap(affine2d_batch)(slices, angle, translate)
    aug = jnp.clip(aug * scale[:, None, None, None] + shift[:, None, None, None] + noise, 0.0, 1.0)
    batch = slices_to_imagenet_batch(aug.reshape(B * L, *aug.shape[2:]), input_size, mean, std)
    emb = resnet_apply_folded(fold_bn_inference(backbone_params, arch), batch, arch).reshape(B, L, -1)
    return emb if per_slice else jnp.mean(emb, axis=1)


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
    prefetch_depth: int = 6,
    progress: bool = True,
    compute_dtype: str = "float32",
) -> List[np.ndarray]:
    """Stream all subjects through the device pipeline. Returns a list of
    embeddings ([emb_dim] or [n_slices, emb_dim] per subject).

    Host/device split: host threads produce ready slices (native C++
    read+resize+normalize+select, GIL-free — or numpy mirrors) and the
    device runs the batched slice->embedding program. Ships ~2.4 MB per
    subject; host cost scales down linearly with cores. (A device-prep
    mode that shipped raw volumes and fused resize/normalize/select into
    the device program was measured slower at every shape on this image
    and deleted — the fused device prep ops survive in ops/image.py for
    volume_stats, the CNN3D builder, and MIL fine-tune.)
    """
    import os

    from pd_fusion.imaging import native

    mean = jnp.asarray(mean_vals, jnp.float32)
    std = jnp.asarray(std_vals, jnp.float32)
    axes_t, counts_t = tuple(int(a) for a in axes), tuple(int(c) for c in counts)
    target_t = tuple(int(t) for t in target_shape)
    n_slices_total = sum(counts_t)
    # slice spatial dims depend on the sliced-out axis: axis 0 -> (t1,t2),
    # axis 1 -> (t0,t2), axis 2 -> (t0,t1); mixing axes over a non-cubic
    # target would concat mismatched shapes, so reject it up front
    if len(axes_t) > 1 and not (target_t[0] == target_t[1] == target_t[2]):
        raise ValueError(
            f"multi-axis slice selection requires a cubic target_shape, got {target_t}"
        )
    _per_axis_dims = {
        0: (target_t[1], target_t[2]),
        1: (target_t[0], target_t[2]),
        2: (target_t[0], target_t[1]),
    }
    h_dim, w_dim = _per_axis_dims[axes_t[0]]

    # Transfer modes, chosen from a live 5-arm A/B on the real TPU relay
    # (scripts/ab_stacked_put.py, 2026-08-19, 16-vol leg, 4 interleaved
    # reps): per_subject min 2.76s / worst 9.78s; grouped4 min 3.12s /
    # worst 4.86s; f16 min 2.24s; f16+grouped4 min 2.21s / median 2.43s.
    # A fully-stacked one-put-per-flush mode was also measured (min
    # 4.07s, worst 11.2s — loses on BOTH good and bad relay samples, i.e.
    # giving up transfer/prep overlap costs more than the saved per-op
    # RTT) and was deleted.
    # PD_FUSION_PUT_GROUP=g: ship GROUPS of g subjects as one
    # [g, L, h, w] device_put each. Cuts relay ops per 16-subject flush
    # from ~17 to ~B/g + 1 while keeping g-granular transfer/prep
    # overlap (per-subject gives up nothing but pays per-op RTT).
    try:
        put_group = max(0, int(os.environ.get("PD_FUSION_PUT_GROUP", "0")))
    except ValueError:
        put_group = 0
    if put_group == 1:
        put_group = 0  # groups of one == per-subject mode
    # PD_FUSION_PUT_DTYPE=f16: ship slice payloads across the relay as
    # float16 (half the wire bytes; the slices are [0,1]-normalized so
    # f16's 1e-3 relative eps is far below the backbone's bf16 compute
    # noise) and widen to f32 on device before any math. Orthogonal to
    # the grouping knob above. Won the 2026-08-19 A/B (min 2.24s vs f32
    # per-subject 2.76s); bench.py runs it as an arm and quotes the min.
    put_dtype = None
    if os.environ.get("PD_FUSION_PUT_DTYPE", "") in ("f16", "float16"):
        put_dtype = np.float16
    # Multi-chip data-sharded flush mode (the SPMD equivalent of the
    # reference's nn.DataParallel in its embedding builders,
    # build_cnn3d_embeddings.py:123-124): when >1 device is visible,
    # each flush's [W, L, h, w] subject batch is device_put with a
    # NamedSharding over the subject axis and the (replicated) backbone
    # program runs SPMD — XLA splits the B*L image batch across chips.
    # Host payloads are stacked per flush (one sharded put scatters to
    # all chips); per-subject async puts only help on the single-chip
    # relay, where this mode never activates. Equivalence vs the
    # single-device program is gated in dryrun_multichip (embed=<tol>)
    # and tests/test_multichip.py. PD_FUSION_EMBED_MESH=0 disables.
    mesh_sharding = None
    if (
        jax.device_count() > 1
        and os.environ.get("PD_FUSION_EMBED_MESH", "1") != "0"
    ):
        from jax.sharding import NamedSharding, PartitionSpec

        from pd_fusion.utils.device import make_data_mesh

        _mesh = make_data_mesh()
        _nd = int(_mesh.devices.size)
        mesh_sharding = NamedSharding(_mesh, PartitionSpec("data"))
        _repl = NamedSharding(_mesh, PartitionSpec())
        backbone_params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, _repl), backbone_params
        )
        mean = jax.device_put(mean, _repl)
        std = jax.device_put(std, _repl)
        put_group = 0  # grouped puts are a relay-RTT lever; moot under a mesh
    # wire dtype handled inside the loader: the native tier emits f16
    # bits straight from its gather epilogue (no astype pass at all);
    # fallbacks convert in the prefetch worker, not the consume loop
    loader = make_slices_loader(target_t, axes_t, counts_t, out_dtype=put_dtype)
    it = VolumePrefetcher(paths, loader, depth=prefetch_depth)
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(iter(it), total=len(paths), desc=f"{arch} embeddings")
        except Exception:  # pragma: no cover
            it = iter(it)

    n = len(paths)
    B = min(SUBJECTS_PER_CALL, max(n, 1))
    # Tail-flush split: the only device time the pipeline cannot hide
    # under host prep is the FINAL flush's program (earlier flushes are
    # dispatched asynchronously and execute while later subjects still
    # prep on the host). When n >= SUBJECTS_PER_CALL, peel the last
    # B//4 subjects into their own small-width program: a 4-subject tail
    # exposes ~1/3 the device time of a full 16-subject program, and the
    # 12-subject flush it displaces rides under the tail's host prep.
    # Program widths are quantized to {B//4, B//2, B} so at most three
    # batch-size variants ever compile per (per_slice, dtype) combo.
    tail_w = B // 4 if n >= SUBJECTS_PER_CALL and B >= 8 else 0
    widths = [w for w in (tail_w, B // 2, B) if w] or [B]
    if mesh_sharding is not None:
        # every program width must divide evenly across the data mesh so
        # the sharded subject axis has equal per-device blocks
        widths = sorted({-(-w // _nd) * _nd for w in widths})
        B = widths[-1]

    def _pad_width(nb: int) -> int:
        for w in widths:
            if nb <= w:
                return w
        return B

    # grouped-put mode needs the group to divide every program width so
    # flush padding stays block-aligned; fall toward the nearest divisor
    # (1 == per-subject mode)
    if put_group:
        while put_group > 1 and any(w % put_group for w in widths):
            put_group -= 1
        if put_group <= 1:
            put_group = 0

    # per-flush device outputs, fetched in ONE readback at the end (each
    # individual device->host fetch costs ~50-150 ms through the relay;
    # 16 subjects fetched one-by-one used to burn ~0.75 s of pure RTT)
    flush_embs: List[jax.Array] = []
    flush_idx: List[List[int]] = []
    flush_width: List[int] = []

    def tta_params(batch_idx, nb, W):
        # Stable per-subject seed. The reference seeds with builtin
        # hash() (build_resnet2d_mil_embeddings.py:120), which is
        # PYTHONHASHSEED-randomized across processes; a sha256 digest
        # keeps its per-subject-stream semantics but is reproducible
        # between runs (documented deviation).
        rngs = [
            np.random.default_rng(
                int.from_bytes(
                    hashlib.sha256(str(subject_ids[i]).encode()).digest()[:4], "little"
                )
            )
            for i in batch_idx
        ] + [np.random.default_rng(0)] * (W - nb)
        draws = []
        for _ in range(tta):
            angle = np.zeros(W, np.float32)
            translate = np.zeros((W, 2), np.float32)
            scale = np.ones(W, np.float32)
            shift = np.zeros(W, np.float32)
            noise = np.zeros((W, n_slices_total, h_dim, w_dim), np.float32)
            for j, rng in enumerate(rngs):
                angle[j] = rng.uniform(-max_rotation, max_rotation)
                translate[j] = rng.uniform(-max_translation, max_translation, size=2) * np.array(
                    [h_dim, w_dim]
                )
                scale[j] = 1.0 + rng.uniform(-intensity_scale, intensity_scale)
                shift[j] = rng.uniform(-intensity_shift, intensity_shift)
                if noise_std > 0:
                    noise[j] = rng.normal(
                        0.0, noise_std, size=(n_slices_total, h_dim, w_dim)
                    ).astype(np.float32)
            draws.append((angle, translate, scale, shift, noise))
        return draws

    def flush(batch_idx, batch_payload):
        nb = len(batch_idx)
        W = _pad_width(nb)
        # subjects (or [g,...] group blocks) were device_put as the
        # prefetcher yielded them — pad the tuple to the program
        # width (repeating the first entry costs no new transfer)
        # and stack/concat ON DEVICE inside the jitted program
        if mesh_sharding is not None:
            # one sharded put scatters the whole flush across the mesh
            t0 = time.perf_counter()
            stack = jax.device_put(
                np.stack(list(batch_payload) + [batch_payload[0]] * (W - nb)),
                mesh_sharding,
            )
            prof["device_put_s"] += time.perf_counter() - t0
        elif put_group:
            need = W // put_group
            stack = tuple(batch_payload) + (batch_payload[0],) * (need - len(batch_payload))
        else:
            stack = tuple(batch_payload) + (batch_payload[0],) * (W - nb)
        if tta <= 1:
            emb = embed_slices_batch(
                backbone_params, stack, mean, std, arch, input_size, per_slice,
                compute_dtype,
            )
        else:
            emb = None
            for angle, translate, scale, shift, noise in tta_params(batch_idx, nb, W):
                e = embed_slices_batch_augmented(
                    backbone_params, stack, mean, std, jnp.asarray(angle),
                    jnp.asarray(translate), jnp.asarray(scale), jnp.asarray(shift),
                    jnp.asarray(noise), arch, input_size, per_slice,
                )
                emb = e if emb is None else emb + e
            emb = emb / tta
        flush_embs.append(emb)
        flush_idx.append(list(batch_idx))
        flush_width.append(W)

    batch_idx, batch_payload = [], []
    pending: List[np.ndarray] = []  # host payloads awaiting a grouped put
    prof = {"iter_wait_s": 0.0, "device_put_s": 0.0, "dispatch_s": 0.0,
            "final_fetch_s": 0.0}

    def put_pending(final: bool = False):
        # ship the pending host payloads as ONE [g, L, h, w] transfer;
        # an incomplete final group is padded with its own first subject
        # (pad rows land after the real rows and are never read back)
        if not pending:
            return
        blk = pending if not final or len(pending) == put_group else (
            pending + [pending[0]] * (put_group - len(pending))
        )
        t0 = time.perf_counter()
        batch_payload.append(jax.device_put(np.stack(blk)))
        prof["device_put_s"] += time.perf_counter() - t0
        pending.clear()

    def timed_flush(bi, bp):
        t0 = time.perf_counter()
        flush(bi, bp)
        prof["dispatch_s"] += time.perf_counter() - t0

    consumed = 0
    it2 = iter(it)
    while True:
        t0 = time.perf_counter()
        try:
            i, payload = next(it2)
        except StopIteration:
            break
        prof["iter_wait_s"] += time.perf_counter() - t0
        if put_group:
            pending.append(payload)
            if len(pending) == put_group:
                put_pending()
        else:
            if mesh_sharding is None:
                # start the host->device transfer NOW (async): it rides the
                # relay while the prefetch threads prep the next subjects
                # (mesh mode keeps payloads on host and ships the whole
                # flush as one sharded put inside flush())
                t0 = time.perf_counter()
                payload = jax.device_put(payload)
                prof["device_put_s"] += time.perf_counter() - t0
            batch_payload.append(payload)
        batch_idx.append(i)
        consumed += 1
        # full batch, or tail-split point: flush early so exactly tail_w
        # subjects remain for the final (small, cheap) program while this
        # flush's device time hides under their host prep
        if len(batch_idx) == B or (tail_w and n - consumed == tail_w):
            put_pending(final=True)
            timed_flush(batch_idx, batch_payload)
            batch_idx, batch_payload = [], []
    if batch_idx:
        put_pending(final=True)
        timed_flush(batch_idx, batch_payload)

    # single device-side concat + ONE host fetch for every embedding.
    # The concat program's arity is the chunk count; pad to the next
    # power of two (repeating the last chunk costs no transfer) so at
    # most log2(n/B) concat variants ever compile, not one per dataset
    # size.
    results: List[Optional[np.ndarray]] = [None] * n
    LAST_PROFILE.clear()
    LAST_PROFILE.update(prof)
    if not flush_embs:
        return results
    t0 = time.perf_counter()
    if len(flush_embs) > 1:
        P = 1 << (len(flush_embs) - 1).bit_length()
        padded = tuple(flush_embs) + (flush_embs[-1],) * (P - len(flush_embs))
        all_emb = np.asarray(_concat_rows(padded))
    else:
        all_emb = np.asarray(flush_embs[0])
    prof["final_fetch_s"] = time.perf_counter() - t0
    LAST_PROFILE.update(prof)
    off = 0
    for idxs, w in zip(flush_idx, flush_width):
        for j, i in enumerate(idxs):
            results[i] = all_emb[off + j]
        off += w
    return results
