"""Compatibility shim for the reference's torch device helper
(reference: utils/torch_utils.py:4-12, CUDA -> MPS -> CPU preference).

This framework's compute path is JAX (see utils/device.py for the
TPU-native selection); the shim keeps ``get_torch_device`` importable for
downstream code that still drives torch models side-by-side.
"""


def get_torch_device():
    import torch

    if torch.cuda.is_available():
        return torch.device("cuda")
    if getattr(torch.backends, "mps", None) is not None and torch.backends.mps.is_available():
        return torch.device("mps")
    return torch.device("cpu")
