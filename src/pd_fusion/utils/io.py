"""YAML / pickle IO helpers.

Behavioral contract from the reference (src/pd_fusion/utils/io.py:7-20):
``load_yaml`` must round-trip results.yaml files that may embed numpy
scalars (the reference emits them via ``yaml.dump`` of numpy values and
reads them back with ``yaml.UnsafeLoader``). We keep UnsafeLoader for
read-compatibility with reference-produced artifacts, but our writers
always cast numpy scalars to plain Python floats/ints first so our own
artifacts are loadable with safe loaders too (documented deviation).
"""
import pickle
from pathlib import Path
from typing import Any, Dict

import numpy as np
import yaml


def _to_plain(obj: Any) -> Any:
    """Recursively convert numpy scalars/arrays to plain Python types."""
    if isinstance(obj, dict):
        return {_to_plain(k): _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if isinstance(obj, np.ndarray):
        return _to_plain(obj.tolist())
    # jax arrays (0-d or otherwise) expose __array__; normalize through numpy
    if hasattr(obj, "__array__") and not isinstance(obj, (str, bytes, Path)):
        return _to_plain(np.asarray(obj))
    if isinstance(obj, Path):
        return str(obj)
    return obj


def load_yaml(path: Path) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.load(f, Loader=yaml.UnsafeLoader)


# _to_plain guarantees pure-Python trees, so the libyaml C emitter is
# safe and ~10x faster than the pure-Python Dumper (yaml.dump was the
# single largest host cost in a warm CV run: ~50 ms of a ~350 ms wall)
_DUMPER = getattr(yaml, "CSafeDumper", yaml.SafeDumper)


def save_yaml(data: Dict[str, Any], path: Path):
    with open(path, "w") as f:
        yaml.dump(_to_plain(data), f, default_flow_style=False, Dumper=_DUMPER)


def save_pickle(obj: Any, path: Path):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: Path) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
