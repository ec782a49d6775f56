"""Training-state checkpointing.

The reference's "checkpointing" is model pickles plus content-addressed
artifact caches (SURVEY §5). The rebuild adds real mid-training
checkpoints for the long-running trainers (MIL fine-tune): the full
(params, opt_state, epoch, rng) pytree is saved via orbax when available,
with a pickle fallback, and training resumes from the latest checkpoint.
"""
import pickle
from pathlib import Path
from typing import Any, Optional

import jax

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path, state: Any, step: int = 0):
    """Save a pytree training state. ``path`` is a directory."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    state = jax.device_get(state)
    if _HAS_ORBAX:
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save((path / f"step_{step}").absolute(), state, force=True)
            ckptr.wait_until_finished()
            (path / "LATEST").write_text(str(step))
            return
        except Exception:
            pass  # fall back to pickle below
    with open(path / f"step_{step}.pkl", "wb") as f:
        pickle.dump(state, f)
    (path / "LATEST").write_text(str(step))


def latest_step(path) -> Optional[int]:
    marker = Path(path) / "LATEST"
    if not marker.exists():
        return None
    try:
        return int(marker.read_text().strip())
    except ValueError:  # pragma: no cover
        return None


def load_checkpoint(path, step: Optional[int] = None, like: Any = None) -> Optional[Any]:
    """Load the checkpoint at ``step`` (default: latest). ``like`` is an
    abstract pytree template required by orbax restore."""
    path = Path(path)
    if step is None:
        step = latest_step(path)
    if step is None:
        return None
    pkl = path / f"step_{step}.pkl"
    if pkl.exists():
        with open(pkl, "rb") as f:
            return pickle.load(f)
    if _HAS_ORBAX and (path / f"step_{step}").exists():
        try:
            ckptr = ocp.StandardCheckpointer()
            if like is not None:
                return ckptr.restore((path / f"step_{step}").absolute(), like)
            return ckptr.restore((path / f"step_{step}").absolute())
        except Exception:  # pragma: no cover
            return None
    return None
