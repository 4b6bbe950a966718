"""Model checkpoint save/load (orbax) + the ``model/`` cache convention.

The reference caches downloaded checkpoints under ``model/``
(11_dataset_labeling.py:10, 22_segment_image_auto.py:28-38) and relies on
output-existence checks for pipeline resumability. Here model params
(CLIP / SAM / TinyDet / train state) checkpoint through orbax to a
directory, and ``latest_step`` supports resuming interrupted training.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

MODEL_CACHE_DIR = Path("model")


def save_params(params: Any, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str | Path, like: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            import jax

            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
                if hasattr(ocp.utils, "to_shape_dtype_struct") else like
            return ckptr.restore(path, target)
        return ckptr.restore(path)


class TrainCheckpointer:
    """Step-numbered train-state checkpoints with resume support."""

    def __init__(self, root: str | Path, keep: int = 3):
        import orbax.checkpoint as ocp

        self.root = Path(root).resolve()
        self._mgr = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.root}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def close(self) -> None:
        self._mgr.close()
