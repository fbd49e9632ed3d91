"""Param-tree checkpointing.

Two tiers:

* ``save_params``/``load_params`` — nested dict/list pytrees <-> one
  compressed ``.npz``.  Dependency-free (keeps the committed surrogate
  checkpoint loadable without orbax); keys encode the tree path with ``/``
  separators and ``#i`` list indices.  Host-side, synchronous, unsharded —
  right for small trees and fixtures.
* :class:`TrainCheckpointer` — orbax-backed training checkpoints (params +
  optimizer state + EMA + step in one tree): ASYNC saves (the train loop
  keeps running while the previous state streams to disk), retention,
  step discovery for resume, and SHARDED restore — pass a mesh + spec tree
  and every leaf is materialized directly into its multi-chip sharding
  (each host reads only its shards; no full-tree host copy).  This is the
  production path the reference has no counterpart for (SURVEY.md §5
  checkpoint/resume covers only the samplers' trajectory state).
"""

from __future__ import annotations

import pathlib
from typing import Any

import numpy as np

_NONE_SUFFIX = ".__none__"


def _flatten(node: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(node, dict):
        for k, v in node.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            out.update(_flatten(v, f"{prefix}/#{i}" if prefix else f"#{i}"))
    elif node is None:
        # None leaves (e.g. identity skip connections) get a portable
        # sentinel; np.savez would otherwise pickle them as object arrays,
        # which np.load refuses without allow_pickle.
        out[prefix + _NONE_SUFFIX] = np.zeros((), np.uint8)
    else:
        out[prefix] = np.asarray(node)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for key, value in flat.items():
        if key.endswith(_NONE_SUFFIX):
            key, value = key[: -len(_NONE_SUFFIX)], None
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [listify(node[f"#{i}"]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_params(path: str | pathlib.Path, params: Any) -> None:
    "Write a nested dict/list param tree as one compressed .npz."
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **_flatten(params))


def load_params(path: str | pathlib.Path) -> Any:
    "Inverse of :func:`save_params`."
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


class TrainCheckpointer:
    """Orbax-backed async training checkpoints.

    ``state`` is any pytree — the conventional layout is
    ``{"params": ..., "opt_state": ..., "ema": ..., "step": ...}`` but
    nothing here depends on it.

    * ``save(step, state)`` returns as soon as the state is snapshotted;
      serialization streams to disk in the background (``wait()`` or
      ``close()`` joins it — both are also invoked by orbax before the next
      save, so overlapping saves are safe).
    * ``restore(step=None)`` reads the given (default: latest) step.  Plain
      restore materializes numpy-backed leaves; pass ``like=`` (a matching
      tree of arrays or ShapeDtypeStructs, e.g. built with mesh shardings)
      and each leaf lands as a ``jax.Array`` with that sharding — on a real
      multi-host mesh each host reads only its own shards.
    """

    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._manager = ocp.CheckpointManager(
            pathlib.Path(directory).absolute(),
            # an explicit handler lets a restore-only manager (a different
            # process than the saver) read item_metadata — required for the
            # topology-independent plain restore below
            item_handlers=ocp.StandardCheckpointHandler(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=async_save
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._manager.save(int(step), args=self._ocp.args.StandardSave(state))

    def restore(self, step: int | None = None, like: Any = None) -> Any:
        "Latest (or given) step; ``like`` supplies dtypes/shardings per leaf."
        import jax

        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError("no checkpoint steps found")
        if like is not None:
            abstract = jax.tree.map(
                lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=getattr(leaf, "sharding", None))
                if hasattr(leaf, "shape")
                else leaf,
                like,
            )
            return self._manager.restore(int(step), args=self._ocp.args.StandardRestore(abstract))
        # plain restore: try the save-time sharding replay FIRST — on the
        # same topology it restores a sharded state sharded (no single-device
        # gather that could OOM a large state).  Only when the replay fails —
        # a checkpoint written on a TPU process restored by a CPU process
        # ("Device TPU v5 lite0 was not found in jax.local_devices()") —
        # rebuild the abstract tree from the checkpoint's own metadata with a
        # CONCRETE local single-device sharding per leaf (callers with a
        # sharded target on a NEW topology should pass ``like=``).
        try:
            return self._manager.restore(int(step))
        except Exception:  # noqa: BLE001 — recorded devices absent here
            meta = self._manager.item_metadata(int(step))
            if meta is None or not jax.tree.leaves(meta):
                raise  # no metadata to rebuild from: surface the replay failure
        local = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=local) if hasattr(m, "shape") else m,
            meta,
        )
        return self._manager.restore(int(step), args=self._ocp.args.StandardRestore(abstract))

    def latest_step(self) -> int | None:
        return self._manager.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self._manager.all_steps())

    def wait(self) -> None:
        "Join any in-flight async save."
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.close()

    def __enter__(self) -> "TrainCheckpointer":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()
