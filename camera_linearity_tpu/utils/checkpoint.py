"""Checkpoint / resume for long-running solves.

The reference has no in-process persistence: its de-facto checkpoint layer
is txt/tif artifacts re-read from disk, and the DE solver supports early
stop but not resume (SURVEY.md §5; reference
ICRF_calibration_exposure.py:357-370).  Here solver state — population,
energies, PRNG keys, generation counter — checkpoints as a pytree through
orbax, so a calibration can stop (preemption, budget) and continue exactly
where it left off.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

__all__ = ["save_pytree", "load_pytree", "DECheckpoint"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str | Path, tree: Any) -> None:
    """Save any pytree of arrays (orbax PyTreeCheckpointer)."""
    path = Path(path).absolute()
    if path.exists():
        import shutil
        shutil.rmtree(path)
    _checkpointer().save(str(path), tree)


def load_pytree(path: str | Path) -> Any:
    return _checkpointer().restore(str(Path(path).absolute()))


class DECheckpoint:
    """Differential-evolution solver state persistence.

    Stores the (C, S, D) normalized population, (C, S) energies, per-channel
    PRNG keys, generation counter and done flags — everything
    ``differential_evolution_batched`` needs to continue a solve.
    """

    FIELDS = ("pop", "energies", "keys", "nit", "done")

    @staticmethod
    def save(path: str | Path, pop, energies, keys, nit, done) -> None:
        save_pytree(path, {
            "pop": np.asarray(pop),
            "energies": np.asarray(energies),
            "keys": np.asarray(keys),
            "nit": np.asarray(nit),
            "done": np.asarray(done),
        })

    @staticmethod
    def load(path: str | Path):
        import jax.numpy as jnp
        tree = load_pytree(path)
        return (jnp.asarray(tree["pop"]), jnp.asarray(tree["energies"]),
                jnp.asarray(tree["keys"]), int(tree["nit"]),
                jnp.asarray(tree["done"]))

    @staticmethod
    def exists(path: str | Path) -> bool:
        return Path(path).exists()

    @classmethod
    def try_load(cls, path: str | Path):
        """Load a checkpoint, or None when absent OR unreadable.

        A preempted process can die mid-save, leaving a partial directory
        that ``exists()`` reports as present; resuming must then degrade
        to a fresh start rather than crash — that fallback IS the
        failure-recovery behavior the checkpoint feature exists for.
        Structural problems (missing fields, wrong dtypes) are treated
        the same way and logged.
        """
        if not cls.exists(path):
            return None
        try:
            state = cls.load(path)
            if state[0].ndim != 3 or state[1].shape != state[0].shape[:2]:
                raise ValueError("checkpoint field shapes inconsistent")
            return state
        except Exception as exc:  # noqa: BLE001 — any corruption -> fresh
            from .observability import get_logger
            get_logger().warning(
                "checkpoint at %s unreadable (%s: %s); starting fresh",
                path, type(exc).__name__, str(exc)[:200])
            return None
