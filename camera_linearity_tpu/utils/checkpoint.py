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

import jax
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
