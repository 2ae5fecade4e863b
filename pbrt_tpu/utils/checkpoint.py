"""Render checkpoint/resume.

The reference has none (film written once at the end, integrator.cpp:338;
SURVEY.md §5.4) — this is the TPU-native preemption story it lacks: the film
accumulator + next sample index are the *only* render state (samplers are
pure functions of (pixel, sampleNum)), so a checkpoint is one npz every K
sample batches and resume continues at the saved sample index.
"""
from __future__ import annotations

import os

import numpy as np

from .. import film as fm


def save(path: str, film_state: fm.FilmState, next_sample: int):
    tmp = path + ".tmp"
    np.savez(
        tmp,
        weighted_sum=np.asarray(film_state.weighted_sum),
        weight_sum=np.asarray(film_state.weight_sum),
        splat=np.asarray(film_state.splat),
        next_sample=np.int64(next_sample),
    )
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load(path: str, film_state: fm.FilmState):
    """Restore into an existing film state (keeps static config fields).
    Returns (film_state, next_sample)."""
    import jax.numpy as jnp

    z = np.load(path)
    fs = film_state.replace(
        weighted_sum=jnp.asarray(z["weighted_sum"]),
        weight_sum=jnp.asarray(z["weight_sum"]),
        splat=jnp.asarray(z["splat"]),
    )
    return fs, int(z["next_sample"])


def maybe_resume(path: str, film_state: fm.FilmState):
    if path and os.path.exists(path):
        return load(path, film_state)
    return film_state, 0


# ---------------------------------------------------------------------------
# Whole-pytree checkpoints (wavefront engine): the lane-pool state dict (film
# + in-flight lanes + sampler cursors + work counter) is the COMPLETE render
# state, so snapshotting the pytree is exact — resume continues mid-pool with
# no lost or double-counted (pixel, sample) work.
# ---------------------------------------------------------------------------


def save_state(path: str, state):
    """Atomic npz snapshot of an arbitrary array pytree."""
    import jax

    leaves = jax.tree_util.tree_leaves(state)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{f"leaf{i}": np.asarray(x) for i, x in enumerate(leaves)})
    os.replace(tmp, path)


def load_state(path: str, template):
    """Restore a pytree saved by save_state into `template`'s structure.
    The caller must rebuild the same render config (same treedef/shapes)."""
    import jax
    import jax.numpy as jnp

    z = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(z.files) != len(leaves):
        raise ValueError(
            f"checkpoint {path} has {len(z.files)} leaves, expected "
            f"{len(leaves)} — different render config?"
        )
    new = [
        jnp.asarray(z[f"leaf{i}"]).astype(l.dtype) if hasattr(l, "dtype")
        else z[f"leaf{i}"]
        for i, l in enumerate(leaves)
    ]
    for l, n in zip(leaves, new):
        if hasattr(l, "shape") and tuple(l.shape) != tuple(n.shape):
            raise ValueError(
                f"checkpoint {path} leaf shape {n.shape} != {l.shape}"
            )
    return jax.tree_util.tree_unflatten(treedef, new)


def maybe_resume_state(path: str, template):
    if path and os.path.exists(path):
        return load_state(path, template)
    return template
