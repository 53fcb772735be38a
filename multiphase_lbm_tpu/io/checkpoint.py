"""Checkpoint / resume.

Two mechanisms, mirroring and extending the reference (SURVEY §5.4):

* **Reference-compatible flow warm start** — the combustion module's
  ``save_converged_f_solution`` / ``Einlesefunktion_F`` text format
  (``CooLBM_MRT_combustion.cpp:3129-3178``): header ``nx ny q``, then one
  line of q values per cell, x-major outer, y inner, k innermost per line.
  We read and write that exact layout so converged flow fields interchange
  with the C++.
* **Full-state checkpoints** — any model's state pytree to a single ``.npz``
  (every leaf array + structure metadata), restoring to the original pytree
  shape.  Covers all distributions + macro fields + wall geometry, i.e. the
  "full-state checkpoint" obligation the reference lacks.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


# ─── reference-compatible combustion flow field (ini_f.dat) ────────────────
def save_flow_field_txt(path, f, precision: int = 15):
    """Write flow populations in the reference's exact restart layout
    (save_converged_f_solution, :3158-3176): header ``nx ny q`` then one
    line of q values per cell, x-major outer, y inner."""
    f = np.asarray(f)
    q, ny, nx = f.shape
    with open(path, "w") as fh:
        fh.write(f"{nx} {ny} {q}\n")
        for x in range(nx):
            for y in range(ny):
                fh.write(" ".join(f"{f[k, y, x]:.{precision}g}"
                                  for k in range(q)) + " \n")
            fh.write("\n")


def load_flow_field_txt(path, q=9, dtype=np.float64):
    """Read the reference restart file (Einlesefunktion_F, :3129-3156):
    whitespace tokens after the ``nx ny q`` header, cell-major x then y,
    k inner.  Returns (q, ny, nx)."""
    tokens = Path(path).read_text().split()
    nx, ny, qf = int(tokens[0]), int(tokens[1]), int(tokens[2])
    assert qf == q, (qf, q)
    vals = np.array(tokens[3:3 + nx * ny * q], dtype=dtype)
    return vals.reshape(nx, ny, q).transpose(2, 1, 0)


# ─── generic pytree checkpoints ────────────────────────────────────────────
def save_state(path, state, meta: dict | None = None):
    """Save any pytree of arrays to one .npz with its treedef."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(a) for i, a in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    if meta:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path, like_state):
    """Restore a checkpoint into the structure of ``like_state``
    (shapes and dtypes validated leaf-by-leaf; a dtype mismatch raises
    rather than silently changing the run's precision)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like_state)
    n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_saved != len(leaves):
        raise ValueError(f"checkpoint has {n_saved} leaves, "
                         f"like_state has {len(leaves)}")
    new = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(np.shape(ref)):
            raise ValueError(f"leaf {i}: shape {arr.shape} vs "
                             f"{tuple(np.shape(ref))}")
        want = np.dtype(getattr(ref, "dtype", None) or np.asarray(ref).dtype)
        if arr.dtype != want:
            raise ValueError(f"leaf {i}: dtype {arr.dtype} vs {want}; "
                             "cast the checkpoint explicitly if intended")
        new.append(arr)
    return jax.tree.unflatten(treedef, new)


def load_meta(path) -> dict:
    data = np.load(path)
    if "__meta__" not in data:
        return {}
    return json.loads(bytes(data["__meta__"]).decode())
