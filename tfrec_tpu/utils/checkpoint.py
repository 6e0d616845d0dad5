"""Checkpoint/resume (SURVEY.md §5 "checkpoint/resume").

Layout: ``<dir>/step_<N>/`` holding one ``.npy`` per pytree leaf (keyed by a
flattened path string) plus ``tree.json`` metadata. Restore takes a template
state (for structure and target shardings): every loaded leaf is
``device_put`` against the template leaf's sharding, so restoring onto a
live mesh re-shards tables correctly regardless of the saving topology.

Multi-host note: each process saves only its addressable shard of sharded
leaves (suffix ``.shard<i>``) and restore reassembles per-process — the only
large state is the embedding tables, which are exactly the sharded leaves.
Single-process saves write whole arrays.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict

import jax
import numpy as np


def _flatten(state) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = leaf
    return flat


def _local_block(leaf) -> np.ndarray:
    """This process's portion of a (possibly non-fully-addressable) array.

    Deduplicates replicated shards by index and reassembles row/column
    blocks along the sharded axis. Restore assumes the SAME process/mesh
    topology (standard TPU practice — cross-topology restore would require
    a global gather; documented limitation)."""
    if not isinstance(leaf, jax.Array) or leaf.is_fully_addressable:
        return np.asarray(jax.device_get(leaf))
    blocks = {}
    for shard in leaf.addressable_shards:
        key = tuple(
            (0 if s.start is None else int(s.start),
             dim if s.stop is None else int(s.stop))
            for s, dim in zip(shard.index, leaf.shape)
        )
        blocks.setdefault(key, np.asarray(shard.data))
    if len(blocks) == 1:
        return next(iter(blocks.values()))
    keys = sorted(blocks)
    axis = next(
        d for d in range(len(keys[0]))
        if len({k[d][0] for k in keys}) > 1
    )
    return np.concatenate([blocks[k] for k in keys], axis=axis)


def save_checkpoint(ckpt_dir: str, step: int, state, keep: int = 3) -> str:
    out = os.path.join(ckpt_dir, f"step_{step:010d}")
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    flat = _flatten(state)
    proc = jax.process_index()
    for key, leaf in flat.items():
        fname = re.sub(r"[^\w/.-]", "_", key).replace("/", "__")
        np.save(os.path.join(tmp, f"{fname}.p{proc}.npy"), _local_block(leaf))
    if proc == 0:
        with open(os.path.join(tmp, "tree.json"), "w") as f:
            json.dump({"step": step, "keys": sorted(flat)}, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_{step}")
    # Process 0 is the SOLE mover (every process's shard files are already
    # in tmp thanks to the barrier above; two movers race and one hits
    # FileNotFoundError on the vanished tmp). Overwrite semantics: remove a
    # stale same-step checkpoint first (os.replace onto a non-empty dir
    # raises ENOTEMPTY).
    if proc == 0:
        if os.path.exists(out):
            shutil.rmtree(out)
        os.replace(tmp, out)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_moved_{step}")
    # Retention: keep the newest `keep` checkpoints (process 0 only).
    if proc == 0 and keep > 0:
        steps = sorted(
            int(m.group(1))
            for d in os.listdir(ckpt_dir)
            if (m := re.fullmatch(r"step_(\d+)", d))
        )
        for old in steps[:-keep]:
            victim = os.path.join(ckpt_dir, f"step_{old:010d}")
            try:
                shutil.rmtree(victim)
            except OSError:
                pass
    return out


def load_table_arrays(ckpt_dir: str, step: int | None = None):
    """Raw embedding tables from a checkpoint WITHOUT a template state —
    the warm-start loader (train.init_from / model pretraining, the
    reference family's NeuMF/APR/IRGAN protocol). Returns
    {table_name: np.ndarray}.

    Multi-process checkpoints save per-process blocks (.p{i}): row-sharded
    tables reassemble by axis-0 concat in process order; replicated leaves
    (identical blocks) keep the first. Optimizer/dense state is not
    loaded — warm starts transfer representations, not trainer state."""
    import glob as _glob

    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise ValueError(f"no checkpoint found under {ckpt_dir!r}")
    d = os.path.join(ckpt_dir, f"step_{step:010d}")
    per_name: Dict[str, Dict[int, str]] = {}
    for p in _glob.glob(os.path.join(d, "tables__*.p*.npy")):
        base = os.path.basename(p)[: -len(".npy")]
        name_part, proc = base.rsplit(".p", 1)
        per_name.setdefault(name_part[len("tables__"):], {})[int(proc)] = p
    out: Dict[str, np.ndarray] = {}
    for name, procs in per_name.items():
        blocks = [np.load(procs[i]) for i in sorted(procs)]
        if len(blocks) > 1 and all(
            b.shape == blocks[0].shape and np.array_equal(b, blocks[0])
            for b in blocks[1:]
        ):
            blocks = blocks[:1]  # replicated leaf saved by every process
        out[name] = blocks[0] if len(blocks) == 1 else np.concatenate(blocks, 0)
    return out


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"step_(\d+)", d))
    ]
    return max(steps) if steps else None


def save_checkpoint_orbax(ckpt_dir: str, step: int, state) -> str:
    """Alternative backend: orbax StandardCheckpointer (async-capable,
    battle-tested multi-host atomicity). Same directory convention
    (step_<N>); pairs with restore_checkpoint_orbax."""
    import orbax.checkpoint as ocp

    out = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:010d}.orbax")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out, state, force=True)
    return out


def restore_checkpoint_orbax(ckpt_dir: str, template, step: int):
    """Restore an orbax checkpoint into the template's structure and
    shardings."""
    import orbax.checkpoint as ocp

    src = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:010d}.orbax")
    abstract = jax.tree_util.tree_map(
        lambda leaf: jax.ShapeDtypeStruct(
            np.shape(leaf),
            getattr(leaf, "dtype", np.asarray(leaf).dtype),
            sharding=getattr(leaf, "sharding", None),
        ),
        template,
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(src, abstract)


def restore_checkpoint(ckpt_dir: str, template, step: int | None = None):
    """Load the checkpoint at ``step`` (default: latest) into the structure
    and shardings of ``template``."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    src = os.path.join(ckpt_dir, f"step_{step:010d}")
    flat_template = _flatten(template)
    proc = jax.process_index()
    loaded = {}
    for key, tmpl_leaf in flat_template.items():
        fname = re.sub(r"[^\w/.-]", "_", key).replace("/", "__")
        path = os.path.join(src, f"{fname}.p{proc}.npy")
        if not os.path.exists(path):  # fall back to process-0 file
            path = os.path.join(src, f"{fname}.p0.npy")
        arr = np.load(path)
        sharding = getattr(tmpl_leaf, "sharding", None)
        if sharding is not None and isinstance(tmpl_leaf, jax.Array) and not tmpl_leaf.is_fully_addressable:
            loaded[key] = jax.make_array_from_process_local_data(
                sharding, arr.astype(tmpl_leaf.dtype)
            )
        elif sharding is not None:
            loaded[key] = jax.device_put(arr.astype(tmpl_leaf.dtype), sharding)
        else:
            loaded[key] = arr
    # Rebuild the pytree in template order.
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = [
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for path, _ in leaves_paths
    ]
    return jax.tree_util.tree_unflatten(treedef, [loaded[k] for k in keys])
