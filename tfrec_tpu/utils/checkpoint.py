"""Checkpoint/resume (SURVEY.md §5 "checkpoint/resume").

Layout: ``<dir>/step_<N>/`` holding one ``.npy`` per pytree leaf per process
(suffix ``.p<i>``, keyed by a flattened path string), ``tree.json`` metadata
(keys, step, saving process count), and per-process ``blocks.p<i>.json``
recording each sharded leaf's global row spans.

Restore takes a template state (for structure and target shardings). Two
paths:
- SAME process count as the save: each process loads its own ``.p<i>``
  files directly (fast, no reassembly).
- DIFFERENT process count (SURVEY.md §5 failure model: "restart from last
  checkpoint" must survive a resized job): every process reassembles the
  global array from all saved blocks using the recorded spans, then
  re-shards it onto the live mesh via ``jax.make_array_from_callback`` —
  bitwise-identical tables regardless of the saving topology
  (tests/test_utils.py cross-topology roundtrips). Row-padding differences
  (pad_vocab depends on device count) are absorbed by zero-padding /
  pad-row truncation on axis 0 — pad rows are zeros by construction.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict

import jax
import numpy as np


def _path_key(path) -> str:
    """ONE place derives the flat key string from a pytree path — save
    and restore must agree on it (review finding, round 4)."""
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _flatten(state) -> Dict[str, Any]:
    return {
        _path_key(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]
    }


def _local_block_meta(leaf):
    """(this process's portion of a possibly non-fully-addressable array,
    span metadata or None).

    Deduplicates replicated shards by index and reassembles row/column
    blocks along the sharded axis. The metadata records where the block's
    segments live in the GLOBAL array ({"axis", "spans": [[start, stop),
    ...], "global_shape"}; axis None = the block IS the full array) so a
    restore under a different process count can reassemble."""
    if not isinstance(leaf, jax.Array) or leaf.is_fully_addressable:
        return np.asarray(jax.device_get(leaf)), None
    blocks = {}
    for shard in leaf.addressable_shards:
        key = tuple(
            (0 if s.start is None else int(s.start),
             dim if s.stop is None else int(s.stop))
            for s, dim in zip(shard.index, leaf.shape)
        )
        blocks.setdefault(key, np.asarray(shard.data))
    gshape = [int(d) for d in leaf.shape]
    if len(blocks) == 1:
        key, arr = next(iter(blocks.items()))
        axis = next(
            (d for d in range(len(key)) if key[d] != (0, gshape[d])), None
        )
        if axis is None:  # replicated leaf: the block is the whole array
            return arr, {"axis": None, "global_shape": gshape}
        return arr, {
            "axis": axis, "spans": [list(key[axis])], "global_shape": gshape,
        }
    keys = sorted(blocks)
    axis = next(
        d for d in range(len(keys[0]))
        if len({k[d][0] for k in keys}) > 1
    )
    arr = np.concatenate([blocks[k] for k in keys], axis=axis)
    return arr, {
        "axis": axis, "spans": [list(k[axis]) for k in keys],
        "global_shape": gshape,
    }


def _local_block(leaf) -> np.ndarray:
    return _local_block_meta(leaf)[0]


def save_checkpoint(ckpt_dir: str, step: int, state, keep: int = 3,
                    meta: dict | None = None) -> str:
    """``meta``: extra layout facts merged into tree.json — currently
    ``row_permute`` (mesh.row_permute physically reorders table rows as a
    function of DEVICE COUNT, so such a checkpoint cannot be reinterpreted
    at a different device count or by a non-permuted run; restore refuses
    both loudly — see restore_checkpoint)."""
    out = os.path.join(ckpt_dir, f"step_{step:010d}")
    tmp = out + ".tmp"
    # A stale tmp from a CRASHED prior save of this step may hold other
    # processes' block files (possibly from a different topology); reusing
    # it would publish fresh and stale blocks together and a later
    # cross-topology restore would silently overwrite sub-ranges with
    # stale rows (review finding, round 4). Process 0 cleans, everyone
    # barriers, then writes.
    proc0 = jax.process_index() == 0
    if proc0 and os.path.exists(tmp):
        shutil.rmtree(tmp)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_tmp_clean_{step}")
    os.makedirs(tmp, exist_ok=True)
    flat = _flatten(state)
    proc = jax.process_index()
    spans = {}
    for key, leaf in flat.items():
        fname = re.sub(r"[^\w/.-]", "_", key).replace("/", "__")
        # NB: named leaf_meta, not meta — that would shadow the layout
        # parameter merged into tree.json below.
        arr, leaf_meta = _local_block_meta(leaf)
        np.save(os.path.join(tmp, f"{fname}.p{proc}.npy"), arr)
        if leaf_meta is not None:
            spans[key] = leaf_meta
    # Per-process span metadata: lets a restore under a DIFFERENT process
    # count reassemble the global arrays (cross-topology restart).
    with open(os.path.join(tmp, f"blocks.p{proc}.json"), "w") as f:
        json.dump(spans, f)
    if proc == 0:
        with open(os.path.join(tmp, "tree.json"), "w") as f:
            json.dump({
                "step": step, "keys": sorted(flat),
                "process_count": jax.process_count(),
                # Device count distinguishes a same-proc-count restore
                # whose vocab padding differs (pad_vocab is a function of
                # DEVICE count) — that case must reassemble, not fast-path
                # (review finding, round 4).
                "device_count": jax.device_count(),
                **(meta or {}),
            }, f)
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
    # Prefer the recorded per-process block spans (blocks.p*.json): the
    # bare process-order concat below mis-assembles interleaved layouts
    # and collapses a zeros-initialized sharded table to one shard via
    # the replicated-value heuristic (review finding, round 4).
    blocks_meta: Dict[int, dict] = {}
    for p in _glob.glob(os.path.join(d, "blocks.p*.json")):
        i = int(os.path.basename(p)[len("blocks.p"):-len(".json")])
        with open(p) as f:
            blocks_meta[i] = json.load(f)
    per_name: Dict[str, Dict[int, str]] = {}
    for p in _glob.glob(os.path.join(d, "tables__*.p*.npy")):
        base = os.path.basename(p)[: -len(".npy")]
        name_part, proc = base.rsplit(".p", 1)
        per_name.setdefault(name_part[len("tables__"):], {})[int(proc)] = p
    out: Dict[str, np.ndarray] = {}
    for name, procs in per_name.items():
        key = f"tables/{name}"
        fname = f"tables__{name}"
        if blocks_meta and any(key in m for m in blocks_meta.values()):
            out[name] = _assemble_global(
                d, key, fname, blocks_meta, len(procs)
            )
            continue
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


def checkpoint_row_permute(ckpt_dir: str, step: int | None = None) -> bool:
    """Whether a checkpoint's tables were saved in the row-permuted
    physical layout (mesh.row_permute recorded in tree.json at save).
    False for legacy/absent metadata."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            return False
    tree = os.path.join(ckpt_dir, f"step_{step:010d}", "tree.json")
    if not os.path.exists(tree):
        return False
    try:
        with open(tree) as f:
            return bool(json.load(f).get("row_permute", False))
    except (OSError, ValueError):
        return False


def checkpoint_table_layout(ckpt_dir: str, step: int | None = None):
    """Table layout recorded in a checkpoint's key list: True when the
    saved CTR tables are lane-packed (``tables/pack_*``), False when
    per-field (``tables/field_*``), None when no checkpoint / no CTR
    tables / no readable metadata. AUTO lane packing is resolved from
    ambient state (device count, batch size), so restore paths consult
    this to honor the SAVED layout over re-derivation (ADVICE r3)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            return None
    tree = os.path.join(ckpt_dir, f"step_{step:010d}", "tree.json")
    if not os.path.exists(tree):
        return None
    try:
        with open(tree) as f:
            keys = json.load(f).get("keys", [])
    except (OSError, ValueError):
        return None
    for k in keys:
        if k.startswith(("tables/pack_", "tables/linpack_")):
            return True
        if k.startswith(("tables/field_", "tables/lin_")):
            return False
    return None


def _global_shape_like(tmpl_leaf):
    return tuple(int(d) for d in np.shape(tmpl_leaf))


def _fit_axis0(arr: np.ndarray, want_shape) -> np.ndarray:
    """Absorb row-padding differences between topologies: pad_vocab rounds
    V up to a multiple of (device_count * 8), so a different DEVICE count
    changes only the number of trailing pad rows — zeros by construction
    (tables pad with zeros; sparse-opt state is zero-padded the same way
    in ShardedTrainStepBuilder._init_padded). Any other mismatch is a real
    error and raises."""
    if tuple(arr.shape) == tuple(want_shape):
        return arr
    if arr.shape[1:] != tuple(want_shape)[1:] or arr.ndim == 0:
        raise ValueError(
            f"checkpoint leaf shape {arr.shape} does not match template "
            f"{tuple(want_shape)} (only axis-0 pad-row differences are "
            "reconcilable)"
        )
    want0 = want_shape[0]
    if arr.shape[0] > want0:
        dropped = arr[want0:]
        if np.any(dropped):
            raise ValueError(
                f"cross-topology restore would truncate {arr.shape[0] - want0} "
                "NON-ZERO rows — the saved vocab exceeds the template's "
                "padded vocab; this is not a padding difference"
            )
        return arr[:want0]
    pad = np.zeros((want0 - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _assemble_global(src, key, fname, blocks_meta, saved_procs):
    """Reassemble one leaf's GLOBAL array from every saved process block
    (the cross-topology restore path)."""
    import glob as _glob

    paths = {}
    for p in _glob.glob(os.path.join(src, f"{fname}.p*.npy")):
        paths[int(os.path.basename(p).rsplit(".p", 2)[-1][:-len(".npy")])] = p
    if not paths:
        raise FileNotFoundError(f"{fname}.p*.npy missing under {src}")
    metas = {i: blocks_meta.get(i, {}).get(key) for i in paths}
    sharded = {i: m for i, m in metas.items() if m and m.get("axis") is not None}
    if not sharded:
        # Replicated / fully-addressable leaf: every process saved the
        # whole array — any copy works.
        return np.load(paths[min(paths)])
    first = sharded[min(sharded)]
    axis, gshape = first["axis"], tuple(first["global_shape"])
    sample = np.load(paths[min(sharded)])
    out = np.zeros(gshape, sample.dtype)
    filled = 0
    for i in sorted(sharded):
        arr = sample if i == min(sharded) else np.load(paths[i])
        off = 0
        for start, stop in sharded[i]["spans"]:
            n = stop - start
            sl = [slice(None)] * len(gshape)
            sl[axis] = slice(start, stop)
            take = [slice(None)] * len(gshape)
            take[axis] = slice(off, off + n)
            out[tuple(sl)] = arr[tuple(take)]
            off += n
            filled += n
    if filled < gshape[axis]:
        raise ValueError(
            f"checkpoint leaf {key!r}: saved blocks cover {filled} of "
            f"{gshape[axis]} rows on axis {axis} — incomplete checkpoint "
            f"(found processes {sorted(paths)} of {saved_procs})"
        )
    return out


def restore_checkpoint(ckpt_dir: str, template, step: int | None = None,
                       expect_row_permute: bool | None = None,
                       expect_row_permute_shards: int | None = None):
    """Load the checkpoint at ``step`` (default: latest) into the structure
    and shardings of ``template``. Restores across process-count changes
    (save at N, restore at M != N) by reassembling global arrays from the
    recorded block spans and re-sharding onto the live mesh.

    ``expect_row_permute``: the restoring run's mesh.row_permute (None =
    caller doesn't use the flag, legacy behavior). The permutation is a
    function of DEVICE COUNT, so a permuted checkpoint is refused loudly
    when the device count changed or the flags disagree — a silent
    restore would scramble every table row (round-5 review finding)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    src = os.path.join(ckpt_dir, f"step_{step:010d}")
    tree_meta = {}
    tree_path = os.path.join(src, "tree.json")
    if os.path.exists(tree_path):
        with open(tree_path) as f:
            tree_meta = json.load(f)
    saved_procs = tree_meta.get("process_count")
    saved_devs = tree_meta.get("device_count")
    cur_procs = jax.process_count()
    saved_permute = bool(tree_meta.get("row_permute", False))
    if expect_row_permute is not None and saved_permute != expect_row_permute:
        raise ValueError(
            f"checkpoint {src!r} was saved with row_permute="
            f"{saved_permute} but this run has mesh.row_permute="
            f"{expect_row_permute}; the physical row layouts differ — "
            "restore with the matching config"
        )
    if saved_permute:
        # The round-robin permutation is a function of the DATA-AXIS
        # shard count (mesh.shape['data']), NOT the total device count —
        # a (2,2) mesh and a (4,1) mesh have the same device count but
        # different permutations (review finding, round 5). Guard on the
        # recorded shard count when present; legacy permuted checkpoints
        # (none recorded) fall back to the device-count proxy.
        saved_shards = tree_meta.get("row_permute_shards")
        if saved_shards is not None and expect_row_permute_shards is not None:
            if saved_shards != expect_row_permute_shards:
                raise ValueError(
                    f"checkpoint {src!r} was saved with row_permute=True "
                    f"over {saved_shards} data-axis shards; this mesh has "
                    f"{expect_row_permute_shards} — the row layouts "
                    "differ, restore at the saved shard count (or "
                    "export/de-permute first)"
                )
        elif saved_devs is not None and saved_devs != jax.device_count():
            raise ValueError(
                f"checkpoint {src!r} was saved with row_permute=True on "
                f"{saved_devs} devices; the round-robin row layout "
                f"cannot be restored on {jax.device_count()} devices — "
                "restore at the saved topology (or export/de-permute)"
            )
    # Legacy checkpoints (no process_count) keep the old same-topology
    # fast path; with metadata present, topology changes reassemble.
    # "Same topology" requires the DEVICE count too when recorded: vocab
    # padding is a function of device count, so saving on 1 proc x 8
    # devices and restoring on 1 proc x 4 changes the padded row count
    # even though the process count matches (review finding, round 4).
    same_topology = saved_procs is None or (
        saved_procs == cur_procs
        and (saved_devs is None or saved_devs == jax.device_count())
    )
    blocks_meta: Dict[int, dict] = {}
    if not same_topology:
        import glob as _glob

        for p in _glob.glob(os.path.join(src, "blocks.p*.json")):
            i = int(os.path.basename(p)[len("blocks.p"):-len(".json")])
            with open(p) as f:
                blocks_meta[i] = json.load(f)
    flat_template = _flatten(template)
    proc = jax.process_index()
    loaded = {}
    for key, tmpl_leaf in flat_template.items():
        fname = re.sub(r"[^\w/.-]", "_", key).replace("/", "__")
        sharding = getattr(tmpl_leaf, "sharding", None)
        if same_topology:
            path = os.path.join(src, f"{fname}.p{proc}.npy")
            if not os.path.exists(path):  # fall back to process-0 file
                path = os.path.join(src, f"{fname}.p0.npy")
            arr = np.load(path)
            if sharding is not None and isinstance(tmpl_leaf, jax.Array) and not tmpl_leaf.is_fully_addressable:
                loaded[key] = jax.make_array_from_process_local_data(
                    sharding, arr.astype(tmpl_leaf.dtype)
                )
            elif sharding is not None:
                loaded[key] = jax.device_put(arr.astype(tmpl_leaf.dtype), sharding)
            else:
                loaded[key] = arr
            continue
        arr = _assemble_global(src, key, fname, blocks_meta, saved_procs)
        arr = _fit_axis0(arr, _global_shape_like(tmpl_leaf))
        if sharding is not None and isinstance(tmpl_leaf, jax.Array):
            dtype = tmpl_leaf.dtype
            loaded[key] = jax.make_array_from_callback(
                tuple(np.shape(tmpl_leaf)), sharding,
                # np.asarray (not ascontiguousarray: it promotes 0-d
                # scalars to 1-d and the shard-shape check rejects that).
                lambda idx, a=arr, dt=dtype: np.asarray(a[idx], dtype=dt),
            )
        else:
            loaded[key] = arr
    # Rebuild the pytree in template order.
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = [_path_key(path) for path, _ in leaves_paths]
    return jax.tree_util.tree_unflatten(treedef, [loaded[k] for k in keys])
