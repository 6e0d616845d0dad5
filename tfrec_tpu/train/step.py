"""The generic train step: one jitted XLA program per step (SURVEY.md §3b).

Flow inside the compiled step:
  lookup ids -> gather rows -> grad w.r.t. (dense params, gathered rows)
  -> dense update (optax) -> per-table duplicate-combine + rowwise sparse
  update (ops/sparse_optim.py).

Gradients w.r.t. embedding tables are never materialized densely: autodiff
stops at the gathered rows, and the sparse optimizer scatters updates back
into only the touched rows. This is the structural difference from a naive
``grad(loss)(tables)`` (which would write a full [V, D] gradient every step)
and is what makes the step's HBM traffic proportional to batch size, not
vocabulary size.

The step is pure (state, batch) -> (state, metrics); callers wrap it in
``jax.jit`` (single device) or pjit with shardings (tfrec_tpu/parallel).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from tfrec_tpu.configs import OptimConfig
from tfrec_tpu.models.base import RecModel
from tfrec_tpu.ops.embedding import gather
from tfrec_tpu.ops.sparse_optim import SparseOptimizer, make_sparse_optimizer
from tfrec_tpu.train.losses import make_loss

State = Dict
LookupFn = Callable[[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]]


_HOST_SORT_POOL = None


def host_dedup_sorts(model: RecModel, host_batch) -> Dict[str, "object"]:
    """Per-table stable argsorts of this batch's ids, computed on HOST
    numpy (train.host_dedup). The step's duplicate combine then skips its
    device argsort while the host work overlaps device compute in the
    prefetch pipeline. NOTE the measured verdict (docs/PERF.md
    "Host-precomputed dedup sorts"): on this chip the device argsort is
    NOT the binding cost (in-situ tie unpacked, 2 ms worse lane-packed,
    where the extra batch inputs outweigh the removed sort), so the
    feature defaults OFF and exists for hosts where the trade differs.
    Stable sort => bit-identical results to the device path
    (jnp.argsort is stable).

    Returns {"_sort_<table>": [N] int32} arrays to merge into the host
    batch. The per-table argsorts run on a small shared thread pool, and
    each sorts the composite key ``id * N + position`` with quicksort —
    the exact stable-by-id permutation at ~4x less than numpy's stable
    kind (measured 0.8 vs 3.0 ms per 32k-id sort; ~4 ms/batch for the
    flagship 26-field shape on a 4-vCPU host vs the ~11 ms device
    step it overlaps)."""
    import numpy as np

    global _HOST_SORT_POOL
    ids = model.lookup_ids(host_batch, xp=np)
    if len(ids) > 1 and _HOST_SORT_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _HOST_SORT_POOL = ThreadPoolExecutor(
            min(8, os.cpu_count() or 1), thread_name_prefix="hostdedup"
        )

    vocabs = {spec.name: spec.vocab for spec in model.table_specs()}

    def one(v, sentinel):
        v = np.asarray(v)
        # Same negative-id normalization as combine_duplicate_ids: the
        # device combine sorts normalized ids, so the host order must
        # rank corrupt negatives AT the sentinel to stay bit-identical.
        v = np.where(v < 0, sentinel, v)
        key = v.astype(np.int64) * len(v) + np.arange(len(v), dtype=np.int64)
        return np.argsort(key, kind="quicksort").astype(np.int32)

    if len(ids) > 1:
        futs = {
            k: _HOST_SORT_POOL.submit(one, v, vocabs[k])
            for k, v in ids.items()
        }
        return {f"_sort_{k}": f.result() for k, f in futs.items()}
    return {f"_sort_{k}": one(v, vocabs[k]) for k, v in ids.items()}


def make_schedule(cfg: OptimConfig, base_lr: float):
    """Step -> lr. Shared by the dense (optax) and sparse (rowwise) paths."""
    if cfg.lr_schedule == "constant" and cfg.warmup_steps == 0:
        return lambda step: base_lr
    if cfg.lr_schedule not in ("constant", "cosine", "linear"):
        # Refusing beats silently training at constant LR (the repo's
        # named silent-fallback bug class — review finding, round 4).
        raise ValueError(
            f"unknown lr_schedule {cfg.lr_schedule!r}; "
            "options: constant, cosine, linear"
        )
    if cfg.lr_schedule in ("cosine", "linear") and cfg.decay_steps <= 0:
        raise ValueError(
            f"lr_schedule={cfg.lr_schedule!r} requires decay_steps > 0 "
            "(with decay_steps=0 the LR would collapse to the floor after "
            "one step)"
        )
    end = base_lr * cfg.end_lr_factor
    decay_steps = max(cfg.decay_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(1.0, (step + 1.0) / max(cfg.warmup_steps, 1))
        if cfg.lr_schedule == "cosine":
            frac = jnp.clip(step / decay_steps, 0.0, 1.0)
            decayed = end + 0.5 * (base_lr - end) * (1 + jnp.cos(jnp.pi * frac))
        elif cfg.lr_schedule == "linear":
            frac = jnp.clip(step / decay_steps, 0.0, 1.0)
            decayed = base_lr + (end - base_lr) * frac
        else:  # constant (+ warmup); unknown names raise below
            decayed = base_lr
        return decayed * (warm if cfg.warmup_steps > 0 else 1.0)

    return schedule


def make_dense_tx(cfg: OptimConfig) -> optax.GradientTransformation:
    lr = make_schedule(cfg, cfg.learning_rate)
    if cfg.dense_optimizer == "adam":
        tx = optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.eps)
    elif cfg.dense_optimizer == "adagrad":
        tx = optax.adagrad(
            lr,
            initial_accumulator_value=cfg.adagrad_init,
            eps=max(cfg.eps, 1e-10),
        )
    elif cfg.dense_optimizer == "sgd":
        tx = optax.sgd(lr)
    else:
        raise ValueError(f"unknown dense optimizer {cfg.dense_optimizer!r}")
    if cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def default_lookup(tables: Dict[str, jnp.ndarray], ids: Dict[str, jnp.ndarray]):
    """Local (unsharded / GSPMD-partitioned) gather."""
    return {name: gather(tables[name], t_ids) for name, t_ids in ids.items()}


def pallas_lookup(tables: Dict[str, jnp.ndarray], ids: Dict[str, jnp.ndarray]):
    """Fused Pallas row-gather (kernels/gather_pallas.py)."""
    from tfrec_tpu.kernels.gather_pallas import gather_pallas

    return {name: gather_pallas(tables[name], t_ids) for name, t_ids in ids.items()}


class TrainStepBuilder:
    """Builds the pure step function for a (model, loss, optimizers) triple.

    ``lookup_fn``/``scatter_hook`` are the seams where the sharded embedding
    subsystem (explicit all-to-all path) plugs in without touching models.
    """

    def __init__(
        self,
        model: RecModel,
        loss_name: str,
        optim_cfg: OptimConfig,
        *,
        l2_reg: float = 0.0,
        lookup_fn: LookupFn | None = None,
        kernels: str = "xla",
        seed: int = 0,
        device_negatives: bool = False,
        num_items: int = 0,
        group_dedup: bool = False,
    ):
        self.base_rng = jax.random.PRNGKey(seed)
        # Duplicate-id combine strategy across same-shaped tables, all
        # bit-identical (tests/test_sparse_optim.py):
        #   False      — per table (26 sorts). The measured default.
        #   True       — ONE batched [F, N] argsort
        #     (combine_duplicate_ids_grouped). Measured SLOWER on v5e:
        #     XLA lowers the batched sort as F sequential minor-dim
        #     sorts, so it saves nothing and adds stack/gather traffic
        #     (step_ablate + step_dedup_grouped, docs/PERF.md).
        #   "flat"     — ONE flat keyed sort over disjoint per-table key
        #     ranges (combine_duplicate_ids_multi): statically sliceable
        #     blocks, one sort/gather/segsum/scatter total.
        self.group_dedup = group_dedup
        if device_negatives and loss_name not in ("bpr", "hinge"):
            raise ValueError(
                "device_negatives supports single-negative pairwise losses "
                f"(bpr/hinge), not {loss_name!r}"
            )
        # Device-side negative sampling: (user, pos)-only batches get their
        # "neg" column drawn uniformly on device per step (no host sampler
        # in the pipeline; no train-positive exclusion — the standard
        # large-catalog approximation).
        self.device_negatives = device_negatives
        self.num_items = num_items
        self.model = model
        self.loss_fn = make_loss(loss_name)
        self.optim_cfg = optim_cfg
        self.l2_reg = l2_reg
        if lookup_fn is None:
            lookup_fn = pallas_lookup if kernels == "pallas" else default_lookup
        self.lookup_fn = lookup_fn
        self.kernels = kernels
        self.dense_tx = make_dense_tx(optim_cfg)
        self.sparse_opt: SparseOptimizer = make_sparse_optimizer(
            optim_cfg.sparse_optimizer,
            adagrad_init=optim_cfg.adagrad_init,
            adam_b1=optim_cfg.adam_b1,
            adam_b2=optim_cfg.adam_b2,
            eps=optim_cfg.eps,
        )
        self.sparse_lr = (
            optim_cfg.sparse_learning_rate
            if optim_cfg.sparse_learning_rate is not None
            else optim_cfg.learning_rate
        )
        self.sparse_schedule = make_schedule(optim_cfg, self.sparse_lr)

    def init_state(self, rng: jax.Array) -> State:
        params = self.model.init(rng)
        # Lane-packed tables (TableSpec.lane_groups > 1) keep per-group
        # rowwise optimizer state; the apply path infers the grouping
        # from the state shape.
        groups = self._lane_groups()
        return {
            "step": jnp.zeros((), jnp.int32),
            "tables": params["tables"],
            "dense": params["dense"],
            "sparse_opt": {
                name: self.sparse_opt.init(t, lane_groups=groups.get(name, 1))
                for name, t in params["tables"].items()
            },
            "dense_opt": self.dense_tx.init(params["dense"]),
        }

    # ---- seams the sharded subsystem overrides (tfrec_tpu/parallel/step.py) ----

    def lookup(
        self, tables: Dict[str, jnp.ndarray], ids: Dict[str, jnp.ndarray],
        want_route: bool = False,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Returns (gathered rows per table, aux metrics e.g. overflow).

        ``want_route``: the caller is a train step that will run the
        gradient-combine transpose in the SAME program — a sharded builder
        may then return its per-table exchange route under aux["_route"]
        for the update half to reuse (route reuse, parallel/embedding.py).
        The local gather has no route; the flag is ignored here."""
        return self.lookup_fn(tables, ids), {}

    def sparse_update(self, name: str, table, opt_state, ids, grads, lr,
                      order=None):
        """One table's sparse-optimizer application. Returns (table, state).

        ``order``: host-computed stable argsort of ``ids`` (train.
        host_dedup) — the duplicate combine then skips its device argsort,
        the step's most expensive sparse-path op."""
        if (
            self._lane_groups().get(name, 1) > 1
            and self.sparse_opt.name == "rowwise_adam"
        ):
            # Grouped adam needs the per-id slot signal for its touch
            # mask; it bypasses the host-order and fused-kernel paths
            # (its internal combine carries the one-hot touch channel).
            return self.sparse_opt.apply(
                table, opt_state, ids, grads, lr,
                slots=self._slots_for(name, ids.shape[0]),
            )
        if order is not None or self._fused_scatter_ok(table, name):
            from tfrec_tpu.ops.embedding import combine_duplicate_ids

            uids, g = combine_duplicate_ids(
                ids, grads, sentinel=table.shape[0], order=order
            )
            return self.sparse_update_deduped(name, table, opt_state, uids, g, lr)
        return self.sparse_opt.apply(table, opt_state, ids, grads, lr)

    def _slots_for(self, name: str, n_ids: int):
        """Per-position lane-group slots of a lane-packed table's flat id
        vector ([n_ids] int32; None for unpacked tables). Built from an
        iota + tiny static boundaries — never a baked [n_ids] constant
        (jit closure constants over big arrays bloat the executable)."""
        widths_fn = getattr(self.model, "lane_slot_widths", None)
        widths = widths_fn(name) if widths_fn is not None else None
        if widths is None:
            return None
        import numpy as np

        total = sum(widths)
        b = n_ids // total
        assert b * total == n_ids, (name, n_ids, widths)
        bounds = np.cumsum([w * b for w in widths[:-1]]).astype(np.int32)
        pos = jnp.arange(n_ids, dtype=jnp.int32)
        # count of bounds <= pos == searchsorted(bounds, pos, 'right'),
        # vectorized over the tiny static bounds (searchsorted lowers to
        # a while-loop on XLA:TPU — docs/PERF.md round-4 trace).
        return jnp.sum(
            pos[:, None] >= jnp.asarray(bounds)[None, :], axis=1
        ).astype(jnp.int32)

    def _fused_scatter_ok(self, table, name: str = "") -> bool:
        from tfrec_tpu.ops.sparse_optim import fused_adagrad_gate

        return fused_adagrad_gate(
            table.shape[0], table.shape[1], kernels=self.kernels,
            opt_name=self.sparse_opt.name,
            lane_grouped=self._lane_groups().get(name, 1) > 1,
        )

    def _lane_groups(self):
        if not hasattr(self, "_lane_groups_cache"):
            self._lane_groups_cache = {
                s.name: s.lane_groups for s in self.model.table_specs()
            }
        return self._lane_groups_cache

    def _fused_apply(self, table, opt_state, uids, g, lr):
        # Fused single-pass RMW kernel (kernels/scatter_pallas.py);
        # duplicate combine stays in XLA (sort + segment-sum).
        from tfrec_tpu.kernels.scatter_pallas import fused_rowwise_adagrad

        new_table, new_acc = fused_rowwise_adagrad(
            table, opt_state["acc"], uids, g, lr, self.sparse_opt.eps
        )
        return new_table, {"acc": new_acc}

    def sparse_update_deduped(self, name: str, table, opt_state, uids, g, lr):
        """Post-combine half of ``sparse_update`` (uids/g already deduped)."""
        if self._fused_scatter_ok(table, name):
            return self._fused_apply(table, opt_state, uids, g, lr)
        return self.sparse_opt.apply_deduped(table, opt_state, uids, g, lr)

    def sparse_update_all(self, state: State, ids, gathered_grad, lr,
                          host_sort=None, route=None):
        """Apply the sparse optimizer to every table.

        ``route``: per-table exchange routes from the same step's lookup
        (aux["_route"]) — only the sharded builder produces/consumes them;
        here it is always None (the local path has no exchange).

        ``group_dedup`` selects how same-shaped tables share the
        duplicate-id combine (see __init__; per-table is the measured
        default). Grouped/flat modes fall back to the per-table
        ``sparse_update`` seam for 1-table groups and non-flat id shapes;
        the optimizer trio is always per table. ``host_sort``: per-table
        host-computed argsort arrays (train.host_dedup), honored on the
        per-table path only.
        """
        new_tables = dict(state["tables"])
        new_sparse = dict(state["sparse_opt"])
        host_sort = host_sort or {}

        def per_table(name):
            kw = {}
            if route is not None and route.get(name) is not None:
                # Only a sharded builder ever produces routes, and its
                # sparse_update accepts the kwarg; the base signature
                # stays lean for the local path.
                kw["route"] = route[name]
            new_tables[name], new_sparse[name] = self.sparse_update(
                name, state["tables"][name], state["sparse_opt"][name],
                ids[name], gathered_grad[name], lr,
                order=host_sort.get(name), **kw,
            )

        if not self.group_dedup:
            for name in gathered_grad:
                per_table(name)
            return new_tables, new_sparse

        groups: Dict[tuple, list] = {}
        for name in gathered_grad:
            if ids[name].ndim != 1 or (
                self._lane_groups().get(name, 1) > 1
                and self.sparse_opt.name == "rowwise_adam"
            ):
                # Grouped/flat combine hands sparse_update_deduped bare
                # (uids, grads) with no slot signal; lane-packed
                # rowwise_adam needs per-key slots for its [V, G] touch
                # mask — the per-table seam derives them (review finding:
                # before this guard the combination crashed at trace
                # time; pre-round-4 it was unbuildable).
                per_table(name)
                continue
            key = (ids[name].shape, str(ids[name].dtype), gathered_grad[name].shape)
            groups.setdefault(key, []).append(name)
        for members in groups.values():
            if len(members) == 1:
                per_table(members[0])
                continue
            sentinels = [state["tables"][n].shape[0] for n in members]
            if self.group_dedup == "flat":
                from tfrec_tpu.ops.embedding import combine_duplicate_ids_multi

                uids, comb = combine_duplicate_ids_multi(
                    [ids[n] for n in members],
                    [gathered_grad[n] for n in members], sentinels,
                )
            else:
                from tfrec_tpu.ops.embedding import combine_duplicate_ids_grouped

                ids_st = jnp.stack([ids[n] for n in members])
                g_st = jnp.stack([gathered_grad[n] for n in members])
                uids, comb = combine_duplicate_ids_grouped(ids_st, g_st, sentinels)
            for i, name in enumerate(members):
                new_tables[name], new_sparse[name] = self.sparse_update_deduped(
                    name, state["tables"][name], state["sparse_opt"][name],
                    uids[i], comb[i], lr,
                )
        return new_tables, new_sparse

    def step(self, state: State, batch: Dict[str, jnp.ndarray]) -> Tuple[State, Dict]:
        model, loss_fn = self.model, self.loss_fn
        # Per-step rng (dropout + device negatives), identical on every
        # host/device (SPMD).
        step_rng = jax.random.fold_in(self.base_rng, state["step"])
        if (
            self.device_negatives
            and "pos" in batch
            and "neg" not in batch
            and "negs" not in batch
        ):
            neg_rng, step_rng = jax.random.split(step_rng)
            batch = dict(batch)
            batch["neg"] = jax.random.randint(
                neg_rng, batch["pos"].shape, 0, self.num_items, dtype=jnp.int32
            )
        # Host-precomputed dedup sorts (train.host_dedup): "_sort_<table>"
        # batch keys carry the stable argsort of that table's ids; the
        # sparse update skips its device argsort. Split off before the
        # model sees the batch.
        host_sort = {
            k[len("_sort_"):]: v for k, v in batch.items()
            if k.startswith("_sort_")
        }
        if host_sort:
            batch = {k: v for k, v in batch.items()
                     if not k.startswith("_sort_")}
        with jax.named_scope("embedding_lookup"):
            ids = model.lookup_ids(batch)
            gathered, aux = self.lookup(state["tables"], ids, want_route=True)
        # Route reuse (sharded builder): the lookup's exchange route rides
        # aux to the update half; it is never a metric.
        route = aux.pop("_route", None)

        def objective(dense_params, g):
            logits = model.forward(dense_params, g, batch, rng=step_rng)
            loss = loss_fn(logits, batch)
            if self.l2_reg > 0:
                reg = sum(jnp.sum(v * v) for v in g.values())
                reg = reg + sum(
                    jnp.sum(p * p) for p in jax.tree_util.tree_leaves(dense_params)
                )
                # First leaf's leading dim is the batch size for every
                # forward output shape (vector, [B,K] matrix, or the
                # dict outputs of ELBO-style models).
                bsz = jax.tree_util.tree_leaves(logits)[0].shape[0]
                loss = loss + self.l2_reg * reg / bsz
            return loss

        with jax.named_scope("forward_backward"):
            loss, (dense_grad, gathered_grad) = jax.value_and_grad(
                objective, argnums=(0, 1)
            )(state["dense"], gathered)

        with jax.named_scope("dense_update"):
            updates, new_dense_opt = self.dense_tx.update(
                dense_grad, state["dense_opt"], state["dense"]
            )
            new_dense = optax.apply_updates(state["dense"], updates)

        sparse_lr_t = self.sparse_schedule(state["step"])
        with jax.named_scope("sparse_update"):
            new_tables, new_sparse = self.sparse_update_all(
                state, ids, gathered_grad, sparse_lr_t,
                host_sort=host_sort or None, route=route,
            )

        new_state = {
            "step": state["step"] + 1,
            "tables": new_tables,
            "dense": new_dense,
            "sparse_opt": new_sparse,
            "dense_opt": new_dense_opt,
        }
        return new_state, {"loss": loss, **aux}

    def multi_step(self, state: State, batches: Dict[str, jnp.ndarray]):
        """K steps in ONE XLA program: ``batches`` leaves carry a leading
        [K] axis and ``lax.scan`` drives the device-side loop — the
        standard TPU "multiple steps per host dispatch" pattern, amortizing
        host dispatch latency K-fold (train.steps_per_dispatch). Returns
        the final state and the last step's metrics plus the mean loss.
        """

        def body(st, batch):
            return self.step(st, batch)

        state, stacked = jax.lax.scan(body, state, batches)
        out = {k: v[-1] for k, v in stacked.items()}
        out["loss_mean"] = jnp.mean(stacked["loss"])
        if "lookup_overflow" in stacked:
            # SUM across the K steps: overflow is a loudness counter —
            # keeping only step K-1's count hid a2a capacity drops in
            # steps 0..K-2 of each dispatch (review finding, round 4).
            out["lookup_overflow"] = jnp.sum(stacked["lookup_overflow"])
        return state, out


def init_state(
    model: RecModel, optim_cfg: OptimConfig, rng: jax.Array, **kw
) -> Tuple[TrainStepBuilder, State]:
    builder = TrainStepBuilder(model, kw.pop("loss", "bpr"), optim_cfg, **kw)
    return builder, builder.init_state(rng)
