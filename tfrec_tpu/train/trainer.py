"""Config-driven training driver: the TPU-native counterpart of the
reference family's per-model ``train_model()`` epoch loop (SURVEY.md §3a).

One Trainer serves the whole zoo. It wires: dataset/sampler construction,
the jitted generic step (train/step.py), periodic full-catalog retrieval or
AUC evaluation, JSONL metric logging, and checkpoint/resume.

Data-model pairings:
- interaction data + retrieval model (mf/gmf/mlp/neumf): PairwiseSampler for
  pairwise losses (bpr/hinge), PointwiseSampler for logloss; eval is
  full-catalog recall/NDCG/... with train items masked.
- interaction data + CTR model (fm/...): pointwise samples are presented as
  2-field categorical batches (cat = [user, item]); eval adds AUC and, for
  FM, full-catalog retrieval via its MF-form score_all.
- CTR data (synthetic_ctr / criteo TSV) + CTR model: shuffled fixed-shape
  batches; eval is AUC + logloss on the held-out slice.
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.configs import Config
from tfrec_tpu.data.dataset import build_dataset
from tfrec_tpu.data.samplers import CTRBatcher, PairwiseSampler, PointwiseSampler
from tfrec_tpu.data.synthetic import synthetic_ctr
from tfrec_tpu.eval.metrics import auc as auc_metric
from tfrec_tpu.eval.metrics import logloss as logloss_metric
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.losses import (
    IN_BATCH_LOSSES, MULTI_NEG_LOSSES, PAIRWISE_LOSSES,
)
from tfrec_tpu.train.step import TrainStepBuilder
from tfrec_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from tfrec_tpu.utils.logging import MetricLogger
from tfrec_tpu.utils.prefetch import prefetch

CTR_MODELS = ("fm", "dcn", "dcnv2", "deepfm", "nfm", "widedeep", "dlrm")


def _criteo_vocabs(sizes) -> tuple:
    """Criteo needs exactly 26 per-field vocab sizes; a single value is an
    explicit broadcast, anything else is a config error (silently
    broadcasting the first value would corrupt model capacity)."""
    from tfrec_tpu.data.criteo import NUM_CATEGORICAL

    sizes = tuple(sizes)
    if len(sizes) == 1:
        return sizes * NUM_CATEGORICAL
    if len(sizes) != NUM_CATEGORICAL:
        raise ValueError(
            f"criteo needs 1 or {NUM_CATEGORICAL} categorical_vocab_sizes, "
            f"got {len(sizes)}"
        )
    return sizes


INTERACTION_SOURCES = ("movielens", "synthetic_implicit")
CTR_SOURCES = ("criteo", "synthetic_ctr")


class Trainer:
    def __init__(self, config: Config, quiet: bool = False,
                 log_metrics: bool = True):
        """``log_metrics=False`` keeps this construction out of the run's
        on-disk metric stream (serve.Recommender.from_checkpoint rebuilds
        a Trainer just to restore state — appending a second run_config
        there would corrupt the original stream for log consumers)."""
        self.config = config
        c = config
        self.is_ctr_model = c.model.name.lower() in CTR_MODELS
        # ALWAYS set (None restores jax's own default): the flag is
        # process-global, so a previous Trainer's non-default precision
        # would silently leak into this run (review finding, round 4).
        jax.config.update(
            "jax_default_matmul_precision",
            None if c.train.matmul_precision == "default"
            else c.train.matmul_precision,
        )
        self.logger = MetricLogger(
            c.run_name,
            out_dir=c.train.checkpoint_dir if log_metrics else None,
            quiet=quiet,
        )
        # Full run config as the stream's first record (SURVEY.md §5:
        # "run config dumped alongside") — runs stay reproducible from
        # their own logs.
        import dataclasses as _dc

        self.logger.log({"event": "run_config", "config": _dc.asdict(c)})

        # ---- data ----
        self.stream = None
        if c.data.source in INTERACTION_SOURCES:
            self.dataset = build_dataset(c.data)
            nu, ni = self.dataset.num_users, self.dataset.num_items
            self.user_side = self.item_side = None
            if self.is_ctr_model:
                side_vocabs = self._load_side_features(nu, ni)
                self.data_spec = DataSpec.ctr((nu, ni) + side_vocabs, num_dense=0)
            else:
                self.data_spec = DataSpec.interaction(nu, ni)
            self.ctr_arrays = None
        elif c.data.source in CTR_SOURCES:
            if c.data.source == "criteo" and c.data.streaming:
                from tfrec_tpu.data.criteo import NUM_CATEGORICAL, CriteoStreamBatcher

                vocabs = _criteo_vocabs(c.data.categorical_vocab_sizes)
                # Multi-process: each process streams its own round-robin
                # stripe of per-process-sized batches (disjoint examples,
                # equal step counts — collective-safe).
                n_proc = jax.process_count()
                if c.train.batch_size % max(n_proc, 1) != 0:
                    raise ValueError(
                        f"batch_size={c.train.batch_size} must divide by "
                        f"process count {n_proc} for streaming"
                    )
                self.stream = CriteoStreamBatcher(
                    c.data.path, c.train.batch_size // max(n_proc, 1), vocabs,
                    eval_examples=c.data.eval_examples,
                    max_examples=c.data.num_examples or None,
                    num_shards=max(n_proc, 1),
                    shard_index=jax.process_index(),
                )
                dense, cat, label = self.stream.eval_arrays()
                self.ctr_arrays = {"train": None, "test": (dense, cat, label)}
                self.dataset = None
                self.data_spec = DataSpec.ctr(vocabs, num_dense=dense.shape[1])
                if not self.is_ctr_model:
                    raise ValueError(
                        f"model {c.model.name!r} needs interaction data"
                    )
            elif c.data.source == "synthetic_ctr":
                dense, cat, label = synthetic_ctr(
                    c.data.num_examples,
                    num_dense=c.data.num_dense_features,
                    vocab_sizes=c.data.categorical_vocab_sizes,
                    seed=c.data.seed,
                    field_widths=c.data.categorical_field_widths or None,
                )
                vocabs = tuple(c.data.categorical_vocab_sizes)
            else:
                from tfrec_tpu.data.criteo import load_criteo

                vocabs = _criteo_vocabs(c.data.categorical_vocab_sizes)
                dense, cat, label = load_criteo(
                    c.data.path, vocabs, max_examples=c.data.num_examples or None
                )
            if self.stream is None:
                n_test = int(len(label) * c.data.test_fraction)
                if n_test == 0 or n_test >= len(label):
                    raise ValueError(
                        f"test_fraction={c.data.test_fraction} with "
                        f"{len(label)} examples yields an empty train or "
                        "test split; adjust num_examples/test_fraction"
                    )
                self.ctr_arrays = {
                    "train": (dense[:-n_test], cat[:-n_test], label[:-n_test]),
                    "test": (dense[-n_test:], cat[-n_test:], label[-n_test:]),
                }
                self.dataset = None
                self.data_spec = DataSpec.ctr(
                    vocabs, num_dense=dense.shape[1],
                    field_widths=c.data.categorical_field_widths or None,
                )
            if not self.is_ctr_model:
                raise ValueError(
                    f"model {c.model.name!r} needs interaction data, got {c.data.source!r}"
                )
        else:
            raise ValueError(f"unknown data source {c.data.source!r}")

        # ---- model + step ----
        # Same predicate as the mesh-path selection below: auto lane
        # packing must know whether tables shard (AUTO keeps mesh runs
        # unpacked — measured 0.87-0.90x, exp_mesh_ab) and the PER-CHIP
        # batch (the >=32k sort-cost rule — lane_pack_applies).
        will_shard = c.mesh.data_axis_size != 0 and (
            jax.device_count() > 1 or c.mesh.table_axis_size > 1
        )
        n_data = 1
        if will_shard:
            n_data = (
                c.mesh.data_axis_size if c.mesh.data_axis_size > 0
                else max(
                    jax.device_count() // max(c.mesh.table_axis_size, 1), 1
                )
            )
        model_cfg = c.model
        if (
            model_cfg.lane_pack is None
            and c.train.resume
            and c.train.checkpoint_dir
        ):
            # AUTO lane packing is resolved from ambient state (device
            # count, batch size) but checkpoints store layout-specific
            # table names: a resume or from_checkpoint on a different
            # topology must honor the SAVED layout over re-derivation
            # (ADVICE r3) or restore fails on the missing table files.
            from tfrec_tpu.utils.checkpoint import checkpoint_table_layout

            saved_layout = checkpoint_table_layout(c.train.checkpoint_dir)
            if saved_layout is not None:
                model_cfg = _dc.replace(model_cfg, lane_pack=saved_layout)
                self.logger.log({
                    "event": "lane_pack_from_checkpoint",
                    "lane_pack": saved_layout,
                })
        self.model = build_model(model_cfg, self.data_spec,
                                 backend=c.train.kernels,
                                 sharded_tables=will_shard,
                                 batch_size=max(c.train.batch_size // n_data, 1))
        loss = c.train.loss
        if self.is_ctr_model and loss in PAIRWISE_LOSSES:
            self.logger.log({
                "event": "loss_coerced",
                "from": loss, "to": "logloss",
                "reason": "CTR models train pointwise",
            })
            loss = "logloss"
        # History-conditioned long-tail models: attach the train-history
        # matrix for eval scoring, and coerce incompatible losses loudly.
        if getattr(self.model, "needs_graph", lambda: False)():
            # Graph models (LightGCN) propagate over the TRAIN bipartite
            # graph; attach its edge lists once.
            self.model.attach_graph(self.dataset.train.users,
                                    self.dataset.train.items)
        self.needs_history = bool(
            getattr(self.model, "needs_history", lambda: False)()
        )
        if self.needs_history:
            if getattr(self.model, "ordered_history", False):
                # Sequential models need the TIME-ORDERED train sequence.
                # Eval encodes max_history - 1 positions — the trained
                # receptive field: training encodes seq[:, :-1], so
                # length-indexed params at index L-1 (pos_emb, vertical
                # filter lags) never receive gradients and must not be
                # read at scoring time.
                from tfrec_tpu.data.samplers import build_sequences

                hist, lens = build_sequences(
                    self.dataset, max(c.model.max_history - 1, 1),
                    seed=c.train.seed,
                )
            else:
                from tfrec_tpu.data.samplers import build_history

                hist, lens = build_history(
                    self.dataset, c.model.max_history, seed=c.train.seed
                )
            self.model.attach_history(hist, lens)
            # Reconstruction/sequential models carry their own objective;
            # the item-similarity family (fism/nais) trains pairwise.
            want = {"multvae": "multvae", "multdae": "multvae",
                    "cdae": "cdae", "sasrec": "sasrec",
                    "gru4rec": "sasrec", "caser": "sasrec",
                    "fpmc": "sasrec"}.get(c.model.name.lower())
            if want and loss != want:
                self.logger.log({
                    "event": "loss_coerced", "from": loss, "to": want,
                    "reason": f"{c.model.name} trains on its own "
                              "reconstruction objective",
                })
                loss = want
            elif want is None and loss not in ("bpr", "hinge"):
                self.logger.log({
                    "event": "loss_coerced", "from": loss, "to": "bpr",
                    "reason": "item-similarity models train "
                              "single-negative pairwise",
                })
                loss = "bpr"
        if c.model.name.lower() == "sbpr" and loss != "sbpr":
            self.logger.log({
                "event": "loss_coerced", "from": loss, "to": "sbpr",
                "reason": "sbpr trains on social triples",
            })
            loss = "sbpr"
        if c.model.name.lower() == "apr" and loss != "apr":
            self.logger.log({
                "event": "loss_coerced", "from": loss, "to": "apr",
                "reason": "apr trains on the adversarial objective",
            })
            loss = "apr"
        if c.model.name.lower() == "irgan" and loss != "irgan":
            self.logger.log({
                "event": "loss_coerced", "from": loss, "to": "irgan",
                "reason": "irgan trains on the minimax objective",
            })
            loss = "irgan"
        # Closed-form path: models exposing ``make_solver`` (WRMF's ALS
        # sweeps, EASE's one-shot ridge solve) train without SGD — no
        # sampler, no step builder, no mesh (the solves are whole-table
        # computations; replicated on multi-device).
        self.solver = None
        make_solver = getattr(self.model, "make_solver", None)
        if make_solver is not None:
            if c.train.neg_sampling != "uniform":
                # The closed-form path has no sampler at all; a silently
                # dead knob would read as "trained with popularity".
                raise ValueError(
                    f"train.neg_sampling={c.train.neg_sampling!r} has no "
                    f"effect on closed-form models ({c.model.name})"
                )
            want = self.model.solver_loss_name
            if loss != want:
                self.logger.log({
                    "event": "loss_coerced", "from": loss, "to": want,
                    "reason": f"{c.model.name} trains closed-form "
                              "(solver sweeps, not SGD)",
                })
            loss = want
        self.loss_name = loss
        # Mesh path: sharded tables + explicit collectives whenever more
        # than one device is visible (or a table axis is requested).
        self.mesh = None
        if make_solver is not None:
            if c.mesh.row_permute:
                raise ValueError(
                    "mesh.row_permute applies to sharded-table SGD runs; "
                    "closed-form solvers keep replicated tables"
                )
            self.builder = None
            self.jit_step = None
            # Solvers that parallelize (ALS row solves) get a data mesh;
            # Trainer.mesh itself stays None (eval reads replicated
            # tables — solver outputs are replicated by construction).
            solver_mesh = None
            if c.mesh.data_axis_size != 0 and jax.device_count() > 1:
                from tfrec_tpu.parallel.mesh import make_mesh

                solver_mesh = make_mesh(c.mesh.data_axis_size, 1)
            self.solver = make_solver(
                self.dataset, batch=min(c.train.batch_size, 4096),
                seed=c.train.seed, mesh=solver_mesh,
            )
            self.state = {
                "step": jnp.zeros((), jnp.int32),
                "tables": dict(self.solver.tables()),
                "dense": {},
            }
            self.start_epoch = 0
            if c.train.resume and c.train.checkpoint_dir:
                step = latest_step(c.train.checkpoint_dir)
                if step is not None:
                    self.state = restore_checkpoint(
                        c.train.checkpoint_dir, self.state
                    )
                    self.solver.load(self.state["tables"])
                    self.start_epoch = step
                    self.logger.log({"event": "resumed", "epoch": step})
        elif c.mesh.data_axis_size != 0 and (
            jax.device_count() > 1 or c.mesh.table_axis_size > 1
        ):
            from tfrec_tpu.parallel.mesh import make_mesh
            from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

            self.mesh = make_mesh(c.mesh.data_axis_size, c.mesh.table_axis_size)
            n_data = self.mesh.shape["data"]
            if c.train.batch_size % n_data != 0:
                raise ValueError(
                    f"train.batch_size={c.train.batch_size} must be divisible "
                    f"by the data mesh axis ({n_data} devices); use e.g. "
                    f"{(c.train.batch_size // n_data + 1) * n_data}, or force "
                    "the single-device path with mesh.data_axis_size=0"
                )
            self.builder = ShardedTrainStepBuilder(
                self.model, loss, c.optim, self.mesh, c.mesh,
                l2_reg=c.model.l2_reg, kernels=c.train.kernels, seed=c.train.seed,
                device_negatives=self._use_device_negs(loss),
                num_items=getattr(self.dataset, "num_items", 0),
            )
            self.jit_step = None  # compiled lazily against the first batch
        else:
            if c.mesh.row_permute:
                # The single-device path has no sharded planners: the flag
                # would be silently inert AND the run's checkpoints would
                # record row_permute=False, confusing a later mesh resume
                # (review finding, round 5). Refuse loudly.
                raise ValueError(
                    "mesh.row_permute requires the sharded (mesh) path; "
                    "this run resolved to the single-device builder — "
                    "drop the flag or run on a mesh"
                )
            self.builder = TrainStepBuilder(
                self.model, loss, c.optim,
                l2_reg=c.model.l2_reg, kernels=c.train.kernels, seed=c.train.seed,
                device_negatives=self._use_device_negs(loss),
                num_items=getattr(self.dataset, "num_items", 0),
            )
            self.jit_step = None  # compiled lazily (single- or multi-step)
        if self.solver is None:
            self.state = self.builder.init_state(jax.random.PRNGKey(c.train.seed))
            self.start_epoch = 0
            if c.train.resume and c.train.checkpoint_dir:
                step = latest_step(c.train.checkpoint_dir)
                if step is not None:
                    self.state = restore_checkpoint(
                        c.train.checkpoint_dir, self.state,
                        expect_row_permute=self._row_permute_active(),
                        expect_row_permute_shards=(
                            self.mesh.shape["data"]
                            if self._row_permute_active() else None
                        ),
                    )
                    self.start_epoch = step
                    self.logger.log({"event": "resumed", "epoch": step})

        # ---- warm start (reference-family pretraining protocol) ----
        if c.train.init_from:
            if self.start_epoch == 0:
                self._warm_start(c.train.init_from)
            else:
                self.logger.log({
                    "event": "warm_start_skipped",
                    "reason": "resume restored this run's checkpoint "
                              "(resume wins over init_from)",
                })

        # ---- sampler + profiler ----
        self.sampler = None if self.solver is not None else self._make_sampler()
        from tfrec_tpu.utils.profile import StepProfiler

        self.profiler = StepProfiler(c.train.profile_steps)
        self.global_step = 0
        self._es_best = None   # early-stopping monitor state
        self._es_stall = 0
        # Compile-once eval caches.
        self._retrieval_eval = None
        self._fwd_jit = None

    def _warm_start(self, ckpt_dir: str) -> None:
        """Copy matching embedding tables from another run's checkpoint
        (train.init_from) — NeuMF-from-GMF / APR/IRGAN-from-BPR
        pretraining. Mapping: the model's warm_start_aliases() first,
        then same-name; rows beyond the source vocab keep their fresh
        init; shape mismatches and absent sources are skipped LOUDLY in
        the warm_start log event. Copying nothing is an error (a silent
        no-op warm start would be mistaken for the paper protocol)."""
        from tfrec_tpu.utils.checkpoint import (
            checkpoint_row_permute, load_table_arrays,
        )

        if checkpoint_row_permute(ckpt_dir):
            # The source tables are in a device-count-dependent physical
            # row order; copying them as logical rows would scramble every
            # embedding (round-5 review finding — same class as the
            # restore guard). Refusing beats silent corruption.
            raise ValueError(
                f"init_from checkpoint {ckpt_dir!r} was saved with "
                "mesh.row_permute=True; warm starting from a permuted "
                "physical layout is not supported — export/de-permute it "
                "first (e.g. resume it and save with row_permute off)"
            )
        src_tables = load_table_arrays(ckpt_dir)
        aliases = getattr(self.model, "warm_start_aliases", dict)()
        copied, skipped = [], []
        tables = dict(self.state["tables"])
        plans = getattr(self.builder, "plans", {})
        for name, tbl in tables.items():
            s_name = aliases.get(name, name)
            if s_name not in src_tables:
                skipped.append([name, f"no source table {s_name!r}"])
                continue
            arr = src_tables[s_name]
            if arr.ndim != tbl.ndim or tuple(arr.shape[1:]) != tuple(tbl.shape[1:]):
                skipped.append(
                    [name, f"shape {list(arr.shape)} vs {list(tbl.shape)}"]
                )
                continue
            rows = min(arr.shape[0], tbl.shape[0])
            plan = plans.get(name)
            if getattr(plan, "permute", False):
                # This run's table lives in the permuted physical layout:
                # scatter logical source row i to physical perm_rows()[i].
                perm = plan.perm_rows()[:rows]
                tables[name] = jax.jit(
                    lambda t, a, p: t.at[p].set(a),
                    out_shardings=getattr(tbl, "sharding", None),
                )(tbl, jnp.asarray(arr[:rows]), perm)
            else:
                tables[name] = jax.jit(
                    lambda t, a, r=rows: t.at[:r].set(a),
                    out_shardings=getattr(tbl, "sharding", None),
                )(tbl, jnp.asarray(arr[:rows]))
            if rows < arr.shape[0]:
                # Source has MORE rows (larger vocab or mesh padding):
                # record the truncation explicitly — a wrong checkpoint/
                # dataset pairing must never look like a clean copy.
                copied.append([name, f"first {rows} of {arr.shape[0]} source rows"])
            else:
                copied.append(name)
        self.state = {**self.state, "tables": tables}
        if self.solver is not None:
            self.solver.load(self.state["tables"])
        self.logger.log({
            "event": "warm_start", "from": ckpt_dir,
            "copied": sorted(copied, key=str), "skipped": skipped,
        })
        if not copied:
            raise ValueError(
                f"warm start from {ckpt_dir!r} copied no tables "
                f"(skipped: {skipped}); check warm_start_aliases / dims"
            )

    def _use_device_negs(self, loss: str) -> bool:
        return (
            self.config.train.device_negatives
            and self.dataset is not None
            and loss in ("bpr", "hinge")
        )

    def _load_side_features(self, nu: int, ni: int):
        """Per-user/per-item categorical side features for multi-field CTR
        models over interaction data (BASELINE.json:8 'multi-field'). Returns
        the tuple of side-field vocab sizes; fills self.user_side [U, Fu] /
        self.item_side [V, Fi] int32 arrays (or leaves them None)."""
        c = self.config
        vocabs: tuple = ()
        if c.data.user_features_path:
            from tfrec_tpu.data.movielens import load_ml1m_user_features

            feats, fv = load_ml1m_user_features(c.data.user_features_path)
            # Raw ids here must match the dataset's raw->dense mapping only
            # approximately; unmatched users get field value 0.
            arr = np.zeros((nu, len(fv)), np.int32)
            for raw, vec in feats.items():
                if raw - 1 < nu:  # ml-1m raw ids are 1-based and dense
                    arr[raw - 1] = vec
            self.user_side = arr
            vocabs += fv
        if c.data.item_features_path:
            from tfrec_tpu.data.movielens import load_ml1m_item_genres

            genres, n_genres = load_ml1m_item_genres(c.data.item_features_path)
            arr = np.zeros((ni, 1), np.int32)
            for raw, g in genres.items():
                if raw - 1 < ni:
                    arr[raw - 1, 0] = g
            self.item_side = arr
            vocabs += (n_genres,)
        if c.data.synthetic_side_features and not vocabs:
            rng = np.random.default_rng(c.data.seed + 11)
            side_vocabs_u = (2, 7, 21)  # gender, age bucket, occupation
            self.user_side = np.stack(
                [rng.integers(0, v, nu) for v in side_vocabs_u], axis=1
            ).astype(np.int32)
            self.item_side = rng.integers(0, 18, (ni, 1)).astype(np.int32)
            vocabs = side_vocabs_u + (18,)
        return vocabs

    def _make_sampler(self):
        """Multi-process (SURVEY.md §3b): every process samples its own
        1/num_processes slice of each global batch (seed folded with the
        process index), and _to_device_batch assembles the global array
        from process-local shards."""
        c = self.config
        n_proc = jax.process_count()
        local_bs = c.train.batch_size // n_proc
        assert local_bs * n_proc == c.train.batch_size, (
            c.train.batch_size, n_proc,
        )
        seed = c.train.seed * max(n_proc, 1) + jax.process_index()
        if c.train.neg_sampling != "uniform" and (
            self.dataset is None
            or self.loss_name in ("sasrec", "sbpr", "multvae", "cdae")
        ):
            # The knob only reaches the pairwise/pointwise interaction
            # samplers; refusing here beats silently training uniform.
            raise ValueError(
                f"train.neg_sampling={c.train.neg_sampling!r} applies to "
                "the pairwise/pointwise interaction samplers, not the "
                f"{self.loss_name!r} data path"
            )
        if self.stream is not None:
            return self.stream  # already constructed per-process sharded
        if self.ctr_arrays is not None:
            dense, cat, label = self.ctr_arrays["train"]
            return CTRBatcher(dense, cat, label, local_bs, seed=seed)
        if self.loss_name == "sasrec":
            from tfrec_tpu.data.samplers import SequenceSampler

            return SequenceSampler(
                self.dataset, local_bs, c.model.max_history, seed,
                order_seed=c.train.seed,
            )
        if self.loss_name == "sbpr":
            from tfrec_tpu.data.samplers import SBPRSampler

            return SBPRSampler(self.dataset, local_bs, seed)
        if self.loss_name in ("multvae", "cdae"):
            from tfrec_tpu.data.samplers import UserHistorySampler

            return UserHistorySampler(
                self.dataset, local_bs, c.model.max_history, seed
            )
        neg_cdf = None
        if c.train.neg_sampling == "popularity":
            if self._use_device_negs(self.loss_name):
                raise ValueError(
                    "train.neg_sampling='popularity' is a host-sampler "
                    "proposal; device_negatives draws uniformly on device — "
                    "disable one of the two"
                )
            if self.loss_name in IN_BATCH_LOSSES:
                raise ValueError(
                    "train.neg_sampling='popularity' has no effect under "
                    f"{self.loss_name!r}: in-batch losses take negatives "
                    "from the batch's other positives, not from a sampler"
                )
            from tfrec_tpu.data.samplers import popularity_cdf

            neg_cdf = popularity_cdf(self.dataset, c.train.neg_sampling_beta)
        elif c.train.neg_sampling != "uniform":
            raise ValueError(
                f"unknown train.neg_sampling {c.train.neg_sampling!r}; "
                "options: uniform, popularity"
            )
        if self.loss_name in PAIRWISE_LOSSES:
            return PairwiseSampler(
                self.dataset, local_bs, c.train.num_negatives, seed,
                multi_neg=self.loss_name in MULTI_NEG_LOSSES,
                no_negatives=(
                    self.loss_name in IN_BATCH_LOSSES
                    or self._use_device_negs(self.loss_name)
                ),
                with_history=(c.model.max_history if self.needs_history else 0),
                neg_cdf=neg_cdf,
            )
        return PointwiseSampler(
            self.dataset, local_bs, max(c.train.num_negatives, 1), seed,
            neg_cdf=neg_cdf,
        )

    @property
    def _host_dedup_on(self) -> bool:
        return (
            self.config.train.host_dedup
            and self.is_ctr_model
            and self.mesh is None
            and not getattr(self.builder, "group_dedup", False)
        )

    def _host_batch(self, batch: Dict[str, np.ndarray],
                    train: bool = True) -> Dict[str, np.ndarray]:
        """Model-facing host batch (interaction -> CTR adapter applied)."""
        if self.is_ctr_model and self.ctr_arrays is None:
            # interaction pointwise sample -> multi-field categorical batch
            # [user, item, user-side fields..., item-side fields...]
            cols = [batch["user"][:, None], batch["item"][:, None]]
            if self.user_side is not None:
                cols.append(self.user_side[batch["user"]])
            if self.item_side is not None:
                cols.append(self.item_side[batch["item"]])
            batch = {
                "dense": np.zeros((len(batch["user"]), 0), np.float32),
                "cat": np.concatenate(cols, axis=1).astype(np.int32),
                "label": batch["label"],
            }
        if self._host_dedup_on and train:
            # Only the train step consumes "_sort_*" keys; eval forwards
            # would pay the host argsorts + transfer for dead arrays
            # (review finding, round 4).
            from tfrec_tpu.train.step import host_dedup_sorts

            batch = {**batch, **host_dedup_sorts(self.model, batch)}
        return batch

    def _device_put_batch(self, batch, stacked: bool = False):
        if self.mesh is not None:
            shardings = self.builder.batch_shardings(batch, stacked=stacked)
            if jax.process_count() > 1:
                return {
                    k: jax.make_array_from_process_local_data(
                        shardings[k], np.asarray(v)
                    )
                    for k, v in batch.items()
                }
            return {
                k: jax.device_put(jnp.asarray(v), shardings[k])
                for k, v in batch.items()
            }
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _to_device_batch(self, batch: Dict[str, np.ndarray],
                         train: bool = True) -> Dict[str, jnp.ndarray]:
        return self._device_put_batch(self._host_batch(batch, train=train))

    def _compile(self, dev_batch, stacked: bool = False):
        """jit the (multi-)step appropriate for this batch shape."""
        if self.mesh is not None:
            return self.builder.compile_step(self.state, dev_batch, stacked=stacked)
        fn = self.builder.multi_step if stacked else self.builder.step
        return jax.jit(fn, donate_argnums=(0,))

    @property
    def params(self):
        tables = (
            self.builder.unpadded_tables(self.state)
            if self.mesh is not None
            else self.state["tables"]
        )
        return {"tables": tables, "dense": self.state["dense"]}

    # ---- evaluation ----

    def evaluate(self) -> Dict[str, float]:
        c = self.config
        out: Dict[str, float] = {}
        if self.ctr_arrays is not None:
            dense, cat, label = self.ctr_arrays["test"]
            out.update(self._eval_ctr(dense, cat, label))
            return out
        if (
            c.train.eval_protocol == "sampled"
            and self.model.data_spec.kind == "interaction"
        ):
            if self._retrieval_eval is None:
                from tfrec_tpu.eval.sampled import SampledEvaluator

                sampled_eval = SampledEvaluator(
                    self.model, self.dataset, ks=tuple(c.train.eval_topk),
                    num_candidates=c.train.eval_num_candidates,
                    seed=c.train.seed + 13,
                    user_batch=c.train.eval_user_batch,
                )
                self._retrieval_eval = lambda: sampled_eval(self.params)
            out.update(self._retrieval_eval())
            if self.loss_name == "logloss" or self.is_ctr_model:
                out.update(self._eval_interaction_auc())
            return out
        # Interaction data: full-catalog ranking eval (compiled once).
        # On a mesh with a dot-product scorer, run the distributed top-k
        # directly on the live sharded tables (parallel/eval.py) — tables
        # are never re-replicated for eval.
        if self._retrieval_eval is None:
            if self.mesh is not None and self.model.dot_decomposition() is not None:
                from tfrec_tpu.parallel.eval import ShardedRetrievalEvaluator

                sharded = ShardedRetrievalEvaluator(
                    self.builder, self.model, self.dataset,
                    ks=tuple(c.train.eval_topk),
                    user_batch=c.train.eval_user_batch,
                )
                # Takes the live state — self.params would materialize
                # unpadded replicated tables, defeating the sharded path.
                self._retrieval_eval = lambda: sharded(self.state)
            else:
                try:
                    from tfrec_tpu.eval.retrieval import RetrievalEvaluator

                    full_eval = RetrievalEvaluator(
                        lambda p, u: self.model.score_all(p, u),
                        self.dataset,
                        ks=tuple(c.train.eval_topk),
                        user_batch=c.train.eval_user_batch,
                    )
                    self._retrieval_eval = lambda: full_eval(self.params)
                except NotImplementedError:
                    self._retrieval_eval = False
        if self._retrieval_eval:
            try:
                out.update(self._retrieval_eval())
            except NotImplementedError:
                self._retrieval_eval = False
        if self.loss_name == "logloss" or self.is_ctr_model:
            out.update(self._eval_interaction_auc())
        return out

    def _forward_fn(self):
        """Eval forward pass. On a mesh: jit with explicit shardings and the
        builder's sharded lookup seam (all-to-all on the live row shards) —
        tables are never re-replicated for eval."""
        if self._fwd_jit is None:

            def fwd(state, batch):
                ids = self.model.lookup_ids(batch)
                # The builder's lookup seam: on a mesh this is the explicit
                # all-to-all on the live row shards (state shardings are
                # carried by the arrays; GSPMD reshards the batch to the
                # shard_map's P('data') in_specs).
                gathered, aux = self.builder.lookup(state["tables"], ids)
                logits = self.model.forward(state["dense"], gathered, batch)
                return logits, aux.get("lookup_overflow", jnp.zeros((), jnp.int32))

            self._fwd_jit = jax.jit(fwd)
        return self._fwd_jit

    def _eval_rows(self) -> int:
        """Eval batches must split evenly over the data mesh axis."""
        return self.mesh.shape["data"] if self.mesh is not None else 1

    def _row_permute_active(self) -> bool:
        """Whether this run's tables live in the row-permuted physical
        layout (a checkpoint-layout fact — recorded at save, enforced at
        restore; the permutation is a function of device count)."""
        return bool(
            self.mesh is not None and self.config.mesh.row_permute
        )

    def _eval_ctr(self, dense, cat, label) -> Dict[str, float]:
        max_n = self.config.train.eval_ctr_max_rows
        n = min(len(label), max_n) if max_n > 0 else len(label)
        if n < len(label):
            # The cap truncates this holdout: say so in the log stream AND
            # in the eval record itself (silent subsampling of the
            # contract metric is the repo's named bug class).
            self.logger.log({
                "event": "eval_truncated",
                "eval_rows": n,
                "holdout_rows": len(label),
                "knob": "train.eval_ctr_max_rows",
            })
        mult = self._eval_rows()
        bs = min(8192, -(-n // mult) * mult)
        bs = -(-bs // mult) * mult
        logits_out = []
        overflow = 0
        fwd = self._forward_fn()
        n_proc = jax.process_count()
        replicate = None
        if self.mesh is not None and n_proc > 1:
            # Sharded logits are not host-addressable across processes;
            # an on-device replication makes np.asarray legal everywhere.
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicate = jax.jit(
                lambda x: x, out_shardings=NamedSharding(self.mesh, P())
            )
        for s in range(0, n, bs):
            take = min(bs, n - s)
            if take < bs:  # pad the tail batch to the static shape
                pad = bs - take
                d = np.concatenate([dense[s:n], np.zeros((pad,) + dense.shape[1:], dense.dtype)])
                ca = np.concatenate([cat[s:n], np.zeros((pad,) + cat.shape[1:], cat.dtype)])
                la = np.zeros(bs, label.dtype)
            else:
                d, ca, la = dense[s : s + bs], cat[s : s + bs], label[s : s + bs]
            host_b = {"dense": np.asarray(d), "cat": np.asarray(ca),
                      "label": np.asarray(la)}
            if n_proc > 1 and self.mesh is not None:
                # Every process holds the same eval arrays; contribute
                # this process's contiguous row block of the global batch.
                rows = bs // n_proc
                lo = jax.process_index() * rows
                host_b = {k: v[lo : lo + rows] for k, v in host_b.items()}
                batch = self._device_put_batch(host_b)
            else:
                batch = {k: jnp.asarray(v) for k, v in host_b.items()}
            logits, ovf = fwd(self.state, batch)
            if replicate is not None:
                logits = replicate(logits)
            logits_out.append(np.asarray(logits)[:take])
            overflow += int(ovf)
        logits = np.concatenate(logits_out)
        labels = label[: len(logits)]
        a = float(auc_metric(jnp.asarray(logits), jnp.asarray(labels)))
        ll = float(logloss_metric(jnp.asarray(logits), jnp.asarray(labels)))
        out = {"auc": a, "logloss": ll}
        if n < len(label):
            out["eval_rows"] = float(n)  # truncated — see eval_truncated event
        if overflow:  # a2a capacity drops during eval — loud, never silent
            out["eval_lookup_overflow"] = float(overflow)
        return out

    def _eval_interaction_auc(self, num_neg: int = 50) -> Dict[str, float]:
        """AUC over held-out positives vs ``num_neg`` sampled negatives per
        positive (CTR-style view of implicit data)."""
        rng = np.random.default_rng(self.config.train.seed + 7)
        test = self.dataset.test
        # ~20k scored examples total: each positive fans out to 1 + num_neg
        # rows, so the positive budget shrinks with num_neg.
        n = min(len(test), max(20_000 // (1 + num_neg), 1))
        users = np.repeat(test.users[:n], 1 + num_neg)
        pos_items = test.items[:n]
        neg_items = rng.integers(
            0, self.dataset.num_items, size=(n, num_neg)
        ).astype(np.int32)
        items = np.concatenate([pos_items[:, None], neg_items], axis=1).reshape(-1)
        labels = np.tile(
            np.concatenate([[1.0], np.zeros(num_neg)]).astype(np.float32), n
        )
        # Pad rows so the batch splits evenly over the data mesh axis; the
        # padded rows repeat row 0 and are trimmed before the AUC.
        real = len(users)
        mult = self._eval_rows()
        pad = (-real) % mult
        if pad:
            users = np.concatenate([users, users[:pad]])
            items = np.concatenate([items, items[:pad]])
            labels = np.concatenate([labels, labels[:pad]])
        batch = {"user": users.astype(np.int32), "item": items, "label": labels}
        n_proc = jax.process_count()
        if n_proc > 1 and self.mesh is not None:
            # Every process built the IDENTICAL full batch; contribute
            # only this process's contiguous row block — the multi-process
            # device_put assembles the global array from process-local
            # shards, so shipping the full batch would duplicate it
            # n_proc-fold (review finding, round 4; mirrors _eval_ctr).
            rows = len(batch["user"]) // n_proc
            lo = jax.process_index() * rows
            batch = {k: v[lo : lo + rows] for k, v in batch.items()}
        dev_batch = self._to_device_batch(batch, train=False)
        logits, _ovf = self._forward_fn()(self.state, dev_batch)
        if n_proc > 1 and self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            logits = jax.jit(
                lambda x: x, out_shardings=NamedSharding(self.mesh, P())
            )(logits)
        return {"auc": float(auc_metric(logits[:real], jnp.asarray(labels[:real])))}

    # ---- training ----

    def _train_closed_form(self) -> List[Dict[str, float]]:
        """Closed-form solvers (WRMF ALS, EASE): one epoch = one solver
        sweep; the reported loss is the solver's EXACT objective (ALS
        decreases it monotonically — tests/test_wrmf.py)."""
        c = self.config
        history: List[Dict[str, float]] = []
        nnz = len(self.dataset.train.users)
        for epoch in range(self.start_epoch, c.train.epochs):
            t0 = time.monotonic()
            metrics = self.solver.epoch()
            tables = dict(self.solver.tables())
            # Fetch-fence (not block_until_ready — docs/PERF.md): pull one
            # element of each solved table to the host before timing.
            # Indexed fetch, NOT jnp.ravel(t)[0]: a standalone ravel
            # dispatch materializes a full O(V*D) copy (un-donated
            # outputs cannot alias), polluting the timed epoch (review
            # finding, round 4).
            for t in tables.values():
                float(t[(0,) * t.ndim])
            dt = time.monotonic() - t0
            self.state = {
                "step": jnp.asarray(epoch + 1, jnp.int32),
                "tables": tables,
                "dense": {},
            }
            rec: Dict[str, float] = {
                "epoch": epoch,
                "loss": metrics["loss"],
                # interactions re-solved per sweep-second (the ALS analog
                # of examples/s: every sweep refits all nnz observations).
                "examples_per_s": nnz / max(dt, 1e-9),
            }
            if self._post_epoch(epoch, rec, history):
                break
        self.profiler.close()
        return history

    def _post_epoch(self, epoch: int, rec: Dict[str, float], history) -> bool:
        """Shared per-epoch bookkeeping (SGD and closed-form loops): eval
        cadence (always on the final epoch), logging, checkpointing,
        early stopping. Returns True when training should stop now."""
        c = self.config
        is_last = epoch + 1 == c.train.epochs
        evaluated = False
        if c.train.eval_every_epochs and (
            (epoch + 1) % c.train.eval_every_epochs == 0 or is_last
        ):
            rec.update(self.evaluate())
            evaluated = True
        self.logger.log(rec)
        history.append(rec)
        if (
            c.train.checkpoint_dir
            and c.train.checkpoint_every_epochs
            and (epoch + 1) % c.train.checkpoint_every_epochs == 0
        ):
            meta = {"row_permute": self._row_permute_active()}
            if meta["row_permute"]:
                # The permutation is a function of the data-axis shard
                # count — record it so restore can refuse a resized mesh
                # (same device count, different data/table split included).
                meta["row_permute_shards"] = self.mesh.shape["data"]
            save_checkpoint(
                c.train.checkpoint_dir, epoch + 1, self.state, meta=meta,
            )
        if not (c.train.early_stop_patience > 0 and evaluated):
            return False
        name, value, sign = self._early_stop_monitor(rec)
        if value is None:
            # A misspelled/never-emitted monitor would silently disable
            # early stopping — refuse instead (same rule as neg_sampling).
            raise ValueError(
                f"early_stop_metric {name!r} is not in the eval record; "
                f"available: {sorted(k for k, v in rec.items() if isinstance(v, float))}"
            )
        improved = (
            self._es_best is None
            or sign * (value - self._es_best) > c.train.early_stop_min_delta
        )
        if improved:
            self._es_best = value
            self._es_stall = 0
            return False
        self._es_stall += 1
        if self._es_stall >= c.train.early_stop_patience:
            self.logger.log({
                "event": "early_stopped", "epoch": epoch, "metric": name,
                "best": float(self._es_best), "last": float(value),
                "stalled_evals": self._es_stall,
            })
            return True
        return False

    def _early_stop_monitor(self, rec: Dict[str, float]):
        """(name, value, sign) of the monitored metric in this eval
        record; sign +1 maximizes, -1 minimizes. "auto" picks the most
        decision-relevant metric the eval emits."""
        want = self.config.train.early_stop_metric
        if want != "auto":
            sign = -1.0 if want in ("loss", "logloss") else 1.0
            return want, rec.get(want), sign
        if "auc" in rec:
            return "auc", rec["auc"], 1.0
        for family in ("recall@", "hr@"):
            ks = [int(k.split("@")[1]) for k in rec if k.startswith(family)
                  and k.split("@")[1].isdigit()]
            if ks:
                name = f"{family}{max(ks)}"
                return name, rec[name], 1.0
        return "loss", rec.get("loss"), -1.0

    def train(self) -> List[Dict[str, float]]:
        c = self.config
        history: List[Dict[str, float]] = []
        if self.solver is not None:
            return self._train_closed_form()
        if self.stream is None and self.sampler.num_batches() == 0:
            raise ValueError(
                "0 train batches per epoch: the (remainder-dropping) "
                f"sampler has fewer than batch_size={c.train.batch_size} "
                "rows — shrink train.batch_size or supply more data "
                "(a silent 0-step epoch would report nan loss)"
            )
        steps_cap = c.train.steps_per_epoch
        if steps_cap <= 0 and jax.process_count() > 1:
            # Each process samples local batches over the FULL train set;
            # one global epoch = total-batches / num_processes steps per
            # process (otherwise an "epoch" would make n_proc data passes).
            total = self.sampler.num_batches()
            if total > 0:
                steps_cap = max(total // jax.process_count(), 1)
        for epoch in range(self.start_epoch, c.train.epochs):
            t0 = time.monotonic()
            n_examples = 0
            k_steps = max(c.train.steps_per_dispatch, 1)

            def grouped(stream):
                """Stack K host batches into one [K, B, ...] dispatch."""
                group = []
                for b in stream:
                    group.append(self._host_batch(b))
                    if len(group) == k_steps:
                        yield {
                            key: np.stack([g[key] for g in group])
                            for key in group[0]
                        }
                        group = []

            if k_steps > 1:
                batch_stream = prefetch(
                    grouped(self.sampler.epoch(epoch)),
                    lambda b: self._device_put_batch(b, stacked=True),
                )
            else:
                batch_stream = prefetch(
                    self.sampler.epoch(epoch), self._to_device_batch
                )
            # With K>1 the cap rounds DOWN to whole dispatches. When the
            # step budget is SMALLER than one dispatch, one dispatch is
            # still the minimum unit of progress at static shapes — run
            # it, but say so (the previous comment claimed the cap was
            # never exceeded; review finding, round 4).
            cap_dispatch = steps_cap // k_steps if steps_cap > 0 else -1
            if steps_cap > 0 and cap_dispatch == 0:
                self.logger.log({
                    "event": "dispatch_exceeds_step_cap",
                    "steps_per_dispatch": k_steps,
                    "step_cap": steps_cap,
                })
                cap_dispatch = 1
            for i, dev_batch in enumerate(batch_stream):
                if cap_dispatch > 0 and i >= cap_dispatch:
                    break
                if self.jit_step is None:
                    self.jit_step = self._compile(dev_batch, stacked=k_steps > 1)
                self.profiler.step(self.global_step)
                self.state, metrics = self.jit_step(self.state, dev_batch)
                prev_step = self.global_step
                self.global_step += k_steps
                n_examples += c.train.batch_size * k_steps
                log_n = c.train.log_every_steps
                # Intra-epoch loss logging every ~log_every_steps optimizer
                # steps (costs one device sync per log line).
                if log_n > 0 and prev_step // log_n != self.global_step // log_n:
                    self.logger.log({
                        "step": self.global_step,
                        "epoch": epoch,
                        "loss": float(metrics["loss"]),
                    })
            # Fetch-fence the last step for honest timing: a host VALUE
            # fetch forces materialization through the transport, where
            # block_until_ready has been observed returning before
            # execution completes on this relay (docs/PERF.md "The fence
            # artifact" — block-fenced timing is prohibited).
            last_loss = (
                float(metrics["loss"]) if n_examples > 0 else float("nan")
            )
            dt = time.monotonic() - t0
            if n_examples == 0:
                # Empty epoch (dataset smaller than one batch): nothing to
                # log or learn, but don't reference unbound step metrics.
                self.logger.log({"epoch": epoch, "event": "empty_epoch"})
                history.append({"epoch": epoch, "loss": float("nan"),
                                "examples_per_s": 0.0})
                continue
            rec: Dict[str, float] = {
                "epoch": epoch,
                "loss": last_loss,
                "examples_per_s": n_examples / max(dt, 1e-9),
            }
            if self._post_epoch(epoch, rec, history):
                break
        self.profiler.close()
        return history


def run(config: Config, quiet: bool = False) -> Tuple[Trainer, List[Dict[str, float]]]:
    trainer = Trainer(config, quiet=quiet)
    history = trainer.train()
    return trainer, history
