"""Headline benchmark: examples/s/chip on Criteo-shaped DCN CTR training
(BASELINE.json metric). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measurement protocol (docs/PERF.md): this environment's TPU tunnel can
elide or pipeline repeated dispatches, so free-running loops overstate
throughput (round-1 recorded windows above the chip's dense roofline).
The DEFAULT protocol is therefore elision-proof ("slope"): every timed
dispatch fetches its loss to the host (forcing materialization), and the
steady-state per-step time is the SLOPE between interleaved K-small and
K-big multi-step dispatches (lax.scan of K real optimizer steps inside
one XLA program) — the constant host round-trip cancels in the
subtraction, and interleaving controls for window drift. Reported:
  value          — slope estimate (steady-state chip rate, the headline)
  value_fetch    — end-to-end rate at K-big incl. per-dispatch RTT
  value_freerun  — the legacy free-running loop (upper bound; can be
                   inflated by the tunnel — recorded for comparison only)
vs_baseline compares slope-vs-slope against BENCH_BASELINE.json (seeded
with round 1's controlled interleaved A/B medians; the reference itself
published no numbers — BASELINE.json:13 -> {}). On TPU slope runs the MF
anchor seed is replayed in the SAME session and the JSON line carries
  session_factor          — anchor_now / anchor_recorded (session drift)
  vs_baseline_normalized  — vs_baseline / session_factor (the
                            drift-corrected headline the driver should read)

Flags: --model dcn|dlrm|mf|topk  --batch N  --kernels xla|pallas
       --embed_dim N  --protocol slope|fetch|freerun  --devices auto|cpu|tpu
Legacy flags --steps/--fetch/--steps_per_dispatch drive the fetch/freerun
protocols (kept for the experiment matrix in benchmarks/).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def build_dcn_bench(batch_size: int, kernels: str, embed_dim: int = 32,
                    stack_tables: bool = False, vocab: int = 100_000,
                    lane_pack: bool | None = False,
                    host_dedup: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.train.step import TrainStepBuilder

    num_dense = 13
    vocabs = (vocab,) * 26  # Criteo-DAC shape (default 100k per field)
    model = build_model(
        ModelConfig(name="dcn", embed_dim=embed_dim, num_cross_layers=3,
                    mlp_dims=(512, 256, 128), stack_tables=stack_tables,
                    lane_pack=lane_pack),
        DataSpec.ctr(vocabs, num_dense),
        backend=kernels,
        batch_size=batch_size,
    )
    builder = TrainStepBuilder(
        model, "logloss",
        OptimConfig(learning_rate=1e-3, dense_optimizer="adam",
                    sparse_optimizer="rowwise_adagrad", sparse_learning_rate=0.02),
        kernels=kernels,
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n_batches = 8
    batches = []
    for _ in range(n_batches):
        host_b = {
            "dense": rng.normal(size=(batch_size, num_dense)).astype(np.float32),
            "cat": np.stack(
                [rng.integers(0, v, batch_size) for v in vocabs], 1
            ).astype(np.int32),
            "label": rng.integers(0, 2, batch_size).astype(np.float32),
        }
        if host_dedup:
            from tfrec_tpu.train.step import host_dedup_sorts

            host_b.update(host_dedup_sorts(model, host_b))
        batches.append({k: jnp.asarray(v) for k, v in host_b.items()})
    step = jax.jit(builder.step, donate_argnums=(0,))
    return step, state, batches, builder


def build_dcn_sharded_bench(batch_size: int, kernels: str, embed_dim: int = 32,
                            mode: str = "row", vocab: int = 100_000,
                            lane_pack: bool | None = None):
    """The SHARDED-table DCN step (ShardedTrainStepBuilder) on a mesh over
    all visible devices — degenerate (1,1) on the single bench chip. This
    is the production form of configs 4/5 (BASELINE.json:10-11): the a2a
    machinery (dedup-to-capacity, bucket, sentinel reassembly) runs for
    real even when the all-to-all itself degenerates, so the measured
    per-chip rate is the R8 scaling model's T_comp term (docs/PERF.md
    "Round-4 on-chip results"). Returns (builder, state, batches,
    stack_fn) — the caller jits via builder.compile_step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import MeshConfig, ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh()
    num_dense = 13
    vocabs = (vocab,) * 26
    model = build_model(
        ModelConfig(name="dcn", embed_dim=embed_dim, num_cross_layers=3,
                    mlp_dims=(512, 256, 128), lane_pack=lane_pack),
        DataSpec.ctr(vocabs, num_dense),
        backend=kernels,
        sharded_tables=True,
        batch_size=batch_size // mesh.shape["data"],
    )
    builder = ShardedTrainStepBuilder(
        model, "logloss",
        OptimConfig(learning_rate=1e-3, dense_optimizer="adam",
                    sparse_optimizer="rowwise_adagrad",
                    sparse_learning_rate=0.02),
        mesh,
        MeshConfig(table_sharding=mode),
        kernels=kernels,
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(8):
        batches.append({
            "dense": rng.normal(size=(batch_size, num_dense)).astype(np.float32),
            "cat": np.stack(
                [rng.integers(0, v, batch_size) for v in vocabs], 1
            ).astype(np.int32),
            "label": rng.integers(0, 2, batch_size).astype(np.float32),
        })

    def to_device(host_b, stacked=False):
        sh = builder.batch_shardings(host_b, stacked=stacked)
        return {k: jax.device_put(jnp.asarray(v), sh[k])
                for k, v in host_b.items()}

    return builder, state, batches, to_device


def build_topk_bench(batch_size: int, embed_dim: int, sharded: bool = False,
                     method: str = "approx", chunk: int = 0):
    """Retrieval scoring throughput (R7): full-catalog top-k for a user
    batch against a 1M-item table — users/s is the reported rate.
    ``sharded=True`` runs the distributed per-shard-topk + all_gather merge
    (parallel/topk.py) over all visible devices. ``method`` picks the
    candidate-selection op (eval/retrieval.candidate_topk): "approx" =
    lax.approx_max_k (the serving default — TPU PartialReduce), "exact" =
    full-sort lax.top_k. ``chunk=0`` (default) measures the PRODUCT
    single-device path (serve.Recommender.recommend: full [B, V] scores +
    one candidate_topk — [B,V] is 4 GB at B=1024/V=1M and one PartialReduce
    over the full width, measured ~2x the chunked merge); ``chunk>0``
    selects the memory-bounded running-merge variant (chunked_topk), for
    hosts where the score matrix cannot be materialized."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    v, d, k = 1_000_000, embed_dim, 100
    rng = np.random.default_rng(0)

    if sharded:
        from tfrec_tpu.parallel.mesh import make_mesh
        from tfrec_tpu.parallel.topk import sharded_topk_dot

        mesh = make_mesh()
        n_sh = mesh.shape["data"]
        v_pad = -(-v // n_sh) * n_sh
        items_np = np.pad(
            rng.normal(size=(v, d)).astype(np.float32), ((0, v_pad - v), (0, 0))
        )
        items = jax.device_put(
            jnp.asarray(items_np),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None)),
        )

        @jax.jit
        def query(item_table, users):
            return sharded_topk_dot(mesh, users, item_table, k, v,
                                    method=method)

    elif chunk:
        v_pad = -(-v // chunk) * chunk  # dynamic_slice clamps at the edge —
        items = jnp.asarray(  # pad so chunk starts never overhang
            np.pad(rng.normal(size=(v, d)).astype(np.float32),
                   ((0, v_pad - v), (0, 0)))
        )

        from tfrec_tpu.eval.retrieval import chunked_topk

        @jax.jit
        def query(item_table, users):
            # Running top-k merge over item chunks: never materializes
            # [B, V] (4GB at B=1024, V=1M). item_table is an ARGUMENT, not
            # a closure (closed-over arrays bake into the compile payload).
            def score_chunk(u, start):
                block = jax.lax.dynamic_slice_in_dim(item_table, start, chunk, axis=0)
                return jnp.dot(u, block.T, preferred_element_type=jnp.float32)

            return chunked_topk(score_chunk, users, v, k, chunk,
                                method=method)

    else:
        from tfrec_tpu.eval.retrieval import topk_scores

        items = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))

        @jax.jit
        def query(item_table, users):
            # The product single-device path (serve.recommend): full
            # score matrix + one candidate selection over the catalog
            # width. item_table is an ARGUMENT, not a closure.
            scores = jnp.dot(users, item_table.T,
                             preferred_element_type=jnp.float32)
            return topk_scores(scores, k, None, None, method=method)

    batches = [
        jnp.asarray(rng.normal(size=(batch_size, d)).astype(np.float32))
        for _ in range(4)
    ]

    # The item table is the benchmark STATE (threaded through as an
    # argument, never closed over — a closure constant bakes the 512MB
    # table into the compile payload; the remote-compile endpoint rejects
    # it with HTTP 413 and on any backend it bloats the executable).
    def step(state, batch):
        vals, ids = query(state, batch)
        return state, {"loss": vals[0, 0]}

    def multi_query(state, stacked_users):
        # K chained queries in ONE dispatch: each query's result feeds a
        # (numerically negligible) perturbation of the next query so the
        # scan cannot be elided or reordered.
        def body(carry, users):
            vals, _ids = query(state, users + carry * 1e-20)
            return vals[0, 0], None

        last, _ = jax.lax.scan(body, jnp.zeros(()), stacked_users)
        return state, {"loss": last}

    return step, items, batches, None, multi_query


def build_mf_bench(batch_size: int, kernels: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import OptimConfig
    from tfrec_tpu.models import MF, DataSpec
    from tfrec_tpu.train.step import TrainStepBuilder

    model = MF(DataSpec.interaction(1_000_000, 1_000_000), embed_dim=64)
    builder = TrainStepBuilder(
        model, "bpr",
        OptimConfig(learning_rate=0.05, sparse_optimizer="rowwise_adagrad"),
        kernels=kernels,
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(8):
        batches.append({
            "user": jnp.asarray(rng.integers(0, 1_000_000, batch_size).astype(np.int32)),
            "pos": jnp.asarray(rng.integers(0, 1_000_000, batch_size).astype(np.int32)),
            "neg": jnp.asarray(rng.integers(0, 1_000_000, batch_size).astype(np.int32)),
        })
    step = jax.jit(builder.step, donate_argnums=(0,))
    return step, state, batches, builder


def build_wrmf_bench(embed_dim: int = 64, small: bool = False):
    """WRMF/ALS sweep bench: uniform 100k-user x 20k-item catalog, 40
    interactions/user (4M observations refit per sweep; ``small`` shrinks
    it 40x for the CPU smoke path). One "step" = one FULL sweep (users
    half + items half); the headline unit is observations refit per
    second. Returns (step, state, batch, nnz, multi) where multi(k)
    builds a k-sweep chained program for the slope protocol (histories
    ride as batch ARGUMENTS, never closure constants)."""
    import jax
    from types import SimpleNamespace

    import numpy as np

    from tfrec_tpu.train.als import ALSTrainer, sweep_body

    nu, ni, per_u = (5_000, 1_000, 20) if small else (100_000, 20_000, 40)
    rng = np.random.default_rng(0)
    users = np.repeat(np.arange(nu, dtype=np.int32), per_u)
    items = rng.integers(0, ni, nu * per_u).astype(np.int32)
    ds = SimpleNamespace(
        num_users=nu, num_items=ni,
        train=SimpleNamespace(users=users, items=items),
    )
    trainer = ALSTrainer(ds, embed_dim, alpha=10.0, reg=0.05, batch=1024)
    raw = sweep_body(10.0, 0.05)

    def one_pair(x, y, u_hist, i_hist):
        x = raw(y, u_hist)[:nu]
        y = raw(x, i_hist)[:ni]
        return x, y

    def step_fn(state, batch):
        x, y = one_pair(state["x"], state["y"], batch["u"], batch["i"])
        return {"x": x, "y": y}, {"loss": x[0, 0]}

    def multi(k):
        def fn(state, batch):
            def body(c, _):
                x, y = one_pair(c["x"], c["y"], batch["u"], batch["i"])
                return {"x": x, "y": y}, None

            c, _ = jax.lax.scan(body, state, None, length=k)
            return c, {"loss": c["x"][0, 0]}

        return fn

    state = {"x": trainer.x, "y": trainer.y}
    batch = {"u": trainer.u_hist, "i": trainer.i_hist}
    step = jax.jit(step_fn, donate_argnums=(0,))
    return step, state, batch, len(users), multi


def _stack(batches, k):
    import jax.numpy as jnp

    if isinstance(batches[0], dict):
        return {
            key: jnp.stack([batches[i % len(batches)][key] for i in range(k)])
            for key in batches[0]
        }
    return jnp.stack([batches[i % len(batches)] for i in range(k)])


# Physical plausibility ceilings for the session probes: ~2x the chip's
# peak (v5e: ~197 bf16 TFLOP/s MXU, ~819 GB/s HBM). Any implied rate above
# these is a measurement artifact (tunnel jitter swallowing the K-spread),
# never a real rate — BENCH_r02 shipped 4.8e11 "TFLOP/s" from exactly this
# failure class, so the clamp is load-bearing (VERDICT r3 weak #6).
PROBE_MAX_RATE = {"health_tflops": 400.0, "gather_gbs": 1640.0}


def probe_rate(diff_s: float, k_small: int, k_big: int, reps: int,
               work: float, max_rate: float):
    """Rate from an interleaved K-spread time difference. Returns None —
    never a number — when (a) the spread sits inside the tunnel's RTT
    jitter (no slope is inferable; a clamped slope fabricates one) or
    (b) the implied rate exceeds physical plausibility (``max_rate``,
    ~2x chip peak). Pinned in tests/test_driver_contract.py."""
    if diff_s < 3e-3:
        return None
    t_unit = diff_s / (reps * (k_big - k_small))
    rate = work / t_unit
    if rate > max_rate:
        return None
    return round(rate, 1)


def drift_normalized(vs_baseline: float, anchor_value: float,
                     anchor_baseline: float):
    """(session_factor, vs_baseline_normalized): divide the headline
    factor by the in-session anchor-seed replay ratio so the driver's
    number separates real speedups from session drift (VERDICT r3 weak
    #1 — BENCH_r03's 2.0x conflated a 1.33x layout win with ~1.5x
    session/op-mix shift)."""
    sf = anchor_value / anchor_baseline
    return round(sf, 4), round(vs_baseline / sf, 4)


def session_probes():
    """Two fast elision-proof probes characterizing THIS session's chip:
    chained-matmul slope (MXU TFLOP/s) and chained random-row-gather
    slope (effective HBM GB/s, v=100k d=128). Sessions on this tunnel
    have shown full-speed MXU alongside ~40x-slow step times
    (docs/PERF.md "Session health"), so the pair is recorded with every
    headline number to make it interpretable after the fact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # 4096: one matmul is ~0.9 ms at healthy MXU rate, so the K-spread
    # work (~25 ms) clears this tunnel's ~5 ms RTT jitter. The old 2048
    # probe's spread (~1.6 ms) sat INSIDE the jitter — the slope clamped
    # at its 1e-12 floor and emitted a deterministic garbage constant
    # (4.81e11 in BENCH_r02) instead of a rate.
    n = 4096
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    def mm_chain(x, k):
        def body(c, _):
            c = jnp.dot(c, a, preferred_element_type=jnp.float32)
            return c / (jnp.abs(c).max() + 1e-6), None

        out, _ = jax.lax.scan(body, x, None, length=k)
        return out[0, 0]

    v, d, nids = 100_000, 128, 26 * 8192
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids0 = jnp.asarray(rng.integers(0, v, nids).astype(np.int32))

    def g_chain(ids, k):
        def body(i, _):
            rows = jnp.take(table, i, axis=0, mode="clip")
            nxt = (i + (rows.sum(axis=1).astype(jnp.int32) & 0x7) + 1) % v
            return nxt, rows[0, 0]

        _, last = jax.lax.scan(body, ids, None, length=k)
        return last.sum()

    out = {}
    for name, fn, arg, ks, work in (
        ("health_tflops", mm_chain, a, (2, 16), 2 * n**3 / 1e12),
        ("gather_gbs", g_chain, ids0, (2, 16), nids * d * 4 / 1e9),
    ):
        fns = {k: jax.jit(lambda x, k=k, f=fn: f(x, k)) for k in ks}
        for f in fns.values():
            float(f(arg))  # compile + warm
        # Min of 3 interleaved blocks per K: the minimum is the
        # least-interrupted pass, so one RTT spike cannot fabricate a
        # super-peak rate (a +394 TFLOP/s reading slipped past a single
        # 2-dispatch block on 2026-08-19).
        times = {k: [] for k in ks}
        for _ in range(3):
            for k, f in fns.items():
                t0 = time.perf_counter()
                for _ in range(2):
                    float(f(arg))
                times[k].append(time.perf_counter() - t0)
        diff = min(times[ks[1]]) - min(times[ks[0]])
        # None (not garbage) when the spread is inside RTT jitter or the
        # implied rate is physically implausible — see probe_rate.
        out[name] = probe_rate(diff, ks[0], ks[1], 2, work,
                               PROBE_MAX_RATE[name])
    return out


def _timed_block(fn, state, batch, reps):
    """reps dispatches, EVERY one fenced by a host value fetch (elision-
    proof). Returns (state, seconds)."""
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = fn(state, batch)
        float(metrics["loss"])
    return state, time.perf_counter() - t0


def run_slope_protocol(make_k, batch_size, k_small, k_big, reps, rounds):
    """Steady-state per-step time from interleaved K-small/K-big fetched
    multi-step dispatches: the host round-trip is the same constant in
    both, so it cancels in the slope. Returns a result dict."""
    import jax

    variants = {}
    for k in (k_small, k_big):
        fn, state, batch = make_k(k)
        state, _ = _timed_block(fn, state, batch, 1)  # compile + warm
        variants[k] = [fn, state, batch, []]
    for _ in range(rounds):
        for k, slot in variants.items():
            fn, state, batch, times = slot
            state, dt = _timed_block(fn, state, batch, reps)
            slot[1] = state
            times.append(dt)
    del variants[k_big][1], variants[k_small][1]  # allow donation cleanup
    t_small = statistics.median(variants[k_small][-1])
    t_big = statistics.median(variants[k_big][-1])
    t_step = max(t_big - t_small, 1e-12) / (reps * (k_big - k_small))
    rtt = max(t_small / reps - k_small * t_step, 0.0)
    return {
        "value": batch_size / t_step,
        "value_fetch": reps * k_big * batch_size / t_big,
        "rtt_s": rtt,
        "blocks_small_s": variants[k_small][-1],
        "blocks_big_s": variants[k_big][-1],
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="dcn",
                        choices=["dcn", "mf", "topk", "wrmf"])
    parser.add_argument("--protocol", default="slope",
                        choices=["slope", "fetch", "freerun"])
    parser.add_argument("--steps", type=int, default=30,
                        help="freerun/fetch protocols: timed dispatches")
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--kernels", default="xla", choices=["xla", "pallas"])
    parser.add_argument("--lane_pack", default="auto",
                        choices=["auto", "on", "off"],
                        help="dcn: pack 128/d fields per physical table "
                             "(model.lane_pack — docs/PERF.md). auto = "
                             "on whenever d < 128 divides 128 (the model "
                             "default; measured 1.33x at d=32)")
    parser.add_argument("--table_sharding", default="none",
                        choices=["none", "row", "gspmd", "col"],
                        help="dcn: measure the SHARDED-table step "
                             "(ShardedTrainStepBuilder on a mesh over all "
                             "visible devices — degenerate (1,1) on the "
                             "bench chip). This is the production form of "
                             "configs 4/5; slope protocol only")
    parser.add_argument("--sharded_extra", default="auto",
                        choices=["auto", "off"],
                        help="dcn slope runs: ALSO measure the sharded-row "
                             "step in the same session and emit "
                             "sharded_value/sharded_vs_baseline so the "
                             "driver record carries both per-chip numbers "
                             "(VERDICT r4 item 2). auto = on for dcn slope "
                             "runs without --table_sharding")
    parser.add_argument("--host_dedup", action="store_true",
                        help="dcn: host-precomputed stable dedup sorts in "
                             "the batch (train.host_dedup) — the device "
                             "step skips its per-table argsort")
    parser.add_argument("--embed_dim", type=int, default=32,
                        help="per-field embedding dim (default 32 — the "
                             "flagship Criteo config-4/5 setting; round "
                             "1-2 benches used 128)")
    parser.add_argument("--topk_method", default="approx",
                        choices=["approx", "exact"],
                        help="topk candidate op: approx_max_k (serving "
                             "default) or full-sort lax.top_k")
    parser.add_argument("--sharded", action="store_true",
                        help="topk: distributed per-shard-topk over all devices")
    parser.add_argument("--topk_chunk", type=int, default=0,
                        help="topk: >0 selects the memory-bounded running "
                             "chunk merge (chunked_topk) at this chunk "
                             "size; 0 (default) measures the product "
                             "single-device path (full [B,V] scores + one "
                             "candidate selection — serve.recommend)")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="fetch/freerun: K steps per dispatch (lax.scan)")
    parser.add_argument("--k_small", type=int, default=0,
                        help="slope: small K (0 = auto per platform)")
    parser.add_argument("--k_big", type=int, default=0,
                        help="slope: big K (0 = auto per platform)")
    parser.add_argument("--rounds", type=int, default=3,
                        help="slope: interleaved rounds per K")
    parser.add_argument("--reps", type=int, default=3,
                        help="slope: fetched dispatches per timed block")
    parser.add_argument("--fetch", action="store_true",
                        help="legacy alias for --protocol fetch")
    parser.add_argument("--precision", default="default",
                        choices=["default", "bfloat16", "float32", "highest"])
    parser.add_argument(
        "--devices", default="auto", choices=["auto", "cpu", "tpu"],
        help="auto probes the TPU with a deadline; tpu skips the probe",
    )
    parser.add_argument(
        "--anchor", default="auto", choices=["auto", "off"],
        help="replay the MF anchor seed in the SAME session after the "
             "main measurement and emit session_factor + "
             "vs_baseline_normalized (drift-corrected headline). auto = "
             "on for TPU slope runs of non-mf models; off disables",
    )
    parser.add_argument(
        "--record_baseline", action="store_true",
        help="write this run's value into BENCH_BASELINE.json if its key "
             "is missing (only do this from a session that passed the "
             "throttle sanity check — docs/PERF.md)",
    )
    args = parser.parse_args(argv)
    if args.fetch:
        args.protocol = "fetch"
    if args.table_sharding != "none" and (
        args.model != "dcn" or args.protocol != "slope"
    ):
        parser.error("--table_sharding needs --model dcn --protocol slope")
    if args.table_sharding != "none" and args.host_dedup:
        # The mesh path re-buckets ids inside its all-to-all, so host
        # dedup orders never apply there — stamping '-hostdedup' into a
        # sharded baseline key would record a config that was not
        # measured (review finding, round 5).
        parser.error("--host_dedup is a single-device feature; it does "
                     "not apply to --table_sharding runs")

    if args.devices == "auto":
        # The TPU tunnel in this environment can wedge (stateful PJRT
        # session hangs while control stays up). Probe it in a subprocess
        # with a hard deadline; fall back to CPU rather than hanging.
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))"],
                timeout=180, capture_output=True, text=True,
            )
            tpu_ok = probe.returncode == 0 and "4.0" in probe.stdout
        except subprocess.TimeoutExpired:
            tpu_ok = False
        if not tpu_ok:
            print("bench: device probe failed/hung; falling back to CPU",
                  file=sys.stderr)
            args.devices = "cpu"
            # Make the fallback self-explaining in the JSON record: the
            # CPU number is NOT the chip's capability, and the last
            # recorded strict TPU measurement for this config is quoted
            # alongside (the tunnel in this environment has multi-hour
            # outages — CLAUDE.md gotcha #2).
            _fallback_note = {
                "tpu_probe": "failed_or_hung",
                "note": "CPU fallback; see tpu_last_recorded for the "
                        "strict on-chip number at this config",
            }
        else:
            _fallback_note = None
    else:
        _fallback_note = None
    if args.devices == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    platform = jax.default_backend()
    # MF ignores --embed_dim (fixed d=64); keep its baseline key stable.
    key_dim = 64 if args.model == "mf" else args.embed_dim
    # Resolve --lane_pack: None = model-level auto. lane_active is set
    # from the BUILT model below (never a re-derivation of the auto rule,
    # which could drift — ADVICE r3).
    lane_pack = {"auto": None, "on": True, "off": False}[args.lane_pack]
    lane_active = False
    # topk scores a (clamped) user batch against the catalog.
    eff_batch = min(args.batch, 1024) if args.model == "topk" else args.batch
    if args.model == "wrmf":
        # One "step" refits every observation once; --batch is ignored.
        eff_batch = 100_000 * 40 if platform == "tpu" else 5_000 * 20

    def build(kernels):
        if args.model == "dcn":
            step, state, batches, builder = build_dcn_bench(
                args.batch, kernels, args.embed_dim,
                lane_pack=lane_pack, host_dedup=args.host_dedup)
            multi = None
        elif args.model == "topk":
            step, state, batches, builder, multi = build_topk_bench(
                eff_batch, args.embed_dim, sharded=args.sharded,
                method=args.topk_method, chunk=args.topk_chunk)
        elif args.model == "wrmf":
            step, state, batch, nnz, multi = build_wrmf_bench(
                args.embed_dim, small=platform != "tpu")
            assert nnz == eff_batch, (nnz, eff_batch)
            batches, builder = [batch], None
        else:
            step, state, batches, builder = build_mf_bench(args.batch, kernels)
            multi = None
        return step, state, batches, builder, multi

    extra = {}
    _sharded = None
    if args.protocol == "slope":
        if platform == "tpu":
            # Big enough that (k_big - k_small) steps of real chip work
            # dominate dispatch noise; small enough to fit HBM.
            k_small = args.k_small or {"topk": 2, "wrmf": 1}.get(args.model, 8)
            k_big = args.k_big or {"topk": 32, "wrmf": 8}.get(args.model, 256)
        else:  # CPU smoke: keep the driver run fast
            k_small, k_big = args.k_small or 1, args.k_big or (
                2 if args.model == "wrmf" else 4)

        last_sharded_builder = []

        def make_sharded_k(k, mode):
            builder, state, batches, to_device = build_dcn_sharded_bench(
                args.batch, args.kernels, args.embed_dim, mode=mode,
                lane_pack=lane_pack,
            )
            last_sharded_builder.clear()
            last_sharded_builder.append(builder)
            dev = to_device(_stack(batches, k), stacked=True)
            fn = builder.compile_step(state, dev, stacked=True)
            return fn, state, dev

        def make_k(k):
            if args.table_sharding != "none":
                return make_sharded_k(k, args.table_sharding)
            step, state, batches, builder, multi = build(args.kernels)
            if args.model == "topk":
                fn = jax.jit(multi)
                return fn, state, _stack(batches, k)
            if args.model == "wrmf":
                fn = jax.jit(multi(k), donate_argnums=(0,))
                return fn, state, batches[0]
            fn = jax.jit(builder.multi_step, donate_argnums=(0,))
            return fn, state, _stack(batches, k)

        try:
            res = run_slope_protocol(
                make_k, eff_batch, k_small, k_big, args.reps, args.rounds
            )
        except Exception as e:
            if args.kernels == "pallas":
                print(f"bench: pallas path failed ({type(e).__name__}); "
                      "falling back to xla kernels", file=sys.stderr)
                args.kernels = "xla"
                res = run_slope_protocol(
                    make_k, eff_batch, k_small, k_big, args.reps, args.rounds
                )
            else:
                raise
        examples_per_s = res.pop("value")
        extra = {k: v for k, v in res.items() if not k.startswith("blocks")}
        extra["k_pair"] = [k_small, k_big]
        if args.table_sharding != "none":
            # Sharded main run: lane marker from the built mesh model; no
            # freerun window (the slope is the record).
            lane_active = bool(
                getattr(last_sharded_builder[0].model, "lane_pack", False)
            )
        else:
            # One short free-run window for the legacy upper bound.
            step, state, batches, builder, _ = build(args.kernels)
            if builder is not None:
                # The key's "-lanepack" marker reflects the BUILT model,
                # not a re-derivation of the auto rule (which could drift).
                lane_active = bool(getattr(builder.model, "lane_pack", False))
            for i in range(2):
                state, m = step(state, batches[i % len(batches)])
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            n_free = 10
            for i in range(n_free):
                state, m = step(state, batches[i % len(batches)])
            jax.block_until_ready(m["loss"])
            extra["value_freerun"] = round(
                n_free * eff_batch / (time.perf_counter() - t0), 1
            )
        if (
            args.sharded_extra == "auto" and args.model == "dcn"
            and args.table_sharding == "none"
            # Skip on auto CPU-fallback (tunnel down): the fallback run is
            # already slow and its numbers are placeholders; explicit
            # --devices cpu (tests, smokes) still measures it.
            and _fallback_note is None
        ):
            # Same-session sharded-row slope (VERDICT r4 item 2): the
            # contract metric's production form is the sharded-table step
            # (configs 4/5) — the driver record must carry BOTH per-chip
            # numbers, not just the single-device one.
            try:
                sh_res = run_slope_protocol(
                    lambda k: make_sharded_k(k, "row"), eff_batch,
                    k_small, k_big, args.reps, args.rounds,
                )
                _sharded = {
                    "value": sh_res["value"],
                    "lane": bool(getattr(
                        last_sharded_builder[0].model, "lane_pack", False
                    )),
                }
            except Exception as e:  # context, never a bench failure
                extra["sharded_error"] = type(e).__name__
    else:
        step, state, batches, builder, multi = build(args.kernels)
        if builder is not None:
            lane_active = bool(getattr(builder.model, "lane_pack", False))
        k_disp = max(args.steps_per_dispatch, 1)
        if k_disp > 1:
            if args.model == "topk":
                step = jax.jit(multi)
                batches = [_stack(batches, k_disp)]
            elif args.model == "wrmf":
                step = jax.jit(multi(k_disp), donate_argnums=(0,))
            else:
                assert builder is not None
                step = jax.jit(builder.multi_step, donate_argnums=(0,))
                batches = [_stack(batches, k_disp)]
        warmup = max(args.warmup, 1)
        try:
            for i in range(warmup):
                state, metrics = step(state, batches[i % len(batches)])
            jax.block_until_ready(metrics["loss"])
        except Exception as e:
            if args.kernels == "pallas":
                print(f"bench: pallas path failed ({type(e).__name__}); "
                      "falling back to xla kernels", file=sys.stderr)
                args.kernels = "xla"
                step, state, batches, builder, multi = build("xla")
                if k_disp > 1 and args.model != "topk":
                    step = jax.jit(builder.multi_step, donate_argnums=(0,))
                    batches = [_stack(batches, k_disp)]
                for i in range(warmup):
                    state, metrics = step(state, batches[i % len(batches)])
                jax.block_until_ready(metrics["loss"])
            else:
                raise
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step(state, batches[i % len(batches)])
            if args.protocol == "fetch":
                float(metrics["loss"])
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        examples_per_s = args.steps * k_disp * eff_batch / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    dedup_active = args.host_dedup and args.model == "dcn"
    key = (f"{args.model}-{platform}-b{eff_batch}-d{key_dim}-{args.kernels}-"
           f"{args.precision}-{args.protocol}"
           + ("-lanepack" if lane_active else "")
           + (f"-sh{args.table_sharding}"
              if args.table_sharding != "none" else "")
           + ("-hostdedup" if dedup_active else "")
           + ("-sharded" if args.sharded else "")
           + (f"-{args.topk_method}" if args.model == "topk" else "")
           + (f"-chunk{args.topk_chunk}"
              if args.model == "topk" and args.topk_chunk else ""))
    vs_baseline = 1.0
    record = None
    base = {}
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                base = json.load(f)
        except Exception:
            base = {}
    base_key = key
    if key not in base and (lane_active or dedup_active):
        # Lane packing / host dedup are transparent layout+pipeline
        # changes of the SAME model (math pinned bit-identical /
        # rtol-1e-6 in tests); their honest denominator is the strict
        # plain seed at the same shape.
        plain = key.replace("-lanepack", "").replace("-hostdedup", "")
        if plain in base:
            base_key = plain
            extra["baseline_key"] = plain
    if base_key in base:
        vs_baseline = examples_per_s / base[base_key]
    if args.record_baseline and key not in base:
        # Never auto-record: one 2026-08-17 session ran ~40x slow (flat
        # ~24ms/dispatch throttle) and would have seeded garbage
        # denominators. Recording is an explicit, human-checked act.
        # Checked against KEY, not base_key: when only the plain fallback
        # seed exists, --record_baseline must still record the suffixed
        # key so future runs compare like-for-like (ADVICE r3 #2).
        record = key
    if _sharded is not None:
        sh_key = (f"dcn-{platform}-b{eff_batch}-d{key_dim}-{args.kernels}-"
                  f"{args.precision}-{args.protocol}"
                  + ("-lanepack" if _sharded["lane"] else "") + "-shrow")
        extra["sharded_key"] = sh_key
        extra["sharded_value"] = round(_sharded["value"], 1)
        if sh_key in base:
            extra["sharded_vs_baseline"] = round(
                _sharded["value"] / base[sh_key], 4
            )
    writes = {}
    if record:
        writes[record] = examples_per_s
    if args.record_baseline and _sharded is not None and sh_key not in base:
        writes[sh_key] = _sharded["value"]
    if writes and platform == "tpu":
        base.update(writes)
        try:
            with open(baseline_path, "w") as f:
                json.dump(base, f, indent=1)
        except OSError:
            pass

    # Drift normalization (VERDICT r3 weak #1): replay the MF anchor seed
    # in THIS session with the seed's exact protocol; vs_baseline divided
    # by the anchor ratio separates real wins from session/op-mix drift.
    ANCHOR_KEY = "mf-tpu-b8192-d64-xla-default-slope"
    if (
        args.anchor == "auto" and platform == "tpu"
        and args.protocol == "slope" and args.model != "mf"
        and ANCHOR_KEY in base
    ):
        def make_anchor_k(k):
            a_step, a_state, a_batches, a_builder = build_mf_bench(8192, "xla")
            fn = jax.jit(a_builder.multi_step, donate_argnums=(0,))
            return fn, a_state, _stack(a_batches, k)

        try:
            a_res = run_slope_protocol(make_anchor_k, 8192, 8, 256,
                                       args.reps, args.rounds)
            extra["anchor_key"] = ANCHOR_KEY
            extra["anchor_value"] = round(a_res["value"], 1)
            sf, norm = drift_normalized(
                vs_baseline, a_res["value"], base[ANCHOR_KEY]
            )
            extra["session_factor"] = sf
            # Only emit the drift-corrected headline when a real baseline
            # comparison happened: normalizing the placeholder 1.0 would
            # fabricate a regression/gain out of pure session drift
            # (review finding, round 4).
            if base_key in base:
                extra["vs_baseline_normalized"] = norm
        except Exception as e:  # the anchor is context, never a failure
            extra["anchor_error"] = type(e).__name__

    if _fallback_note is not None:
        extra.update(_fallback_note)
        tpu_key = key.replace(f"-{platform}-", "-tpu-")
        if tpu_key in base:
            # vs_baseline stays 1.0 (neutral — no CPU baseline exists);
            # the strict on-chip number rides along for the record.
            extra["tpu_last_recorded"] = base[tpu_key]

    if platform == "tpu":
        try:
            extra.update(session_probes())
        except Exception as e:  # probes are context, never a failure mode
            extra["session_probe_error"] = type(e).__name__

    desc = {
        "dcn": "CTR train", "mf": "BPR train",
        "topk": "top-100 retrieval vs 1M items, users/s",
        "wrmf": "ALS full sweep, observations refit/s",
    }[args.model]
    print(json.dumps({
        "metric": f"examples/s/chip ({args.model} {desc}, {platform}, "
                  f"batch={eff_batch}, d={key_dim}, kernels={args.kernels}, "
                  f"prec={args.precision}, protocol={args.protocol}"
                  + (", lane_pack" if lane_active else "")
                  + (f", table_sharding={args.table_sharding}"
                     if args.table_sharding != "none" else "")
                  + (", host_dedup" if dedup_active else "")
                  + (", sharded" if args.sharded else "")
                  + (f", topk={args.topk_method}" if args.model == "topk"
                     else "")
                  + (f", chunk={args.topk_chunk}"
                     if args.model == "topk" and args.topk_chunk else "")
                  + ")",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs_baseline, 4),
        # Self-describing protocol marker (VERDICT r4 item 10): rows from
        # the fence era (BENCH_r01) carry no such field, so a fresh driver
        # can tell strict slope records from artifact-era ones.
        "protocol": args.protocol,
        **{k: (round(v, 6) if isinstance(v, float) else v)
           for k, v in extra.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
