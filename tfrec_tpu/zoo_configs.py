"""The five milestone configs (BASELINE.json:7-11) plus synthetic stand-ins.

Each constructor returns a full Config. The MovieLens/Criteo configs expect
a dataset path (no datasets ship in this environment — SURVEY.md §0); the
``*_synthetic`` variants are the seeded stand-ins CI and benchmarks use.
"""

from __future__ import annotations

import dataclasses

from tfrec_tpu.configs import (
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)


def mf_bpr_ml100k(path: str | None = None) -> Config:
    """Config 1: MF + BPR on MovieLens-100K — single table, dot-product
    scorer, CPU-runnable."""
    return Config(
        run_name="mf_bpr_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio",
            test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
        ),
        # Hyperparameters tuned on the synthetic stand-in (benchmarks/
        # quality_bands.py sweeps): l2 0.03 is load-bearing — without it MF
        # overfits below the popularity baseline (0.116 here); these
        # settings reach recall@20 ~0.127 vs the generator oracle's 0.160.
        model=ModelConfig(name="mf", embed_dim=64, l2_reg=0.03),
        optim=OptimConfig(
            learning_rate=0.1, dense_optimizer="adagrad",
            sparse_optimizer="rowwise_adagrad",
        ),
        train=TrainConfig(
            batch_size=2048, epochs=60, loss="bpr", eval_every_epochs=10,
            eval_topk=(10, 20, 50),
        ),
    )


def fm_ctr_ml1m(path: str | None = None) -> Config:
    """Config 2: FM pointwise CTR on MovieLens-1M, multi-field categoricals
    (user, item + gender/age/occupation/genre side fields; set
    data.user_features_path / item_features_path to the ml-1m users.dat /
    movies.dat for the real side features)."""
    return Config(
        run_name="fm_ctr_ml1m",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio",
            test_fraction=0.2,
            num_users=6040, num_items=3706, interactions_per_user=64,
            synthetic_side_features=path is None,
        ),
        model=ModelConfig(name="fm", embed_dim=64),
        optim=OptimConfig(
            learning_rate=0.02, dense_optimizer="adagrad",
            sparse_optimizer="rowwise_adagrad",
        ),
        train=TrainConfig(
            batch_size=4096, epochs=20, loss="logloss", num_negatives=4,
            eval_every_epochs=5, eval_topk=(10, 20),
        ),
    )


def neumf_ml20m(path: str | None = None) -> Config:
    """Config 3: NeuMF (GMF + MLP fusion) with sampled negatives."""
    return Config(
        run_name="neumf_ml20m",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="leave_one_out",
            num_users=8192, num_items=4096, interactions_per_user=32,
        ),
        model=ModelConfig(
            name="neumf", gmf_dim=32, mlp_embed_dim=32, mlp_dims=(64, 32, 16)
        ),
        optim=OptimConfig(
            learning_rate=0.001, dense_optimizer="adam",
            sparse_optimizer="rowwise_adam",
        ),
        train=TrainConfig(
            batch_size=8192, epochs=20, loss="logloss", num_negatives=4,
            eval_every_epochs=5, eval_topk=(10, 20),
            # NCF-paper protocol: held-out item vs 100 sampled negatives.
            eval_protocol="sampled", eval_num_candidates=100,
        ),
    )


def dcn_criteo(path: str | None = None, max_examples: int = 2_000_000) -> Config:
    """Config 4: DCN (cross + deep) on a Criteo subset, sharded tables on
    one host."""
    return Config(
        run_name="dcn_criteo",
        data=DataConfig(
            source="criteo" if path else "synthetic_ctr",
            path=path,
            num_examples=max_examples,
            num_dense_features=13,
            categorical_vocab_sizes=(100_000,) * 26 if path else (10_000,) * 8,
            test_fraction=0.05,
        ),
        model=ModelConfig(
            name="dcn", embed_dim=32, num_cross_layers=3, mlp_dims=(512, 256, 128)
        ),
        optim=OptimConfig(
            learning_rate=0.001, dense_optimizer="adam",
            sparse_optimizer="rowwise_adagrad",
            sparse_learning_rate=0.02,
        ),
        train=TrainConfig(batch_size=8192, epochs=2, loss="logloss",
                          eval_every_epochs=1,
                          # amortize host dispatch (docs/PERF.md)
                          steps_per_dispatch=8),
        mesh=MeshConfig(table_sharding="row"),
    )


def dcn_retrieval_multihost(path: str | None = None) -> Config:
    """Config 5: multi-host DCN + retrieval — row/column-sharded tables,
    all-to-all over ICI (v5e-16 target; runs on any mesh size).

    stack_tables (fusing the 26 field tables into one so the step issues
    ONE a2a set instead of 26) was the preset until round 5, on a
    collective-count rationale that was never measured on the mesh path.
    The round-5 interleaved on-chip A/B REFUTED it: the stacked mesh step
    runs 66.05 ms vs 22.06 ms per-field (0.33x — one 213k-id dedup/
    bucket/gather chain costs far more than 26 latency-bound 8k ones;
    docs/PERF.md "Round-5 on-chip results"), while the collective-count
    saving it buys is ~1.5 ms even at a 20 us/op launch floor. Per-field
    tables are therefore the measured default; set model.stack_tables=
    true to get the single-a2a layout on interconnects where launch cost
    dominates."""
    cfg = dcn_criteo(path)
    return cfg.replace(
        run_name="dcn_multihost",
        mesh=MeshConfig(table_sharding="row", a2a_capacity_factor=2.0),
    )


def fism_ml100k(path: str | None = None) -> Config:
    """Long-tail zoo: FISM item-based retrieval on the ML-100K shape
    (pairwise BPR over history-conditioned scores)."""
    return Config(
        run_name="fism_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio",
            test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
        ),
        model=ModelConfig(name="fism", embed_dim=64, l2_reg=0.01,
                          max_history=64, fism_alpha=0.5),
        optim=OptimConfig(
            learning_rate=0.05, dense_optimizer="adagrad",
            sparse_optimizer="rowwise_adagrad",
        ),
        train=TrainConfig(
            batch_size=1024, epochs=40, loss="bpr", eval_every_epochs=10,
            eval_topk=(10, 20, 50),
        ),
    )


def multvae_ml100k(path: str | None = None) -> Config:
    """Long-tail zoo: Mult-VAE^PR autoencoder retrieval on the ML-100K
    shape (per-user reconstruction batches, ELBO objective)."""
    return Config(
        run_name="multvae_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio",
            test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
        ),
        model=ModelConfig(name="multvae", vae_hidden=256, vae_latent=64,
                          vae_beta=0.2, dropout=0.5, max_history=128),
        optim=OptimConfig(learning_rate=0.001, dense_optimizer="adam"),
        train=TrainConfig(
            batch_size=128, epochs=80, loss="multvae", eval_every_epochs=20,
            eval_topk=(10, 20, 50),
        ),
    )


def nais_ml100k(path: str | None = None) -> Config:
    """Long-tail zoo: NAIS attentive item similarity on the ML-100K shape
    (FISM with a target-aware attention pool over the history)."""
    cfg = fism_ml100k(path)
    return cfg.replace(
        run_name="nais_ml100k",
        model=ModelConfig(name="nais", embed_dim=64, l2_reg=0.01,
                          max_history=64, nais_attention_dim=16,
                          nais_beta=0.5),
        optim=OptimConfig(
            learning_rate=0.02, dense_optimizer="adagrad",
            sparse_optimizer="rowwise_adagrad",
        ),
    )


def cdae_ml100k(path: str | None = None) -> Config:
    """Long-tail zoo: collaborative denoising autoencoder on the ML-100K
    shape (per-user reconstruction batches, full-catalog BCE)."""
    cfg = multvae_ml100k(path)
    return cfg.replace(
        run_name="cdae_ml100k",
        model=ModelConfig(name="cdae", vae_hidden=256, dropout=0.2,
                          max_history=128),
        train=dataclasses.replace(cfg.train, loss="cdae"),
    )


def sasrec_ml1m(path: str | None = None) -> Config:
    """Sequential zoo: SASRec next-item prediction on the ML-1M shape
    (leave-one-out split, time-ordered sequences — the paper protocol)."""
    return Config(
        run_name="sasrec_ml1m",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="leave_one_out",
            binarize_threshold=1.0 if path else 0.0,
            num_users=6040, num_items=3706, interactions_per_user=96,
        ),
        model=ModelConfig(name="sasrec", embed_dim=64, max_history=200,
                          sasrec_blocks=2, sasrec_heads=1, dropout=0.2),
        optim=OptimConfig(learning_rate=0.001, dense_optimizer="adam",
                          sparse_optimizer="rowwise_adam"),
        train=TrainConfig(
            batch_size=128, epochs=60, loss="sasrec", eval_every_epochs=20,
            eval_topk=(10, 20),
        ),
    )


def sbpr_ml100k(path: str | None = None) -> Config:
    """Social zoo: SBPR on the ML-100K shape. MovieLens has no trust
    file, so the graph comes from data.social_path (dense-id "u v"
    lines) when you have one, else taste-overlap synthesis
    (social_degree) — the same stand-in policy as the synthetic data."""
    return Config(
        run_name="sbpr_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio", test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
            social_degree=10,
        ),
        model=ModelConfig(name="sbpr", embed_dim=64),
        optim=OptimConfig(learning_rate=0.05, sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(
            batch_size=1024, epochs=40, loss="sbpr", eval_every_epochs=10,
            eval_topk=(10, 20, 50),
        ),
    )


def apr_ml100k(path: str | None = None) -> Config:
    """Adversarial zoo: APR on the ML-100K shape — BPR-MF pretraining is
    the paper's protocol, approximated by a plain warmup (apr trains the
    minimax objective from scratch here; resume from an mf_bpr_ml100k
    checkpoint for the two-phase recipe)."""
    return Config(
        run_name="apr_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio", test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
        ),
        model=ModelConfig(name="apr", embed_dim=64, apr_eps=0.5,
                          apr_lambda=1.0),
        optim=OptimConfig(learning_rate=0.05,
                          sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(
            batch_size=1024, epochs=40, loss="apr", eval_every_epochs=10,
            eval_topk=(10, 20, 50),
        ),
    )


def irgan_ml100k(path: str | None = None) -> Config:
    """Adversarial zoo: IRGAN minimax retrieval on the ML-100K shape.
    The generator samples from a 16-item uniform pool per positive
    (train.num_negatives — the large-scale pool approximation,
    models/irgan.py); eval scores with the generator."""
    return Config(
        run_name="irgan_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio", test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
        ),
        model=ModelConfig(name="irgan", embed_dim=64, irgan_temperature=0.5),
        optim=OptimConfig(learning_rate=0.05,
                          sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(
            batch_size=1024, epochs=40, loss="irgan", num_negatives=16,
            eval_every_epochs=10, eval_topk=(10, 20, 50),
        ),
    )


def wrmf_ml100k(path: str | None = None) -> Config:
    """Classic zoo: WRMF (implicit ALS) on the ML-100K shape. Epochs are
    full alternating-least-squares sweeps (closed-form, ~15 suffice);
    the logged loss is the exact weighted objective and must decrease
    monotonically."""
    return Config(
        run_name="wrmf_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio", test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
        ),
        model=ModelConfig(name="wrmf", embed_dim=64, wrmf_alpha=10.0,
                          wrmf_reg=0.05),
        train=TrainConfig(
            batch_size=1024, epochs=15, loss="wrmf", eval_every_epochs=5,
            eval_topk=(10, 20, 50),
        ),
    )


def ease_ml100k(path: str | None = None) -> Config:
    """Closed-form zoo: EASE item-item solve on the ML-100K shape. ONE
    epoch = the entire training run (a single [V,V] ridge solve)."""
    return Config(
        run_name="ease_ml100k",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="ratio", test_fraction=0.2,
            binarize_threshold=1.0 if path else 0.0,
            num_users=943, num_items=1682, interactions_per_user=64,
        ),
        model=ModelConfig(name="ease", ease_reg=100.0),
        train=TrainConfig(
            batch_size=1024, epochs=1, loss="ease", eval_every_epochs=1,
            eval_topk=(10, 20, 50),
        ),
    )


def gru4rec_ml1m(path: str | None = None) -> Config:
    """Sequential zoo: GRU4Rec next-item prediction, same protocol and
    data shape as sasrec_ml1m (time-ordered sequences, per-position BCE)."""
    return Config(
        run_name="gru4rec_ml1m",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="leave_one_out",
            binarize_threshold=1.0 if path else 0.0,
            num_users=6040, num_items=3706, interactions_per_user=96,
        ),
        model=ModelConfig(name="gru4rec", embed_dim=64, max_history=200,
                          gru_hidden=128, gru_layers=1, dropout=0.1),
        optim=OptimConfig(learning_rate=0.001, dense_optimizer="adam",
                          sparse_optimizer="rowwise_adam"),
        train=TrainConfig(
            batch_size=128, epochs=60, loss="sasrec", eval_every_epochs=20,
            eval_topk=(10, 20),
        ),
    )


def caser_ml1m(path: str | None = None) -> Config:
    """Sequential zoo: Caser (causal conv windows + user embedding),
    same protocol and data shape as sasrec_ml1m."""
    return Config(
        run_name="caser_ml1m",
        data=DataConfig(
            source="movielens" if path else "synthetic_implicit",
            path=path,
            splitter="leave_one_out",
            binarize_threshold=1.0 if path else 0.0,
            num_users=6040, num_items=3706, interactions_per_user=96,
        ),
        model=ModelConfig(name="caser", embed_dim=64, max_history=64,
                          caser_h_filters=16, caser_heights=(2, 3, 4),
                          caser_v_filters=4, dropout=0.3),
        optim=OptimConfig(learning_rate=0.001, dense_optimizer="adam",
                          sparse_optimizer="rowwise_adam"),
        train=TrainConfig(
            batch_size=128, epochs=60, loss="sasrec", eval_every_epochs=20,
            eval_topk=(10, 20),
        ),
    )


ZOO = {
    "mf_bpr_ml100k": mf_bpr_ml100k,
    "fm_ctr_ml1m": fm_ctr_ml1m,
    "neumf_ml20m": neumf_ml20m,
    "dcn_criteo": dcn_criteo,
    "dcn_multihost": dcn_retrieval_multihost,
    "fism_ml100k": fism_ml100k,
    "multvae_ml100k": multvae_ml100k,
    "nais_ml100k": nais_ml100k,
    "cdae_ml100k": cdae_ml100k,
    "sasrec_ml1m": sasrec_ml1m,
    "gru4rec_ml1m": gru4rec_ml1m,
    "caser_ml1m": caser_ml1m,
    "sbpr_ml100k": sbpr_ml100k,
    "apr_ml100k": apr_ml100k,
    "irgan_ml100k": irgan_ml100k,
    "wrmf_ml100k": wrmf_ml100k,
    "ease_ml100k": ease_ml100k,
}
