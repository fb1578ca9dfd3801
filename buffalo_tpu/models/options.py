"""Per-algorithm option factories: defaults + validation.

Behavioral counterpart of the reference ``buffalo/algo/options.py`` —
same hyperparameter names and defaults per algorithm so configurations
port over unchanged.  TPU-specific additions (extra keys, all
defaulted): ``num_devices`` (0 = all visible chips), ``sharding``
("dp", "tp" or "dp+tp") and ``resident_mb`` (HBM budget for keeping
the padded epoch on device).  GPU-era options (``accelerator``,
``hyper_threads``) are kept for API parity; the compute device is
always the JAX default backend.
"""
from __future__ import annotations

from buffalo_tpu.utils import Option
from buffalo_tpu.utils.option import InputOptions


class AlgoOption(InputOptions):
    def get_default_option(self) -> Option:
        """Common options (reference options.py:8-30).

        :ivar bool evaluation_on_learning: run evaluation during training.
        :ivar bool compute_loss_on_training: compute loss during training.
        :ivar int early_stopping_rounds: epochs of patience after minimum
            loss (0 disables).
        :ivar bool save_best: save the model whenever loss improves.
        :ivar int evaluation_period: evaluation cadence in epochs.
        :ivar int save_period: save_best cadence in epochs.
        :ivar int random_seed: seed for factor init and sampling.
        :ivar dict validation: validation options (topk, batch, eval_samples).

        TPU-specific keys:

        :ivar int num_devices: mesh size (0 = all visible devices when
            more than one exists; 1 forces single-device).
        :ivar str sharding: "dp" (batch sharding) or "dp+tp" (also
            row-shard the factor tables; training then uses the
            shard_map range-layout epoch).
        :ivar int resident_mb: HBM budget for keeping the whole epoch's
            batches device-resident (beyond it, streaming fallbacks).
        :ivar bool range_layout: permute tables into bucket order so
            updates are contiguous ranges (default True; False falls
            back to scatter updates — mainly for parity testing).
        :ivar str epoch_dispatch: "auto" | "fused" | "group" — one XLA
            program per epoch vs one per stacked shape group (auto
            switches to group past ~100M padded entries, where the
            fused program OOMs on XLA temporaries).
        :ivar str vals_dtype: "auto" | "float32" | "bfloat16" for
            staged confidence values (auto -> bf16 at scale; solve math
            always upcasts to f32).
        """
        return Option({
            "evaluation_on_learning": True,
            "compute_loss_on_training": True,
            "early_stopping_rounds": 0,
            "save_best": False,
            "evaluation_period": 1,
            "save_period": 10,
            "random_seed": 0,
            "validation": {},
            # TPU-specific
            "num_devices": 0,
            "sharding": "dp",
            "resident_mb": 4096,
            "range_layout": True,
            "epoch_dispatch": "auto",
            "vals_dtype": "auto",
        })

    def is_valid_option(self, opt) -> bool:
        b = super().is_valid_option(opt)
        for f in ["num_workers"]:
            if f not in opt:
                raise RuntimeError(f"{f} not defined")
        return b


class ALSOption(AlgoOption):
    def get_default_option(self) -> Option:
        """Alternating Least Squares (reference options.py:40-86).

        :ivar bool adaptive_reg: scale L2 by per-row interaction count.
        :ivar int d: latent dimension.
        :ivar float reg_u / reg_i: L2 coefficients.
        :ivar float alpha: implicit-feedback confidence coefficient.
        :ivar str optimizer: llt | ldlt | manual_cg | eigen_cg | eigen_bicg |
            eigen_gmres | eigen_dgmres | eigen_minres | ialspp.
        :ivar int num_cg_max_iters: CG iteration cap.
        :ivar int block_size: iALS++ subspace block size.
        :ivar int stored_width: TPU addition — on-device factor-table
            width.  0 (auto) zero-pads 32 < d < 64 up to 64 lanes on
            TPU backends when the larger factor table exceeds ~200k
            rows (the r5 width audit: brunch d=40 epochs are 1.37x
            slower than d=64 on less arithmetic, but ML-20M d=40
            padding LOSES 16% — ``als_kernels.als_stored_width`` has
            both measurements); -1 never pads; >= 1 stores at exactly
            max(d, stored_width).  Saved models always hold the true
            ``d`` columns.
        """
        opt = super().get_default_option()
        opt.update({
            "adaptive_reg": False,
            "save_factors": False,
            "accelerator": False,
            "stored_width": 0,
            "d": 20,
            "num_iters": 10,
            "num_workers": 1,
            "hyper_threads": 256,
            "num_cg_max_iters": 3,
            "reg_u": 0.1,
            "reg_i": 0.1,
            "alpha": 8.0,
            "optimizer": "manual_cg",
            "cg_tolerance": 1e-10,
            "block_size": 32,
            "eps": 1e-10,
            "model_path": "",
            "data_opt": {},
        })
        return Option(opt)

    def is_valid_option(self, opt) -> bool:
        b = super().is_valid_option(opt)
        possible = ["llt", "ldlt", "manual_cg", "eigen_cg", "eigen_bicg",
                    "eigen_gmres", "eigen_dgmres", "eigen_minres", "ialspp"]
        if opt.optimizer not in possible:
            raise RuntimeError(
                f"optimizer ({opt.optimizer}) should be in {possible}")
        return b


class EALSOption(AlgoOption):
    def get_default_option(self) -> Option:
        """Element-wise ALS (reference options.py:98-132).

        :ivar float c0: strength of negative feedback.
        :ivar float exponent: popularity exponent for negative weights.
        """
        opt = super().get_default_option()
        opt.update({
            "save_factors": False,
            "d": 20,
            "num_iters": 10,
            "num_workers": 1,
            "reg_u": 0.1,
            "reg_i": 0.1,
            "alpha": 8.0,
            "c0": 512.0,
            "exponent": 0.5,
            "model_path": "",
            "data_opt": {},
        })
        return Option(opt)


class CFROption(AlgoOption):
    def get_default_option(self) -> Option:
        """CoFactor (reference options.py:135-177).

        :ivar float reg_c: L2 for the context embedding.
        :ivar float l: weight of user-item loss vs item-context loss.
        """
        opt = super().get_default_option()
        opt.update({
            "save_factors": False,
            "d": 20,
            "num_iters": 10,
            "num_workers": 1,
            "num_cg_max_iters": 3,
            "cg_tolerance": 1e-10,
            "eps": 1e-10,
            "reg_u": 0.1,
            "reg_i": 0.1,
            "reg_c": 0.1,
            "alpha": 8.0,
            "l": 1.0,
            "optimizer": "manual_cg",
            "model_path": "",
            "data_opt": {},
        })
        return Option(opt)

    def is_valid_option(self, opt) -> bool:
        b = super().is_valid_option(opt)
        possible = ["llt", "ldlt", "manual_cg", "eigen_cg", "eigen_bicg",
                    "eigen_gmres", "eigen_dgmres", "eigen_minres"]
        if opt.optimizer not in possible:
            raise RuntimeError(
                f"optimizer ({opt.optimizer}) should be in {possible}")
        return b


class BPRMFOption(AlgoOption):
    def get_default_option(self) -> Option:
        """Bayesian Personalized Ranking MF (reference options.py:189-253).

        :ivar bool use_bias: item bias term.
        :ivar str optimizer: sgd | adagrad | adam.
        :ivar float lr / min_lr: learning rate and its decay floor.
            Default 0.05 — higher than the reference's 0.002, which is
            tuned for per-sample hogwild updates; deterministic
            megabatch steps are fewer and need a larger step to reach
            the same accuracy (parity gate: benchmark/test_accuracy.py).
        :ivar bool per_coordinate_normalize: normalize accumulated
            gradients by per-row sample counts before the optimizer step.
        :ivar float sampling_power: 0 = uniform negatives, 1 = popularity.
        :ivar bool verify_neg: reject negatives present in the user's
            positives.
        :ivar int batch_size: sampled triplets per device step (TPU
            addition; the deterministic megabatch replacing the
            reference's hogwild job queue).
        :ivar str epoch_dispatch: "auto" | "fused" | "split" (TPU
            addition).  "fused" (= "auto") runs the whole epoch as one
            XLA program; "split" issues negative sampling+verification
            as a separate dispatch whose output feeds the update
            program — bit-identical factors, one extra dispatch per
            epoch, and the bloom-probe gathers never share a program
            with the gradient scatter-adds.
        :ivar float max_step_norm: TPU-only — per-row L2 cap on each
            megabatch's aggregated sgd update (0 disables; cf.
            W2VOption).  The hogwild reference interleaves a popular
            item's updates with re-reads (each step sees the partly
            updated factors, so the pairwise logit self-damps); the
            fused megabatch aggregates per-sample gradients computed
            from ONE stale snapshot, which diverges on popularity-
            skewed data (measured: ML-20M-shaped zipf corpus explodes
            to 1e16 within one epoch uncapped, trains capped).
        :ivar int stored_width: TPU addition — on-device storage width
            of the factor tables.  0 (auto) zero-pads sub-64 ``d`` up
            to 64 lanes on TPU backends (sub-64 tables hit a slow XLA
            path: KakaoBrunch epochs measured 4.2/4.0/5.0 s at
            d=10/20/40 vs a flat 1.91 s padded; factors identical to
            6e-8 — ops/sgd_kernels.resolve_stored_width).  -1 never
            pads; >=1 stores at exactly max(d, stored_width).  Saved
            models always hold the true ``d`` columns.
        """
        opt = super().get_default_option()
        opt.update({
            "accelerator": False,
            "use_bias": True,
            "evaluation_period": 100,
            "num_workers": 1,
            "hyper_threads": 256,
            "num_iters": 100,
            "d": 20,
            "update_i": True,
            "update_j": True,
            "reg_u": 0.025,
            "reg_i": 0.025,
            "reg_j": 0.025,
            "reg_b": 0.025,
            "optimizer": "sgd",
            "lr": 0.05,
            "min_lr": 0.0001,
            "beta1": 0.9,
            "beta2": 0.999,
            "eps": 1e-10,
            "per_coordinate_normalize": False,
            "num_negative_samples": 1,
            "sampling_power": 0.0,
            "verify_neg": True,
            "random_positive": False,
            "max_step_norm": 0.1,
            "batch_size": 0,
            "epoch_dispatch": "auto",
            "stored_width": 0,
            "model_path": "",
            "data_opt": {},
        })
        return Option(opt)


class WARPOption(AlgoOption):
    def get_default_option(self) -> Option:
        """WARP / CML (reference options.py:256-312).

        :ivar int max_trials: negative-search attempt cap; trial count
            feeds the rank weight.
        :ivar str score_func: dot | l2 (CML).
        :ivar float threshold: margin.
        :ivar str epoch_dispatch: "auto" | "fused" | "split" (TPU
            addition, cf. BPRMFOption): "split" runs the candidate
            bloom probes as a separate dispatch feeding packed seen
            bits to the update program — bit-identical factors.
        :ivar bool adaptive_trials: TPU addition, default ON — start
            at a small fixed candidate budget (K=16) and double it (up
            to min(max_trials, 64)) whenever more than 2% of positives
            fail to find a violating negative.  Early epochs find
            violators in a couple of trials (the reference's average
            trial count rises the same way, warp.cc:118-136), so most
            of a fixed K=64's candidate gathers/bloom probes are
            wasted there — measured 5.10 vs 8.79 s/epoch ML-20M d=32
            (1.7x).  The default was settled by a 32-seed PAIRED A/B
            (`benchmark/warp_adaptive_ab.py`, r5): paired NDCG delta
            -0.0018 with CI95 [-0.0033, -0.0003] and AUC delta
            +0.0001 — a statistically resolvable but practically
            negligible trade for the 1.7x epoch win.  Set False to
            recover the fixed-K schedule.
        :ivar str probe_mode: "lazy" (default) | "all" — TPU addition.
            "lazy" bloom-probes only each sample's first few
            margin-violating candidates (the all-K probe was measured
            at 61% of the epoch; lazy cut ML-20M d=32 from 18.1 s to
            ~8 s/epoch).  Trial ranks count seen non-violators as
            tried (~0.5% inflation through Phi's log; see
            ops/warp_kernels._select_violator_lazy); "all" keeps the
            reference-exact trial-rank semantics and is forced under
            epoch_dispatch="split".
        :ivar int stored_width: TPU addition — on-device storage width
            of the factor tables (cf. BPRMFOption).  0 (auto) zero-pads
            sub-64 ``d`` up to 64 lanes on TPU backends; -1 never pads;
            >=1 stores at exactly max(d, stored_width).  Zero columns
            are inert through the WARP update including the unit-ball
            projection; saved models hold the true ``d`` columns.
        """
        opt = super().get_default_option()
        opt.update({
            "accelerator": False,
            "evaluation_period": 5,
            "num_workers": 1,
            "hyper_threads": 256,
            "num_iters": 40,
            "d": 64,
            "threshold": 1.0,
            "score_func": "dot",
            "max_trials": 500,
            "adaptive_trials": True,
            "probe_mode": "lazy",
            "epoch_dispatch": "auto",
            "stored_width": 0,
            "update_i": True,
            "update_j": True,
            "reg_u": 0.0,
            "reg_i": 0.0,
            "reg_j": 0.0,
            "optimizer": "adagrad",
            "lr": 0.05,
            "min_lr": 0.0001,
            "beta1": 0.9,
            "beta2": 0.999,
            "eps": 1e-10,
            "per_coordinate_normalize": False,
            "batch_size": 0,
            "model_path": "",
            "data_opt": {},
        })
        return Option(opt)


class W2VOption(AlgoOption):
    def get_default_option(self) -> Option:
        """Skip-gram word2vec over streams (reference options.py:315-352).

        :ivar int window: context window size.
        :ivar int min_count: vocabulary frequency floor.
        :ivar float sample: frequent-word subsampling threshold.
        :ivar int num_negative_samples: negatives per (center, context).
        :ivar float max_step_norm: TPU-only — per-row L2 cap on each
            megabatch's aggregated update (0 disables).  The sequential
            hogwild reference interleaves a frequent word's updates
            with sigmoid saturation; the fused megabatch stacks them,
            which diverges once lr*count > 1.  A/B on the synthetic
            analogy gate picked capped (0.1) as default.
        :ivar int max_chunks_per_dispatch: TPU addition — upper bound
            on the lax.scan length of one fused-epoch dispatch.  The
            whole-epoch program at the full KakaoBrunch stream shape
            (~225 chunks) took the remote TPU compiler/worker down; a
            32-chunk body compiles and runs fine, so longer epochs run
            as ceil(n/32) dispatches of one shared compiled shape with
            the tables carried across groups (semantics unchanged).
        :ivar int stored_width: TPU addition — on-device storage width
            of the embedding tables (cf. BPRMFOption).  0 (auto)
            zero-pads sub-64 ``d`` up to 64 lanes on TPU backends; -1
            never pads; >=1 stores at exactly max(d, stored_width).
            Saved models always hold the true ``d`` columns.
        :ivar str pair_gen: TPU addition — where skip-gram pairs are
            expanded.  "host" ships precomputed (input, target) pairs
            (~8 B/pair; ~0.5 GB/epoch at the brunch stream shape) and
            scatters 2 + K table rows per pair.  "device" ships only
            the subsampled token stream (~9 B/token) and expands the
            window inside the jitted epoch with position-major delta
            accumulation and block-shared negatives
            (``w2v_kernels.w2v_epoch_stream``) — same SGNS family,
            different (valid) sampling stream.  "auto" = device on
            TPU single-device runs, host elsewhere (the dp-mesh path
            always uses host pairs).
        :ivar str offset_mode: "device" pair_gen only — "scan"
            (default) runs ONE offset pass under lax.scan over the
            traced offset; "unrolled" emits one pass per window
            position.  Measured at the full brunch stream shape
            (`w2v_stream_{decomp,scan}.log`): scan compiles 2.8x
            faster (96 vs 271 s) AND dispatches faster (1.49 vs
            1.65 s/epoch), so it wins on both axes; both modes share
            the same pad+slice math and are parity-tested.
        :ivar int neg_block: "device" pair_gen only — consecutive-token
            block size sharing one negative draw (pWord2Vec-style).
            Default 4 — chosen on BRUNCH-SCALE loss trajectories
            (epochs 1-4, vs the per-pair host path's
            3.19/2.66/2.62): block=16 converges visibly slower
            (4.10/4.02/3.92 — the sharing noise costs ~2 epochs)
            while block=4 matches (3.46/2.76/2.65/2.62) at
            4.6 s/epoch; block=1 matches exactly at 8.0 s.  Raise it
            (16 -> 3.1 s/epoch) only when epoch time dominates and
            extra epochs are acceptable.  Small-corpus purity gates
            additionally reject block >= 128 outright (0.57 vs 1.00,
            three-arm parity harness).
        """
        opt = super().get_default_option()
        opt.update({
            "evaluation_on_learning": False,
            "num_workers": 1,
            "num_iters": 3,
            "d": 20,
            "window": 5,
            "min_count": 5,
            "sample": 0.001,
            "num_negative_samples": 5,
            "lr": 0.025,
            "min_lr": 0.0001,
            "max_step_norm": 0.1,
            "max_chunks_per_dispatch": 32,
            "stored_width": 0,
            "pair_gen": "auto",
            "offset_mode": "scan",
            "neg_block": 4,
            "batch_size": 0,
            "model_path": "",
            "data_opt": {},
        })
        return Option(opt)


class PLSIOption(AlgoOption):
    def get_default_option(self) -> Option:
        """pLSI EM (reference options.py:355-385).

        :ivar float alpha1: smoothing for cluster assignment P(z|u).
        :ivar float alpha2: smoothing for item preference P(i|z).
        """
        opt = super().get_default_option()
        opt.update({
            "d": 20,
            "num_iters": 10,
            "num_workers": 1,
            "alpha1": 1.0,
            "alpha2": 1.0,
            "eps": 1e-10,
            "model_path": "",
            "save_factors": False,
            "data_opt": {},
            "inherit_opt": {},
        })
        return Option(opt)
