"""Bayesian Personalized Ranking matrix factorization on TPU.

Counterpart of the reference BPR stack (driver ``buffalo/algo/bpr.py``,
C++ core ``lib/algo_impl/bpr/bpr.cc``, CUDA ``lib/cuda/bpr/bpr.cu``):
same model (MF + item bias trained on sampled (u, i+, j-) triplets with
log-sigmoid loss), same sampling options (uniform or popularity^power
cumulative-table negatives with seen-set rejection), same optimizers
(sgd with linear lr decay / adagrad / adam with per-epoch deferred
gradients and optional per-coordinate normalization), same loss-sample
harness (sqrt(U) fixed triplets, ``bpr.py:135-161``) — but the
producer-consumer hogwild thread pool becomes deterministic jitted
megabatch steps with scatter-add gradient aggregation.

Reference: Rendle et al., BPR: Bayesian Personalized Ranking from
Implicit Feedback (UAI 2009).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Optional

import numpy as np

from buffalo_tpu.data.base import Data
from buffalo_tpu.data.batching import COOBatcher
from buffalo_tpu.evaluate import Evaluable
from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.models.options import BPRMFOption
from buffalo_tpu.ops import sgd_kernels as K


class BPRMF(Algo, BPRMFOption, Evaluable, Serializable):
    """Python driver for TPU BPR-MF."""

    def __init__(self, opt_path=None, *args, **kwargs):
        Algo.__init__(self, *args, **kwargs)
        BPRMFOption.__init__(self, *args, **kwargs)
        Evaluable.__init__(self, *args, **kwargs)
        Serializable.__init__(self, *args, **kwargs)
        self._setup_driver(opt_path, BPRMFOption, "BPRMF", ["matrix"], kwargs)

    @staticmethod
    def new(path, data_fields=[]):
        return BPRMF.instantiate(BPRMFOption, path, data_fields)

    def set_data(self, data):
        assert isinstance(data, Data), f"Wrong instance: {type(data)}"
        self.data = data

    def normalize(self, group="item"):
        if group == "item" and not self.opt.get("_nrz_Q"):
            self.Q = self._normalize(self.Q)
            self.Qb = np.zeros_like(self.Qb)
            self.opt._nrz_Q = True
        elif group == "user" and not self.opt.get("_nrz_P"):
            self.P = self._normalize(self.P)
            self.opt._nrz_P = True

    def initialize(self):
        super().initialize()
        self.init_factors()
        self.prepare_sampling()

    def init_factors(self):
        assert self.data, "Data is not set"
        header = self.data.get_header()
        d = self.opt.d
        self.num_nnz = header["num_nnz"]
        for name, rows in [("P", header["num_users"]),
                           ("Q", header["num_items"])]:
            setattr(self, name, np.abs(np.random.normal(
                scale=1.0 / (d ** 2), size=(rows, d)).astype("float32")))
        self.Qb = np.abs(np.random.normal(
            scale=1.0 / (d ** 2),
            size=(header["num_items"],)).astype("float32"))
        if not self.opt.use_bias:
            self.Qb *= 0

    def prepare_sampling(self):
        """Popularity^power cumulative table (bpr.py:99-112).

        Stored as a NORMALIZED int32 CDF (float64 cumsum scaled to
        0x7FFFFFFF, like the W2V unigram table): a raw float32 cumsum
        of counts loses boundary resolution past ~2^24 total — tail
        items of a 100M+-interaction catalog would quantize to zero
        probability, where the reference's int64 lower_bound is exact.
        """
        header = self.data.get_header()
        self._cum_table = None
        if self.opt.sampling_power > 0.0:
            group = self.data.get_group("colwise")
            counts = np.diff(np.asarray(group["indptr"])).astype(np.float64)
            counts = counts ** float(self.opt.sampling_power)
            cum = np.cumsum(counts)
            cum /= max(cum[-1], 1.0)
            self._cum_table = (cum * 0x7FFFFFFF).astype(np.int32)

    # ------------------------------------------------------------- retrieval
    def _get_topk_recommendation(self, rows, topk, pool=None):
        p = self.P[rows]
        Qb = self.Qb if self.opt.use_bias else None
        topks = super()._get_topk_recommendation(
            p, self.Q, pb=None, Qb=Qb, pool=pool, topk=topk,
            num_workers=self.opt.num_workers)
        return zip(rows, topks)

    def _get_most_similar_item(self, col, topk, pool):
        return super()._get_most_similar_item(
            col, topk, self.Q, self.opt.get("_nrz_Q", False), pool)

    def get_scores(self, row_col_pairs):
        return {(r, c): float(self.P[r].dot(self.Q[c]) + self.Qb[c])
                for r, c in row_col_pairs}

    def _get_scores(self, row, col):
        return (self.P[row] * self.Q[col]).sum(axis=1) + self.Qb[col]

    # -------------------------------------------------------------- training
    def sampling_loss_samples(self):
        """sqrt(U) fixed (u, i+, j-) triplets for loss (bpr.py:135-161)."""
        users, positives, negatives = [], [], []
        if self.opt.compute_loss_on_training:
            header = self.data.get_header()
            num_loss_samples = int(header["num_users"] ** 0.5)
            _users = np.random.choice(range(self.P.shape[0]),
                                      size=num_loss_samples, replace=False)
            for u in _users:
                keys, *_ = self.data.get(u)
                if len(keys) == 0:
                    continue
                seen = set(map(int, keys))
                negs = [n for n in np.random.choice(
                    range(self.Q.shape[0]), size=len(seen) + 1,
                    replace=False) if n not in seen]
                if not negs:
                    continue
                users.append(int(u))
                positives.append(int(keys[0]))
                negatives.append(int(negs[0]))
            self.logger.info(f"Generated {len(users)} loss samples.")
        self._sub_samples = [np.array(users, dtype=np.int32),
                             np.array(positives, dtype=np.int32),
                             np.array(negatives, dtype=np.int32)]

    def compute_loss(self) -> float:
        users, positives, negatives = self._sub_samples
        if len(users) == 0:
            return 0.0
        return float(K.bpr_loss(self._P, self._Q, self._Qb,
                                users, positives, negatives,
                                use_bias=bool(self.opt.use_bias)))

    def _static_opts(self) -> dict:
        opt = self.opt
        return dict(num_items=int(self.data.get_header()["num_items"]),
                    num_negatives=int(opt.num_negative_samples),
                    use_bias=bool(opt.use_bias),
                    update_i=bool(opt.update_i),
                    update_j=bool(opt.update_j),
                    verify_neg=bool(opt.verify_neg),
                    use_cum_table=self._cum_table is not None)

    def _stage_epoch_chunks(self, batch_size, chunk_sharding=None):
        """Device-resident (nchunks, N) positives in CSR order.

        The reference's job queue also walks rows in CSR order
        (``algo.cc:308-362``); padding entries beyond nnz are masked
        inside the fused epoch.  ``chunk_sharding`` (dp mesh path)
        shards the batch axis across devices.
        """
        import jax

        group = self.data.get_group("rowwise")
        indptr = np.asarray(group["indptr"], dtype=np.int64)
        users = np.repeat(np.arange(len(indptr) - 1, dtype=np.int32),
                          np.diff(indptr))
        items = np.asarray(group["key"], dtype=np.int32)
        nnz = len(items)
        nchunks = -(-nnz // batch_size)
        pad = nchunks * batch_size - nnz
        if pad:
            users = np.concatenate([users, np.zeros(pad, np.int32)])
            items = np.concatenate([items, np.zeros(pad, np.int32)])
        put = (jax.device_put if chunk_sharding is None
               else partial(jax.device_put, device=chunk_sharding))
        return (put(users.reshape(nchunks, batch_size)),
                put(items.reshape(nchunks, batch_size)), nnz)

    def train(self, training_callback: Optional[
            Callable[[int, Dict[str, float]], None]] = None) -> Dict[str, float]:
        assert self.data, "Data is not set"
        import jax
        import jax.numpy as jnp

        opt = self.opt
        optimizer = opt.optimizer
        header = self.data.get_header()

        batch_size = int(opt.get("batch_size") or 0)
        if batch_size <= 0:
            # keep >= 32 sequential steps per epoch: the reference's
            # hogwild applies nnz tiny updates per epoch, and a single
            # whole-epoch megabatch step cannot match its learning
            # dynamics at small nnz (cf. w2v.py's same rule)
            batch_size = min(max(self.num_nnz // 32, 1024), 1 << 19)

        group = self.data.get_group("rowwise")
        bloom_np, bloom_log2 = K.build_bloom(
            np.asarray(group["indptr"]), np.asarray(group["key"]))
        bloom = jax.device_put(bloom_np)
        # popularity sampling rides Walker-alias tables on device (the
        # int32 CDF is the serialized reference format; searchsorted
        # over a big CDF is pathological on TPU — see
        # sgd_kernels.build_alias_table).  CDF -> weights via diff.
        if self._cum_table is not None:
            cum_table = jax.device_put(K.build_alias_table(
                np.diff(self._cum_table.astype(np.int64), prepend=0)))
        else:
            cum_table = jnp.zeros((1,), jnp.float32)

        # sub-64-lane tables hit a slow XLA code path (2-2.6x) — store
        # them zero-padded on device, slice back on host sync
        # (sgd_kernels.resolve_stored_width has the measurements)
        d = int(opt.d)
        width = K.resolve_stored_width(d, int(opt.get("stored_width", 0)))
        self._P = jax.device_put(K.pad_cols(self.P, width))
        self._Q = jax.device_put(K.pad_cols(self.Q, width))
        self._Qb = jax.device_put(self.Qb)
        statics = self._static_opts()
        pcn = bool(opt.per_coordinate_normalize)
        deferred = optimizer != "sgd"

        # device-resident fused epoch unless the COO exceeds the budget
        resident_mb = int(opt.get("resident_mb", 4096))
        resident = (self.num_nnz * 8) <= resident_mb * 1024 * 1024
        # "split" issues negative sampling as its own dispatch before
        # each update epoch (bit-identical factors; ~2x dispatch count)
        dispatch = str(opt.get("epoch_dispatch") or "auto")
        if dispatch not in ("auto", "fused", "split"):
            raise ValueError(
                f"epoch_dispatch must be auto|fused|split, got {dispatch!r}")
        split_neg = dispatch == "split"
        if split_neg and not resident:
            self.logger.warning(
                "epoch_dispatch='split' applies to the device-resident "
                "fused epoch only; the streaming path ignores it")
            split_neg = False
        mesh = self._select_dp_mesh(resident, split_neg)
        repl = None
        if mesh is not None:
            from buffalo_tpu import parallelism
            from jax.sharding import NamedSharding, PartitionSpec
            repl = parallelism.replicated(mesh)
            chunk_shard = NamedSharding(mesh, PartitionSpec(None, "d"))
            # chunk width must divide evenly over the mesh
            batch_size = -(-batch_size // mesh.size) * mesh.size
            bloom = jax.device_put(bloom_np, repl)
            # tuple (alias tables) or dummy array — device_put either
            # pytree onto the replicated spec
            cum_table = jax.device_put(
                jax.tree.map(np.asarray, cum_table), repl)
            self._P = jax.device_put(K.pad_cols(self.P, width), repl)
            self._Q = jax.device_put(K.pad_cols(self.Q, width), repl)
            self._Qb = jax.device_put(self.Qb, repl)
        if resident:
            users_c, items_c, nnz = self._stage_epoch_chunks(
                batch_size, chunk_sharding=(
                    chunk_shard if mesh is not None else None))
            # random_positive (bpr.cu:53): per-slot uniform positive
            # draw needs the CSR positive lists on device
            def put_repl(x):
                return (jax.device_put(x, repl) if mesh is not None
                        else jax.device_put(x))
            if bool(opt.get("random_positive")):
                rw = self.data.get_group("rowwise")
                self._pos_indptr = put_repl(
                    np.asarray(rw["indptr"], dtype=np.int32))
                self._pos_keys = put_repl(
                    np.asarray(rw["key"], dtype=np.int32))
            else:
                self._pos_indptr = put_repl(np.zeros(2, np.int32))
                self._pos_keys = put_repl(np.zeros(1, np.int32))
            opt_state = {}
            if deferred:
                opt_state = {"mP": jnp.zeros_like(self._P),
                             "vP": jnp.zeros_like(self._P),
                             "mQ": jnp.zeros_like(self._Q),
                             "vQ": jnp.zeros_like(self._Q)}
                if opt.use_bias:
                    opt_state["mQb"] = jnp.zeros_like(self._Qb)
                    opt_state["vQb"] = jnp.zeros_like(self._Qb)
        else:
            if bool(opt.get("random_positive")):
                # reference parity: only the accelerator path honors
                # random_positive (options.py:216 "only implemented in
                # cuda mode"); the streaming fallback walks CSR order
                self.logger.warning(
                    "random_positive is honored on the fused "
                    "device-resident path only; streaming epochs walk "
                    "positives in CSR order")
            coo = COOBatcher(self.data, chunk_size=batch_size,
                             shuffle=True, seed=int(opt.random_seed))
            if deferred:
                gradP = jnp.zeros_like(self._P)
                gradQ = jnp.zeros_like(self._Q)
                gradQb = jnp.zeros_like(self._Qb)
                countP = jnp.zeros(self._P.shape[0], jnp.float32)
                countQ = jnp.zeros(self._Q.shape[0], jnp.float32)
                mP = jnp.zeros_like(self._P)
                vP = jnp.zeros_like(self._P)
                mQ = jnp.zeros_like(self._Q)
                vQ = jnp.zeros_like(self._Q)
                mQb = jnp.zeros_like(self._Qb)
                vQb = jnp.zeros_like(self._Qb)

        self.sampling_loss_samples()

        rng = jax.random.PRNGKey(int(opt.random_seed))
        total_samples = float(self.num_nnz) * opt.num_iters
        processed = 0.0

        def _sync_host():
            self.P = np.ascontiguousarray(np.asarray(self._P)[:, :d])
            self.Q = np.ascontiguousarray(np.asarray(self._Q)[:, :d])
            self.Qb = np.asarray(self._Qb)
        self._sync_host_factors = _sync_host

        best_loss, loss, self.validation_result = float("inf"), None, {}
        full_st = time.time()
        self.iteration_times = []  # per-epoch train seconds
        for i in range(opt.num_iters):
            start_t = time.time()
            if resident and mesh is not None:
                rng, sub = jax.random.split(rng)
                self._P, self._Q, self._Qb, opt_state = K.bpr_epoch_dp(
                    self._P, self._Q, self._Qb, opt_state,
                    users_c, items_c, bloom, cum_table, sub,
                    jnp.int32(i), self._pos_indptr, self._pos_keys,
                    mesh=mesh,
                    random_positive=bool(opt.get("random_positive")),
                    optimizer=optimizer, bloom_log2=bloom_log2,
                    per_coordinate_normalize=pcn, lr=float(opt.lr),
                    min_lr=float(opt.min_lr), beta1=float(opt.beta1),
                    beta2=float(opt.beta2), reg_u=float(opt.reg_u),
                    reg_i=float(opt.reg_i), reg_j=float(opt.reg_j),
                    reg_b=float(opt.reg_b), num_valid=nnz,
                    total_samples=total_samples,
                    max_step_norm=float(opt.get("max_step_norm", 0.0)),
                    **statics)
            elif resident:
                rng, sub = jax.random.split(rng)
                negs = None
                if split_neg:
                    # dispatch 1: verified negatives only (gather/probe
                    # graph); dispatch 2 below consumes them and is pure
                    # scatter/update — the two graphs never fuse
                    negs = K.bpr_sample_negatives_epoch(
                        users_c, bloom, cum_table, sub,
                        num_items=statics["num_items"],
                        num_negatives=statics["num_negatives"],
                        verify_neg=statics["verify_neg"],
                        use_cum_table=statics["use_cum_table"],
                        bloom_log2=bloom_log2)
                self._P, self._Q, self._Qb, opt_state = K.bpr_epoch(
                    self._P, self._Q, self._Qb, opt_state,
                    users_c, items_c, bloom, cum_table, sub,
                    jnp.int32(i), self._pos_indptr, self._pos_keys,
                    negs, precomputed_neg=split_neg,
                    random_positive=bool(opt.get("random_positive")),
                    optimizer=optimizer,
                    bloom_log2=bloom_log2,
                    per_coordinate_normalize=pcn, lr=float(opt.lr),
                    min_lr=float(opt.min_lr), beta1=float(opt.beta1),
                    beta2=float(opt.beta2), reg_u=float(opt.reg_u),
                    reg_i=float(opt.reg_i), reg_j=float(opt.reg_j),
                    reg_b=float(opt.reg_b), num_valid=nnz,
                    total_samples=total_samples,
                    max_step_norm=float(opt.get("max_step_norm", 0.0)),
                    **statics)
            else:
                for users, positives, _vals in coo:
                    rng, sub = jax.random.split(rng)
                    if deferred:
                        gradP, gradQ, gradQb, countP, countQ = \
                            K.bpr_accumulate_step(
                                self._P, self._Q, self._Qb, gradP, gradQ,
                                gradQb, countP, countQ, users, positives,
                                bloom, cum_table, sub,
                                per_coordinate_normalize=pcn,
                                bloom_log2=bloom_log2,
                                **statics)
                    else:
                        # linear lr decay by progress (algo.cc:283-287)
                        progress = processed / total_samples
                        lr = max(opt.lr - (opt.lr - opt.min_lr) * progress,
                                 opt.min_lr)
                        self._P, self._Q, self._Qb = K.bpr_sgd_step(
                            self._P, self._Q, self._Qb, users, positives,
                            bloom, cum_table, sub,
                            jnp.float32(lr),
                            reg_u=float(opt.reg_u), reg_i=float(opt.reg_i),
                            reg_j=float(opt.reg_j), reg_b=float(opt.reg_b),
                            bloom_log2=bloom_log2,
                            max_step_norm=float(
                                opt.get("max_step_norm", 0.0)),
                            **statics)
                    processed += len(users)
                if deferred:
                    self._P, gradP, mP, vP = K.apply_deferred_update(
                        self._P, gradP, mP, vP, countP, i, optimizer=optimizer,
                        lr=float(opt.lr), beta1=float(opt.beta1),
                        beta2=float(opt.beta2), reg=float(opt.reg_u),
                        per_coordinate_normalize=pcn)
                    self._Q, gradQ, mQ, vQ = K.apply_deferred_update(
                        self._Q, gradQ, mQ, vQ, countQ, i, optimizer=optimizer,
                        lr=float(opt.lr), beta1=float(opt.beta1),
                        beta2=float(opt.beta2), reg=float(opt.reg_i),
                        per_coordinate_normalize=pcn)
                    if opt.use_bias:
                        self._Qb, gradQb, mQb, vQb = K.apply_deferred_update(
                            self._Qb, gradQb, mQb, vQb, countQ, i,
                            optimizer=optimizer, lr=float(opt.lr),
                            beta1=float(opt.beta1), beta2=float(opt.beta2),
                            reg=float(opt.reg_b),
                            per_coordinate_normalize=pcn)
                    if pcn:
                        countP = jnp.zeros_like(countP)
                        countQ = jnp.zeros_like(countQ)

            loss = self.compute_loss()  # device readback: fences the epoch
            train_t = time.time() - start_t
            self.iteration_times.append(train_t)
            metrics = {"train_loss": loss}
            if opt.get("validation") and opt.evaluation_on_learning and \
                    self.periodical(opt.evaluation_period, i):
                start_t = time.time()
                _sync_host()
                self.validation_result = self.get_validation_results()
                vali_t = time.time() - start_t
                val_str = " ".join(f"{k}:{v:0.5f}"
                                   for k, v in self.validation_result.items())
                self.logger.info(f"Validation: {val_str} "
                                 f"Elapsed {vali_t:0.3f} secs")
                metrics.update({f"val_{k}": v
                                for k, v in self.validation_result.items()})
                if training_callback is not None and callable(training_callback):
                    training_callback(i, metrics)
            self.logger.info(
                "Iteration %d: Loss %.3f Elapsed %.3f secs (%.0f samples/s)"
                % (i + 1, loss, train_t,
                   self.num_nnz / max(train_t, 1e-9)))
            best_loss = self.save_best_only(loss, best_loss, i)
            if self.early_stopping(loss):
                break
        _sync_host()
        del self._P, self._Q, self._Qb
        self._sync_host_factors = None
        self.logger.info(
            f"elapsed for full epochs: {time.time() - full_st:.2f} sec")
        ret = {"train_loss": loss}
        ret.update({f"val_{k}": v for k, v in self.validation_result.items()})
        return ret

    # --------------------------------------------------------------- access
    def _get_feature(self, index, group="item"):
        if group == "item":
            return self.Q[index]
        elif group == "user":
            return self.P[index]
        return None

    def _get_data(self):
        data = super()._get_data()
        data.extend([("opt", self.opt), ("P", self.P), ("Q", self.Q),
                     ("Qb", self.Qb)])
        return data

    def get_evaluation_metrics(self):
        return ["train_loss", "val_ndcg", "val_map", "val_accuracy",
                "val_auc"]
