"""WARP (Weighted Approximate-Rank Pairwise) MF / CML on TPU.

Counterpart of the reference WARP stack (driver
``buffalo/algo/warp.py``, C++ core ``lib/algo_impl/warp/warp.cc``):
rank-weighted pairwise updates with adaptive negative search, ``dot``
or ``l2`` (collaborative metric learning) scores, deferred
adagrad/adam with optional per-coordinate normalization, per-epoch
unit-ball projection, and violation-rate training loss.

Reference: Weston et al., WSABIE (IJCAI 2011); Hsieh et al.,
Collaborative Metric Learning (WWW 2017).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

from buffalo_tpu.data.base import Data
from buffalo_tpu.data.batching import COOBatcher
from buffalo_tpu.evaluate import Evaluable
from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.models.options import WARPOption
from buffalo_tpu.ops import sgd_kernels as K
from buffalo_tpu.ops import warp_kernels as W


def default_batch_size(nnz: int, d: int, max_trials: int) -> int:
    """Auto batch size for the WARP epoch (shared with the profiling
    microbench so its chunk geometry cannot drift from production).

    Keep >= 32 sequential steps per epoch: the reference's hogwild
    applies nnz tiny updates per epoch, and a single whole-epoch
    megabatch step cannot match its learning dynamics at small nnz
    (cf. w2v.py's same rule).  Then bound the per-chunk candidate
    live-set: the epoch materializes a (batch, K, d) gathered-candidate
    tensor, and 2^18 x 64 x 64 x 4B = 4.3 GB OOMed a 16 GB chip
    (measured, ML-20M d=64); budget it at ~512 MB worst-case.
    """
    batch_size = min(max(nnz // 32, 1024), 1 << 18)
    k_worst = int(min(max(int(max_trials), 2), 64))
    cap = (512 << 20) // max(k_worst * int(d) * 4, 1)
    return max(min(batch_size, cap), 1024)


class WARP(Algo, WARPOption, Evaluable, Serializable):
    """Python driver for TPU WARP."""

    def __init__(self, opt_path=None, *args, **kwargs):
        Algo.__init__(self, *args, **kwargs)
        WARPOption.__init__(self, *args, **kwargs)
        Evaluable.__init__(self, *args, **kwargs)
        Serializable.__init__(self, *args, **kwargs)
        self._setup_driver(opt_path, WARPOption, "WARP", ["matrix"], kwargs)

    @staticmethod
    def new(path, data_fields=[]):
        return WARP.instantiate(WARPOption, path, data_fields)

    def set_data(self, data):
        assert isinstance(data, Data), f"Wrong instance: {type(data)}"
        self.data = data

    def normalize(self, group="item"):
        if str(self.opt.score_func) == "l2":
            # distances are not scale-invariant (warp.py:63-64)
            self.logger.warning(
                "Normalization will harm performance if score func is L2")
        if group == "item" and not self.opt.get("_nrz_Q"):
            self.Q = self._normalize(self.Q)
            self.opt._nrz_Q = True
        elif group == "user" and not self.opt.get("_nrz_P"):
            self.P = self._normalize(self.P)
            self.opt._nrz_P = True

    def initialize(self):
        super().initialize()
        self.init_factors()

    def init_factors(self):
        assert self.data, "Data is not set"
        header = self.data.get_header()
        d = self.opt.d
        self.num_nnz = header["num_nnz"]
        for name, rows in [("P", header["num_users"]),
                           ("Q", header["num_items"])]:
            setattr(self, name, np.abs(np.random.normal(
                scale=1.0 / (d ** 2), size=(rows, d)).astype("float32")))

    # ------------------------------------------------------------- retrieval
    def _get_topk_recommendation(self, rows, topk, pool=None):
        """dot: plain MIPS; l2: argmax of -(||p-q||^2) (warp.py:94-107)."""
        p = self.P[rows]
        if self.opt.score_func == "l2":
            Q = self.Q if pool is None else self.Q[pool]
            # -(p^2 + q^2 - 2 p.q); p^2 constant per row
            scores = 2.0 * p @ Q.T - (Q * Q).sum(axis=1)[None, :]
            topks = np.asarray(self.get_topk(
                scores, k=topk, num_threads=self.opt.num_workers))
            if pool is not None:
                topks = np.asarray(pool)[topks]
        else:
            topks = super()._get_topk_recommendation(
                p, self.Q, pb=None, Qb=None, pool=pool, topk=topk,
                num_workers=self.opt.num_workers)
        return zip(rows, topks)

    def _get_most_similar_item(self, col, topk, pool):
        if str(self.opt.score_func) == "l2":
            # CML neighbours rank by squared L2 distance, not cosine
            # (warp.py:109-137; returned scores are the positive
            # distances, per the reference's output convention)
            if isinstance(col, np.ndarray):
                q = col
            else:
                q = self.Q[col]
                topk += 1  # the query itself ranks first, dropped later
            candidates = self.Q if pool is None else self.Q[pool]
            neg_dist = -((candidates - q) ** 2).sum(axis=-1)
            picked = self.get_topk(neg_dist, k=topk,
                                   num_threads=self.opt.num_workers)
            best = -neg_dist[picked]
            if pool is not None:
                picked = np.asarray(pool)[picked]
            return picked, best
        return super()._get_most_similar_item(
            col, topk, self.Q, self.opt.get("_nrz_Q", False), pool)

    def get_scores(self, row_col_pairs):
        if str(self.opt.score_func) == "l2":
            return {(r, c): -float(((self.P[r] - self.Q[c]) ** 2).sum())
                    for r, c in row_col_pairs}  # warp.py:139-143
        return {(r, c): float(self.P[r].dot(self.Q[c]))
                for r, c in row_col_pairs}

    def _get_scores(self, row, col):
        if str(self.opt.score_func) == "l2":
            # the reference's validation variant offsets by +1
            # (warp.py:146-150) — kept for metric parity
            return 1.0 - ((self.P[row] - self.Q[col]) ** 2).sum(axis=-1)
        return (self.P[row] * self.Q[col]).sum(axis=1)

    # -------------------------------------------------------------- training
    def sampling_loss_samples(self):
        """sqrt(U) fixed triplets, as BPR (bpr.py:135-161)."""
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
        self._sub_samples = [np.array(users, dtype=np.int32),
                             np.array(positives, dtype=np.int32),
                             np.array(negatives, dtype=np.int32)]

    def compute_loss(self) -> float:
        users, positives, negatives = self._sub_samples
        if len(users) == 0:
            return 0.0
        return float(W.warp_loss(self._P, self._Q, users, positives,
                                 negatives,
                                 score_func=str(self.opt.score_func),
                                 threshold=float(self.opt.threshold)))

    def train(self, training_callback: Optional[
            Callable[[int, Dict[str, float]], None]] = None) -> Dict[str, float]:
        assert self.data, "Data is not set"
        import jax
        import jax.numpy as jnp

        opt = self.opt
        header = self.data.get_header()
        num_items = int(header["num_items"])

        # sub-64-lane tables hit a slow XLA code path (2-2.6x) — store
        # them zero-padded on device, slice back on host sync (zero
        # columns are inert incl. the unit-ball projection;
        # sgd_kernels.resolve_stored_width has the measurements)
        d = int(opt.d)
        width = K.resolve_stored_width(d, int(opt.get("stored_width", 0)))

        batch_size = int(opt.get("batch_size") or 0)
        if batch_size <= 0:
            # the candidate live-set budget scales with the STORED width
            batch_size = default_batch_size(
                self.num_nnz, width, int(opt.max_trials))

        group = self.data.get_group("rowwise")
        indptr = jax.device_put(np.asarray(group["indptr"], dtype=np.int64))
        bloom_np, bloom_log2 = K.build_bloom(
            np.asarray(group["indptr"]), np.asarray(group["key"]))
        bloom = jax.device_put(bloom_np)

        self._P = jax.device_put(K.pad_cols(self.P, width))
        self._Q = jax.device_put(K.pad_cols(self.Q, width))

        resident_mb = int(opt.get("resident_mb", 4096))
        resident = (self.num_nnz * 8) <= resident_mb * 1024 * 1024
        # "split" issues the candidate bloom probes as their own
        # dispatch before each update epoch (bit-identical factors)
        dispatch = str(opt.get("epoch_dispatch") or "auto")
        if dispatch not in ("auto", "fused", "split"):
            raise ValueError(
                f"epoch_dispatch must be auto|fused|split, got {dispatch!r}")
        split_probe = dispatch == "split"
        if split_probe and not resident:
            self.logger.warning(
                "epoch_dispatch='split' applies to the device-resident "
                "fused epoch only; the streaming path ignores it")
            split_probe = False
        # dp mesh opt-in (same rule as BPR: explicit num_devices > 1)
        mesh = self._select_dp_mesh(resident, split_probe)
        chunk_shard = repl = None
        if mesh is not None:
            from buffalo_tpu import parallelism
            from jax.sharding import NamedSharding, PartitionSpec
            repl = parallelism.replicated(mesh)
            chunk_shard = NamedSharding(mesh, PartitionSpec(None, "d"))
            batch_size = -(-batch_size // mesh.size) * mesh.size
            indptr = jax.device_put(np.asarray(indptr), repl)
            bloom = jax.device_put(bloom_np, repl)
            self._P = jax.device_put(K.pad_cols(self.P, width), repl)
            self._Q = jax.device_put(K.pad_cols(self.Q, width), repl)
        if resident:
            # device-resident chunks, one fused dispatch per epoch
            indptr_np = np.asarray(group["indptr"], dtype=np.int64)
            users_np = np.repeat(
                np.arange(len(indptr_np) - 1, dtype=np.int32),
                np.diff(indptr_np))
            items_np = np.asarray(group["key"], dtype=np.int32)
            nnz = len(items_np)
            nchunks = -(-nnz // batch_size)
            pad = nchunks * batch_size - nnz
            if pad:
                users_np = np.concatenate([users_np,
                                           np.zeros(pad, np.int32)])
                items_np = np.concatenate([items_np,
                                           np.zeros(pad, np.int32)])
            put = (jax.device_put if chunk_shard is None else
                   lambda x: jax.device_put(x, chunk_shard))
            users_c = put(users_np.reshape(nchunks, batch_size))
            items_c = put(items_np.reshape(nchunks, batch_size))
            opt_state = {"mP": jnp.zeros_like(self._P),
                         "vP": jnp.zeros_like(self._P),
                         "mQ": jnp.zeros_like(self._Q),
                         "vQ": jnp.zeros_like(self._Q)}
        else:
            coo = COOBatcher(self.data, chunk_size=batch_size, shuffle=True,
                             seed=int(opt.random_seed))
            gradP = jnp.zeros_like(self._P)
            gradQ = jnp.zeros_like(self._Q)
            countP = jnp.zeros(self._P.shape[0], jnp.float32)
            countQ = jnp.zeros(self._Q.shape[0], jnp.float32)
            mP = jnp.zeros_like(self._P)
            vP = jnp.zeros_like(self._P)
            mQ = jnp.zeros_like(self._Q)
            vQ = jnp.zeros_like(self._Q)

        cand_cap = int(min(max(int(opt.max_trials), 2), 64))
        adaptive = bool(opt.get("adaptive_trials", False)) and resident
        num_candidates = min(16, cand_cap) if adaptive else cand_cap
        probe_mode = str(opt.get("probe_mode") or "lazy")
        if probe_mode not in ("lazy", "all"):
            raise ValueError(
                f"probe_mode must be lazy|all, got {probe_mode!r}")
        if split_probe and probe_mode == "lazy":
            # the split dispatch ships all-K packed probe bits; lazy
            # probing would leave them unread — keep semantics aligned
            self.logger.debug("epoch_dispatch='split' forces "
                              "probe_mode='all'")
            probe_mode = "all"
        statics = dict(num_items=num_items, num_candidates=num_candidates,
                       score_func=str(opt.score_func),
                       threshold=float(opt.threshold),
                       reg_u=float(opt.reg_u), reg_i=float(opt.reg_i),
                       reg_j=float(opt.reg_j),
                       update_i=bool(opt.update_i),
                       update_j=bool(opt.update_j),
                       per_coordinate_normalize=bool(
                           opt.per_coordinate_normalize),
                       bloom_log2=bloom_log2, probe=probe_mode)

        self.sampling_loss_samples()
        rng = jax.random.PRNGKey(int(opt.random_seed))
        pcn = bool(opt.per_coordinate_normalize)

        def _sync_host():
            self.P = np.ascontiguousarray(np.asarray(self._P)[:, :d])
            self.Q = np.ascontiguousarray(np.asarray(self._Q)[:, :d])
        self._sync_host_factors = _sync_host

        best_loss, loss, self.validation_result = float("inf"), None, {}
        full_st = time.time()
        self.iteration_times = []  # per-epoch train seconds
        for i in range(opt.num_iters):
            start_t = time.time()
            found_frac = None
            if resident and mesh is not None:
                rng, sub = jax.random.split(rng)
                self._P, self._Q, opt_state, found_frac = W.warp_epoch_dp(
                    self._P, self._Q, opt_state, users_c, items_c,
                    indptr, bloom, sub, jnp.int32(i), mesh=mesh,
                    optimizer=str(opt.optimizer), lr=float(opt.lr),
                    beta1=float(opt.beta1), beta2=float(opt.beta2),
                    num_valid=nnz, **statics)
            elif resident:
                rng, sub = jax.random.split(rng)
                seen_bits = None
                if split_probe:
                    # dispatch 1: candidate draw + bloom probes only;
                    # the update program redraws candidates from the
                    # same key and consumes the packed probe bits
                    seen_bits = W.warp_probe_epoch(
                        users_c, bloom, sub, num_items=num_items,
                        num_candidates=statics["num_candidates"],
                        bloom_log2=bloom_log2)
                self._P, self._Q, opt_state, found_frac = W.warp_epoch(
                    self._P, self._Q, opt_state, users_c, items_c,
                    indptr, bloom, sub, jnp.int32(i), seen_bits,
                    precomputed_probe=split_probe,
                    optimizer=str(opt.optimizer), lr=float(opt.lr),
                    beta1=float(opt.beta1), beta2=float(opt.beta2),
                    num_valid=nnz, **statics)
            else:
                for users, positives, _vals in coo:
                    rng, sub = jax.random.split(rng)
                    gradP, gradQ, countP, countQ = W.warp_accumulate_step(
                        self._P, self._Q, gradP, gradQ, countP, countQ,
                        users, positives, indptr, bloom, sub, **statics)
                self._P, gradP, mP, vP = K.apply_deferred_update(
                    self._P, gradP, mP, vP, countP, i,
                    optimizer=str(opt.optimizer), lr=float(opt.lr),
                    beta1=float(opt.beta1), beta2=float(opt.beta2),
                    reg=float(opt.reg_u), per_coordinate_normalize=pcn)
                self._Q, gradQ, mQ, vQ = K.apply_deferred_update(
                    self._Q, gradQ, mQ, vQ, countQ, i,
                    optimizer=str(opt.optimizer), lr=float(opt.lr),
                    beta1=float(opt.beta1), beta2=float(opt.beta2),
                    reg=float(opt.reg_i), per_coordinate_normalize=pcn)
                # post-step unit-ball projection (warp.cc:192-201)
                self._P = W.project_unit_ball(self._P)
                self._Q = W.project_unit_ball(self._Q)
                if pcn:
                    countP = jnp.zeros_like(countP)
                    countQ = jnp.zeros_like(countQ)

            loss = self.compute_loss()  # device readback: fences the epoch
            train_t = time.time() - start_t
            self.iteration_times.append(train_t)
            if adaptive and found_frac is not None:
                # grow the fixed-K candidate budget as violations get
                # rarer — the analog of the reference's rising average
                # trial count (warp.cc:118-136).  K only grows, and
                # each distinct K compiles once (few powers of two).
                ff = float(found_frac)
                k_now = statics["num_candidates"]
                if ff < 0.98 and k_now < cand_cap:
                    statics["num_candidates"] = min(2 * k_now, cand_cap)
                    self.logger.debug(
                        f"found_frac {ff:0.3f} at K={k_now}: raising "
                        f"num_candidates to {statics['num_candidates']}")
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
        del self._P, self._Q
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
        data.extend([("opt", self.opt), ("P", self.P), ("Q", self.Q)])
        return data

    def get_evaluation_metrics(self):
        return ["train_loss", "val_ndcg", "val_map", "val_accuracy",
                "val_auc"]
