"""Element-wise ALS (eALS) on TPU.

Counterpart of the reference eALS stack (driver
``buffalo/algo/eals.py``, C++ core ``lib/algo_impl/eals/eals.cc``):
coordinate-descent implicit MF with popularity-weighted whole-data
negative feedback ``C_i = c0 * pop_i^exponent / sum(pop^exponent)``
(eals.py:104-110), residual caches in both orientations, RMSE +
total-loss reporting.  Like the reference, the full CSR lives in
memory (here: HBM) rather than being chunk-streamed.

Reference: He et al., Fast Matrix Factorization for Online
Recommendation with Implicit Feedback (SIGIR 2016).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

from buffalo_tpu.data.base import Data
from buffalo_tpu.evaluate import Evaluable
from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.models.options import EALSOption
from buffalo_tpu.ops import eals_kernels as K


class EALS(Algo, EALSOption, Evaluable, Serializable):
    """Python driver for TPU eALS."""

    def __init__(self, opt_path=None, *args, **kwargs):
        Algo.__init__(self, *args, **kwargs)
        EALSOption.__init__(self, *args, **kwargs)
        Evaluable.__init__(self, *args, **kwargs)
        Serializable.__init__(self, *args, **kwargs)
        self._setup_driver(opt_path, EALSOption, "EALS", ["matrix"], kwargs)

    @staticmethod
    def new(path, data_fields=[]):
        return EALS.instantiate(EALSOption, path, data_fields)

    def set_data(self, data):
        assert isinstance(data, Data), f"Wrong instance: {type(data)}"
        self.data = data

    def normalize(self, group="item"):
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
        for name, rows in [("P", header["num_users"]),
                           ("Q", header["num_items"])]:
            setattr(self, name, np.abs(np.random.normal(
                scale=1.0 / (d ** 2), size=(rows, d)).astype("float32")))

    def _get_negative_weights(self) -> np.ndarray:
        """C_i = c0 * (pop_i/max_pop)^exponent / sum (eals.py:104-110)."""
        indptr = np.asarray(self.data.get_group("colwise")["indptr"])
        pop = np.diff(indptr).astype(np.float32)
        pop /= max(pop.max(), 1.0)
        pe = pop ** float(self.opt.get("exponent", 0.0))
        return (float(self.opt.get("c0", 1.0)) * pe / pe.sum()
                ).astype(np.float32)

    # ------------------------------------------------------------- retrieval
    def _get_topk_recommendation(self, rows, topk, pool=None):
        p = self.P[rows]
        topks = super()._get_topk_recommendation(
            p, self.Q, pb=None, Qb=None, pool=pool, topk=topk,
            num_workers=self.opt.num_workers)
        return zip(rows, topks)

    def _get_most_similar_item(self, col, topk, pool):
        return super()._get_most_similar_item(
            col, topk, self.Q, self.opt.get("_nrz_Q", False), pool)

    def get_scores(self, row_col_pairs):
        return {(r, c): float(self.P[r].dot(self.Q[c]))
                for r, c in row_col_pairs}

    def _get_scores(self, row, col):
        return (self.P[row] * self.Q[col]).sum(axis=1)

    # -------------------------------------------------------------- training
    def _train_state(self):
        """Stage data on device: range-layout (default) or COO fallback.

        The range layout turns every per-dimension reduction into a
        dense masked sum over padded (B, L) blocks (no per-nnz
        segment-sum scatter — the ~133 ns/row floor that made the COO
        formulation ~180 s/epoch at ML-20M); the COO path
        (``range_layout=False``) keeps the original per-dimension
        gather/segment-sum formulation.
        """
        import jax

        header = self.data.get_header()
        num_users = int(header["num_users"])
        num_items = int(header["num_items"])
        rw = self.data.get_group("rowwise")
        rw_indptr = np.asarray(rw["indptr"])
        u_rows = np.repeat(np.arange(num_users, dtype=np.int32),
                           np.diff(rw_indptr))
        u_keys = np.asarray(rw["key"], dtype=np.int32)
        u_vals = np.asarray(rw["val"], dtype=np.float32)
        C = self._get_negative_weights()

        if not bool(self.opt.get("range_layout", True)):
            return {"mode": "coo", "C": C, "u": (u_rows, u_keys, u_vals),
                    "num_users": num_users, "num_items": num_items}

        from buffalo_tpu.data.batching import (BatchPlanner,
                                               build_range_layout,
                                               build_sharded_range_layout,
                                               choose_group_dispatch,
                                               padded_entry_count,
                                               stack_batches)
        cw = self.data.get_group("colwise")
        d = int(self.opt.d)
        batch_mb = int(self.data.opt.data.get("batch_mb", 1024))
        entries = max(batch_mb * 1024 * 1024 // (8 + 8 * d), 4096)
        rp = BatchPlanner(rw_indptr, entries_per_batch=entries)
        cp = BatchPlanner(np.asarray(cw["indptr"]),
                          entries_per_batch=entries)

        n_dev = int(self.opt.get("num_devices") or 0)
        if n_dev > 1:
            # mesh training: per-shard bucket-order layout under
            # shard_map (mirrors the ALS/pLSI sharded epochs)
            from buffalo_tpu import parallelism
            mesh = parallelism.get_mesh(n_dev)
            (row_g, col_g, row_seg, col_seg, u_pos, i_pos, S_u,
             S_i) = build_sharded_range_layout(
                rp, cp, u_keys, u_vals,
                np.asarray(cw["key"], np.int32),
                np.asarray(cw["val"], np.float32), mesh.size)
            u_pad, i_pad = mesh.size * S_u, mesh.size * S_i
            C_perm = np.zeros(i_pad, np.float32)
            C_perm[i_pos] = C
            row_shard = parallelism.shard_rows(mesh)
            repl = parallelism.replicated(mesh)

            def put_sharded(tree):
                return jax.device_put(
                    tree, jax.tree.map(lambda _: row_shard, tree))

            def put_repl(tree):
                return jax.device_put(
                    tree, jax.tree.map(lambda _: repl, tree))

            return {
                "mode": "mesh", "mesh": mesh,
                "row_shard": row_shard,
                "row_groups": tuple(put_sharded(g) for g in row_g),
                "col_groups": tuple(put_sharded(g) for g in col_g),
                "row_segments": tuple(put_repl(s) for s in row_seg),
                "col_segments": tuple(put_repl(s) for s in col_seg),
                "C_perm": jax.device_put(C_perm, row_shard),
                "u_pos": u_pos, "i_pos": i_pos,
                "u_pad": u_pad, "i_pad": i_pad,
                "u": (u_pos[u_rows].astype(np.int32),
                      i_pos[u_keys].astype(np.int32), u_vals),
                "num_users": num_users, "num_items": num_items,
            }

        row_b, col_b, u_pos, i_pos, u_pad, i_pad = build_range_layout(
            rp, cp, u_keys, u_vals,
            np.asarray(cw["key"], np.int32),
            np.asarray(cw["val"], np.float32))
        C_perm = np.zeros(i_pad, np.float32)
        C_perm[i_pos] = C
        return {
            "mode": "range",
            "group_dispatch": choose_group_dispatch(
                self.opt, padded_entry_count(row_b + col_b)),
            "row_groups": tuple(jax.device_put(b)
                                for b in stack_batches(row_b)),
            "col_groups": tuple(jax.device_put(b)
                                for b in stack_batches(col_b)),
            "C_perm": jax.device_put(C_perm),
            "u_pos": u_pos, "i_pos": i_pos,
            "u_pad": u_pad, "i_pad": i_pad,
            # permuted COO view for the loss pass
            "u": (u_pos[u_rows].astype(np.int32),
                  i_pos[u_keys].astype(np.int32), u_vals),
            "num_users": num_users, "num_items": num_items,
        }

    def train(self, training_callback: Optional[
            Callable[[int, Dict[str, float]], None]] = None) -> Dict[str, float]:
        assert self.data, "Data is not set"
        import jax
        import jax.numpy as jnp

        opt = self.opt
        st = self._train_state()
        num_users, num_items = st["num_users"], st["num_items"]
        u_rows, u_keys, u_vals = st["u"]
        du = (jax.device_put(u_rows), jax.device_put(u_keys),
              jax.device_put(u_vals))

        if st["mode"] in ("range", "mesh"):
            from buffalo_tpu.data.batching import permute_table
            from buffalo_tpu import parallelism
            Pp = permute_table(self.P, st["u_pos"], st["u_pad"])
            Qp = permute_table(self.Q, st["i_pos"], st["i_pad"])
            if st["mode"] == "mesh":
                P = jax.device_put(Pp, st["row_shard"])
                Q = jax.device_put(Qp, st["row_shard"])
                repl = parallelism.replicated(st["mesh"])
                du = tuple(jax.device_put(np.asarray(x), repl)
                           for x in st["u"])
            else:
                P = jax.device_put(Pp)
                Q = jax.device_put(Qp)
            C = st["C_perm"]

            def to_host(P, Q):
                return (parallelism.host_local_copy(P)[st["u_pos"]],
                        parallelism.host_local_copy(Q)[st["i_pos"]])
        else:
            cw = self.data.get_group("colwise")
            cw_indptr = np.asarray(cw["indptr"])
            i_rows = np.repeat(np.arange(num_items, dtype=np.int32),
                               np.diff(cw_indptr))
            i_keys = np.asarray(cw["key"], dtype=np.int32)
            i_vals = np.asarray(cw["val"], dtype=np.float32)
            # rowwise position -> colwise position permutation (the
            # cross-index maps ind_u2i_/ind_i2u_ of eals.cc:83-100)
            u2i = np.lexsort((u_rows, u_keys))
            di = (jax.device_put(i_rows), jax.device_put(i_keys),
                  jax.device_put(i_vals))
            u2i_d = jax.device_put(u2i)
            ones_u = jnp.ones(num_users, jnp.float32)
            C = jax.device_put(st["C"])
            P = jax.device_put(self.P)
            Q = jax.device_put(self.Q)
            vhat_u = K.compute_vhat(P, Q, du[0], du[1])

            def to_host(P, Q):
                return np.asarray(P), np.asarray(Q)

        def _sync_host():
            # closure over the loop's current device tables
            self.P, self.Q = to_host(P, Q)
        self._sync_host_factors = _sync_host

        best_loss, loss, self.validation_result = float("inf"), None, {}
        full_st = time.time()
        self.iteration_times = []  # per-epoch train seconds
        for i in range(opt.num_iters):
            start_t = time.time()
            if st["mode"] == "mesh":
                P, Q = K.eals_epoch_sharded_range(
                    P, Q, st["row_groups"], st["col_groups"],
                    st["row_segments"], st["col_segments"], C,
                    mesh=st["mesh"], axis_name="d",
                    alpha=float(opt.alpha), reg_u=float(opt.reg_u),
                    reg_i=float(opt.reg_i))
                vhat_u = K.compute_vhat(P, Q, du[0], du[1])
            elif st["mode"] == "range":
                if st["group_dispatch"]:
                    Sq = K.eals_gramian(Q, C)
                    for g in st["row_groups"]:
                        P = K.eals_group_step(
                            P, Q, C, Sq, g, item_axis=False,
                            alpha=float(opt.alpha), reg=float(opt.reg_u))
                    Sp = K.eals_gramian(P)
                    for g in st["col_groups"]:
                        Q = K.eals_group_step(
                            Q, P, C, Sp, g, item_axis=True,
                            alpha=float(opt.alpha), reg=float(opt.reg_i))
                else:
                    P, Q = K.eals_epoch(
                        P, Q, st["row_groups"], st["col_groups"], C,
                        alpha=float(opt.alpha), reg_u=float(opt.reg_u),
                        reg_i=float(opt.reg_i))
                vhat_u = K.compute_vhat(P, Q, du[0], du[1])
            else:
                # user side: Sq = (C^0.5 Q)^T (C^0.5 Q)
                CQ = Q * jnp.sqrt(C)[:, None]
                Sq = jnp.dot(CQ.T, CQ, preferred_element_type=jnp.float32)
                P, vhat_u = K.eals_half_epoch(
                    P, Q, vhat_u, du[0], du[1], du[2],
                    jnp.take(C, du[1]), ones_u, Sq,
                    num_rows=num_users, alpha=float(opt.alpha),
                    reg=float(opt.reg_u))
                # item side: permute residuals to colwise order
                vhat_i = jnp.take(vhat_u, u2i_d)
                Sp = jnp.dot(P.T, P, preferred_element_type=jnp.float32)
                Q, vhat_i = K.eals_half_epoch(
                    Q, P, vhat_i, di[0], di[1], di[2],
                    jnp.take(C, di[0]), C, Sp,
                    num_rows=num_items, alpha=float(opt.alpha),
                    reg=float(opt.reg_i))
                vhat_u = jnp.zeros_like(vhat_u).at[u2i_d].set(vhat_i)

            rmse, total_loss = K.eals_loss(
                P, Q, vhat_u, du[0], du[1], du[2], C,
                float(opt.reg_u), float(opt.reg_i),
                alpha=float(opt.alpha))
            loss = float(rmse)
            train_t = time.time() - start_t
            self.iteration_times.append(train_t)
            metrics = {"train_loss": loss}
            if opt.get("validation") and opt.evaluation_on_learning and \
                    self.periodical(opt.evaluation_period, i):
                start_t = time.time()
                self.P, self.Q = to_host(P, Q)
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
                "Iteration %d: RMSE %.3f TotalLoss %.3f Elapsed %.3f secs"
                % (i + 1, loss, float(total_loss) / len(u_vals), train_t))
            best_loss = self.save_best_only(loss, best_loss, i)
            if self.early_stopping(loss):
                break
        self.P, self.Q = to_host(P, Q)
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
        data.extend([("opt", self.opt), ("Q", self.Q), ("P", self.P)])
        return data

    def get_evaluation_metrics(self):
        return ["train_loss", "val_rmse", "val_ndcg", "val_map",
                "val_accuracy", "val_error"]
