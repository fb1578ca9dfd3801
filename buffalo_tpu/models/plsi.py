"""Probabilistic Latent Semantic Indexing (EM) on TPU.

Counterpart of the reference pLSI stack (driver
``buffalo/algo/plsi.py``, C++ core ``lib/algo_impl/plsi/plsi.cc``):
EM over user-item co-occurrence with double-buffered tables, smoothing
parameters alpha1/alpha2, warm-start ``inherit`` from a previous model
by string-id matching (plsi.py:62-89), and loss
``-sum v log P(i|u) / sum v``.

Reference: Hofmann, Probabilistic Latent Semantic Indexing (SIGIR 99).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

from buffalo_tpu.data.base import Data
from buffalo_tpu.data.batching import DeviceBatcher
from buffalo_tpu.evaluate import Evaluable
from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.models.options import PLSIOption
from buffalo_tpu.ops.plsi_kernels import (plsi_accumulate,
                                          plsi_accumulate_group,
                                          plsi_accumulate_segments,
                                          plsi_epoch, plsi_epoch_range,
                                          plsi_mstep, plsi_normalize_swap,
                                          plsi_segment_group)


class PLSI(Algo, PLSIOption, Evaluable, Serializable):
    """Python driver for TPU pLSI."""

    def __init__(self, opt_path=None, *args, **kwargs):
        Algo.__init__(self, *args, **kwargs)
        PLSIOption.__init__(self, *args, **kwargs)
        Evaluable.__init__(self, *args, **kwargs)
        Serializable.__init__(self, *args, **kwargs)
        self._setup_driver(opt_path, PLSIOption, "PLSI", ["matrix", "stream"], kwargs)

    @staticmethod
    def new(path, data_fields=[]):
        return PLSI.instantiate(PLSIOption, path, data_fields)

    def set_data(self, data):
        assert isinstance(data, Data), f"Wrong instance: {type(data)}"
        self.data = data

    def normalize(self, group="item"):
        if group == "item":
            self.Q /= (np.sum(self.Q, axis=0, keepdims=True) + self.opt.eps)
        elif group == "user":
            self.P /= (np.sum(self.P, axis=1, keepdims=True) + self.opt.eps)

    def initialize(self):
        super().initialize()
        self.init_factors()
        self.inherit()

    def init_factors(self):
        """|N(0, 1/d)| init with stochastic-matrix normalization
        (plsi.cc:44-70): P rows sum to 1, Q columns sum to 1."""
        assert self.data, "Did not set data"
        header = self.data.get_header()
        self.num_users = header["num_users"]
        self.num_items = header["num_items"]
        self.num_nnz = header["num_nnz"]
        d = self.opt.d
        P = np.abs(np.random.normal(scale=1.0 / d,
                                    size=(self.num_users, d))
                   ).astype("float32")
        self.P = P / P.sum(axis=1, keepdims=True)
        Q = np.abs(np.random.normal(scale=1.0 / d,
                                    size=(self.num_items, d))
                   ).astype("float32")
        self.Q = Q / Q.sum(axis=0, keepdims=True)

    def inherit(self):
        """Warm-start from a previous model by string-id matching
        (plsi.py:62-89) — id-stable resume across retrains."""
        if not self.opt.get("inherit_opt"):
            return
        inherit_opt = self.opt.inherit_opt
        prev_model = PLSI.new(inherit_opt.model_path)

        def _inherit(which):
            if which == "user":
                self.build_userid_map()
                curr_idmap = self._idmanager.userid_map
                prev_idmap = prev_model._idmanager.userid_map
                curr_obj, prev_obj = self.P, prev_model.P
            else:
                self.build_itemid_map()
                curr_idmap = self._idmanager.itemid_map
                prev_idmap = prev_model._idmanager.itemid_map
                curr_obj, prev_obj = self.Q, prev_model.Q
            assert curr_obj.shape[1] == prev_obj.shape[1], (
                f"Dimension mismatch. Current dimension: "
                f"{curr_obj.shape[1]} / Previous dimension: "
                f"{prev_obj.shape[1]}")
            for key, curr_idx in curr_idmap.items():
                if key in prev_idmap:
                    curr_obj[curr_idx] = prev_obj[prev_idmap[key]]

        if inherit_opt.get("inherit_user", False):
            self.logger.info("Inherit from previous user matrix")
            _inherit("user")
        if inherit_opt.get("inherit_item", False):
            self.logger.info("Inherit from previous item matrix")
            _inherit("item")

    # ------------------------------------------------------------- retrieval
    def _get_topk_recommendation(self, rows, topk, pool=None):
        p = self.P[rows]
        topks = super()._get_topk_recommendation(
            p, self.Q, pb=None, Qb=None, pool=pool, topk=topk,
            num_workers=self.opt.num_workers)
        return zip(rows, topks)

    def _get_most_similar_item(self, col, topk, pool):
        return super()._get_most_similar_item(col, topk, self.Q, True, pool)

    def get_scores(self, row_col_pairs):
        return {(r, c): float(self.P[r].dot(self.Q[c]))
                for r, c in row_col_pairs}

    def _get_scores(self, row, col):
        return (self.P[row] * self.Q[col]).sum(axis=1)

    # -------------------------------------------------------------- training
    def train(self, training_callback: Optional[
            Callable[[int, Dict[str, float]], None]] = None) -> Dict[str, float]:
        assert self.data, "Data is not set"
        import jax
        import jax.numpy as jnp

        opt = self.opt
        batcher = DeviceBatcher(
            self.data, "rowwise",
            batch_mb=int(self.data.opt.data.get("batch_mb", 1024)),
            resident_mb=int(opt.get("resident_mb", 4096)),
            d=int(opt.d))
        group = self.data.get_group("rowwise")
        loss_deno = float(np.sum(group["val"], dtype=np.float64))

        # mesh training (num_devices > 1): per-shard bucket-order range
        # layout under shard_map, mirroring the ALS sharded epoch
        self._range = None
        self._mesh_range = None
        n_dev = int(opt.get("num_devices") or 0)
        mesh = None
        if n_dev > 1:
            from buffalo_tpu import parallelism
            if (batcher.resident and self.data.has_group("colwise")
                    and bool(opt.get("range_layout", True))):
                mesh = parallelism.get_mesh(n_dev)
            else:
                self.logger.warning(
                    "mesh pLSI needs a device-resident dataset, the "
                    "colwise group, and range_layout; training "
                    "single-device")
        if mesh is not None:
            from buffalo_tpu.data.batching import (
                build_sharded_range_layout, permute_table)
            cb = DeviceBatcher(
                self.data, "colwise",
                batch_mb=int(self.data.opt.data.get("batch_mb", 1024)),
                resident_mb=int(opt.get("resident_mb", 4096)),
                d=int(opt.d))
            (row_g, col_g, row_seg, col_seg, u_pos, i_pos, S_u,
             S_i) = build_sharded_range_layout(
                batcher.planner, cb.planner, batcher.key, batcher.val,
                cb.key, cb.val, mesh.size)
            row_shard = parallelism.shard_rows(mesh)
            repl = parallelism.replicated(mesh)

            def put_sharded(tree):
                return jax.device_put(
                    tree, jax.tree.map(lambda _: row_shard, tree))

            def put_repl(tree):
                return jax.device_put(
                    tree, jax.tree.map(lambda _: repl, tree))

            p_mask = np.zeros(mesh.size * S_u, np.float32)
            p_mask[u_pos] = 1.0
            q_mask = np.zeros(mesh.size * S_i, np.float32)
            q_mask[i_pos] = 1.0
            self._mesh_range = {
                "row_groups": tuple(put_sharded(g) for g in row_g),
                "col_groups": tuple(put_sharded(g) for g in col_g),
                "row_segments": tuple(put_repl(s) for s in row_seg),
                "col_segments": tuple(put_repl(s) for s in col_seg),
                "u_pos": u_pos, "i_pos": i_pos,
                "p_mask": jax.device_put(p_mask, row_shard),
                "q_mask": jax.device_put(q_mask, row_shard),
                "mesh": mesh,
            }
            P = jax.device_put(
                permute_table(self.P, u_pos, mesh.size * S_u), row_shard)
            Q = jax.device_put(
                permute_table(self.Q, i_pos, mesh.size * S_i), row_shard)

            def to_host(P, Q):
                return (parallelism.host_local_copy(P)[u_pos],
                        parallelism.host_local_copy(Q)[i_pos])

        # bucket-order range layout over BOTH orientations: contiguous
        # accumulator writes instead of per-nnz scatter-adds (the
        # measured epoch bound); needs the colwise group + residency
        if (mesh is None and batcher.resident
                and self.data.has_group("colwise")
                and bool(opt.get("range_layout", True))):
            from buffalo_tpu.data.batching import (build_range_layout,
                                                   choose_group_dispatch,
                                                   padded_entry_count,
                                                   stack_batches)
            cb = DeviceBatcher(
                self.data, "colwise",
                batch_mb=int(self.data.opt.data.get("batch_mb", 1024)),
                resident_mb=int(opt.get("resident_mb", 4096)),
                d=int(opt.d))
            if cb.resident:
                row_b, col_b, u_pos, i_pos, u_pad, i_pad = \
                    build_range_layout(batcher.planner, cb.planner,
                                       batcher.key, batcher.val,
                                       cb.key, cb.val)
                from buffalo_tpu.data.batching import (RangeBatch,
                                                       SegmentBatch)

                def split(batches):
                    rs = [b for b in stack_batches(batches)
                          if isinstance(b, RangeBatch)]
                    segs = [b for b in batches
                            if isinstance(b, SegmentBatch)]
                    return (tuple(jax.device_put(b) for b in rs),
                            tuple(jax.device_put(b) for b in segs))

                p_mask = np.zeros(u_pad, np.float32)
                p_mask[u_pos] = 1.0
                q_mask = np.zeros(i_pad, np.float32)
                q_mask[i_pos] = 1.0
                rg, rseg = split(row_b)
                cg, cseg = split(col_b)

                self._range = {
                    "row_groups": rg, "row_segments": rseg,
                    "col_groups": cg, "col_segments": cseg,
                    "u_pos": u_pos, "i_pos": i_pos,
                    "p_mask": jax.device_put(p_mask),
                    "q_mask": jax.device_put(q_mask),
                    "u_pad": u_pad, "i_pad": i_pad,
                    "group_dispatch": choose_group_dispatch(
                        opt, padded_entry_count(row_b + col_b)),
                }

        if self._mesh_range is not None:
            pass  # tables already staged sharded above
        elif self._range is not None:
            from buffalo_tpu.data.batching import permute_table
            Pp = permute_table(self.P, self._range["u_pos"],
                               self._range["u_pad"])
            Qp = permute_table(self.Q, self._range["i_pos"],
                               self._range["i_pad"])
            P = jax.device_put(Pp)
            Q = jax.device_put(Qp)

            def to_host(P, Q):
                return (np.asarray(P)[self._range["u_pos"]],
                        np.asarray(Q)[self._range["i_pos"]])
        else:
            P = jax.device_put(self.P)
            Q = jax.device_put(self.Q)

            def to_host(P, Q):
                return np.asarray(P), np.asarray(Q)

        self.logger.info(
            f"Train pLSI, K: {opt.d}, alpha1: {opt.alpha1}, "
            f"alpha2: {opt.alpha2}")

        def _sync_host():
            # closure over the loop's current device tables
            self.P, self.Q = to_host(P, Q)
        self._sync_host_factors = _sync_host

        best_loss, loss, self.validation_result = 1e10, None, {}
        full_st = time.time()
        self.iteration_times = []  # per-epoch train seconds
        from buffalo_tpu.data.batching import SegmentBatch

        for i in range(opt.num_iters):
            start_t = time.time()
            if self._mesh_range is not None:
                mr = self._mesh_range
                from buffalo_tpu.ops.plsi_kernels import \
                    plsi_epoch_sharded_range
                P, Q, epoch_loss = plsi_epoch_sharded_range(
                    P, Q, mr["row_groups"], mr["col_groups"],
                    mr["row_segments"], mr["col_segments"],
                    mr["p_mask"], mr["q_mask"], mesh=mr["mesh"],
                    axis_name="d", alpha1=float(opt.alpha1),
                    alpha2=float(opt.alpha2),
                    num_items=int(self.num_items))
                loss_nume = float(epoch_loss)
            elif self._range is not None:
                rs = self._range
                if rs["group_dispatch"]:
                    Pn = jnp.zeros_like(P)
                    # keep the loss a device scalar so the group
                    # dispatches pipeline; one host readback per epoch
                    losses = []
                    for g in rs["row_groups"]:
                        Pn, l_ = plsi_accumulate_group(Pn, P, Q, g,
                                                       with_loss=True)
                        losses.append(l_)
                    for s in rs["row_segments"]:
                        Pn, l_ = plsi_segment_group(Pn, P, Q, s,
                                                    with_loss=True)
                        losses.append(l_)
                    Qn = jnp.zeros_like(Q)
                    for g in rs["col_groups"]:
                        Qn, _ = plsi_accumulate_group(Qn, Q, P, g,
                                                      with_loss=False)
                    for s in rs["col_segments"]:
                        Qn, _ = plsi_segment_group(Qn, Q, P, s,
                                                   with_loss=False)
                    P, Q = plsi_mstep(
                        Pn, Qn, rs["p_mask"], rs["q_mask"],
                        alpha1=float(opt.alpha1),
                        alpha2=float(opt.alpha2),
                        num_items=int(self.num_items))
                    loss_nume = float(np.sum([np.asarray(x)
                                              for x in losses]))
                else:
                    P, Q, epoch_loss = plsi_epoch_range(
                        P, Q, rs["row_groups"], rs["col_groups"],
                        rs["row_segments"], rs["col_segments"],
                        rs["p_mask"], rs["q_mask"],
                        alpha1=float(opt.alpha1),
                        alpha2=float(opt.alpha2),
                        num_items=int(self.num_items))
                    loss_nume = float(epoch_loss)
            elif batcher.resident:
                # whole EM epoch in one dispatch
                P, Q, epoch_loss = plsi_epoch(
                    P, Q, tuple(batcher.device_batches_stacked()),
                    alpha1=float(opt.alpha1), alpha2=float(opt.alpha2))
                loss_nume = float(epoch_loss)
            else:
                Pn = jnp.zeros_like(P)
                Qn = jnp.zeros_like(Q)
                losses = []
                for b in batcher:
                    if isinstance(b, SegmentBatch):
                        Pn, Qn, batch_loss = plsi_accumulate_segments(
                            Pn, Qn, P, Q, b.rows, b.seg_ids,
                            b.chunk_lens, b.cols, b.vals)
                    else:
                        Pn, Qn, batch_loss = plsi_accumulate(
                            Pn, Qn, P, Q, b.rows, b.lens, b.cols, b.vals)
                    losses.append(batch_loss)
                P, Q = plsi_normalize_swap(Pn, Qn,
                                           alpha1=float(opt.alpha1),
                                           alpha2=float(opt.alpha2))
                loss_nume = float(np.sum([np.asarray(x) for x in losses]))
            train_t = time.time() - start_t
            self.iteration_times.append(train_t)
            loss = loss_nume / (loss_deno + opt.eps)
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
            self.logger.info("Iteration %d: Loss %.3f Elapsed %.3f secs"
                             % (i + 1, loss, train_t))
            best_loss = self.save_best_only(loss, best_loss, i)
            if self.early_stopping(loss):
                break
        self.P, self.Q = to_host(P, Q)
        self._sync_host_factors = None
        self._range = None
        self._mesh_range = None
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
