"""CoFactor (CFR) on TPU.

Counterpart of the reference CFR stack (driver ``buffalo/algo/cfr.py``,
C++ core ``lib/algo_impl/cfr/cfr.cc``): joint factorization of the
user-item implicit matrix and the item-context SPPMI matrix with
shared item embeddings and item/context biases; three-phase epochs
(user / item / context) with the loss scaled by
``l * (alpha * vsum + U * I) + sppmi_nnz`` (cfr.py:181-187).

The item phase needs the colwise and SPPMI groups for the same item
rows; the reference synchronizes chunk ranges
(``fetch_batch_range``, cfr.py:128-160) — here the colwise padded
batches drive, and each batch's SPPMI slice is padded alongside
(``data.batching.pad_rows``).

Reference: Liang et al., Factorization Meets the Item Embedding
(RecSys 2016).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

from buffalo_tpu.data.base import Data
from buffalo_tpu.data.batching import BatchPlanner, pad_rows
from buffalo_tpu.evaluate import Evaluable
from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.models.options import CFROption
from buffalo_tpu.ops import cfr_kernels as K


class CFR(Algo, CFROption, Evaluable, Serializable):
    """Python driver for TPU CoFactor."""

    def __init__(self, opt_path=None, *args, **kwargs):
        Algo.__init__(self, *args, **kwargs)
        CFROption.__init__(self, *args, **kwargs)
        Evaluable.__init__(self, *args, **kwargs)
        Serializable.__init__(self, *args, **kwargs)
        self._setup_driver(opt_path, CFROption, "CFR", ["stream"], kwargs)
        self.is_initialized = False
        if self.data:
            assert self.data.has_group("sppmi"), \
                "CFR requires SPPMI data (set data.sppmi options)"
            assert self.data.has_group("colwise"), \
                "CFR requires matrix internal data type"

    @staticmethod
    def new(path, data_fields=[]):
        return CFR.instantiate(CFROption, path, data_fields)

    def set_data(self, data):
        assert isinstance(data, Data), f"Wrong instance: {type(data)}"
        self.data = data

    def normalize(self, group="item"):
        assert group in ["user", "item", "context"], \
            f"group ({group}) is not properly provided"
        if group == "user" and not self.opt.get("_nrz_U"):
            self.U = self._normalize(self.U)
            # keep the ALS-style P/Q aliases (and their guard flags,
            # checked by ParALS.topk_recommendation) in sync
            self.P = self.U
            self.opt._nrz_U = True
            self.opt._nrz_P = True
        elif group == "item" and not self.opt.get("_nrz_I"):
            self.I = self._normalize(self.I)
            self.Q = self.I
            self.opt._nrz_I = True
            self.opt._nrz_Q = True
        elif group == "context" and not self.opt.get("_nrz_C"):
            self.C = self._normalize(self.C)
            self.opt._nrz_C = True

    def initialize(self):
        super().initialize()
        assert self.data, "Data is not set"
        header = self.data.get_header()
        num_users, num_items, d = (header["num_users"],
                                   header["num_items"], self.opt.d)
        for attr, shape in [("U", (num_users, d)), ("I", (num_items, d)),
                            ("C", (num_items, d))]:
            setattr(self, attr, np.random.normal(
                scale=1.0 / (d ** 2), size=shape).astype(np.float32))
        self.Ib = np.zeros(num_items, dtype=np.float32)
        self.Cb = np.zeros(num_items, dtype=np.float32)
        self.P = self.U
        self.Q = self.I
        self.is_initialized = True

    # ------------------------------------------------------------- retrieval
    def _get_topk_recommendation(self, rows, topk, pool=None):
        u = self.U[rows]
        topks = super()._get_topk_recommendation(
            u, self.I, pb=None, Qb=None, pool=pool, topk=topk,
            num_workers=self.opt.num_workers)
        return zip(rows, topks)

    def _get_most_similar_item(self, col, topk, pool):
        return super()._get_most_similar_item(
            col, topk, self.I, self.opt.get("_nrz_I", False), pool)

    def get_scores(self, row_col_pairs):
        return {(r, c): float(self.U[r].dot(self.I[c]))
                for r, c in row_col_pairs}

    def _get_scores(self, row, col):
        return (self.U[row] * self.I[col]).sum(axis=1)

    # -------------------------------------------------------------- training
    def compute_scale(self) -> float:
        ret = self.data.get_scale_info(with_sppmi=True)
        alpha, l = self.opt.alpha, self.opt.l
        return float(l * (alpha * ret["vsum"]
                          + ret["num_users"] * ret["num_items"])
                     + ret["sppmi_nnz"])

    def _build_batches(self):
        """Fixed-shape batches for the three phases.

        Users and contexts: degree-bucketed padded batches, long rows
        as SegmentBatch chunks (default ``max_len`` — the pin to
        ``1 << 30`` is gone, so a >100k-degree power-law head row costs
        O(max_len)-wide chunks, never one padded monster row; the
        reference's analog is ``fetch_batch_range`` chunk streaming,
        ``buffered_data.py:120-160``).  Items: colwise padded batches
        with a row-synchronized SPPMI block; rows long on EITHER side
        become (SegmentBatch colwise, SegmentBatch sppmi) pairs over
        one shared row list.
        """
        from buffalo_tpu.data.batching import (DEFAULT_MAX_L, PaddedBatch,
                                               SegmentBatch,
                                               build_segment_batch)
        batch_mb = int(self.data.opt.data.get("batch_mb", 1024))
        max_len = int(self.opt.get("max_len", DEFAULT_MAX_L))
        # cap per-batch entries so a batch's gathered (B*L, d) f32
        # temporary stays <= ~2 GB: the former flat 16 B/entry budget
        # let it reach 8.6 GB at d=32 and OOM outright at d=64
        # (f32[40.8M, 64] allocation, `stream_cfr_d64.log`).  The cap
        # engages only where the temporary would be the problem — the
        # flat budget's measured 6.18 s epoch is preserved at small
        # batch_mb * d products.
        d = int(self.opt.d)
        entries = max(min(int(batch_mb) * 1024 * 1024 // 16,
                          (2 << 30) // (4 * d)), 4096)
        out = {}
        rw = self.data.get_group("rowwise")
        planner = BatchPlanner(np.asarray(rw["indptr"]),
                               entries_per_batch=entries,
                               max_len=max_len)
        out["user"] = list(planner.iter_batches(rw["key"], rw.get("val")))

        cw = self.data.get_group("colwise")
        sp = self.data.get_group("sppmi")
        cw_indptr = np.asarray(cw["indptr"])
        sp_indptr = np.asarray(sp["indptr"])
        cw_deg = np.diff(cw_indptr)
        sp_deg = np.diff(sp_indptr)
        # long on either side -> the segment pair path
        long_mask = (cw_deg > max_len) | (sp_deg > max_len)

        # NOTE (r5 decision record): a joint (Lu, Lc) 1.25-grid
        # bucketing of this phase was built and measured — 96.8M
        # padded entries vs this layout's 176.6M at the brunch
        # stream shape — and the epoch did NOT improve (6.63 s vs
        # 6.18 s clean, stream_cfr_grid.log), while its 56 batch
        # shapes grew the fused program enough that the d=64
        # compile OOM-killed the remote compile helper
        # (stream_cfr_d64.log).  The epoch is not bound by padded
        # gather count at this shape, so the simpler layout stays.
        planner = BatchPlanner(cw_indptr, entries_per_batch=entries,
                               max_len=max_len)
        item_batches = []
        for b in planner.iter_batches(cw["key"], cw.get("val")):
            if isinstance(b, SegmentBatch):
                continue  # cw-long rows take the segment-pair path below
            # rows that are sppmi-long leave the padded batch (their
            # slot becomes padding) and join the segment set
            keep = ~long_mask[np.minimum(b.rows, len(cw_deg) - 1)] \
                | (b.lens == 0)
            if not keep.all():
                b = PaddedBatch(
                    rows=np.where(keep, b.rows,
                                  len(cw_deg)).astype(np.int32),
                    lens=np.where(keep, b.lens, 0).astype(np.int32),
                    cols=np.where(keep[:, None], b.cols, 0),
                    vals=np.where(keep[:, None], b.vals, 0.0))
            lens_c, cols_c, vals_c = pad_rows(
                sp_indptr, sp["key"], sp["val"], b.rows)
            item_batches.append((b, lens_c, cols_c, vals_c))
        # items with sppmi entries but NO colwise entries still need an
        # item update; the reference loops all rows per range so covers
        # them — collect the short leftovers into extra padded batches
        leftover = np.nonzero((cw_deg == 0) & (sp_deg > 0)
                              & ~long_mask)[0]
        if len(leftover):
            for beg in range(0, len(leftover), 1024):
                rows = leftover[beg:beg + 1024]
                B = max(8, 1 << int(np.ceil(np.log2(len(rows)))))
                rpad = np.full(B, len(cw_deg), dtype=np.int32)
                rpad[:len(rows)] = rows
                lens_c, cols_c, vals_c = pad_rows(
                    sp_indptr, sp["key"], sp["val"], rpad)
                empty = PaddedBatch(
                    rows=rpad, lens=np.zeros(B, np.int32),
                    cols=np.zeros((B, 8), np.int32),
                    vals=np.zeros((B, 8), np.float32))
                item_batches.append((empty, lens_c, cols_c, vals_c))
        # segment pairs: pack long rows bounded by both sides' chunks
        long_rows = np.nonzero(long_mask)[0]
        if len(long_rows):
            budget = max(1, planner.entries_per_batch // max_len)
            order = np.argsort(-(cw_deg[long_rows] + sp_deg[long_rows]),
                               kind="stable")
            cur, cur_chunks = [], 0
            plans = []
            for r in long_rows[order]:
                n = int(np.ceil(cw_deg[r] / max_len)
                        + np.ceil(max(sp_deg[r], 1) / max_len))
                if cur and cur_chunks + n > budget:
                    plans.append(cur)
                    cur, cur_chunks = [], 0
                cur.append(int(r))
                cur_chunks += n
            if cur:
                plans.append(cur)
            for plan in plans:
                sb_u = build_segment_batch(cw_indptr, cw["key"],
                                           cw.get("val"), plan, max_len,
                                           len(cw_deg))
                sb_c = build_segment_batch(sp_indptr, sp["key"],
                                           sp["val"], plan, max_len,
                                           len(sp_deg))
                item_batches.append((sb_u, sb_c))
        out["item"] = item_batches

        planner = BatchPlanner(sp_indptr, entries_per_batch=entries,
                               max_len=max_len)
        out["context"] = list(planner.iter_batches(sp["key"], sp["val"]))
        return out

    def _streaming_epoch(self, U, I, C, Ib, Cb, batches, com):
        """Per-batch dispatches for beyond-``resident_mb`` data — the
        reference's bounded-memory chunk loop (cfr.py:128-160); loss
        scalars stay on device until the epoch ends."""
        import jax
        import jax.numpy as jnp

        from buffalo_tpu.data.batching import SegmentBatch
        opt = self.opt
        losses = []
        FF = jnp.dot(I.T, I, preferred_element_type=jnp.float32)
        for b in batches["user"]:
            b = jax.device_put(b)
            if isinstance(b, SegmentBatch):
                U, l_ = K.cfr_user_segment_step(
                    U, I, FF, b, alpha=float(opt.alpha), l=float(opt.l),
                    reg_u=float(opt.reg_u), **com)
            else:
                U, l_ = K.cfr_user_step(
                    U, I, FF, b.rows, b.lens, b.cols, b.vals,
                    alpha=float(opt.alpha), l=float(opt.l),
                    reg_u=float(opt.reg_u), **com)
            losses.append(l_)
        FF = jnp.dot(U.T, U, preferred_element_type=jnp.float32)
        for entry in batches["item"]:
            entry = jax.device_put(entry)
            if isinstance(entry[0], SegmentBatch):
                sb_u, sb_c = entry
                I, Ib, l_ = K.cfr_item_segment_step(
                    I, U, C, Ib, Cb, FF, sb_u, sb_c,
                    alpha=float(opt.alpha), l=float(opt.l),
                    reg_i=float(opt.reg_i), **com)
            else:
                b, lens_c, cols_c, vals_c = entry
                I, Ib, l_ = K.cfr_item_step(
                    I, U, C, Ib, Cb, FF, b.rows, b.lens, b.cols, b.vals,
                    lens_c, cols_c, vals_c, alpha=float(opt.alpha),
                    l=float(opt.l), reg_i=float(opt.reg_i), **com)
            losses.append(l_)
        for b in batches["context"]:
            b = jax.device_put(b)
            if isinstance(b, SegmentBatch):
                C, Cb, l_ = K.cfr_context_segment_step(
                    C, I, Ib, Cb, b, reg_c=float(opt.reg_c), **com)
            else:
                C, Cb, l_ = K.cfr_context_step(
                    C, I, Ib, Cb, b.rows, b.lens, b.cols, b.vals,
                    reg_c=float(opt.reg_c), **com)
            losses.append(l_)
        total = float(np.sum([np.asarray(x) for x in losses])) \
            if losses else 0.0
        return U, I, C, Ib, Cb, total

    def train(self, training_callback: Optional[
            Callable[[int, Dict[str, float]], None]] = None) -> Dict[str, float]:
        assert self.is_initialized, "embedding matrix is not initialized"
        import jax

        opt = self.opt
        batches = self._build_batches()
        U = jax.device_put(self.U)
        I = jax.device_put(self.I)
        C = jax.device_put(self.C)
        Ib = jax.device_put(self.Ib)
        Cb = jax.device_put(self.Cb)

        com = dict(optimizer=str(opt.optimizer),
                   cg_iters=int(opt.num_cg_max_iters),
                   cg_tol=float(opt.cg_tolerance),
                   compute_loss=bool(opt.compute_loss_on_training))
        scale = self.compute_scale()

        def _sync_host():
            # closure over the loop's current device tables
            self.U, self.I, self.C = (np.asarray(U), np.asarray(I),
                                      np.asarray(C))
            self.Ib, self.Cb = np.asarray(Ib), np.asarray(Cb)
            self.P, self.Q = self.U, self.I
        self._sync_host_factors = _sync_host

        best_loss, loss, self.validation_result = float("inf"), None, {}
        full_st = time.time()
        self.iteration_times = []  # per-epoch train seconds

        def entry_arrays(entry):
            if isinstance(entry, tuple):
                out = []
                for part in entry:
                    out.extend(part if hasattr(part, "_fields") else [part])
                return out
            return list(entry)

        staged_bytes = sum(
            np.asarray(a).nbytes
            for phase in batches.values() for e in phase
            for a in entry_arrays(e))
        resident = staged_bytes <= int(
            opt.get("resident_mb", 4096)) * 1024 * 1024
        mesh = self._select_dp_mesh(resident, False)
        if resident and mesh is not None:
            # dp mesh staging: pad every padded batch's row axis to a
            # mesh multiple and shard it; segments stay replicated
            from buffalo_tpu import parallelism
            from buffalo_tpu.data.batching import PaddedBatch, SegmentBatch
            from jax.sharding import NamedSharding, PartitionSpec
            shard = NamedSharding(mesh, PartitionSpec("d"))
            repl = parallelism.replicated(mesh)
            D = mesh.size

            def pad_rows_to(arr, B_new, fill):
                pad = B_new - arr.shape[0]
                if pad == 0:
                    return np.asarray(arr)
                block = np.full((pad,) + arr.shape[1:], fill, arr.dtype)
                return np.concatenate([np.asarray(arr), block])

            def pad_padded(b, sentinel):
                B_new = -(-b.rows.shape[0] // D) * D
                return B_new, PaddedBatch(
                    rows=pad_rows_to(b.rows, B_new, sentinel),
                    lens=pad_rows_to(b.lens, B_new, 0),
                    cols=pad_rows_to(b.cols, B_new, 0),
                    vals=pad_rows_to(b.vals, B_new, 0.0))

            def stage(entry, sentinel):
                # NB: PaddedBatch/SegmentBatch are NamedTuples — test
                # for them BEFORE the plain-tuple item entries
                if isinstance(entry, SegmentBatch) or (
                        not isinstance(entry, PaddedBatch)
                        and isinstance(entry[0], SegmentBatch)):
                    return jax.device_put(
                        entry, jax.tree.map(lambda _: repl, entry))
                if isinstance(entry, PaddedBatch):
                    _, b = pad_padded(entry, sentinel)
                    return jax.device_put(
                        b, jax.tree.map(lambda _: shard, b))
                b, lens_c, cols_c, vals_c = entry
                B_new, b = pad_padded(b, sentinel)
                entry = (b, pad_rows_to(lens_c, B_new, 0),
                         pad_rows_to(cols_c, B_new, 0),
                         pad_rows_to(vals_c, B_new, 0.0))
                return jax.device_put(
                    entry, jax.tree.map(lambda _: shard, entry))

            nu, ni, nc = (self.U.shape[0], self.I.shape[0],
                          self.C.shape[0])
            user_b = tuple(stage(b, nu) for b in batches["user"])
            item_b = tuple(stage(e, ni) for e in batches["item"])
            ctx_b = tuple(stage(b, nc) for b in batches["context"])
            U, I, C = (jax.device_put(self.U, repl),
                       jax.device_put(self.I, repl),
                       jax.device_put(self.C, repl))
            Ib = jax.device_put(self.Ib, repl)
            Cb = jax.device_put(self.Cb, repl)
        elif resident:
            # stage all three phases' batches on device once; the whole
            # 3-phase epoch then runs as a single XLA dispatch
            user_b = tuple(jax.device_put(b) for b in batches["user"])
            item_b = tuple(jax.device_put(b) for b in batches["item"])
            ctx_b = tuple(jax.device_put(b) for b in batches["context"])
        for i in range(opt.num_iters):
            start_t = time.time()
            if resident and mesh is not None:
                U, I, C, Ib, Cb, epoch_loss = K.cfr_epoch_dp(
                    U, I, C, Ib, Cb, user_b, item_b, ctx_b,
                    mesh=mesh, axis_name="d",
                    alpha=float(opt.alpha), l=float(opt.l),
                    reg_u=float(opt.reg_u), reg_i=float(opt.reg_i),
                    reg_c=float(opt.reg_c), **com)
            elif resident:
                U, I, C, Ib, Cb, epoch_loss = K.cfr_epoch(
                    U, I, C, Ib, Cb, user_b, item_b, ctx_b,
                    alpha=float(opt.alpha), l=float(opt.l),
                    reg_u=float(opt.reg_u), reg_i=float(opt.reg_i),
                    reg_c=float(opt.reg_c), **com)
            else:
                U, I, C, Ib, Cb, epoch_loss = self._streaming_epoch(
                    U, I, C, Ib, Cb, batches, com)
            loss = float(epoch_loss) / scale
            train_t = time.time() - start_t
            self.iteration_times.append(train_t)
            metrics = {"train_loss": loss}
            if opt.get("validation") and opt.evaluation_on_learning and \
                    self.periodical(opt.evaluation_period, i):
                start_t = time.time()
                self.U, self.I, self.C = (np.asarray(U), np.asarray(I),
                                          np.asarray(C))
                self.Ib, self.Cb = np.asarray(Ib), np.asarray(Cb)
                self.validation_result = self.get_validation_results()
                vali_t = time.time() - start_t
                val_str = " ".join(f"{k}:{v:0.5f}"
                                   for k, v in self.validation_result.items())
                self.logger.info(f"Validation: {val_str} "
                                 f"Elapsed {vali_t:0.3f} secs")
                metrics.update({f"vali_{k}": v
                                for k, v in self.validation_result.items()})
                if training_callback is not None and callable(training_callback):
                    training_callback(i, metrics)
            self.logger.info("Iteration %d: Loss %.3f Elapsed %.3f secs"
                             % (i + 1, loss, train_t))
            best_loss = self.save_best_only(loss, best_loss, i)
            if self.early_stopping(loss):
                break
        self.U, self.I, self.C = np.asarray(U), np.asarray(I), np.asarray(C)
        self.Ib, self.Cb = np.asarray(Ib), np.asarray(Cb)
        self.P = self.U
        self.Q = self.I
        self._sync_host_factors = None
        self.logger.info(
            f"elapsed for full epochs: {time.time() - full_st:.2f} sec")
        ret = {"train_loss": loss}
        ret.update({f"vali_{k}": v for k, v in self.validation_result.items()})
        return ret

    # --------------------------------------------------------------- access
    def _get_feature(self, index, group="item"):
        if group == "item":
            return self.I[index]
        elif group == "user":
            return self.U[index]
        elif group == "context":
            return self.C[index]
        return None

    def _get_data(self):
        data = super()._get_data()
        data.extend([("opt", self.opt), ("I", self.I), ("U", self.U),
                     ("C", self.C), ("Ib", self.Ib), ("Cb", self.Cb)])
        return data

    def get_evaluation_metrics(self):
        return ["train_loss", "vali_rmse", "vali_ndcg", "vali_map",
                "vali_accuracy", "vali_error"]
