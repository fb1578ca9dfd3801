"""Implicit-feedback Alternating Least Squares on TPU.

Counterpart of the reference ALS stack (driver ``buffalo/algo/als.py``,
C++ core ``lib/algo_impl/als/als.cc``, CUDA core ``lib/cuda/als/als.cu``)
— same epoch structure (gramian precompute → rowwise half → colwise
half → RMSE from (nume, deno) → validation → save-best/early-stop),
same hyperparameters and solver set, but the per-row OpenMP/CUDA loops
become jitted batched einsum+solve steps over padded degree-bucketed
batches, with the iALS++ blockwise subspace CG auto-enabled at d>=128
(``als.cc:46``).

Reference: Hu, Koren, Volinsky — Collaborative Filtering for Implicit
Feedback Datasets; iALS++ (arXiv 2110.14044).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Optional

import numpy as np

from buffalo_tpu.data.base import Data
from buffalo_tpu.data.batching import (DeviceBatcher, build_range_layout,
                                        build_sharded_range_layout,
                                        choose_group_dispatch,
                                        padded_entry_count, permute_table,
                                        stack_batches)
from buffalo_tpu.evaluate import Evaluable
from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.models.options import ALSOption
from buffalo_tpu.ops.als_kernels import (als_batch_step, als_epoch,
                                         als_epoch_sharded_range,
                                         als_group_step, gramian_step)
from buffalo_tpu import parallelism


class ALS(Algo, ALSOption, Evaluable, Serializable):
    """Python driver for TPU ALS."""

    def __init__(self, opt_path=None, *args, **kwargs):
        Algo.__init__(self, *args, **kwargs)
        ALSOption.__init__(self, *args, **kwargs)
        Evaluable.__init__(self, *args, **kwargs)
        Serializable.__init__(self, *args, **kwargs)
        self._setup_driver(opt_path, ALSOption, "ALS", ["matrix"], kwargs)

    @staticmethod
    def new(path, data_fields=[]):
        return ALS.instantiate(ALSOption, path, data_fields)

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
        """|N(0, 1/d^2)| init, matching the reference (als.py:85-88)."""
        assert self.data, "Data is not set"
        header = self.data.get_header()
        d = self.opt.d
        for name, rows in [("P", header["num_users"]),
                           ("Q", header["num_items"])]:
            setattr(self, name, np.abs(
                np.random.normal(scale=1.0 / (d ** 2),
                                 size=(rows, d)).astype("float32")))

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
    def _resolve_optimizer(self) -> str:
        optimizer = self.opt.optimizer
        if self.opt.d >= 128:
            # auto iALS++ (als.cc:46).  TPU block-size note: einsums
            # over a sub-128 block contract on a lane-padded axis —
            # measured ML-20M d=160 epochs: b32 1.49s, b64 1.09s,
            # b128 0.89s, b160 0.80s (manual_cg 0.89s).  When
            # block_size sits at the reference default (32, tuned for
            # CPU cache lines), auto-select the full dimension —
            # whether ialspp was auto-chosen or user-requested.
            optimizer = "ialspp"
        if optimizer == "ialspp" and self.opt.d >= 128 \
                and int(self.opt.block_size) == 32:
            self.opt.block_size = int(self.opt.d)
        return optimizer

    def _epoch_kwargs(self):
        opt = self.opt
        return dict(
            optimizer=self._optimizer, alpha=float(opt.alpha),
            adaptive_reg=bool(opt.adaptive_reg),
            cg_iters=int(opt.num_cg_max_iters),
            cg_tol=float(opt.cg_tolerance),
            block_size=min(int(opt.block_size), int(opt.d)),
            compute_loss=bool(opt.compute_loss_on_training))

    def _run_epoch(self, batchers, P, Q):
        """One full epoch; one XLA dispatch when data is device-resident.

        Falls back to per-batch streaming dispatches (reference-style
        ``batch_mb`` bounded memory, ``buffered_data.py:85-118``) when
        the padded epoch exceeds the HBM budget.
        """
        import jax.numpy as jnp

        opt = self.opt
        kw = self._epoch_kwargs()
        if getattr(self, "_mesh_range", None) is not None:
            # mesh path: row-sharded tables, per-shard contiguous range
            # updates under shard_map (all-gather fixed side + psum
            # gramian); long rows run as sharded scatter segments
            mr = self._mesh_range
            P, Q, nume, deno = als_epoch_sharded_range(
                P, Q, mr["row_groups"], mr["col_groups"],
                mr["row_segments"], mr["col_segments"],
                mesh=mr["mesh"], axis_name="d",
                reg_u=float(opt.reg_u), reg_i=float(opt.reg_i),
                num_p_rows=mr["num_users"], num_q_rows=mr["num_items"],
                **kw)
            return P, Q, float(nume), float(deno)
        if all(batchers[g].resident for g in ("rowwise", "colwise")):
            if getattr(self, "_range", None) is not None:
                # bucket-order layout: tables are permuted/padded,
                # updates are contiguous range writes (no scatter)
                rs = self._range
                if rs["group_dispatch"]:
                    # beyond ~100M padded entries the single fused
                    # program OOMs on XLA temps; dispatch per stacked
                    # group instead (pipelined round trips)
                    nume = deno = 0.0
                    com = dict(reg=float(opt.reg_u), item_axis=False,
                               num_fixed_rows=rs["num_items"], **kw)
                    FF = gramian_step(Q)
                    for g in rs["row_groups"]:
                        P, n, dn = als_group_step(P, Q, FF, g, **com)
                        nume, deno = nume + n, deno + dn
                    com = dict(reg=float(opt.reg_i), item_axis=True,
                               num_fixed_rows=rs["num_users"], **kw)
                    FF = gramian_step(P)
                    for g in rs["col_groups"]:
                        Q, n, dn = als_group_step(Q, P, FF, g, **com)
                        nume, deno = nume + n, deno + dn
                    return P, Q, float(nume), float(deno)
                P, Q, nume, deno = als_epoch(
                    P, Q, rs["row_groups"], rs["col_groups"],
                    reg_u=float(opt.reg_u), reg_i=float(opt.reg_i),
                    num_p_rows=rs["num_users"],
                    num_q_rows=rs["num_items"], **kw)
                return P, Q, float(nume), float(deno)
            # stacked groups (one compiled body per shape) unless the
            # batches carry explicit shardings (the dp mesh path shards
            # the batch axis, which stacking would hide)
            def staged(b):
                return (b.device_batches() if b.sharding is not None
                        else b.device_batches_stacked())
            header = self.data.get_header()
            if getattr(self, "_scatter_group_dispatch", False):
                # beyond ~100M padded entries the single fused program
                # OOMs on XLA temps (730M lesson); dispatch per stacked
                # group instead — the dispatches pipeline
                nume = deno = 0.0
                FF = gramian_step(Q)
                for g in staged(batchers["rowwise"]):
                    P, n, dn = als_group_step(
                        P, Q, FF, g, reg=float(opt.reg_u),
                        item_axis=False,
                        num_fixed_rows=int(header["num_items"]), **kw)
                    nume, deno = nume + n, deno + dn
                FF = gramian_step(P)
                for g in staged(batchers["colwise"]):
                    Q, n, dn = als_group_step(
                        Q, P, FF, g, reg=float(opt.reg_i), item_axis=True,
                        num_fixed_rows=int(header["num_users"]), **kw)
                    nume, deno = nume + n, deno + dn
                return P, Q, float(nume), float(deno)
            P, Q, nume, deno = als_epoch(
                P, Q, tuple(staged(batchers["rowwise"])),
                tuple(staged(batchers["colwise"])),
                reg_u=float(opt.reg_u), reg_i=float(opt.reg_i),
                num_p_rows=int(header["num_users"]),
                num_q_rows=int(header["num_items"]), **kw)
            return P, Q, float(nume), float(deno)

        nume = deno = 0.0
        header = self.data.get_header()
        for group in ("rowwise", "colwise"):
            item_axis = group == "colwise"
            A, Bf = (P, Q) if group == "rowwise" else (Q, P)
            reg = opt.reg_i if item_axis else opt.reg_u
            n_fixed = int(header["num_items" if not item_axis
                                 else "num_users"])
            FF = jnp.dot(Bf.T, Bf, preferred_element_type=jnp.float32)
            step = partial(als_batch_step, reg=float(reg),
                           item_axis=item_axis, num_fixed_rows=n_fixed,
                           **kw)
            numes, denos = [], []
            st = time.time()
            for batch in batchers[group]:
                A, n, d = step(A, Bf, FF, batch)
                numes.append(n)
                denos.append(d)
            nume += float(np.sum([np.asarray(x) for x in numes]))
            deno += float(np.sum([np.asarray(x) for x in denos]))
            self.logger.debug(
                f"{group} updated: elapsed {time.time() - st:0.3f}s")
            if group == "rowwise":
                P = A
            else:
                Q = A
        return P, Q, nume, deno

    def train(self, training_callback: Optional[
            Callable[[int, Dict[str, float]], None]] = None) -> Dict[str, float]:
        assert self.data, "Data is not set"
        import jax

        self._optimizer = self._resolve_optimizer()
        # 32 < d < 64 tables store zero-padded to 64 lanes on TPU
        # (als_kernels.als_stored_width has the r5 width-audit
        # numbers); host syncs below slice back to the true d
        d_true = int(self.opt.d)
        from buffalo_tpu.ops.als_kernels import als_stored_width
        from buffalo_tpu.ops.sgd_kernels import pad_cols
        width = als_stored_width(d_true,
                                 int(self.opt.get("stored_width", 0)),
                                 max_rows=max(self.P.shape[0],
                                              self.Q.shape[0]))
        self._width_slice = d_true if width > d_true else None
        if self._width_slice is not None:
            self.P = pad_cols(self.P, width)
            self.Q = pad_cols(self.Q, width)
        mesh = None
        n_dev = self.opt.get("num_devices") or 0
        if n_dev == 1:
            mesh = None  # force single-device (enables range layout)
        elif jax.device_count() > 1 or n_dev > 1:
            mesh = parallelism.get_mesh(n_dev if n_dev else None)

        batch_shard = row_shard = repl = None
        if mesh is not None:
            batch_shard = parallelism.shard_batch(mesh)
            row_shard = parallelism.shard_rows(mesh)
            repl = parallelism.replicated(mesh)

        def batch_sharding(arr):
            return batch_shard

        sharding_mode = self.opt.get("sharding", "dp")
        range_opt = bool(self.opt.get("range_layout", True))
        # tp on a mesh defaults to the sharded range layout: per-shard
        # contiguous updates under shard_map instead of scatter into
        # the row-sharded table (the measured ~133 ns/row floor)
        mesh_range_intent = (mesh is not None and "tp" in sharding_mode
                             and range_opt)

        def make_batchers(mesh_batches):
            return {group: DeviceBatcher(
                self.data, group,
                batch_mb=int(self.data.opt.data.get("batch_mb", 1024)),
                resident_mb=int(self.opt.get("resident_mb", 4096)),
                row_multiple=(mesh.size if mesh_batches else 1),
                sharding=batch_sharding if mesh_batches else None,
                d=width,
                # llt/ldlt materialize the (B, d, d) system at every
                # bucket length; cap rows-per-batch everywhere for them
                matrix_free=self._optimizer not in ("llt", "ldlt"))
                for group in ("rowwise", "colwise")}

        batchers = make_batchers(mesh is not None and not mesh_range_intent)
        resident = all(batchers[g].resident for g in ("rowwise", "colwise"))
        if mesh_range_intent and not resident:
            # the sharded range layout needs residency; fall back to the
            # mesh streaming path, whose batches must carry the batch
            # sharding (a plain device_put would pin them to one device
            # and clash with the row-sharded tables)
            mesh_range_intent = False
            batchers = make_batchers(mesh is not None)

        table_sharding = row_shard if (
            mesh is not None and "tp" in sharding_mode) else repl

        self._range = None
        self._mesh_range = None
        self._table_pad = False
        self._scatter_group_dispatch = False
        if mesh_range_intent and resident:
            rb = batchers["rowwise"]
            cb = batchers["colwise"]
            (row_g, col_g, row_seg, col_seg, u_pos, i_pos, S_u,
             S_i) = build_sharded_range_layout(
                rb.planner, cb.planner, rb.key, rb.val, cb.key, cb.val,
                mesh.size)
            Pp = permute_table(self.P, u_pos, mesh.size * S_u)
            Qp = permute_table(self.Q, i_pos, mesh.size * S_i)

            def put_sharded(tree):
                return jax.device_put(
                    tree, jax.tree.map(lambda _: row_shard, tree))

            def put_repl(tree):
                return jax.device_put(
                    tree, jax.tree.map(lambda _: repl, tree))

            self._mesh_range = {
                "row_groups": tuple(put_sharded(g) for g in row_g),
                "col_groups": tuple(put_sharded(g) for g in col_g),
                "row_segments": tuple(put_repl(s) for s in row_seg),
                "col_segments": tuple(put_repl(s) for s in col_seg),
                "u_pos": u_pos, "i_pos": i_pos,
                "num_users": int(self.P.shape[0]),
                "num_items": int(self.Q.shape[0]),
                "mesh": mesh,
            }
            P = jax.device_put(Pp, row_shard)
            Q = jax.device_put(Qp, row_shard)

        # bucket-order range layout: single-device resident training
        # permutes both tables once so every batch updates a contiguous
        # row range (scatter costs ~133 ns/row at 20M+ rows; a range
        # write is pure bandwidth)
        use_range = (mesh is None and resident and range_opt)

        def planned_padded_entries():
            # buckets AND segment chunks — power-law head rows can be
            # a third of the epoch, and undercounting them here keeps
            # the fused program / f32 vals past the OOM thresholds
            return sum(batchers[g].planner.padded_entries()
                       for g in ("rowwise", "colwise"))

        def pick_vals_dtype(padded_entries):
            """bf16 confidence values at scale (730M lesson: halves the
            gathered-batch HBM footprint, accuracy unaffected — the
            solve math upcasts to f32)."""
            choice = str(self.opt.get("vals_dtype", "auto"))
            if choice == "auto":
                choice = ("bfloat16" if padded_entries > (100 << 20)
                          else "float32")
            return np.dtype(choice)

        if use_range:
            rb = batchers["rowwise"]
            cb = batchers["colwise"]
            row_b, col_b, u_pos, i_pos, u_pad, i_pad = build_range_layout(
                rb.planner, cb.planner, rb.key, rb.val, cb.key, cb.val,
                vals_dtype=pick_vals_dtype(planned_padded_entries()))
            Pp = permute_table(self.P, u_pos, u_pad)
            Qp = permute_table(self.Q, i_pos, i_pad)
            group_dispatch = choose_group_dispatch(
                self.opt, padded_entry_count(row_b + col_b))
            self._range = {
                "row_groups": tuple(jax.device_put(b)
                                    for b in stack_batches(row_b)),
                "col_groups": tuple(jax.device_put(b)
                                    for b in stack_batches(col_b)),
                "u_pos": u_pos, "i_pos": i_pos,
                "num_users": int(self.P.shape[0]),
                "num_items": int(self.Q.shape[0]),
                "group_dispatch": group_dispatch,
            }
            P = jax.device_put(Pp)
            Q = jax.device_put(Qp)
        elif self._mesh_range is None:
            self._scatter_group_dispatch = resident and \
                choose_group_dispatch(self.opt, planned_padded_entries())
            if mesh is not None and table_sharding is row_shard:
                # row-sharded tables must divide evenly over the mesh;
                # pad with zero rows (never referenced by batches)
                def mesh_pad(T):
                    pad = (-T.shape[0]) % mesh.size
                    if pad:
                        T = np.vstack(
                            [T, np.zeros((pad, T.shape[1]), T.dtype)])
                    return T
                self._table_pad = True
                P = jax.device_put(mesh_pad(self.P), table_sharding)
                Q = jax.device_put(mesh_pad(self.Q), table_sharding)
            else:
                P = jax.device_put(self.P, table_sharding)
                Q = jax.device_put(self.Q, table_sharding)

        def to_host(P, Q):
            Ph = parallelism.host_local_copy(P)
            Qh = parallelism.host_local_copy(Q)
            layout = self._range or self._mesh_range
            if layout is not None:
                Ph, Qh = Ph[layout["u_pos"]], Qh[layout["i_pos"]]
            elif getattr(self, "_table_pad", False):
                header = self.data.get_header()
                Ph = Ph[:header["num_users"]]
                Qh = Qh[:header["num_items"]]
            if self._width_slice is not None:
                Ph = np.ascontiguousarray(Ph[:, :self._width_slice])
                Qh = np.ascontiguousarray(Qh[:, :self._width_slice])
            return Ph, Qh

        def _sync_host():
            # closure over the loop's current device tables
            self.P, self.Q = to_host(P, Q)
        self._sync_host_factors = _sync_host

        best_loss, rmse, self.validation_result = float("inf"), None, {}
        full_st = time.time()
        self.iteration_times = []  # per-epoch train seconds
        for i in range(self.opt.num_iters):
            start_t = time.time()
            P, Q, nume, deno = self._run_epoch(batchers, P, Q)
            train_t = time.time() - start_t
            self.iteration_times.append(train_t)
            rmse = (nume / (deno + self.opt.eps)) ** 0.5
            metrics = {"train_loss": rmse}
            if self.opt.get("validation") and \
                    self.opt.evaluation_on_learning and \
                    self.periodical(self.opt.evaluation_period, i):
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
            self.logger.info("Iteration %d: RMSE %.3f Elapsed %.3f secs"
                             % (i + 1, rmse, train_t))
            best_loss = self.save_best_only(rmse, best_loss, i)
            if self.early_stopping(rmse):
                break
        self.P, self.Q = to_host(P, Q)
        self._sync_host_factors = None
        self._range = None
        self._mesh_range = None
        self.logger.info(
            f"elapsed for full epochs: {time.time() - full_st:.2f} sec")
        ret = {"train_loss": rmse}
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
