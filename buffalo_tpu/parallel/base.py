"""Batch retrieval ("Parallels") layer.

Counterpart of the reference ``buffalo/parallel/base.py`` +
``_core.hpp``: bulk ``most_similar`` / ``topk_recommendation`` over
many queries at once.  The OpenMP ``dot_topn`` scan kernel
(``_core.hpp:88-142``) becomes one device matmul + ``lax.top_k`` per
query chunk (ops/topk.batch_topn); pool filtering gathers the pool
rows first, bias-aware scoring covers BPR.  Same surface: ``ParALS``,
``ParBPRMF``, ``ParW2V``, ``ParCFR``; ``-1`` key padding when a pool
is smaller than topk; ANN (hnsw) hooks intentionally left open as in
the current reference.
"""
from __future__ import annotations

import abc

import numpy as np

from buffalo_tpu.models.als import ALS
from buffalo_tpu.models.bpr import BPRMF
from buffalo_tpu.models.cfr import CFR
from buffalo_tpu.models.eals import EALS
from buffalo_tpu.models.w2v import W2V
from buffalo_tpu.ops.topk import batch_topn, batch_topn_sharded


class Parallel(abc.ABC):
    def __init__(self, algo, *argv, **kwargs):
        super().__init__()
        if not isinstance(algo, (ALS, EALS, CFR, W2V, BPRMF)):
            raise ValueError(f"Not supported algo type: {type(algo)}")
        self.algo = algo
        self.num_workers = int(kwargs["num_workers"])
        self._ann_index = {}    # group -> index (reference _ann_list)
        # optional device mesh: retrieval shards the candidate table
        # and merges per-shard top-k (ops.topk.sharded_matmul_topk)
        self.mesh = kwargs.get("mesh")
        if self.mesh is None and int(kwargs.get("num_devices", 0)) > 1:
            from buffalo_tpu import parallelism
            self.mesh = parallelism.get_mesh(int(kwargs["num_devices"]))
        # approx=True swaps exact top-k selection for lax.approx_max_k
        # (TPU partial reduction): measured 2.1x faster at 505k-wide
        # catalogs on a v5e at recall@10 0.98 vs exact — opt-in because
        # results may drop ~2% of true top-10 entries.
        self.approx = bool(kwargs.get("approx", False))
        from buffalo_tpu.utils import enable_compilation_cache
        enable_compilation_cache()

    def set_ann_index(self, index, group="item"):
        """Optional ANN hook (the reference's n2/HNSW path,
        ``examples/example_als.py:56-76``): any object exposing
        ``search(queries: (B, d) float32, topk: int) -> (ids, scores)``,
        or a path to a saved :class:`~buffalo_tpu.parallel.ann.IVFIndex`
        (the analog of ``set_hnsw_index(path, group)``).  Indexes are
        kept per ``group`` (the reference's ``_ann_list``): an index
        built on item factors must not serve ``group="user"`` queries.
        When set, ``most_similar`` over that group delegates to it
        instead of the exact sharded matmul scan."""
        if isinstance(index, str):
            from buffalo_tpu.parallel.ann import IVFIndex
            index = IVFIndex.load(index)
        if not hasattr(index, "search"):
            raise ValueError("ANN index must expose search(queries, topk)")
        self._ann_index[group] = index

    def _resolve(self, keys, group):
        indexes = self.algo.get_index(list(keys), group=group)
        kept = [(k, i) for k, i in zip(keys, indexes) if i is not None]
        keys = [k for k, _ in kept]
        idx = np.array([i for _, i in kept], dtype=np.int32)
        return keys, idx

    def _resolve_pool(self, pool, group="item"):
        if pool is None:
            return None
        pool = self.algo.get_index_pool(pool, group=group)
        if len(pool) == 0:
            raise RuntimeError("pool is empty")
        return pool.astype(np.int32)

    def _scan(self, queries, Factor, topk, pool, Qb=None):
        """Full MIPS scan (exact, or ``lax.approx_max_k`` selection when
        the facade was built with ``approx=True``): sharded over the
        mesh when one is set and no pool restricts the candidates,
        single-device otherwise."""
        if self.mesh is not None and pool is None:
            return batch_topn_sharded(queries, Factor, topk, self.mesh,
                                      Qb=Qb, approx=self.approx)
        # approx mode also ships the queries bf16: the query upload is
        # the dominant cost of a warm bulk call over the tunneled chip
        # (106 of 174 ms at brunch d=100 x 10k queries) and scores
        # still accumulate in f32 — recall measured with both effects
        # in benchmark/README.md's retrieval table
        return batch_topn(queries, Factor, topk, pool=pool, Qb=Qb,
                          approx=self.approx,
                          query_dtype="bfloat16" if self.approx else None)

    def _most_similar(self, group, indexes, Factor, topk, pool):
        ann = self._ann_index.get(group)
        if ann is not None and pool is None:
            return ann.search(np.asarray(Factor)[indexes], topk)
        return self._scan(np.asarray(Factor)[indexes], Factor, topk, pool)

    def _topk_recommendation(self, indexes, FactorP, FactorQ, topk, pool):
        return self._scan(np.asarray(FactorP)[indexes], FactorQ, topk,
                          pool)

    def _topk_recommendation_bias(self, indexes, FactorP, FactorQ,
                                  FactorQb, topk, pool):
        return self._scan(np.asarray(FactorP)[indexes], FactorQ, topk,
                          pool, Qb=FactorQb)

    @abc.abstractmethod
    def most_similar(self, keys, topk=10, group="item", pool=None,
                     repr=False, ef_search=-1, use_mmap=True):
        """Batched top-k most-similar retrieval.

        Returns (topks int32[B, topk] with -1 padding, scores f32) or,
        with ``repr=True``, keys instead of indexes.

        ``ef_search`` / ``use_mmap`` are the reference's n2/HNSW tuning
        knobs (``parallel/base.py:40-41``); accepted for call-site
        compatibility and ignored (the IVF index tunes via ``n_probe``).
        """
        raise NotImplementedError

    @abc.abstractmethod
    def topk_recommendation(self, keys, topk=10, pool=None, repr=False):
        """Batched top-k recommendation; returns (keys, topks, scores)."""
        raise NotImplementedError


class ParALS(Parallel):
    def __init__(self, algo, **kwargs):
        opt = getattr(algo, "opt", None)
        kwargs["num_workers"] = int(kwargs.get(
            "num_workers", opt.num_workers if opt else 1))
        super().__init__(algo, **kwargs)

    def most_similar(self, keys, topk=10, group="item", pool=None,
                     repr=False, ef_search=-1, use_mmap=True):
        self.algo.normalize(group=group)
        keys, indexes = self._resolve(keys, group)
        pool = self._resolve_pool(pool, group=group)
        if group == "item":
            topks, scores = self._most_similar(group, indexes, self.algo.Q,
                                               topk, pool)
            if repr:
                topks = [[self.algo._idmanager.itemids[t]
                          for t in tt if t != -1] for tt in topks]
            return topks, scores
        elif group == "user":
            topks, scores = self._most_similar(group, indexes, self.algo.P,
                                               topk, pool)
            if repr:
                topks = [[self.algo._idmanager.userids[t]
                          for t in tt if t != -1] for tt in topks]
            return topks, scores
        raise ValueError(f"Not supported group: {group}")

    def topk_recommendation(self, keys, topk=10, pool=None, repr=False):
        if self.algo.opt.get("_nrz_P") or self.algo.opt.get("_nrz_Q"):
            raise RuntimeError(
                "Cannot make topk recommendation with normalized factors")
        keys, indexes = self._resolve(keys, "user")
        pool = self._resolve_pool(pool, group="item")
        topks, scores = self._topk_recommendation(
            indexes, self.algo.P, self.algo.Q, topk, pool)
        if repr:
            topks = [[self.algo._idmanager.itemids[t]
                      for t in tt if t != -1] for tt in topks]
        return keys, topks, scores


class ParEALS(ParALS):
    pass


class ParBPRMF(ParALS):
    def topk_recommendation(self, keys, topk=10, pool=None, repr=False):
        if self.algo.opt.get("_nrz_P") or self.algo.opt.get("_nrz_Q"):
            raise RuntimeError(
                "Cannot make topk recommendation with normalized factors")
        keys, indexes = self._resolve(keys, "user")
        pool = self._resolve_pool(pool, group="item")
        topks, scores = self._topk_recommendation_bias(
            indexes, self.algo.P, self.algo.Q, self.algo.Qb, topk, pool)
        if repr:
            topks = [[self.algo._idmanager.itemids[t]
                      for t in tt if t != -1] for tt in topks]
        return keys, topks, scores


class ParW2V(Parallel):
    def __init__(self, algo, **kwargs):
        opt = getattr(algo, "opt", None)
        kwargs["num_workers"] = int(kwargs.get(
            "num_workers", opt.num_workers if opt else 1))
        super().__init__(algo, **kwargs)

    def most_similar(self, keys, topk=10, pool=None, repr=False,
                     group="item", ef_search=-1, use_mmap=True):
        self.algo.normalize(group="item")
        indexes = self.algo.get_index(list(keys), group="item")
        kept = [(k, i) for k, i in zip(keys, indexes) if i is not None]
        keys = [k for k, _ in kept]
        indexes = np.array([i for _, i in kept], dtype=np.int32)
        if pool is not None:
            pool = np.asarray(
                [i for i in self.algo.get_index(list(pool), group="item")
                 if i is not None], dtype=np.int32)
            if len(pool) == 0:
                raise RuntimeError("pool is empty")
        topks, scores = self._most_similar("item", indexes, self.algo.L0,
                                           topk, pool)
        if repr:
            inv = self.algo._vocab.inv_index
            topks = [[self.algo._idmanager.itemids[inv[t]]
                      for t in tt if t != -1] for tt in topks]
        return topks, scores

    def topk_recommendation(self, keys, topk=10, pool=None, repr=False):
        raise NotImplementedError


class ParCFR(ParALS):
    """CFR retrieval: user x item factors, like ALS (U/I aliased P/Q)."""
