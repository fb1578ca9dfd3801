"""Model base classes: id mapping, retrieval, early stopping, serialization.

Behavioral counterpart of the reference ``buffalo/algo/base.py``:
``Algo`` (id<->index maps, top-k recommendation, most-similar, early
stopping, save-best, feature access, L2 normalize — ``base.py:12-268``)
and ``Serializable`` (length-prefixed pickled record container with
partial-field load and the ``instantiate`` factory —
``base.py:271-318``; the on-disk format is kept identical so models
serialized by either implementation share tooling).  Scoring runs on
device through ``ops.topk``.
"""
from __future__ import annotations

import abc
import pickle
import struct

import numpy as np

from buffalo_tpu.ops.topk import matmul_topk
from buffalo_tpu.utils import Option

EPS = 1e-8


class Algo(abc.ABC):
    def __init__(self, *args, **kwargs):
        self._idmanager = Option({"userid": [], "userid_map": {},
                                  "itemid": [], "itemid_map": {},
                                  "userid_mapped": False,
                                  "itemid_mapped": False})

    def get_option(self, opt_path):
        if isinstance(opt_path, dict):
            opt = Option(opt_path)
        else:
            opt = Option(opt_path)
        self.is_valid_option(opt)
        return (Option(opt), opt_path)

    @staticmethod
    def _normalize(feat):
        feat = np.asarray(feat)
        return feat / np.sqrt((feat ** 2).sum(-1) + EPS)[..., np.newaxis]

    def initialize(self):
        self.__early_stopping = {"round": 0, "min_loss": 987654321}
        if self.opt.get("random_seed"):
            np.random.seed(self.opt.random_seed)

    @abc.abstractmethod
    def normalize(self, group="item"):
        raise NotImplementedError

    # ------------------------------------------------------------- retrieval
    def _get_topk_recommendation(self, p, Q, pb, Qb, pool, topk, num_workers):
        """Device-side scores + top-k (base.py:40-55 analog)."""
        if pool is not None:
            Q = Q[pool]
            if Qb is not None:
                Qb = Qb[pool]
        vals, topks = matmul_topk(np.asarray(p), np.asarray(Q), topk,
                                  pb=None if pb is None else np.asarray(pb),
                                  Qb=None if Qb is None else np.asarray(Qb))
        topks = np.asarray(topks)
        if pool is not None:
            topks = np.asarray(pool)[topks]
        return topks

    def topk_recommendation(self, keys, topk=10, pool=None):
        """Return top-k recommendations for each user key (dict) or one list."""
        is_many = isinstance(keys, list)
        if not is_many:
            keys = [keys]
        if not self._idmanager.userid_mapped:
            self.build_userid_map()
        if not self._idmanager.itemid_mapped:
            self.build_itemid_map()
        if pool is not None:
            pool = self.get_index_pool(pool, group="item")
            if len(pool) == 0:
                return []
        rows = [self._idmanager.userid_map[k] for k in keys
                if k in self._idmanager.userid_map]
        if not rows:
            return []
        topks = self._get_topk_recommendation(rows, topk, pool)
        if is_many:
            return {self._idmanager.userids[k]:
                    [self._idmanager.itemids[v] for v in vv]
                    for k, vv in topks}
        for k, vv in topks:
            return [self._idmanager.itemids[v] for v in vv]

    def most_similar(self, key, topk=10, group="item", pool=None):
        """Return the top-k most similar items as (key, score) tuples."""
        if group == "item":
            if not self._idmanager.itemid_mapped:
                self.build_itemid_map()
            return self._most_similar_item(key, topk, pool)
        return []

    def _get_most_similar_item(self, col, topk, Factor, nrz, pool):
        if isinstance(col, np.ndarray):
            q = col
        else:
            topk += 1
            q = Factor[col]
        target = Factor if pool is None else Factor[pool]
        dot = q.dot(target.T)
        if not nrz:
            dot = dot / (np.linalg.norm(q) *
                         np.linalg.norm(target, axis=1) + EPS)
        topks = self.get_topk(dot, k=topk, num_threads=self.opt.num_workers)
        scores = dot[topks]
        if pool is not None:
            topks = np.asarray(pool)[topks]
        return topks, scores

    def _most_similar_item(self, key, topk=10, pool=None):
        is_vector = False
        if isinstance(key, np.ndarray):
            f = key
            is_vector = True
        else:
            col = self._idmanager.itemid_map.get(key)
            if col is None:
                return []
            f = col
        if pool is not None:
            pool = self.get_index_pool(pool, group="item")
            if len(pool) == 0:
                return []
        topks, scores = self._get_most_similar_item(f, topk, pool)
        if is_vector:
            return [(self._idmanager.itemids[k], v)
                    for (k, v) in zip(topks, scores)]
        return [(self._idmanager.itemids[k], v)
                for (k, v) in zip(topks, scores) if k != f]

    # -------------------------------------------------------------- id maps
    def _build_id_map(self, which: str):
        idmap = self.data.get_group("idmap")
        header = self.data.get_header()
        arr = idmap.get("rows" if which == "user" else "cols")
        n = header["num_users"] if which == "user" else header["num_items"]
        if arr is None or arr.shape[0] == 0:
            ids = [str(i) for i in range(n)]
        else:
            ids = [str(x) for x in arr]
        id_map = {v: idx for idx, v in enumerate(ids)}
        return ids, id_map

    def build_itemid_map(self):
        ids, id_map = self._build_id_map("item")
        self._idmanager.itemids = ids
        self._idmanager.itemid_map = id_map
        self._idmanager.itemid_mapped = True

    def build_userid_map(self):
        ids, id_map = self._build_id_map("user")
        self._idmanager.userids = ids
        self._idmanager.userid_map = id_map
        self._idmanager.userid_mapped = True

    # ------------------------------------------------------------- features
    def get_feature(self, name, group="item"):
        index = self.get_index(name, group=group)
        if index is None:
            return None
        return self._get_feature(index, group)

    @abc.abstractmethod
    def _get_feature(self, index, group="item"):
        raise NotImplementedError

    def get_weighted_feature(self, weights, group="item", min_length=1):
        if isinstance(weights, dict):
            feat = [(self.get_feature(k), w) for k, w in weights.items()]
            feat = [f * w for f, w in feat if f is not None]
        elif isinstance(weights, list):
            feat = [self.get_feature(k) for k, w in weights]
            feat = [f for f in feat if f is not None]
        if len(feat) < min_length:
            return None
        feat = np.array(feat, dtype=np.float64).mean(axis=0)
        return (feat / np.linalg.norm(feat) + EPS).astype(np.float32)

    # -------------------------------------------------------- training aids
    def periodical(self, period, current):
        return not period or (current + 1) % period == 0

    def save_best_only(self, loss, best_loss, i):
        if self.opt.save_best and best_loss > loss \
                and self.periodical(self.opt.save_period, i):
            self.save(self.opt.model_path)
            return loss
        return best_loss

    def early_stopping(self, loss):
        if self.opt.early_stopping_rounds < 1:
            return False
        es = self.__early_stopping
        if es["min_loss"] < loss:
            es["round"] += 1
        else:
            es["round"] = 0
        es["min_loss"] = loss
        if es["round"] >= self.opt.early_stopping_rounds:
            self.logger.info("Reached at early_stopping rounds, stopping train.")
            return True
        return False

    # --------------------------------------------------------------- lookup
    def get_index(self, keys, group="item"):
        is_many = isinstance(keys, list)
        if not is_many:
            keys = [keys]
        if group == "item":
            if not self._idmanager.itemid_mapped:
                self.build_itemid_map()
            indexes = [self._idmanager.itemid_map.get(k) for k in keys]
        elif group == "user":
            if not self._idmanager.userid_mapped:
                self.build_userid_map()
            indexes = [self._idmanager.userid_map.get(k) for k in keys]
        else:
            indexes = []
        if not is_many:
            return indexes[0]
        return np.array(indexes)

    def get_index_pool(self, pool, group="item"):
        if isinstance(pool, list):
            pool = self.get_index(pool, group)
            pool = np.array([p for p in pool if p is not None])
        elif isinstance(pool, np.ndarray):
            pass
        else:
            raise ValueError(f"Unexpected type for pool: {type(pool)}")
        assert isinstance(pool, np.ndarray)
        return pool


class Serializable(abc.ABC):
    """Length-prefixed pickle record container (base.py:271-318 format)."""

    def __init__(self, *args, **kwargs):
        pass

    def save(self, path=None, with_itemid_map=True, with_userid_map=True,
             data_fields=[]):
        if path is None:
            path = self.opt.model_path
        if with_itemid_map and not self._idmanager.itemid_mapped:
            self.build_itemid_map()
        if with_userid_map and not self._idmanager.userid_mapped:
            self.build_userid_map()
        data = self._get_data()
        if data_fields:
            data = [(k, v) for k, v in data if k in data_fields]
        with open(path, "wb") as fout:
            fout.write(struct.pack("Q", len(data)))
            for name, obj in data:
                bname = bytes(name, encoding="utf-8")
                fout.write(struct.pack("Q", len(bname)))
                fout.write(bname)
                s = pickle.dumps(obj, protocol=4)
                fout.write(struct.pack("Q", len(s)))
                fout.write(s)

    def _get_data(self):
        return [("_idmanager", self._idmanager)]

    def load(self, path, data_fields=[]):
        with open(path, "rb") as fin:
            total_objs = struct.unpack("Q", fin.read(8))[0]
            for _ in range(total_objs):
                name_sz = struct.unpack("Q", fin.read(8))[0]
                name = fin.read(name_sz).decode("utf8")
                obj_sz = struct.unpack("Q", fin.read(8))[0]
                if data_fields and name not in data_fields:
                    fin.seek(obj_sz, 1)
                    continue
                setattr(self, name, pickle.loads(fin.read(obj_sz)))

    @classmethod
    def instantiate(cls, cls_opt, path, data_fields):
        opt = cls_opt().get_default_option()
        c = cls(opt)
        c.load(path, data_fields)
        return c
