"""Ranking and score evaluation mixin.

Behavioral counterpart of the reference ``buffalo/evaluate/base.py``:
``get_validation_results`` returns NDCG / MAP / accuracy(hit-rate) /
AUC over seen-filtered top-k recommendations plus RMSE / MAE on the
validation triples, with identical formulas (``evaluate/base.py:44-148``
— the AUC closed form over the ranked list, idcg normalization by
``min(|gt|, topk)``, ap normalized by ``min(|gt|, topk)``).  Scoring
runs on device (one matmul + ``lax.top_k`` instead of the C++
quickselect); the per-user metric accumulation stays in numpy over the
small validation set.
"""
from __future__ import annotations

import numpy as np

from buffalo_tpu.ops.topk import topk as _topk_op


class Evaluable:
    def __init__(self, *args, **kwargs):
        pass

    def prepare_evaluation(self):
        if not self.opt.get("validation") or not self.data.has_group("vali"):
            return
        if not hasattr(self.data, "vali_data"):
            self.data._prepare_validation_data()

    def show_validation_results(self):
        results = self.get_validation_results()
        if not results:
            return "No validation results"
        return "Validation results: " + ", ".join(
            f"{k}: {v:0.5f}" for k, v in results.items())

    def get_validation_results(self):
        if not self.opt.get("validation") or not self.data.has_group("vali"):
            return
        results = {}
        results.update(self._evaluate_ranking_metrics())
        results.update(self._evaluate_score_metrics())
        return results

    def get_topk(self, scores, k, sorted=True, num_threads=4):
        return _topk_op(scores, k, sorted=sorted, num_threads=num_threads)

    def _evaluate_ranking_metrics(self):
        if not hasattr(self.data, "vali_data"):
            self.prepare_evaluation()
        batch_size = self.opt.validation.get("batch", 128)
        topk = self.opt.validation.topk

        vali = self.data.vali_data
        gt = vali["vali_gt"]
        rows = vali["vali_rows"]
        validation_seen = vali["validation_seen"]
        max_seen = vali["validation_max_seen_size"]
        num_items = self.data.get_header()["num_items"]

        if self.opt.validation.get("eval_samples"):
            size = min(self.opt.validation.eval_samples, len(rows))
            rows = np.random.choice(rows, size=size, replace=False)

        NDCG = AP = HIT = AUC = N = 0.0
        idcgs = np.cumsum(1.0 / np.log2(np.arange(2, topk + 2)))
        dcgs = 1.0 / np.log2(np.arange(2, topk + 2))

        for index in range(0, len(rows), batch_size):
            recs = self._get_topk_recommendation(
                rows[index:index + batch_size], topk=topk + max_seen)
            for row, _topk in recs:
                row = int(row)
                seen = validation_seen.get(row, set())
                if len(seen) == 0:
                    continue
                filtered = [t for t in _topk if t not in seen][:topk]
                _gt = gt[row]

                hit_rate = len(set(filtered) & _gt) / len(_gt)
                HIT += hit_rate

                idcg = idcgs[min(len(_gt), topk) - 1]
                dcg = 0.0
                hit, miss, ap = 0.0, 0.0, 0.0
                num_pos = len(_gt)
                num_neg = num_items - num_pos
                auc = 0.0
                for i, r in enumerate(filtered):
                    if r in _gt:
                        hit += 1
                        ap += hit / (i + 1.0)
                        dcg += dcgs[i]
                    else:
                        miss += 1
                        auc += hit
                auc += ((hit + num_pos) / 2.0) * (num_neg - miss)
                auc /= (num_pos * num_neg)

                NDCG += dcg / idcg
                AP += ap / min(len(_gt), topk)
                AUC += auc
                N += 1.0
        if N == 0:
            return {"ndcg": 0.0, "map": 0.0, "accuracy": 0.0, "auc": 0.0}
        return {"ndcg": NDCG / N, "map": AP / N,
                "accuracy": HIT / N, "auc": AUC / N}

    def _evaluate_score_metrics(self):
        if not hasattr(self.data, "vali_data"):
            self.prepare_evaluation()
        vali = self.data.vali_data
        row, col, val = vali["row"], vali["col"], vali["val"]
        scores = np.asarray(self._get_scores(row, col), dtype=np.float64)
        err = scores - np.asarray(val, dtype=np.float64)
        rmse = float(np.sqrt(np.mean(err * err)))
        error = float(np.mean(np.abs(err)))
        return {"rmse": rmse, "error": error}
