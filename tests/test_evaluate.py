"""Vectorized evaluation parity: the batched numpy metric pass in
``evaluate/base.py`` must agree, user for user, with a straightforward
per-user oracle implementing the reference formulas
(reference ``buffalo/evaluate/base.py:44-148``)."""
import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarketOptions, load
from buffalo_tpu.models import ALS, ALSOption


@pytest.fixture(scope="module")
def trained(ml100k_like, tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_data")
    dopt = MatrixMarketOptions().get_default_option()
    dopt.input.main = ml100k_like["path"]
    dopt.input.uid = ml100k_like["uid"]
    dopt.input.iid = ml100k_like["iid"]
    dopt.data.path = str(root / "ml.bfo")
    dopt.data.tmp_dir = str(root / "tmp")
    dopt.data.validation = {"name": "sample", "p": 0.1, "max_samples": 500}
    data = load(dopt)
    data.create()
    opt = ALSOption().get_default_option()
    opt.d = 16
    opt.num_iters = 5
    opt.validation = {"topk": 10}
    als = ALS(opt, data=data)
    als.initialize()
    als.train()
    return als


def _oracle_ranking(algo):
    """Per-user loop implementing the reference metric definitions."""
    data = algo.data
    vali = data.vali_data
    topk = algo.opt.validation.topk
    num_items = data.get_header()["num_items"]
    max_seen = vali["validation_max_seen_size"]
    dcg_w = 1.0 / np.log2(np.arange(2, topk + 2))
    idcg_tab = np.cumsum(dcg_w)

    sums = {"ndcg": 0.0, "map": 0.0, "accuracy": 0.0, "auc": 0.0}
    n = 0
    for row, recs in algo._get_topk_recommendation(
            vali["vali_rows"], topk=topk + max_seen):
        row = int(row)
        seen = vali["validation_seen"].get(row, set())
        if not seen:
            continue
        gt = vali["vali_gt"][row]
        kept = [r for r in np.asarray(recs).tolist() if r not in seen][:topk]

        hits_at = [i for i, r in enumerate(kept) if r in gt]
        n_hit = len(hits_at)
        sums["accuracy"] += n_hit / len(gt)
        sums["ndcg"] += (sum(dcg_w[i] for i in hits_at)
                         / idcg_tab[min(len(gt), topk) - 1])
        sums["map"] += (sum((k + 1) / (i + 1)
                            for k, i in enumerate(hits_at))
                        / min(len(gt), topk))
        # reference AUC closed form
        num_pos, num_neg = len(gt), num_items - len(gt)
        auc = hit = miss = 0.0
        for r in kept:
            if r in gt:
                hit += 1
            else:
                miss += 1
                auc += hit
        auc += (hit + num_pos) / 2.0 * (num_neg - miss)
        sums["auc"] += auc / (num_pos * num_neg)
        n += 1
    return {k: v / n for k, v in sums.items()}


def test_vectorized_matches_oracle(trained):
    got = trained._evaluate_ranking_metrics()
    want = _oracle_ranking(trained)
    for key, val in want.items():
        assert got[key] == pytest.approx(val, rel=1e-9), key


def test_score_metrics_formula(trained):
    got = trained._evaluate_score_metrics()
    vali = trained.data.vali_data
    pred = np.asarray(trained._get_scores(vali["row"], vali["col"]),
                      dtype=np.float64)
    err = pred - vali["val"].astype(np.float64)
    assert got["rmse"] == pytest.approx(float(np.sqrt((err ** 2).mean())))
    assert got["error"] == pytest.approx(float(np.abs(err).mean()))


def test_eval_samples_subsampling(trained):
    trained.opt.validation.eval_samples = 20
    np.random.seed(0)
    res = trained._evaluate_ranking_metrics()
    trained.opt.validation.eval_samples = None
    assert 0.0 <= res["ndcg"] <= 1.0 and 0.0 <= res["auc"] <= 1.0


def test_weighted_feature_normalized(trained):
    feat = trained.get_weighted_feature({"i0": 1.0, "i1": 2.0})
    # the epsilon lands in the denominator: result is unit-norm
    assert np.linalg.norm(feat) == pytest.approx(1.0, rel=1e-5)
    feat2 = trained.get_weighted_feature([("i0", 1.0), ("nope", 2.0)])
    assert feat2 is not None and np.linalg.norm(feat2) == \
        pytest.approx(1.0, rel=1e-5)
