"""Algo base tests: early stopping with a scripted-loss mock
(reference tests/algo/base.py:11-40 + test_base.py analog)."""
import numpy as np
import pytest

from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.utils import Option


class MockAlgo(Algo, Serializable):
    def __init__(self, losses):
        super().__init__()
        self.opt = Option({"early_stopping_rounds": 0, "save_best": False,
                           "save_period": 1, "model_path": "",
                           "num_workers": 1, "random_seed": 0})
        self.losses = losses
        import logging
        self.logger = logging.getLogger("MockAlgo")

    def normalize(self, group="item"):
        pass

    def _get_feature(self, index, group="item"):
        return None


def test_early_stopping_fires_after_rounds():
    algo = MockAlgo([1.0, 0.9, 0.95, 0.96, 0.97, 0.98])
    algo.opt.early_stopping_rounds = 2
    algo.initialize()
    stops = [algo.early_stopping(loss) for loss in algo.losses]
    assert stops == [False, False, False, True, True, True]


def test_early_stopping_disabled():
    algo = MockAlgo([1.0, 2.0, 3.0, 4.0])
    algo.initialize()
    assert not any(algo.early_stopping(loss) for loss in algo.losses)


def test_periodical():
    algo = MockAlgo([])
    assert algo.periodical(0, 5)
    assert algo.periodical(None, 5)
    assert algo.periodical(3, 2)
    assert not algo.periodical(3, 3)


def test_normalize_static():
    feat = np.array([[3.0, 4.0], [0.0, 0.0]], dtype=np.float32)
    nrm = Algo._normalize(feat)
    np.testing.assert_allclose(np.linalg.norm(nrm[0]), 1.0, rtol=1e-4)


def test_get_index_pool_types():
    algo = MockAlgo([])
    pool = algo.get_index_pool(np.array([1, 2, 3]))
    assert pool.tolist() == [1, 2, 3]
    with pytest.raises(ValueError):
        algo.get_index_pool("not-a-pool")
