"""PhaseTimer + device_trace smoke."""
import time

from buffalo_tpu.utils.profiling import PhaseTimer


def test_phase_timer_accumulates():
    t = PhaseTimer("test")
    with t("feed"):
        time.sleep(0.01)
    with t("feed"):
        time.sleep(0.01)
    with t("update"):
        pass
    out = t.log()
    assert out["feed"] >= 0.02
    assert "update" in out
    assert t.acc == {}  # reset after log
