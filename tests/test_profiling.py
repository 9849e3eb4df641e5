"""Throughput meter / step timer instrumentation (utils/profiling.py)."""
import time

from caster_dta_tpu.utils.profiling import StepTimer, ThroughputMeter, annotate


def test_throughput_meter_counts():
    m = ThroughputMeter(window=4)
    assert m.edges_per_s == 0.0
    for _ in range(6):
        m.step(1000, 8)
        time.sleep(0.002)
    s = m.summary()
    assert s["steps"] == 6
    assert s["total_edges"] == 6000 and s["total_pairs"] == 48
    assert m.edges_per_s > 0 and m.pairs_per_s > 0
    # windowed rate reflects recent steps only (window+1 timestamps kept)
    assert len(m._t) <= 5


def test_step_timer_sections():
    t = StepTimer()
    with t.section("load"):
        time.sleep(0.003)
    with t.section("load"):
        time.sleep(0.003)
    with t.section("step"):
        time.sleep(0.001)
    rep = t.report()
    assert rep["load"]["calls"] == 2
    assert rep["load"]["total_s"] >= 0.006
    assert rep["step"]["calls"] == 1


def test_annotate_runs():
    with annotate("region"):
        x = sum(range(100))
    assert x == 4950
