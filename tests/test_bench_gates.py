"""The bench harness's window gates (no Spark, no subprocess load).

The round-5 measurement protocol (BASELINE.md) gates every timed leg on
two independent host-degradation signals: concurrent random-gather
latency inflation (memory-subsystem co-tenancy, steal reads ~0) and
hypervisor steal fraction (CPU preemption, gather reads clean —
sample 9). These tests pin the pure decision logic so a refactor of
bench.py cannot silently drop one of the signals.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import bench


def test_window_dirty_requires_both_signals_clean():
    clean = {"at8_inflation": 1.2, "at8_steal_frac": 0.01}
    assert not bench._window_dirty(clean)


def test_window_dirty_on_gather_inflation():
    m = {"at8_inflation": 1.51, "at8_steal_frac": 0.0}
    assert bench._window_dirty(m)


def test_window_dirty_on_steal_alone():
    # sample 9's mode: plain CPU preemption with a CLEAN gather reading
    m = {"at8_inflation": 1.0, "at8_steal_frac": 0.11}
    assert bench._window_dirty(m)


def test_window_dirty_boundaries_inclusive_clean():
    m = {"at8_inflation": 1.5, "at8_steal_frac": 0.10}
    assert not bench._window_dirty(m)


def test_proc_stat_parses_live():
    busy, steal = bench._proc_stat()
    assert busy > 0.0
    assert steal >= 0.0
