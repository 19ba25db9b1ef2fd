"""Observability tests: stage timers and trace no-op path."""

import time

from telluride_decoding_tpu.utils.profiling import (StageTimer, timed_block,
                                                    trace)


def test_stage_timer_accumulates():
    timer = StageTimer('test')
    for _ in range(3):
        with timer.stage('work'):
            time.sleep(0.01)
    with timer.stage('other'):
        pass
    report = timer.report()
    assert timer.total('work') >= 0.03
    assert 'work' in report and 'other' in report and 'TOTAL' in report
    assert '3 calls' in report
    assert set(timer.as_dict()) == {'work', 'other'}


def test_stage_timer_sync_called():
    called = []
    timer = StageTimer()
    with timer.stage('s', sync=lambda: called.append(1)):
        pass
    assert called == [1]


def test_timed_block_records():
    results = {}
    with timed_block('op', results):
        time.sleep(0.005)
    assert results['op'] >= 0.005


def test_trace_noop_without_dir():
    with trace(None):
        x = 1 + 1
    assert x == 2


def test_trace_writes_files(tmp_path):
    import jax.numpy as jnp
    log_dir = str(tmp_path / 'trace')
    with trace(log_dir):
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    import os
    found = []
    for path, _, files in os.walk(log_dir):
        found.extend(files)
    assert found  # Profile artifacts written.
