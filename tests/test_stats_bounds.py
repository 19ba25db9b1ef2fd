"""Statistical-bound regression harness tests."""

import numpy as np
import pytest

from telluride_decoding_tpu.utils.stats_bounds import (
    BoundViolation,
    GoldenResults,
    check_within_bounds,
    summarize_results,
)


def test_summarize(rng):
    values = 0.5 + 0.1 * rng.randn(1000)
    s = summarize_results(values)
    assert s['mean'] == pytest.approx(0.5, abs=0.02)
    assert s['std'] == pytest.approx(0.1, abs=0.02)
    assert s['count'] == 1000


def test_bounds_pass_and_fail():
    golden = {'mean': 0.5, 'std': 0.05, 'count': 100}
    z = check_within_bounds(0.55, golden)
    assert z == pytest.approx(1.0)
    with pytest.raises(BoundViolation):
        check_within_bounds(0.25, golden)  # 5 sigma low.
    # Tighter limit trips earlier.
    with pytest.raises(BoundViolation):
        check_within_bounds(0.55, golden, num_sigmas=0.5)


def test_golden_results_roundtrip(tmp_path, rng):
    path = str(tmp_path / 'golden.json')
    g = GoldenResults(path)
    assert g.check('corr', 0.5) is None        # No golden yet.
    g.record('corr', 0.5 + 0.02 * rng.randn(50))
    g2 = GoldenResults(path)                   # Reload from disk.
    assert g2.check('corr', 0.5) == pytest.approx(0.0, abs=1.0)
    with pytest.raises(BoundViolation):
        g2.check('corr', 0.9)
    assert g2.names() == ['corr']
