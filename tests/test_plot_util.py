"""plot_util.plot_mean_std: file output, golden overlay, validation
(reference plot_util.py:32-98 and test/plot_util_test.py)."""

import numpy as np
import pytest

from telluride_decoding_tpu.utils import plot_util


class TestPlotMeanStd:

    def test_writes_png(self, tmp_path):
        png = str(tmp_path / 'sweep.png')
        plot_util.plot_mean_std(
            'test_sweep', [1e-3, 1e-2, 1e-1], [0.1, 0.3, 0.2],
            [0.01, 0.02, 0.015], png_file_name=png)
        data = open(png, 'rb').read()
        assert data[:8] == b'\x89PNG\r\n\x1a\n'
        assert len(data) > 1000

    def test_golden_overlay(self, tmp_path):
        png = str(tmp_path / 'golden.png')
        plot_util.plot_mean_std(
            'with_golden', [1e-2, 1e-1], [0.2, 0.4], [0.02, 0.04],
            golden_mean_std_dict={1e-2: (0.25, 0.03), 1e-1: (0.35, 0.02)},
            png_file_name=png)
        assert open(png, 'rb').read()[:8] == b'\x89PNG\r\n\x1a\n'

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError, match='do not match'):
            plot_util.plot_mean_std('bad', [1e-2], [0.1, 0.2], [0.01])
        with pytest.raises(ValueError, match='same length'):
            plot_util.plot_mean_std('bad', [1e-2, 1e-1], [0.1, 0.2],
                                    [0.01])

    def test_accepts_numpy_inputs(self, tmp_path):
        png = str(tmp_path / 'np.png')
        plot_util.plot_mean_std(
            'numpy', np.logspace(-3, 0, 4), np.linspace(0.1, 0.4, 4),
            np.full(4, 0.02), png_file_name=png)
        assert open(png, 'rb').read()[:8] == b'\x89PNG\r\n\x1a\n'
