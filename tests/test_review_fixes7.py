"""Pins the round-5 post-review fixes (pass 3).

Covers: --override key validation in tools/reproduce_codelab (mistyped
keys previously setattr'd silently through DecodingOptions.
set_from_dict), duplicate --platforms rejection in tdt-export-aot, the
shared late-binding stdout proxy in BOTH regression drivers, and the
driver forwarding --batch_size to DCCA (reference decoding.py:53,95
batches every family's dataset at the flag, default 512).
"""
import io
import sys

import pytest


class TestOverrideValidation:

    def test_unknown_key_rejected(self):
        from tools import reproduce_codelab
        with pytest.raises(SystemExit,
                           match='unknown DecodingOptions field'):
            reproduce_codelab.parse_overrides(
                ['regularisation_lambda=100'])

    def test_unknown_key_suggests_closest(self):
        from tools import reproduce_codelab
        with pytest.raises(SystemExit,
                           match='regularization_lambda'):
            reproduce_codelab.parse_overrides(
                ['regularisation_lambda=100'])

    def test_known_keys_parse_as_literals(self):
        from tools import reproduce_codelab
        got = reproduce_codelab.parse_overrides(
            ['batch_size=64', 'dnn_regressor=cca'])
        assert got == {'batch_size': 64, 'dnn_regressor': 'cca'}

    def test_missing_equals_rejected(self):
        from tools import reproduce_codelab
        with pytest.raises(SystemExit, match='KEY=VALUE'):
            reproduce_codelab.parse_overrides(['batch_size'])

    def test_validation_runs_before_download(self, tmp_path):
        # A typo must fail BEFORE ensure_corpus touches the (possibly
        # 3.1 GB) download: point --internet at a path that would
        # explode if opened.
        from tools import reproduce_codelab
        with pytest.raises(SystemExit,
                           match='unknown DecodingOptions field'):
            reproduce_codelab.main([
                '--data_dir', str(tmp_path / 'never_created'),
                '--internet', 'file:///nonexistent/DATA.zip',
                '--override', 'batchsize=64'])
        assert not (tmp_path / 'never_created').exists()


class TestPlatformsDuplicates:

    def test_duplicate_platform_rejected(self):
        # 'tpu,tpu' passed the unknown-name check but still reached
        # jax.export, dying with the opaque error the validation was
        # added to prevent.
        from telluride_decoding_tpu.cli import export_aot
        with pytest.raises(SystemExit, match='--platforms'):
            export_aot.app_main(['model', 'artifact',
                                 '--platforms', 'tpu,tpu'])

    def test_distinct_platforms_pass_validation(self):
        # 'tpu,cpu' must get past flag validation (it then fails on
        # the missing model path, not on --platforms).
        from telluride_decoding_tpu.cli import export_aot
        with pytest.raises(Exception) as exc:
            export_aot.app_main(['/nonexistent/model', 'artifact',
                                 '--platforms', 'tpu,cpu'])
        assert '--platforms' not in str(exc.value)


class TestLateBoundStdout:

    def test_regression_print_follows_stream_swap(self):
        # regression_print was bound to sys.stdout at import; a harness
        # that swaps the stream between embedded calls (pytest capsys,
        # notebook kernels) then wrote to a stale/closed stream.
        from telluride_decoding_tpu.cli import regression
        old = sys.stdout
        buf = io.StringIO()
        try:
            sys.stdout = buf
            print('late-bound', file=regression.regression_print)
        finally:
            sys.stdout = old
        assert buf.getvalue() == 'late-bound\n'

    def test_both_drivers_share_the_proxy_class(self):
        from telluride_decoding_tpu.cli import regression
        from telluride_decoding_tpu.cli import regression_data
        from telluride_decoding_tpu.utils.stdio import LateBoundStdout
        assert isinstance(regression.regression_print, LateBoundStdout)
        assert isinstance(regression_data.regression_data_print,
                          LateBoundStdout)

    def test_survives_closed_stream(self):
        # Writing after a PREVIOUS stream was closed must hit the
        # current stream, not raise 'I/O operation on closed file'.
        from telluride_decoding_tpu.cli import regression
        old = sys.stdout
        first = io.StringIO()
        second = io.StringIO()
        try:
            sys.stdout = first
            print('one', file=regression.regression_print)
            first.close()
            sys.stdout = second
            print('two', file=regression.regression_print)
        finally:
            sys.stdout = old
        assert second.getvalue() == 'two\n'


class TestDccaBatchSizeForwarding:

    def test_dcca_fit_receives_flag_batch_size(self, monkeypatch,
                                                tmp_path):
        # The driver forwards --batch_size to every SGD family; for
        # DCCA this deliberately overrides its API default (1024) to
        # match the reference, which batches the training dataset at
        # the flag for all families (reference decoding.py:53,95).
        import numpy as np
        from telluride_decoding_tpu.cli import decoding
        from telluride_decoding_tpu.data import records

        rng = np.random.RandomState(0)
        data_dir = tmp_path / 'records'
        data_dir.mkdir()
        for trial in ('trial01', 'trial02'):
            feats = {
                'eeg': rng.randn(240, 4).astype(np.float32),
                'intensity': rng.randn(240, 1).astype(np.float32),
            }
            records.convert_data_to_tfrecords(
                feats, str(data_dir / ('%s.tfrecords' % trial)))
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            data='tfrecords',
            tfexample_dir=str(data_dir),
            input_field='eeg',
            output_field='intensity',
            attended_field='',
            frame_rate=100.0,
            pre_context=0,
            post_context=1,
            dnn_regressor='dcca',
            hidden_units='4-4',
            epoch_count=1,
            batch_size=96,
            shuffle_buffer_size=0,
            train_file_pattern='trial01',
            validate_file_pattern='trial02',
            test_file_pattern='trial02',
            summary_dir=str(tmp_path / 'summary'),
            saved_model_dir=None,
            tensorboard_dir=None,
            correlation_frames=50,
        ))
        data = decoding.brain_data.create_brain_dataset(
            my_flags.data, my_flags.input_field, my_flags.output_field,
            frame_rate=my_flags.frame_rate,
            pre_context=my_flags.pre_context,
            post_context=my_flags.post_context,
            final_batch_size=my_flags.batch_size,
            shuffle_buffer_size=0,
            data_dir=my_flags.tfexample_dir,
            train_file_pattern='trial01',
            validate_file_pattern='trial02',
            test_file_pattern='trial02')
        model = decoding.create_brain_model(
            my_flags, data.create_dataset('train'))
        seen = {}
        orig_fit = model.fit

        def spy(dataset, **kwargs):
            seen.update(kwargs)
            return orig_fit(dataset, **kwargs)

        monkeypatch.setattr(model, 'fit', spy)
        decoding.train_and_test(my_flags, data, model, epochs=1)
        assert seen.get('batch_size') == 96
