"""Decoder tests: the invertible toy pipeline + param round trips.

Mirrors the reference's invertible fake-data integration test
(test/infer_decoder_test.py:46-156: intensity = eeg/2 + 0.5, mid-file
attention switch drives decode/window/LDA/accuracy) and its d' and
parameter-serialization unit tests (:510-518, :655-704).
"""

import json

import numpy as np
import pytest

from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.decode import (
    CCADecoder,
    Decoder,
    LinearRegressionDecoder,
    NumpyStore,
    TwoResultStore,
    WindowedDataStore,
    average_data,
    calculate_dprime,
    create_decoder,
)
from telluride_decoding_tpu.models import (BrainModelCCA,
                                           BrainModelLinearRegression)


def invertible_model(inputs):
    """The toy decoder: predicted intensity is eeg/2 + 0.5."""
    return np.asarray(inputs['input_1'])[:, :1] / 2.0 + 0.5


def _toy_datasets(rng, n=2000, batch=200):
    """Attended data: output = model(eeg); unattended: independent."""
    eeg = rng.randn(n, 4).astype(np.float32)
    attended = eeg[:, :1] / 2.0 + 0.5
    unattended = rng.randn(n, 1).astype(np.float32) / 2.0 + 0.5

    def dataset(out):
        bd = brain_data.TestBrainData('input', 'output', 100.0,
                                      final_batch_size=batch,
                                      shuffle_buffer_size=0)
        bd.preserve_test_data(eeg, out)
        return bd.create_dataset('program_test')
    return dataset(attended), dataset(unattended)


class TestResultStores:

    def test_numpy_store_grows(self):
        store = NumpyStore(init_frame_count=4)
        for i in range(10):
            store.add_data(np.full((3, 2), i, np.float32))
        assert store.count == 30
        assert store.all_data.shape == (30, 2)
        np.testing.assert_array_equal(store.all_data[27:], 9)

    def test_numpy_store_next_window(self):
        store = NumpyStore()
        store.add_data(np.arange(10)[:, None])
        (w,) = list(store.next_window(4))
        np.testing.assert_array_equal(w[:, 0], [0, 1, 2, 3])
        assert store.count == 6

    def test_windowed_store_step(self):
        store = WindowedDataStore(window_step=2, window_width=4)
        store.add_data(np.arange(8)[:, None])
        wins = list(store.next_window())
        assert len(wins) == 3
        np.testing.assert_array_equal(wins[0][:, 0], [0, 1, 2, 3])
        np.testing.assert_array_equal(wins[1][:, 0], [2, 3, 4, 5])

    def test_windowed_store_pre_context(self):
        store = WindowedDataStore(window_step=2, window_width=4,
                                  pre_context=2)
        store.add_data(np.arange(4)[:, None] + 1)
        wins = list(store.next_window())
        np.testing.assert_array_equal(wins[0][:, 0], [0, 0, 1, 2])

    def test_two_result_store_pairs(self):
        store = TwoResultStore(window_width=4, window_step=2)
        store.add_data(np.arange(8)[:, None], np.arange(8)[:, None] + 100)
        pairs = list(store.next_window())
        assert len(pairs) == 3
        np.testing.assert_array_equal(pairs[0][1][:, 0] - pairs[0][0][:, 0],
                                      100)

    def test_two_result_store_rejects_mismatch(self):
        store = TwoResultStore()
        with pytest.raises(ValueError):
            store.add_data(np.zeros((3, 1)), np.zeros((4, 1)))


class TestMetrics:

    def test_dprime_known_value(self, rng):
        d1 = rng.randn(100000)
        d2 = rng.randn(100000) + 2.0
        assert abs(calculate_dprime(d1, d2) - 2.0) < 0.05

    def test_average_data(self):
        data = np.arange(10, dtype=np.float32)[:, None]
        out = average_data(data, 3)
        np.testing.assert_allclose(out[:, 0], [1.0, 4.0, 7.0])

    def test_average_data_passthrough(self):
        data = np.arange(4, dtype=np.float32)[:, None]
        np.testing.assert_array_equal(average_data(data, 0), data)


class TestDecoderBasics:

    def test_reduction_validation(self):
        with pytest.raises(ValueError):
            Decoder(reduction='bogus')
        with pytest.raises(TypeError):
            Decoder(decoding_model='not callable')

    def test_create_decoder_sniffing(self):
        assert isinstance(create_decoder('linear'), LinearRegressionDecoder)
        assert isinstance(create_decoder('/path/to/fullyconnected_model'),
                          LinearRegressionDecoder)
        assert isinstance(create_decoder('my_cca_model'), CCADecoder)
        with pytest.raises(ValueError):
            create_decoder('mystery')

    def test_correlator_statistics(self, rng):
        dec = LinearRegressionDecoder(invertible_model, reduction='first')
        x = rng.randn(500, 1)
        y = 0.9 * x + 0.1 * rng.randn(500, 1)
        dec.add_data_correlator(x, y)
        corr = dec.compute_correlation(x, y)
        # Summed normalized cross-product over N = the Pearson r.
        r = np.sum(corr) / 500
        want = np.corrcoef(x[:, 0], y[:, 0])[0, 1]
        np.testing.assert_allclose(r, want, atol=1e-2)


class TestInvertibleToyPipeline:

    def test_train_separates_classes(self, rng):
        attended, unattended = _toy_datasets(rng)
        dec = LinearRegressionDecoder(invertible_model, reduction='lda')
        dprime = dec.train(unattended, attended, window_size=100)
        assert dprime > 2.0

    def test_infer_one_attended_higher(self, rng):
        attended, unattended = _toy_datasets(rng)
        dec = LinearRegressionDecoder(invertible_model, reduction='lda')
        dec.train(unattended, attended, window_size=100)
        scores_att, scores_un = [], []
        for inputs, y in attended:
            scores_att.append(np.mean(dec.infer_one(inputs, y)))
        for inputs, y in unattended:
            scores_un.append(np.mean(dec.infer_one(inputs, y)))
        assert np.mean(scores_att) > np.mean(scores_un) + 0.5

    @pytest.mark.parametrize('reduction',
                             ['first', 'mean', 'mean-squared', 'lda'])
    def test_reductions_shape(self, rng, reduction):
        attended, unattended = _toy_datasets(rng, n=600, batch=200)
        dec = LinearRegressionDecoder(invertible_model, reduction=reduction)
        dec.train(unattended, attended, window_size=50)
        for inputs, y in attended:
            out = dec.infer_one(inputs, y)
            assert out.shape[0] == 200
            break

    def test_test_by_window_accuracy(self, rng):
        # Mid-file attention switch: decoder windows should track labels
        # (reference test/infer_test.py window-accuracy pattern).
        n = 2000
        eeg = rng.randn(n, 4).astype(np.float32)
        matched = eeg[:, :1] / 2.0 + 0.5
        random_out = rng.randn(n, 1).astype(np.float32) / 2.0 + 0.5
        labels = np.zeros((n, 1), np.float32)
        labels[n // 2:] = 1.0
        # Speaker stream: matched while label==1, random while 0.
        output = np.where(labels > 0, matched, random_out)

        bd = brain_data.TestBrainData('input', 'output', 100.0,
                                      final_batch_size=200,
                                      shuffle_buffer_size=0)
        bd.preserve_test_data(eeg, output, attention_data=labels)
        dataset = bd.create_dataset('program_test')

        attended, unattended = _toy_datasets(rng)
        dec = LinearRegressionDecoder(invertible_model, reduction='lda')
        dec.train(unattended, attended, window_size=100)

        correct = total = 0
        for scores, labs in dec.test_by_window(dataset, 100):
            decision = np.mean(scores) > 0.5
            truth = np.mean(labs) > 0.5
            correct += decision == truth
            total += 1
        assert total > 10
        assert correct / total > 0.9

    def test_infer_pair_callable_fallback_matches(self, rng):
        """infer_pair on a plain-python model (no jax apply/params)
        equals two infer_one calls."""
        attended, unattended = _toy_datasets(rng, n=600, batch=200)
        dec = LinearRegressionDecoder(invertible_model, reduction='lda')
        dec.train(unattended, attended, window_size=50)
        for inputs, y in attended:
            x1, in2 = inputs['input_1'], inputs['input_2']
            y_b = np.flip(np.asarray(y), axis=0).copy()
            want_a = dec.infer_one({'input_1': x1, 'input_2': in2}, y)
            want_b = dec.infer_one({'input_1': x1, 'input_2': in2}, y_b)
            got_a, got_b = dec.infer_pair(x1, in2, in2, y, y_b)
            np.testing.assert_allclose(got_a, want_a, atol=1e-6)
            np.testing.assert_allclose(got_b, want_b, atol=1e-6)
            break

    def test_save_restore_parameters(self, rng, tmp_path):
        attended, unattended = _toy_datasets(rng, n=800)
        dec = LinearRegressionDecoder(invertible_model, reduction='lda')
        dec.train(unattended, attended, window_size=50)
        path = str(tmp_path / 'decoder_model.json')
        dec.save_parameters(path)
        # JSON structure matches the reference schema.
        with open(path) as f:
            blob = json.load(f)
        assert set(blob.keys()) == {'correlation_params', 'lda_params'}
        assert len(blob['correlation_params']) == 8
        assert len(blob['lda_params']) == 6

        dec2 = LinearRegressionDecoder(invertible_model, reduction='lda')
        dec2.restore_parameters(path)
        for inputs, y in attended:
            np.testing.assert_allclose(dec2.infer_one(inputs, y),
                                       dec.infer_one(inputs, y), atol=1e-5)
            break


class TestCcaDecoder:

    def test_cca_decoder_pipeline(self, rng):
        # Two views with shared structure; CCA model decodes them.
        n = 3000
        latent = rng.randn(n, 2).astype(np.float32)
        eeg = np.concatenate([latent + 0.2 * rng.randn(n, 2),
                              rng.randn(n, 4)], axis=1).astype(np.float32)
        audio = np.concatenate([latent + 0.2 * rng.randn(n, 2),
                                rng.randn(n, 1)], axis=1).astype(np.float32)
        bd = brain_data.TestBrainData('input', 'ones', 100.0,
                                      final_batch_size=500,
                                      shuffle_buffer_size=0)
        bd.preserve_test_data(eeg, np.ones((n, 1), np.float32),
                              input2_data=audio)
        ds = bd.create_dataset('train')
        model = BrainModelCCA(ds, cca_dims=2, regularization_lambda=1e-3)
        model.fit(ds)

        dec = CCADecoder(model, reduction='lda')
        attended = bd.create_dataset('program_test')
        mixed = bd.create_dataset('test', mixup_batch=True)
        dprime = dec.train(mixed, attended, window_size=100)
        assert dprime > 1.0

        # The fused two-speaker dispatch (the serving path) is
        # value-identical to two single-speaker infer_one calls.
        x1, in2a = eeg[:500], audio[:500]
        in2b = np.flip(audio[:500], axis=0).copy()
        y = np.ones((500, 1), np.float32)
        want_a = dec.infer_one({'input_1': x1, 'input_2': in2a}, y)
        want_b = dec.infer_one({'input_1': x1, 'input_2': in2b}, y)
        got_a, got_b = dec.infer_pair(x1, in2a, in2b, y, y)
        np.testing.assert_allclose(got_a, want_a, atol=1e-5)
        np.testing.assert_allclose(got_b, want_b, atol=1e-5)

        # reduction='all' yields [N, D] correlation vectors; the
        # batched window evaluator must match the iterator path's
        # per-window np.mean. (Regression: flattening interleaved the
        # dims into the frame axis.)
        dec_all = CCADecoder(model, reduction='all')
        dec_all.model_params = dec.model_params
        ds = bd.create_dataset('program_test')
        means, _ = dec_all.test_by_window_means(ds, 100)
        want = [float(np.mean(w)) for w, _ in
                dec_all.test_by_window(bd.create_dataset('program_test'),
                                       100)]
        np.testing.assert_allclose(means[:len(want)], want, atol=1e-4)

    def test_model_params_setter_invalidates_compiled_fns(self, rng):
        """Assigning model_params must recompile the jitted pipeline.
        (Regression: infer_one kept serving with the OLD correlation
        statistics closed over at first compile.)"""
        attended, unattended = _toy_datasets(rng, n=600, batch=200)
        dec = LinearRegressionDecoder(invertible_model,
                                      reduction='mean')
        dec.train(unattended, attended, window_size=50)
        inputs, y = next(iter(attended))
        before = dec.infer_one(inputs, y)
        params = dec.model_params
        scaled = params._replace(
            correlation_params=params.correlation_params._replace(
                power=np.asarray(params.correlation_params.power) * 2.0))
        dec.model_params = scaled
        after = dec.infer_one(inputs, y)
        np.testing.assert_allclose(after, np.asarray(before) / 2.0,
                                   atol=1e-5)


class TestModelIntegration:

    def test_decoder_with_saved_model(self, rng, tmp_path):
        # End-to-end: fit linear model, save, load into decoder, infer.
        n = 1500
        eeg = rng.randn(n, 6).astype(np.float32)
        w = rng.randn(6, 1).astype(np.float32)
        intensity = eeg @ w
        bd = brain_data.TestBrainData('input', 'output', 100.0,
                                      final_batch_size=300,
                                      shuffle_buffer_size=0)
        bd.preserve_test_data(eeg, intensity)
        ds = bd.create_dataset('train')
        model = BrainModelLinearRegression(ds, regularization_lambda=0.0)
        model.fit(ds)
        model.add_metadata({'note': 'test'}, dataset=ds)
        model.save(str(tmp_path / 'linear_model'))

        dec = create_decoder('linear_model', reduction='first')
        dec.load_decoding_model(str(tmp_path / 'linear_model'))
        assert dec.model_inputs['input_1'][1] == 6
        attended = bd.create_dataset('program_test')
        mixed = bd.create_dataset('test', mixup_batch=True)
        dprime = dec.train(mixed, attended, window_size=100)
        assert dprime > 2.0
