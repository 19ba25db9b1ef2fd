"""Batched window evaluation must equal the streaming generator."""

import numpy as np

from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.decode import LinearRegressionDecoder


def invertible_model(inputs):
    return np.asarray(inputs['input_1'])[:, :1] / 2.0 + 0.5


def _dataset(seed=7, n=1700, batch=200):
    rng = np.random.RandomState(seed)
    eeg = rng.randn(n, 4).astype(np.float32)
    out = eeg[:, :1] / 2.0 + 0.5
    labels = (np.arange(n) % 37 < 18).astype(np.float32)[:, None]
    bd = brain_data.TestBrainData('input', 'output', 100.0,
                                  final_batch_size=batch,
                                  shuffle_buffer_size=0)
    bd.preserve_test_data(eeg, out, attention_data=labels)
    return bd.create_dataset('program_test')


def test_batched_matches_generator(rng):
    dec = LinearRegressionDecoder(invertible_model, reduction='first')
    dec.add_data_correlator(rng.randn(500, 1), rng.randn(500, 1))
    dataset = _dataset()
    window = 100

    gen_scores, gen_labels = [], []
    for scores, labels in dec.test_by_window(_dataset(), window):
        gen_scores.append(float(np.mean(scores)))
        gen_labels.append(float(np.mean(labels)))

    batch_scores, batch_labels = dec.test_by_window_means(dataset, window)
    # The generator only yields windows fully contained in the frames
    # delivered so far; both must produce the same count and values.
    assert len(batch_scores) == len(gen_scores)
    np.testing.assert_allclose(batch_scores, gen_scores, atol=1e-5)
    np.testing.assert_allclose(batch_labels, gen_labels, atol=1e-5)


def test_short_dataset_yields_nothing(rng):
    dec = LinearRegressionDecoder(invertible_model, reduction='first')
    dec.add_data_correlator(rng.randn(50, 1), rng.randn(50, 1))
    eeg = rng.randn(40, 4).astype(np.float32)
    bd = brain_data.TestBrainData('input', 'output', 100.0,
                                  final_batch_size=40,
                                  shuffle_buffer_size=0)
    bd.preserve_test_data(eeg, eeg[:, :1] / 2 + 0.5)
    scores, labels = dec.test_by_window_means(
        bd.create_dataset('program_test'), 100)
    assert scores.shape == (0,)
