"""Signal-layer tests: jax sosfilt vs scipy, Preprocessor semantics.

The IIR tests pin the associative-scan filter against
scipy.signal.sosfilt bit-for-bit (to float32 tolerance), including
streaming chunk boundaries — the reference's filtering is scipy
(preprocess.py:293-352), so this is direct numerical parity.
"""

import numpy as np
import pytest
import scipy.signal

from telluride_decoding_tpu.signal import (
    AudioFeatures,
    AudioIntensityStore,
    AudioLoudnessMick,
    Preprocessor,
    butter_sos,
    sosfilt,
    streaming_state_init,
)
from telluride_decoding_tpu.ops.lagstack import lag_stack_np


class TestSosfilt:

    @pytest.mark.parametrize('order,cutoff,btype', [
        (4, 2.0, 'hp'), (2, 0.5, 'hp'), (4, 30.0, 'lp'), (10, 37.5, 'lp')])
    def test_matches_scipy(self, rng, order, cutoff, btype):
        x = rng.randn(2000, 4).astype(np.float32)
        sos = butter_sos(order, cutoff, btype, fs=100.0)
        zi = np.zeros((sos.shape[0], 2, 4))
        want, want_state = scipy.signal.sosfilt(sos, x, axis=0, zi=zi)
        # float32 on device vs scipy float64: near-DC poles (0.5 Hz @
        # 100 Hz) accumulate ~2e-4 drift over 2000 frames.
        np.testing.assert_allclose(np.asarray(sosfilt(sos, x)[0]), want,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(sosfilt(sos, x)[1]),
                                   want_state, atol=1e-3)

    def test_streaming_chunks_equal_one_pass(self, rng):
        x = rng.randn(1500, 3).astype(np.float32)
        sos = butter_sos(4, 5.0, 'hp', fs=100.0)
        zi = streaming_state_init(sos, x[0])
        want, _ = scipy.signal.sosfilt(sos, x, axis=0, zi=zi)
        parts = []
        state = zi
        for chunk in np.array_split(x, 5):
            out, state = sosfilt(sos, chunk, np.asarray(state))
            parts.append(np.asarray(out))
        np.testing.assert_allclose(np.concatenate(parts), want, atol=1e-4)

    def test_1d_input(self, rng):
        x = rng.randn(500).astype(np.float32)
        sos = butter_sos(2, 10.0, 'lp', fs=100.0)
        got, _ = sosfilt(sos, x)
        want, _ = scipy.signal.sosfilt(sos, x[:, None], axis=0,
                                       zi=np.zeros((sos.shape[0], 2, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestPreprocessor:

    def test_highpass_removes_dc(self, rng):
        p = Preprocessor('eeg', fs_in=100, fs_out=100, highpass_cutoff=1.0,
                         highpass_order=2)
        x = (rng.randn(3000, 2) + 100.0).astype(np.float32)
        out = p.process(x)
        assert abs(np.mean(out[500:])) < 1.0  # DC (100) removed.

    def test_anti_alias_auto_lowpass(self):
        p = Preprocessor('eeg', fs_in=1000, fs_out=100)
        assert p.lowpass_cutoff == pytest.approx(0.75 * 50)
        assert p.lowpass_order == 10

    def test_resample_downsamples(self, rng):
        p = Preprocessor('eeg', fs_in=200, fs_out=100, data_mean=0,
                         data_std=1)
        x = rng.randn(1000, 2).astype(np.float32)
        out = p.process(x)
        assert out.shape[0] == 500

    def test_resample_matches_reference_indexing(self):
        # Nearest-neighbor semantics: idx = round(i/fs_out*fs_in).
        p = Preprocessor('x', fs_in=250, fs_out=100)
        p._lowpass_sos = None  # Isolate the resampler.
        data = np.arange(250, dtype=np.float32)[:, None]
        out = p.resample(data)
        assert out.shape[0] == 100
        # Exact reference formula (preprocess.py:393-398): note
        # arange * (1/fs_out) * fs_in, whose float rounding differs
        # from arange * 2.5 at a few indices.
        want = np.minimum(249, np.round(np.arange(100) * (1.0 / 100) * 250))
        np.testing.assert_array_equal(out[:, 0], want)

    def test_rereference_groups(self, rng):
        p = Preprocessor('eeg', fs_in=100, fs_out=100,
                         ref_channels=[[0], [3]],
                         channels_to_ref=[[1], [2]])
        x = rng.randn(100, 4).astype(np.float32)
        out = p.process(np.copy(x))
        np.testing.assert_allclose(out[:, 1], x[:, 1] - x[:, 0], atol=1e-6)
        np.testing.assert_allclose(out[:, 2], x[:, 2] - x[:, 3], atol=1e-6)
        np.testing.assert_allclose(out[:, 0], x[:, 0], atol=1e-6)

    def test_channel_parsing(self):
        p = Preprocessor('eeg', fs_in=100, fs_out=100,
                         channel_numbers='1-3,7')
        assert p.channel_numbers == [1, 2, 3, 7]
        p2 = Preprocessor('eeg', fs_in=100, fs_out=100, channel_numbers=5)
        assert p2.channel_numbers == [5]

    def test_normalization(self, rng):
        p = Preprocessor('eeg', fs_in=100, fs_out=100, data_mean=None,
                         data_std=None)
        x = (5 + 3 * rng.randn(2000, 2)).astype(np.float32)
        out = p.process(x)
        assert abs(np.mean(out)) < 0.01
        assert abs(np.std(out) - 1.0) < 0.01

    def test_streaming_context_matches_offline(self, rng):
        pre, post = 3, 2
        p = Preprocessor('eeg', fs_in=100, fs_out=100, pre_context=pre,
                         post_context=post)
        x = rng.randn(200, 2).astype(np.float32)
        chunks = [p.add_context(c) for c in np.array_split(x, 4)]
        streamed = np.concatenate(chunks)
        # Offline equivalent: zero pre-padding, valid windows only.
        padded = np.concatenate([np.zeros((pre, 2), np.float32), x])
        offline = lag_stack_np(padded, pre, post)[pre:padded.shape[0] - post]
        np.testing.assert_allclose(streamed, offline, atol=1e-6)
        assert streamed.shape == (200 - post, 2 * (pre + 1 + post))

    def test_param_string_init(self):
        p = Preprocessor('eeg(highpass_cutoff=2;highpass_order=3;'
                         'channel_numbers=0-1)', fs_in=100, fs_out=100)
        assert p.name == 'eeg'
        assert p.highpass_cutoff == 2
        assert p.channel_numbers == [0, 1]

    def test_rejects_bad_params(self):
        with pytest.raises(ValueError):
            Preprocessor('x', fs_in=-1, fs_out=100)
        with pytest.raises(ValueError):
            Preprocessor('x', fs_in=100, fs_out=100, pre_context=-1)
        with pytest.raises(ValueError):
            Preprocessor('x', fs_in=100, fs_out=100, data_std=0)


class TestAudioFeatures:

    def test_resample_matches_naive_loop(self, rng):
        # The vectorized cumsum resampler must equal the reference's
        # per-frame averaging loop (preprocess.py:676-682).
        fs_in, fs_out, window = 1000.0, 100.0, 2.0
        data = rng.randn(2000, 1).astype(np.float32)
        af = AudioFeatures('audio', fs_in, fs_out, window=window)
        got = af.audio_resample(np.copy(data))

        half = 0.5 * window / fs_out
        frames_out = int(round(data.shape[0] / fs_in * fs_out))
        want = np.zeros((frames_out, 1))
        for i in range(frames_out):
            t = float(i) / fs_out
            t1 = int(max(0, round(fs_in * (t - half))))
            t2 = int(min(data.shape[0], round(fs_in * (t + half))))
            want[i] = np.mean(data[t1:t2, 0])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_intensity_of_sine(self):
        # RMS of a unit sine is 1/sqrt(2).
        fs = 1000.0
        t = np.arange(10000) / fs
        wave = np.sin(2 * np.pi * 50 * t).astype(np.float32)
        af = AudioFeatures('audio', fs, 100.0, window=5)
        intensity = af.compute_intensity(wave[:, None])
        np.testing.assert_allclose(np.median(intensity), 1 / np.sqrt(2),
                                   atol=0.02)

    def test_intensity_compression_exponent(self):
        fs = 1000.0
        wave = np.ones(5000, np.float32) * 4.0
        af = AudioFeatures('audio', fs, 100.0, window=1,
                           exponent=np.log10(2))
        intensity = af.compute_intensity(wave[:, None])
        np.testing.assert_allclose(np.median(intensity),
                                   4.0 ** np.log10(2), atol=1e-3)

    def test_spectrogram_shape(self, rng):
        wave = rng.randn(8000).astype(np.float32)
        af = AudioFeatures('audio', 16000.0, 100.0)
        spec, freqs = af.compute_spectrogram(wave)
        assert spec.shape[0] == len(freqs)
        assert np.max(spec) == pytest.approx(255.0)

    def test_buffer_streaming(self, rng):
        # Chunked resampling with carried buffer ~ one-shot (interior).
        fs_in, fs_out = 1000.0, 100.0
        data = rng.randn(3000, 1).astype(np.float32)
        af1 = AudioFeatures('a', fs_in, fs_out, window=2)
        whole = af1.audio_resample(np.copy(data))
        af2 = AudioFeatures('a', fs_in, fs_out, window=2)
        parts = [af2.audio_resample(np.copy(c))
                 for c in np.array_split(data, 3)]
        streamed = np.concatenate(parts)
        assert abs(streamed.shape[0] - whole.shape[0]) <= 1


class TestAudioStores:

    def test_intensity_store(self):
        store = AudioIntensityStore(window_step=4, window_width=4)
        store.add_data(2 * np.ones((8, 1)))
        values = list(store.next_window())
        assert values == [4.0, 4.0]

    def test_loudness_mick(self):
        store = AudioLoudnessMick(window_step=4, window_width=4)
        store.add_data(4 * np.ones((4, 1)))
        (value,) = list(store.next_window())
        assert value == pytest.approx(4.0 ** np.log10(2))
