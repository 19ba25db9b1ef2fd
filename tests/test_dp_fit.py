"""Data-parallel SGD training: minibatches shard over the mesh,
gradients all-reduce into replicated parameters — the SAME batch
stream as the single-device fit, so numbers match to float tolerance.
A TPU-native extension: the reference's Keras fit (reference
brain_model.py:206-253) is single-process."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from telluride_decoding_tpu.data.brain_data import TestBrainData
from telluride_decoding_tpu.models.brain_model import (
    BrainModelClassifier,
    BrainModelDNN,
)
from telluride_decoding_tpu.models.cca import BrainModelDCCA


def _mesh():
    if len(jax.devices()) < 2:
        pytest.skip('needs a multi-device mesh')
    return Mesh(np.array(jax.devices()), ('data',))


def _regression_data(rng, n=1000, d=6):
    x = rng.randn(n, d).astype(np.float32)
    w = rng.randn(d, 1).astype(np.float32)
    y = (x @ w + 0.1 * rng.randn(n, 1)).astype(np.float32)
    return x, y


def _dataset(x, y, post=2):
    bd = TestBrainData('input_1', 'output', 100.0, pre_context=0,
                       post_context=post)
    bd.preserve_test_data(x, y)
    return bd.create_dataset('train')


class TestDataParallelFit:

    def test_dnn_matches_single_device(self, rng):
        x, y = _regression_data(rng)
        kw = dict(epochs=3, batch_size=128, seed=3)
        m1 = BrainModelDNN(input_width=18, output_width=1,
                           num_hidden_list=[8])
        m1.compile(learning_rate=0.01, loss='mse')
        h1 = m1.fit(_dataset(x, y), **kw)
        m2 = BrainModelDNN(input_width=18, output_width=1,
                           num_hidden_list=[8])
        m2.compile(learning_rate=0.01, loss='mse')
        h2 = m2.fit(_dataset(x, y), mesh=_mesh(), **kw)
        np.testing.assert_allclose(h1['loss'], h2['loss'], rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                        jax.tree_util.tree_leaves(m2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_gradients_actually_all_reduce(self, rng):
        """The DP trainer's compiled program must contain a cross-
        device all-reduce (otherwise the 'parallel' fit silently
        replicated every batch)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = _mesh()
        bs = NamedSharding(mesh, P(('data',)))
        rep = NamedSharding(mesh, P())
        x = jax.device_put(
            jnp.asarray(rng.randn(256, 8), jnp.float32), rep)
        y = jax.device_put(
            jnp.asarray(rng.randn(256, 1), jnp.float32), rep)
        params = jax.device_put({'w': jnp.zeros((8, 1))}, rep)

        def loss_fn(p, xb, yb):
            return jnp.mean((xb @ p['w'] - yb) ** 2)

        @jax.jit
        def step(p, x, y, idx):
            idx = jax.lax.with_sharding_constraint(idx, bs)
            return jax.value_and_grad(loss_fn)(p, x[idx], y[idx])

        txt = step.lower(params, x, y,
                         jnp.arange(64)).compile().as_text()
        assert 'all-reduce' in txt

    def test_batch_size_rounds_up_to_mesh_multiple(self, rng):
        """An off-multiple batch_size still trains (rounded up so the
        per-device slices stay equal)."""
        x, y = _regression_data(rng, n=500)
        m = BrainModelDNN(input_width=18, output_width=1,
                          num_hidden_list=[4])
        m.compile(learning_rate=0.01, loss='mse')
        h = m.fit(_dataset(x, y), epochs=2, batch_size=100, seed=0,
                  mesh=_mesh())
        assert np.isfinite(h['loss']).all()

    def test_classifier_matches_single_device(self, rng):
        # input_2 equals a projection of input_1 for label 0; random
        # for 1 (test_models.py pattern).
        n = 800
        x1 = rng.randn(n, 4).astype(np.float32)
        labels = (np.arange(n) % 2).astype(np.float32)[:, None]
        x2 = np.where(labels > 0.5,
                      rng.randn(n, 1).astype(np.float32),
                      x1[:, :1])
        kw = dict(epochs=2, batch_size=160, seed=1)
        outs = []
        for mesh in (None, _mesh()):
            bd = TestBrainData('input', 'output', 100.0)
            bd.preserve_test_data(x1, labels, input2_data=x2)
            ds = bd.create_dataset('train')
            m = BrainModelClassifier(ds, [6])
            m.compile(learning_rate=0.02)
            h = m.fit(ds, **(dict(kw, mesh=mesh) if mesh else kw))
            outs.append((h['loss'], m.params))
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                        jax.tree_util.tree_leaves(outs[1][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_dcca_trains_under_mesh(self, rng):
        """DCCA (towers + final streamed CCA solve) accepts the mesh
        and produces a usable model."""
        n = 600
        z = rng.randn(n, 3).astype(np.float32)
        x1 = np.concatenate([z, rng.randn(n, 2)], 1).astype(np.float32)
        x2 = np.concatenate([z @ rng.randn(3, 3).astype(np.float32),
                             rng.randn(n, 1)], 1).astype(np.float32)
        bd = TestBrainData('input', 'output', 100.0)
        bd.preserve_test_data(x1, np.zeros((n, 1), np.float32),
                              input2_data=x2)
        ds = bd.create_dataset('train')
        m = BrainModelDCCA(ds, cca_dims=2, hidden_units=[8])
        m.compile(learning_rate=0.01)
        h = m.fit(ds, epochs=2, batch_size=120, seed=0, mesh=_mesh())
        assert np.isfinite(h['loss']).all()

    def test_driver_dp_fit_flag(self, tmp_path, rng):
        """--dp_fit end to end through run_decoding_experiment: same
        quality as the default fit on the TRF corpus."""
        from telluride_decoding_tpu.cli import decoding
        from telluride_decoding_tpu.data import records
        d = tmp_path / 'records'
        t = np.arange(25) / 100.0
        shape = 30 * t * np.exp(-30 * t)
        irs = (np.random.RandomState(0).randn(4, 25) *
               shape[None, :]).astype(np.float32)
        for name in ['trial01', 'trial02']:
            n = 1200
            raw = np.abs(rng.randn(n // 10 + 2))
            idx = np.linspace(0, raw.shape[0] - 1.001, n)
            lo = idx.astype(int)
            fr = idx - lo
            att = ((1 - fr) * raw[lo] +
                   fr * raw[lo + 1]).astype(np.float32)
            eeg = np.stack([np.convolve(att, irs[c], 'full')[:n]
                            for c in range(4)], 1).astype(np.float32)
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'intensity': att[:, None]},
                str(d / ('%s.tfrecords' % name)))
        results = {}
        for dp in (False, True):
            flags_ = decoding.DecodingOptions().set_from_dict(dict(
                tfexample_dir=str(d), input_field='eeg',
                output_field='intensity', dnn_regressor='fullyconnected',
                hidden_units='8', epoch_count=4, batch_size=256,
                learning_rate=0.02, pre_context=0, post_context=8,
                train_file_pattern='allbut',
                validate_file_pattern='trial02',
                test_file_pattern='trial02', attended_field='',
                shuffle_buffer_size=0, dp_fit=dp,
                summary_dir=str(tmp_path / ('s_dp%d' % dp)),
                saved_model_dir=None))
            _, test_results, _ = decoding.run_decoding_experiment(
                flags_)
            results[dp] = test_results['pearson_correlation_first']
        # Identical batch stream: the two runs agree to float
        # tolerance (reduction order only).
        assert results[True] == pytest.approx(results[False],
                                              abs=1e-3)


class TestDataParallelStreamingFit:

    def test_streaming_dp_matches_streaming_single(self, tmp_path,
                                                   rng):
        """fit_streaming with a mesh sees the SAME batch stream (file
        order and permutations come from the host RandomState), so it
        must match the meshless streaming fit to float tolerance."""
        from telluride_decoding_tpu.data import brain_data, records
        d = tmp_path / 'records'
        d.mkdir()
        for i, n in enumerate([500, 430]):
            records.convert_data_to_tfrecords(
                {'eeg': rng.randn(n, 6).astype(np.float32),
                 'env': rng.randn(n, 1).astype(np.float32)},
                str(d / ('t%02d.tfrecords' % i)))
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=2, post_context=2,
            data_dir=str(d), train_file_pattern='t',
            shuffle_buffer_size=0)
        kw = dict(epochs=2, batch_size=128, seed=7)
        m1 = BrainModelDNN(input_width=30, output_width=1,
                           num_hidden_list=[8])
        m1.compile(learning_rate=0.01, loss='mse')
        h1 = m1.fit_streaming(bd, **kw)
        m2 = BrainModelDNN(input_width=30, output_width=1,
                           num_hidden_list=[8])
        m2.compile(learning_rate=0.01, loss='mse')
        h2 = m2.fit_streaming(bd, mesh=_mesh(), **kw)
        np.testing.assert_allclose(h1['loss'], h2['loss'], rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                        jax.tree_util.tree_leaves(m2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_streaming_dp_short_corpus_trims_to_mesh(self, tmp_path,
                                                     rng):
        """A corpus smaller than one batch trains as one short batch;
        under a mesh it trims to a device multiple instead of failing
        with an uneven-shard error."""
        from telluride_decoding_tpu.data import brain_data, records
        d = tmp_path / 'records'
        d.mkdir()
        records.convert_data_to_tfrecords(
            {'eeg': rng.randn(45, 3).astype(np.float32),
             'env': rng.randn(45, 1).astype(np.float32)},
            str(d / 't00.tfrecords'))
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=str(d),
            train_file_pattern='t', shuffle_buffer_size=0)
        m = BrainModelDNN(input_width=3, output_width=1,
                          num_hidden_list=[4])
        m.compile(learning_rate=0.01, loss='mse')
        h = m.fit_streaming(bd, epochs=1, batch_size=512, seed=0,
                            mesh=_mesh())
        assert np.isfinite(h['loss']).all()

    def test_tiny_corpus_on_mesh_fails_clearly(self, rng):
        """A corpus smaller than one per-device slice must raise a
        clear error, not an opaque reshape inside the jitted epoch."""
        x, y = _regression_data(rng, n=3)
        m = BrainModelDNN(input_width=18, output_width=1,
                          num_hidden_list=[4])
        m.compile(learning_rate=0.01, loss='mse')
        with pytest.raises(ValueError, match='per-device slice'):
            m.fit(_dataset(x, y), epochs=1, batch_size=8, seed=0,
                  mesh=_mesh())
