"""Multi-process cohort sweeps: partitioning, exact part-file joins,
and the DCN-collective join under a real 2-process jax.distributed
group (reference scaling model: independent shell-fanned processes
joined via result files, doc/DecodingCodelab.md:353-503)."""

import csv
import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from telluride_decoding_tpu.parallel import multihost
from telluride_decoding_tpu.sweep.engine import SweepResult, \
    cohort_summary

from conftest import write_cohort_tree as _write_cohort


def _fake_results(rng, subjects=('s00', 's01', 's02'), num_l=4,
                  files=3):
    return {
        name: SweepResult(rng.randn(num_l, files + i).astype(np.float64),
                          np.logspace(-4, 0, num_l),
                          ['f%d' % f for f in range(files + i)])
        for i, name in enumerate(subjects)
    }


class TestPartition:

    def test_round_robin_disjoint_and_complete(self):
        subjects = {'s%02d' % i: i for i in range(7)}
        shards = [multihost.partition_subjects(subjects, i, 3)
                  for i in range(3)]
        assert sorted(n for s in shards for n in s) == sorted(subjects)
        assert all(len(set(a) & set(b)) == 0
                   for i, a in enumerate(shards) for b in shards[i + 1:])
        # Deterministic: same assignment when recomputed elsewhere.
        assert shards[1] == multihost.partition_subjects(subjects, 1, 3)

    def test_list_input_and_empty_shard(self):
        names = ['b', 'a']
        assert multihost.partition_subjects(names, 0, 2) == ['a']
        assert multihost.partition_subjects(names, 1, 4) == ['b']
        assert multihost.partition_subjects(names, 3, 4) == []
        with pytest.raises(ValueError):
            multihost.partition_subjects(names, 2, 2)
        with pytest.raises(ValueError):
            multihost.partition_subjects(names, 0, 0)


class TestPartJoin:

    def test_join_equals_single_process_summary(self, tmp_path, rng):
        results = _fake_results(rng)
        lambdas = results['s00'].lambdas
        want_mean, want_std = cohort_summary(results)
        for idx in range(2):
            shard = multihost.partition_subjects(results, idx, 2)
            multihost.write_part(str(tmp_path), idx, lambdas, shard)
        mean, std, joined = multihost.join_parts(str(tmp_path), 2,
                                                 lambdas=lambdas)
        np.testing.assert_allclose(mean, want_mean, rtol=1e-12)
        np.testing.assert_allclose(std, want_std, rtol=1e-12)
        assert joined == ['s00', 's01', 's02']

    def test_empty_part_contributes_zero(self, tmp_path, rng):
        results = _fake_results(rng, subjects=('only',))
        lambdas = results['only'].lambdas
        multihost.write_part(str(tmp_path), 0, lambdas, results)
        multihost.write_part(str(tmp_path), 1, lambdas, {})
        mean, std, joined = multihost.join_parts(str(tmp_path), 2)
        want_mean, want_std = cohort_summary(results)
        np.testing.assert_allclose(mean, want_mean, rtol=1e-12)
        np.testing.assert_allclose(std, want_std, rtol=1e-12)
        assert joined == ['only']

    def test_missing_part_times_out_with_names(self, tmp_path, rng):
        results = _fake_results(rng, subjects=('s00',))
        multihost.write_part(str(tmp_path), 0, results['s00'].lambdas,
                             results)
        with pytest.raises(TimeoutError, match='cohort_part_00001'):
            multihost.join_parts(str(tmp_path), 2, timeout_s=0.2,
                                 poll_s=0.05)

    def test_lambda_grid_mismatch_raises(self, tmp_path, rng):
        results = _fake_results(rng, subjects=('s00',))
        multihost.write_part(str(tmp_path), 0, [1.0, 2.0, 3.0, 4.0],
                             results)
        multihost.write_part(str(tmp_path), 1, [1.0, 2.0, 3.0, 9.0], {})
        with pytest.raises(ValueError, match='swept lambdas'):
            multihost.join_parts(str(tmp_path), 2)

    def test_stale_part_from_other_cohort_rejected(self, tmp_path, rng):
        """A leftover part covering a DIFFERENT subject shard (reused
        partition_dir) fails loudly instead of silently joining."""
        results = _fake_results(rng, subjects=('sA', 'sB'))
        lambdas = results['sA'].lambdas
        multihost.write_part(str(tmp_path), 0, lambdas,
                             {'sA': results['sA']})
        # Stale worker part from an earlier, larger cohort.
        multihost.write_part(str(tmp_path), 1, lambdas,
                             {'sZ': results['sB']})
        with pytest.raises(ValueError, match='stale part'):
            multihost.join_parts(
                str(tmp_path), 2,
                expected_shards={0: ['sA'], 1: ['sB']})
        # Matching shards join fine.
        multihost.write_part(str(tmp_path), 1, lambdas,
                             {'sB': results['sB']})
        mean, _, joined = multihost.join_parts(
            str(tmp_path), 2, expected_shards={0: ['sA'], 1: ['sB']})
        assert joined == ['sA', 'sB']

    def test_clean_parts(self, tmp_path, rng):
        results = _fake_results(rng, subjects=('s00',))
        multihost.write_part(str(tmp_path), 0, results['s00'].lambdas,
                             results)
        assert os.path.exists(multihost.part_path(str(tmp_path), 0))
        multihost.clean_parts(str(tmp_path))
        assert not os.path.exists(multihost.part_path(str(tmp_path), 0))

    def test_part_file_is_json_with_subjects(self, tmp_path, rng):
        results = _fake_results(rng, subjects=('sA', 'sB'))
        path = multihost.write_part(str(tmp_path), 3,
                                    results['sA'].lambdas, results)
        payload = json.load(open(path))
        assert payload['partition_index'] == 3
        assert payload['subjects'] == ['sA', 'sB']
        assert len(payload['n']) == 4


class TestPartitionedDriver:

    def test_two_process_cli_matches_single(self, tmp_path, rng,
                                            cpu_subprocess_env):
        """Two tdt-cohort processes (shell fan-out, file join) produce
        the same cohort CSV as one process."""
        root = _write_cohort(tmp_path, rng, num_subjects=3)
        base = [sys.executable, '-m',
                'telluride_decoding_tpu.cli.cohort',
                '--cohort_dir', root,
                '--input_field', 'eeg', '--output_field', 'intensity',
                '--post_context', '4',
                '--regularization_list', '1e-5,1e-2',
                '--partition_dir', str(tmp_path / 'parts')]
        procs = []
        for idx in range(2):
            csv_file = str(tmp_path / ('c%d.csv' % idx))
            procs.append(subprocess.Popen(
                base + ['--num_partitions', '2',
                        '--partition_index', str(idx),
                        '--cohort_csv_file', csv_file],
                env=cpu_subprocess_env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-3000:]
        assert 'Cohort sweep over 2 partitions' in outs[0][0]
        assert 'Partition 1/2 done' in outs[1][0]
        single = subprocess.run(
            base + ['--cohort_csv_file', str(tmp_path / 'single.csv')],
            env=cpu_subprocess_env, capture_output=True, text=True,
            timeout=600)
        assert single.returncode == 0, single.stderr[-3000:]
        joined = np.genfromtxt(tmp_path / 'c0.csv', delimiter=',',
                               skip_header=1)
        alone = np.genfromtxt(tmp_path / 'single.csv', delimiter=',',
                              skip_header=1)
        np.testing.assert_allclose(joined, alone, atol=1e-6)
        # Worker partitions write no summary CSV.
        assert not os.path.exists(tmp_path / 'c1.csv')

    def test_api_partitioned_summary(self, tmp_path, rng):
        """run_partitioned_cohort in-process (single jax process →
        file join), partition 0 returns the exact cohort summary."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=3)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4, dnn_regressor='linear',
            train_file_pattern='allbut', shuffle_buffer_size=0))
        subjects = cohort.discover_subjects(root, [])
        lambdas = [1e-5, 1e-2]
        part_dir = str(tmp_path / 'parts')
        # Worker first (so partition 0's join finds its part).
        res1, summary1 = cohort.run_partitioned_cohort(
            my_flags, subjects, lambdas, partition_index=1,
            num_partitions=2, partition_dir=part_dir)
        assert summary1 is None and len(res1) == 1
        res0, summary0 = cohort.run_partitioned_cohort(
            my_flags, subjects, lambdas, partition_index=0,
            num_partitions=2, partition_dir=part_dir,
            cohort_csv_file=str(tmp_path / 'c.csv'))
        assert len(res0) == 2
        mean, std = summary0
        _, (want_mean, want_std) = cohort.run_cohort_sweep(
            my_flags, subjects, lambdas)
        np.testing.assert_allclose(mean, want_mean, atol=1e-6)
        np.testing.assert_allclose(std, want_std, atol=1e-6)
        assert os.path.exists(tmp_path / 'c.csv')


class TestDistributedCollectiveJoin:

    def test_two_process_allgather_summary(self, tmp_path, rng,
                                           cpu_subprocess_env):
        """A real 2-process jax.distributed group (CPU backend, Gloo):
        allgather_summary reduces per-process partials with one
        collective and every process gets the exact cohort summary."""
        results = _fake_results(rng)
        want_mean, want_std = cohort_summary(results)
        lambdas = results['s00'].lambdas
        # Stage per-partition shards for the child processes.
        for idx in range(2):
            shard = multihost.partition_subjects(results, idx, 2)
            blob = {name: [r.correlations.tolist(),
                           list(map(float, r.lambdas))]
                    for name, r in shard.items()}
            json.dump(blob, open(tmp_path / ('shard%d.json' % idx), 'w'))
        with socket.socket() as s:
            s.bind(('localhost', 0))
            port = s.getsockname()[1]
        script = textwrap.dedent('''
            import json, os, sys
            import numpy as np
            import jax
            jax.config.update('jax_platforms', 'cpu')
            pid = int(sys.argv[1])
            # Join through the PRODUCTION env-driven path (this is the
            # regression test for the initialize() idempotency guard:
            # it must not touch jax.process_count(), which would
            # initialize the XLA backends and make
            # jax.distributed.initialize() raise).
            os.environ['TDT_COORDINATOR'] = 'localhost:%d'
            os.environ['TDT_NUM_PROCESSES'] = '2'
            os.environ['TDT_PROCESS_ID'] = str(pid)
            from telluride_decoding_tpu.parallel import multihost
            assert multihost.initialize() is True
            assert multihost.initialize() is True   # idempotent
            from telluride_decoding_tpu.sweep.engine import SweepResult
            blob = json.load(open(sys.argv[2]))
            results = {
                name: SweepResult(np.asarray(corr), np.asarray(lams),
                                  ['f'] * np.asarray(corr).shape[1])
                for name, (corr, lams) in blob.items()}
            mean, std = multihost.allgather_summary(
                np.asarray(%s), results)
            print('MEAN', ','.join('%%.9f' %% m for m in mean))
            print('STD', ','.join('%%.9f' %% s for s in std))
        ''' % (port, list(map(float, lambdas))))
        script_path = tmp_path / 'child.py'
        script_path.write_text(script)
        procs = [subprocess.Popen(
            [sys.executable, str(script_path), str(idx),
             str(tmp_path / ('shard%d.json' % idx))],
            env=cpu_subprocess_env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True) for idx in range(2)]
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-3000:]
        for out, _ in outs:
            lines = dict(l.split(' ', 1) for l in out.strip().splitlines()
                         if l.startswith(('MEAN', 'STD')))
            got_mean = np.array([float(v)
                                 for v in lines['MEAN'].split(',')])
            got_std = np.array([float(v)
                                for v in lines['STD'].split(',')])
            # Exact float64 join (payload rides as raw uint32 pairs);
            # tolerance bounded only by the %.9f print format.
            np.testing.assert_allclose(got_mean, want_mean, atol=2e-9)
            np.testing.assert_allclose(got_std, want_std, atol=2e-9)

    def test_allgather_rejects_mismatched_lambda_grids(self, rng,
                                                       monkeypatch):
        """The DCN join must fail as loudly as the filesystem join
        when partitions swept different grids: the lambda row rides
        the collective and is cross-checked."""
        results = _fake_results(rng, subjects=('s00',))
        lambdas = results['s00'].lambdas

        def fake_allgather(bits):
            mine = np.asarray(bits)
            if mine.dtype == np.int64:   # The grid-length pre-check.
                return np.stack([mine, mine])
            other = mine.copy().view(np.float64)
            other[3, 0] *= 10.0          # Different grid on process 1.
            return np.stack([mine, other.view(np.uint32)])

        from jax.experimental import multihost_utils
        monkeypatch.setattr(multihost_utils, 'process_allgather',
                            fake_allgather)
        with pytest.raises(ValueError, match='process 1 swept'):
            multihost.allgather_summary(lambdas, results)

    def test_allgather_rejects_mismatched_grid_lengths(self, rng,
                                                       monkeypatch):
        """Grids of different LENGTH would hit the main collective
        with mismatched shapes (cryptic error or hang); the scalar
        length pre-check must catch them loudly first."""
        results = _fake_results(rng, subjects=('s00',))
        lambdas = results['s00'].lambdas

        def fake_allgather(bits):
            mine = np.asarray(bits)
            if mine.dtype == np.int64:
                return np.stack([mine, mine + 1])   # Process 1: +1 λ.
            raise AssertionError(
                'main allgather ran despite mismatched grid lengths')

        from jax.experimental import multihost_utils
        monkeypatch.setattr(multihost_utils, 'process_allgather',
                            fake_allgather)
        with pytest.raises(ValueError, match='different lengths'):
            multihost.allgather_summary(lambdas, results)

    def test_initialize_noop_without_env(self, monkeypatch):
        monkeypatch.delenv('TDT_COORDINATOR', raising=False)
        assert multihost.initialize() is False

    def test_initialize_incomplete_env_raises(self, monkeypatch):
        monkeypatch.setenv('TDT_COORDINATOR', 'localhost:1')
        monkeypatch.delenv('TDT_NUM_PROCESSES', raising=False)
        monkeypatch.delenv('TDT_PROCESS_ID', raising=False)
        with pytest.raises(ValueError, match='TDT_NUM_PROCESSES'):
            multihost.initialize()


class TestPartitionedGeneralCohort:

    def test_partitioned_sgd_cohort_joins_exactly(self, tmp_path, rng):
        """The multi-host join is model-family-agnostic: a
        fullyconnected cohort partitioned over two processes joins to
        the single-process summary (general per-model path per
        partition, exact (n, sum, sumsq) reduction)."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=2, trials=2,
                             n=200)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        subjects = cohort.discover_subjects(root, [])
        lambdas = [1e-3]
        part_dir = str(tmp_path / 'parts')
        res1, summary1 = cohort.run_partitioned_cohort(
            my_flags, subjects, lambdas, partition_index=1,
            num_partitions=2, partition_dir=part_dir)
        assert summary1 is None and len(res1) == 1
        res0, (mean, std) = cohort.run_partitioned_cohort(
            my_flags, subjects, lambdas, partition_index=0,
            num_partitions=2, partition_dir=part_dir)
        assert len(res0) == 1
        _, (want_mean, want_std) = cohort.run_cohort_sweep(
            my_flags, subjects, lambdas)
        np.testing.assert_allclose(mean, want_mean, atol=1e-6)
        np.testing.assert_allclose(std, want_std, atol=1e-6)
