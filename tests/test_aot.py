"""AOT StableHLO serving artifacts (decode/aot.py): export, reload,
symbolic batch dimension, serve-driver integration, error paths."""

import json
import os

import numpy as np
import pytest

from telluride_decoding_tpu.cli import serve
from telluride_decoding_tpu.decode import aot
from telluride_decoding_tpu.decode import infer_decoder


@pytest.fixture(scope='module')
def toy(tmp_path_factory):
    """One toy model dir + its exported artifact, shared by the module
    (export lowers for cpu+tpu; a few seconds on the CPU mesh)."""
    from test_serve import _toy_model_dir   # pytest adds tests/ to sys.path.
    rng = np.random.RandomState(20260818)
    tmp = tmp_path_factory.mktemp('aot')
    model_dir, eeg, a1 = _toy_model_dir(tmp, rng, pre=2, post=3)
    from telluride_decoding_tpu.cli.infer import load_model
    decoder = load_model(model_dir, 'first')
    artifact = str(tmp / 'artifact')
    manifest = aot.export_decoder(decoder, artifact,
                                  input_widths=(6, 1), output_width=1)
    return {'model_dir': model_dir, 'artifact': artifact,
            'manifest': manifest, 'decoder': decoder, 'eeg': eeg,
            'a1': a1, 'rng': rng}


class TestExport:

    def test_manifest_contents(self, toy):
        m = json.load(open(os.path.join(toy['artifact'],
                                        aot.MANIFEST_NAME)))
        assert m == toy['manifest']
        assert m['reduction'] == 'first'
        assert m['input_1_width'] == 6 and m['input_2_width'] == 1
        assert m['output_width'] == 1
        assert set(m['platforms']) == {'tpu', 'cpu'}
        assert m['model_params']['pre_context'] == 2
        assert os.path.isfile(os.path.join(toy['artifact'],
                                           m['program']))
        # The standard wire-format params ride along for tooling.
        assert os.path.isfile(os.path.join(toy['artifact'],
                                           'decoder_model.json'))
        assert aot.is_aot_artifact(toy['artifact'])
        assert not aot.is_aot_artifact(toy['model_dir'])

    def test_infer_pair_matches_live_decoder(self, toy):
        rng = np.random.RandomState(7)
        exported = aot.load_exported_decoder(toy['artifact'])
        for n in (64, 100):   # Two lengths: the frame axis is symbolic.
            x1 = rng.randn(n, 6).astype(np.float32)
            a = np.abs(rng.randn(n, 1)).astype(np.float32)
            b = np.abs(rng.randn(n, 1)).astype(np.float32)
            got_a, got_b = exported.infer_pair(x1, a, b, a, b)
            want_a, want_b = toy['decoder'].infer_pair(x1, a, b, a, b)
            np.testing.assert_allclose(got_a, want_a, atol=1e-6)
            np.testing.assert_allclose(got_b, want_b, atol=1e-6)

    def test_infer_one_through_pair_program(self, toy):
        rng = np.random.RandomState(8)
        exported = aot.load_exported_decoder(toy['artifact'])
        x1 = rng.randn(50, 6).astype(np.float32)
        a = np.abs(rng.randn(50, 1)).astype(np.float32)
        got = exported.infer_one({'input_1': x1, 'input_2': a}, a)
        want = toy['decoder'].infer_one({'input_1': x1, 'input_2': a}, a)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_async_returns_inflight_device_arrays(self, toy):
        rng = np.random.RandomState(9)
        exported = aot.load_exported_decoder(toy['artifact'])
        x1 = rng.randn(32, 6).astype(np.float32)
        a = np.abs(rng.randn(32, 1)).astype(np.float32)
        sa, sb = exported.infer_pair_async(x1, a, a, a, a)
        ra, rb = exported.infer_pair(x1, a, a, a, a)
        np.testing.assert_allclose(np.asarray(sa), ra, atol=0)
        np.testing.assert_allclose(np.asarray(sb), rb, atol=0)

    def test_non_jax_model_refused(self):
        dec = infer_decoder.Decoder(lambda d: np.zeros((3, 1)),
                                    reduction='first')
        with pytest.raises(ValueError, match='pytree'):
            aot.export_decoder(dec, '/tmp/unused',
                               input_widths=(2, 1), output_width=1)

    def test_missing_metadata_needs_explicit_widths(self, toy):
        with pytest.raises(ValueError, match='input_widths'):
            aot.export_decoder(toy['decoder'], '/tmp/unused')

    def test_version_gate(self, toy, tmp_path):
        import shutil
        broken = str(tmp_path / 'broken')
        shutil.copytree(toy['artifact'], broken)
        mpath = os.path.join(broken, aot.MANIFEST_NAME)
        m = json.load(open(mpath))
        m['format_version'] = 999
        json.dump(m, open(mpath, 'w'))
        with pytest.raises(ValueError, match='version'):
            aot.load_exported_decoder(broken)


class TestServeIntegration:

    def test_serve_stream_from_artifact_matches_model_dir(self, toy):
        rng = np.random.RandomState(11)
        eeg, a1 = toy['eeg'], toy['a1']
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        live = serve.serve_stream(
            toy['model_dir'], eeg, a1, a2, chunk_size=37,
            reduction='first', decision='wta', window_width=100,
            window_step=100)
        from_artifact = serve.serve_stream(
            toy['artifact'], eeg, a1, a2, chunk_size=37,
            reduction='first', decision='wta', window_width=100,
            window_step=100)
        assert len(live) == len(from_artifact) > 0
        for d_live, d_art in zip(live, from_artifact):
            assert d_art['attend_speaker1'] == d_live['attend_speaker1']
            assert d_art['score1'] == pytest.approx(d_live['score1'],
                                                    abs=1e-5)
            assert d_art['score2'] == pytest.approx(d_live['score2'],
                                                    abs=1e-5)

    def test_reduction_mismatch_refused(self, toy):
        with pytest.raises(ValueError, match='exported with reduction'):
            serve._load_serving_decoder(toy['artifact'], 'lda')

    def test_no_explicit_reduction_uses_baked_in(self, toy):
        # The --serve_reduction DEFAULT must not conflict with the
        # artifact: None (= flag not set) serves any artifact as-is.
        dec = serve._load_serving_decoder(toy['artifact'], None)
        assert dec.reduction == 'first'
        # Live model dirs fall back to 'lda' under None.
        live = serve._load_serving_decoder(toy['model_dir'], None)
        assert isinstance(live, infer_decoder.Decoder)

    def test_serve_stream_artifact_without_reduction_flag(self, toy):
        # The documented zero-config workflow: serve an artifact whose
        # baked-in reduction is NOT the flag default, no flag given.
        rng = np.random.RandomState(12)
        eeg, a1 = toy['eeg'], toy['a1']
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        decisions = serve.serve_stream(
            toy['artifact'], eeg, a1, a2, chunk_size=37,
            decision='wta', window_width=100, window_step=100)
        assert len(decisions) > 0

    def test_loader_passthrough_for_model_dirs(self, toy):
        dec = serve._load_serving_decoder(toy['model_dir'], 'first')
        assert isinstance(dec, infer_decoder.Decoder)


class TestCli:

    def test_export_aot_tool(self, toy, tmp_path, capsys):
        from telluride_decoding_tpu.cli import export_aot
        out = str(tmp_path / 'cli_artifact')
        export_aot.app_main([toy['model_dir'], out,
                             '--reduction', 'first',
                             '--platforms=cpu',
                             '--input_widths', '6,1',
                             '--output_width=1'])
        assert aot.is_aot_artifact(out)
        m = json.load(open(os.path.join(out, aot.MANIFEST_NAME)))
        assert m['platforms'] == ['cpu']
        assert 'reduction=first' in capsys.readouterr().out

    def test_cli_usage_error(self):
        from telluride_decoding_tpu.cli import export_aot
        with pytest.raises(SystemExit, match='usage'):
            export_aot.app_main(['only_one_arg'])

    def test_cli_trailing_flag_without_value(self):
        from telluride_decoding_tpu.cli import export_aot
        with pytest.raises(SystemExit, match='--reduction needs a value'):
            export_aot.app_main(['model', 'artifact', '--reduction'])

    def test_cli_malformed_input_widths(self):
        from telluride_decoding_tpu.cli import export_aot
        with pytest.raises(SystemExit, match='exactly two'):
            export_aot.app_main(['model', 'artifact',
                                 '--input_widths', '6'])
        with pytest.raises(SystemExit, match='two integers'):
            export_aot.app_main(['model', 'artifact',
                                 '--input_widths', 'x,y'])
        with pytest.raises(SystemExit, match='integer'):
            export_aot.app_main(['model', 'artifact',
                                 '--output_width', 'wide'])

    def test_cli_malformed_platforms(self):
        # All-empty values and unknown names must fail with usage-style
        # SystemExit, not an opaque jax.export error later. (Trailing
        # commas like 'tpu,' are tolerated: empty segments filter out.)
        from telluride_decoding_tpu.cli import export_aot
        for bad in ('', ',', ' ', 'tpu,gpu3'):
            with pytest.raises(SystemExit, match='--platforms'):
                export_aot.app_main(['model', 'artifact',
                                     '--platforms', bad])

    def test_platforms_bare_string_is_one_platform(self, toy, tmp_path):
        # Sequence[str] admits a bare str; it must mean ONE platform,
        # not tuple('cpu') == ('c', 'p', 'u').
        out = str(tmp_path / 'str_platform')
        manifest = aot.export_decoder(
            toy['decoder'], out, platforms='cpu',
            input_widths=(6, 1), output_width=1)
        assert manifest['platforms'] == ['cpu']
