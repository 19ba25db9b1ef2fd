"""On-device correctness gates: run the key numeric checks on the
default JAX backend (the real TPU in this environment).

The pytest suite runs on a virtual CPU mesh; this script re-runs the
reference's headline quality gates on actual hardware, where matmul
precision and kernel lowering differ. Exits nonzero on any failure.

    python tpu_checks.py
"""

import os
import sys

import jax

# Persistent compile cache (TPU-only; see utils/compile_cache.py).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from telluride_decoding_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

import jax.numpy as jnp
import numpy as np
import scipy.signal


def check(name, ok, detail=''):
    status = 'PASS' if ok else 'FAIL'
    print('%-52s %s %s' % (name, status, detail))
    return ok


def main():
    results = []
    rng = np.random.RandomState(0)
    platform = jax.devices()[0].platform
    print('backend: %s (%s)' % (platform, jax.devices()[0]))

    # 1. Ridge exact recovery (reference gate: atol 1e-4).
    from telluride_decoding_tpu.solvers.ridge import (
        calculate_linear_regressor_parameters)
    x = rng.randn(2000, 6).astype(np.float32)
    w = rng.randn(6, 3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    sol = calculate_linear_regressor_parameters(x, x @ w + b, lamb=0.0)
    err = max(np.abs(np.asarray(sol.w) - w).max(),
              np.abs(np.asarray(sol.b) - b).max())
    results.append(check('ridge exact recovery', err < 1e-4,
                         'err %.2g' % err))

    # 2. CCA planted structure (reference gate: e1>0.90, e3<0.02).
    from telluride_decoding_tpu.solvers.cca import calculate_cca_parameters
    np.random.seed(42)
    x1 = np.random.randn(5000, 3).astype(np.float32)
    x2 = np.random.randn(5000, 5).astype(np.float32)
    x2[:, 4] = x1[:, 0]
    e = np.asarray(calculate_cca_parameters(
        x1, x2, dim=3, regularization=0.1).eigenvalues)
    results.append(check('CCA planted eigenstructure',
                         e[0] > 0.90 and e[2] < 0.02,
                         'e=%s' % np.round(e, 4)))

    # 3. IIR filter parity with scipy (solver-precision matmuls).
    from telluride_decoding_tpu.signal import butter_sos, sosfilt
    xf = rng.randn(2000, 4).astype(np.float32)
    sos = butter_sos(4, 2.0, 'hp', fs=100.0)
    want, _ = scipy.signal.sosfilt(sos, xf, axis=0,
                                   zi=np.zeros((sos.shape[0], 2, 4)))
    got, _ = sosfilt(sos, xf)
    ferr = np.abs(np.asarray(got) - want).max()
    results.append(check('IIR sosfilt vs scipy', ferr < 1e-3,
                         'err %.2g' % ferr))

    # 4. Fused Pallas frontend vs its XLA reference (compiled kernel).
    try:
        from telluride_decoding_tpu.ops.fused_frontend import (
            fused_envelope_lagstack, fused_envelope_lagstack_reference)
        audio = rng.randn(16000 * 10).astype(np.float32)
        args = dict(window=2.0, exponent=float(np.log10(2)), pre=3,
                    post=3)
        got = np.asarray(fused_envelope_lagstack(audio, 16000, 100,
                                                 **args))
        want = np.asarray(fused_envelope_lagstack_reference(
            audio, 16000, 100, **args))
        kerr = np.abs(got - want).max()
        results.append(check('fused frontend kernel', kerr < 1e-3,
                             'err %.2g' % kerr))
    except Exception as error:
        results.append(check('fused frontend kernel', False,
                             repr(error)[:60]))

    # 5. Pallas lag stack bit-parity with the numpy semantics.
    try:
        from telluride_decoding_tpu.ops.lagstack import (lag_stack_np,
                                                         lag_stack_pallas)
        xl = rng.randn(3000, 64).astype(np.float32)
        got = np.asarray(lag_stack_pallas(jnp.asarray(xl), 4, 4))
        lerr = np.abs(got - lag_stack_np(xl, 4, 4)).max()
        results.append(check('pallas lag stack', lerr == 0.0,
                             'err %.2g' % lerr))
    except Exception as error:
        results.append(check('pallas lag stack', False,
                             repr(error)[:60]))

    # 6. Jackknife sweep recovers the planted model at small lambda.
    from telluride_decoding_tpu.sweep.engine import ridge_jackknife_sweep
    xs = [rng.randn(400, 6).astype(np.float32) for _ in range(4)]
    wj = rng.randn(6, 1).astype(np.float32)
    ys = [xi @ wj + 0.05 * rng.randn(400, 1).astype(np.float32)
          for xi in xs]
    res = ridge_jackknife_sweep(xs, ys, np.logspace(-6, 0, 7))
    results.append(check('jackknife sweep recovery',
                         bool(np.all(res.correlations[0] > 0.97)),
                         'min r %.4f' % res.correlations[0].min()))

    # 7. Fused-intensity production path (bucketed kernel) equals the
    # cumsum fallback on this device.
    try:
        import os as _os
        from telluride_decoding_tpu.signal import AudioFeatures
        from telluride_decoding_tpu.signal import preprocess as _pp
        # Guard against the two trivially-equal false-pass modes: the
        # kernel was never selected (non-TPU backend or a pre-set
        # TDT_FUSED_FRONTEND=0), or it raised and sticky-disabled
        # itself; either way fused == plain compares the fallback
        # against itself.
        if _pp._fused_frontend_kernel() is None:
            raise RuntimeError('fused kernel not selected on this '
                               'backend (platform %s, '
                               'TDT_FUSED_FRONTEND=%r)' %
                               (jax.devices()[0].platform,
                                _os.environ.get('TDT_FUSED_FRONTEND')))
        audio = rng.randn(30000).astype(np.float32)
        af = AudioFeatures('loud', 16000, 64, window=1.0,
                           exponent=float(np.log10(2)))
        fused = np.asarray(af.compute_intensity(audio))
        saved_mode = _os.environ.get('TDT_FUSED_FRONTEND')
        _os.environ['TDT_FUSED_FRONTEND'] = '0'
        try:
            af2 = AudioFeatures('loud', 16000, 64, window=1.0,
                                exponent=float(np.log10(2)))
            plain = np.asarray(af2.compute_intensity(audio))
        finally:
            if saved_mode is None:
                del _os.environ['TDT_FUSED_FRONTEND']
            else:
                _os.environ['TDT_FUSED_FRONTEND'] = saved_mode
        ierr = np.abs(fused - plain).max()
        kernel_ran = not _pp._FUSED_DISABLED
        results.append(check('fused intensity ingest path',
                             ierr < 1e-3 and kernel_ran,
                             'err %.2g%s' % (ierr, '' if kernel_ran else
                                             ' (kernel DISABLED)')))
    except Exception as error:
        results.append(check('fused intensity ingest path', False,
                             repr(error)[:60]))

    # 8. Streamed per-file moments equal the dense accumulation.
    from telluride_decoding_tpu.ops.covariance import moments_from_arrays
    from telluride_decoding_tpu.data.brain_data import _device_file_moments
    xm = rng.randn(700, 12).astype(np.float32)
    ym = rng.randn(700, 2).astype(np.float32)
    from telluride_decoding_tpu.ops.lagstack import lag_stack_np as _lsn
    dense = moments_from_arrays(jnp.asarray(_lsn(xm, 2, 1)),
                                jnp.asarray(ym))
    pad = np.zeros((1024, 12), np.float32)
    pad[:700] = xm
    pady = np.zeros((1024, 2), np.float32)
    pady[:700] = ym
    stream = _device_file_moments(jnp.asarray(pad), jnp.asarray(pady),
                                  jnp.asarray(700, jnp.float32),
                                  pre=2, post=1, pre_y=0, post_y=0,
                                  want_syy=False)
    merr = max(float(jnp.max(jnp.abs(getattr(dense, f) -
                                     getattr(stream, f))))
               for f in dense._fields)
    results.append(check('streamed moments parity', merr < 1e-2,
                         'err %.2g' % merr))

    # 9. SSD attention tracking (<15% switch error gate).
    from telluride_decoding_tpu.decide import create_attention_decoder
    n = 300
    attended = (np.arange(n) // 75) % 2 == 0
    r_att = np.exp(-0.4 + 0.6 * rng.randn(n))
    r_un = np.exp(-1.5 + 0.9 * rng.randn(n))
    r1 = np.where(attended, r_att, r_un)
    r2 = np.where(attended, r_un, r_att)
    dec = create_attention_decoder('ssd')
    dec.tune(r1[:75], r2[:75])
    errors = total = 0
    for i in range(n):
        p, _, _ = dec.attention(r1[i], r2[i])
        if i < dec.k_w:
            continue
        errors += (p > 0.5) != attended[i - dec.k_b]
        total += 1
    frac = errors / total
    results.append(check('SSD switch tracking', frac < 0.15,
                         'err %.1f%%' % (100 * frac)))

    # 10. Fused two-speaker serving dispatch (infer_pair) equals two
    # single-stream decodes on this device.
    try:
        from telluride_decoding_tpu.decode import (
            LinearRegressionDecoder)
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelLinearRegression)
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        n = 1200
        eegp = rng.randn(n, 6).astype(np.float32)
        outp = (eegp[:, :1] * 0.5 + 0.3 +
                0.05 * rng.randn(n, 1)).astype(np.float32)
        mdl = BrainModelLinearRegression(input_width=6, output_width=1,
                                         regularization_lambda=1e-4)
        tbd = TestBrainData('input_1', 'output', 100.0,
                            final_batch_size=400)
        tbd.preserve_test_data(eegp, outp)
        mdl.fit(tbd.create_dataset('train'))
        decp = LinearRegressionDecoder(mdl, reduction='mean')
        decp.add_data_correlator(outp, outp)
        in2 = outp[:400]
        ya = outp[:400]
        yb = np.flip(outp[:400], axis=0).copy()
        sa = decp.infer_one({'input_1': eegp[:400], 'input_2': in2}, ya)
        sb = decp.infer_one({'input_1': eegp[:400], 'input_2': in2}, yb)
        pa, pb = decp.infer_pair(eegp[:400], in2, in2, ya, yb)
        perr = max(np.abs(pa - sa).max(), np.abs(pb - sb).max())
        results.append(check('infer_pair fused serving dispatch',
                             perr < 1e-4, 'err %.2g' % perr))
    except Exception as error:
        results.append(check('infer_pair fused serving dispatch',
                             False, repr(error)[:60]))

    # 11. DCCA train+test on device under the BASELINE wall-clock
    # target (<1 min for a telluride4-scale train+test incl. DCCA;
    # BASELINE.md "New-framework targets"). Two views sharing a
    # planted latent; the trained towers' first canonical correlation
    # must find it.
    try:
        import time
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        from telluride_decoding_tpu.models import BrainModelDCCA
        n = 4000
        latent = rng.randn(n, 2).astype(np.float32)
        v1 = np.concatenate([latent + 0.3 * rng.randn(n, 2),
                             rng.randn(n, 6)], axis=1).astype(np.float32)
        v2 = np.concatenate([latent @ rng.randn(2, 2).astype(np.float32)
                             + 0.3 * rng.randn(n, 2),
                             rng.randn(n, 1)], axis=1).astype(np.float32)
        tbd = TestBrainData('input_1', 'ones', 100.0,
                            in2_fields='input_2',
                            final_batch_size=1000,
                            shuffle_buffer_size=0)
        tbd.preserve_test_data(v1, np.ones((n, 1), np.float32),
                               input2_data=v2)
        t0 = time.perf_counter()
        dcca = BrainModelDCCA(cca_dims=2, hidden_units=[16],
                              regularization_lambda=1e-2,
                              input1_width=8, input2_width=3)
        dcca.compile(learning_rate=1e-3)
        dcca.fit(tbd.create_dataset('train'), epochs=40,
                 batch_size=1000)
        corr = dcca.evaluate(tbd.create_dataset(
            'train'))['cca_pearson_correlation_first']
        dcca_s = time.perf_counter() - t0
        results.append(check(
            'DCCA train+test on device', corr > 0.4 and dcca_s < 60,
            'corr %.2f in %.1fs (target <60s)' % (corr, dcca_s)))
    except Exception as error:
        results.append(check('DCCA train+test on device', False,
                             repr(error)[:60]))

    # 12. AOT serving artifact on device: the serialized StableHLO
    # program (decode/aot.py) must deserialize and EXECUTE on this
    # backend with scores equal to the live decoder's — the pytest
    # suite only proves this on the CPU mesh.
    try:
        import tempfile
        from telluride_decoding_tpu.decode import (
            LinearRegressionDecoder, aot)
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelLinearRegression)
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        n = 1200
        eega = rng.randn(n, 6).astype(np.float32)
        outa = (eega[:, :1] * 0.5 + 0.3 +
                0.05 * rng.randn(n, 1)).astype(np.float32)
        mdl = BrainModelLinearRegression(input_width=6, output_width=1,
                                         regularization_lambda=1e-4)
        tbd = TestBrainData('input_1', 'output', 100.0,
                            final_batch_size=400)
        tbd.preserve_test_data(eega, outa)
        mdl.fit(tbd.create_dataset('train'))
        live = LinearRegressionDecoder(mdl, reduction='mean')
        live.add_data_correlator(outa, outa)
        with tempfile.TemporaryDirectory() as adir:
            aot.export_decoder(live, adir, input_widths=(6, 1),
                               output_width=1)
            exported = aot.load_exported_decoder(adir)
            in2 = outa[:400]
            ya, yb = outa[:400], np.flip(outa[:400], axis=0).copy()
            ea, eb = exported.infer_pair(eega[:400], in2, in2, ya, yb)
            la, lb = live.infer_pair(eega[:400], in2, in2, ya, yb)
        aerr = max(np.abs(ea - la).max(), np.abs(eb - lb).max())
        results.append(check('AOT StableHLO artifact on device',
                             aerr < 1e-4, 'err %.2g' % aerr))
    except Exception as error:
        results.append(check('AOT StableHLO artifact on device',
                             False, repr(error)[:60]))

    print()
    if all(results):
        print('ALL %d GATES PASS on %s' % (len(results), platform))
        return 0
    print('%d/%d gates FAILED' % (len(results) - sum(results),
                                  len(results)))
    return 1


if __name__ == '__main__':
    sys.exit(main())
