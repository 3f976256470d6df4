"""Golden cross-validation of hit-time/charge PDFs on demo.tiny.

The golden file (tests/golden/demo_tiny_pdf.npz, provenance in
tools/make_golden.py) holds hit-time and charge histograms of a fixed
photon-bomb configuration.  The test re-simulates the configuration
with an independent seed and requires the PDFs to match statistically
(chi^2 over Poisson errors) — the BASELINE.md acceptance shape
("hit-time/charge PDFs statistically matching").  Histograms produced
by the CUDA reference for the same configuration drop into the same
file format and face the same test.
"""
import os

import numpy as np
import pytest

import tests.conftest  # noqa: F401

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden',
                      'demo_tiny_pdf.npz')


@pytest.fixture(scope='module')
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip('golden file missing; run tools/make_golden.py')
    return np.load(GOLDEN)


def chi2_ndf(a, b):
    """chi^2/ndf between two Poisson histograms."""
    err2 = a + b
    use = err2 > 0
    chi2 = np.sum((a[use] - b[use]) ** 2 / err2[use])
    return chi2 / max(use.sum(), 1)


@pytest.mark.slow
def test_golden_hit_pdfs(golden):
    from tools.make_golden import simulate_histograms
    fresh = simulate_histograms(seed=int(golden['seed']) + 999)

    assert chi2_ndf(golden['t_hist'], fresh['t_hist']) < 2.0
    assert chi2_ndf(golden['q_hist'], fresh['q_hist']) < 2.0
    # overall detection fraction within a few permille absolute
    assert abs(float(golden['det_frac'])
               - float(fresh['det_frac'])) < 0.005
    # time PDF peaks in the same bin neighborhood (direct light)
    peak_g = int(np.argmax(golden['t_hist']))
    peak_f = int(np.argmax(fresh['t_hist']))
    assert abs(peak_g - peak_f) <= 1


GOLDEN_FULL = os.path.join(os.path.dirname(__file__), 'golden',
                           'demo_full_pdf.npz')


def test_golden_full_demo():
    """Full-demo (10,055 PMTs) hit-time PDF + detection fraction at a
    fixed bomb configuration — the guard that traversal/driver perf
    work cannot silently change the physics of the benchmark geometry.
    Skips unless both the golden file and the 'full' packed-table
    cache are available (tools/build_full_demo.py +
    tools/make_golden.py --full)."""
    if not os.path.exists(GOLDEN_FULL):
        pytest.skip('full-demo golden missing; run '
                    'tools/make_golden.py --full')
    from tools.make_golden import simulate_full_histograms
    golden = np.load(GOLDEN_FULL)
    fresh = simulate_full_histograms(seed=int(golden['seed']) + 31,
                                     nevents=int(golden['nevents']))
    if fresh is None:
        pytest.skip("no 'full' table cache (tools/build_full_demo.py)")

    assert chi2_ndf(golden['t_hist'], fresh['t_hist']) < 2.0
    assert abs(float(golden['det_frac'])
               - float(fresh['det_frac'])) < 0.004
    peak_g = int(np.argmax(golden['t_hist']))
    peak_f = int(np.argmax(fresh['t_hist']))
    assert abs(peak_g - peak_f) <= 1
