"""Generate the golden hit-PDF snapshot for tests/test_golden.py.

Provenance: produced by THIS framework (seed below) on the demo.tiny
detector and validated against the analytic expectations asserted in
tests/test_propagation.py (time-of-flight peak, Fresnel rates,
Rayleigh angular law) — the CUDA reference is not runnable on this
machine (no NVIDIA GPU), so the golden file guards statistical
regressions and provides the harness into which reference-generated
histograms can be dropped: produce the same file from reference
chroma with `python tools/make_golden.py --out <path>` semantics
(bomb position/count/wavelength below) and the same test validates
cross-package agreement.
"""
import argparse
import os

import numpy as np

GOLDEN_SEED = 1234
NPHOTONS = 40000
WAVELENGTH = 400.0
BOMB_POS = (200.0, 0.0, 0.0)
NEVENTS = 8
TIME_BINS = np.linspace(0.0, 40.0, 81)
CHARGE_BINS = np.linspace(0.0, 4.0, 41)


def simulate_histograms(seed):
    from chroma_tpu import demo
    from chroma_tpu.sim import Simulation
    from chroma_tpu.generator.photon import photon_bomb

    sim = Simulation(demo.tiny(), geant4_processes=0, seed=seed)
    t_hist = np.zeros(len(TIME_BINS) - 1)
    q_hist = np.zeros(len(CHARGE_BINS) - 1)
    nhit = 0
    det_frac = []
    for i in range(NEVENTS):
        ev = next(sim.simulate(
            [photon_bomb(NPHOTONS, WAVELENGTH, BOMB_POS)],
            run_daq=True))
        chan = ev.channels
        hit = np.asarray(chan.hit, bool)
        t_hist += np.histogram(np.asarray(chan.t)[hit], TIME_BINS)[0]
        q_hist += np.histogram(np.asarray(chan.q)[hit], CHARGE_BINS)[0]
        nhit += int(hit.sum())
        det_frac.append(len(ev.flat_hits) / float(NPHOTONS))
    return dict(t_hist=t_hist, q_hist=q_hist, nhit=np.asarray(nhit),
                det_frac=np.asarray(np.mean(det_frac)),
                time_bins=TIME_BINS, charge_bins=CHARGE_BINS,
                nevents=np.asarray(NEVENTS),
                nphotons=np.asarray(NPHOTONS),
                wavelength=np.asarray(WAVELENGTH),
                bomb_pos=np.asarray(BOMB_POS),
                seed=np.asarray(GOLDEN_SEED))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'tests', 'golden', 'demo_tiny_pdf.npz'))
    args = parser.parse_args()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    data = simulate_histograms(GOLDEN_SEED)
    np.savez_compressed(args.out, **data)
    print('wrote', args.out, 'nhit=', int(data['nhit']),
          'det_frac=%.4f' % float(data['det_frac']))


if __name__ == '__main__':
    main()
