"""Event IO round-trip tests (model: reference ROOT IO round trip,
test strategy SURVEY.md §4) using the native npz format."""
import numpy as np

import tests.conftest  # noqa: F401

from chroma_tpu import event
from chroma_tpu.io.npz import NpzWriter, NpzReader
from chroma_tpu.generator.photon import photon_bomb


def make_event(i):
    ev = photon_bomb(50, 450.0, (1.0, 2.0, 3.0), t0=float(i))
    ev.id = i
    ev.vertices = [event.Vertex('e-', (0, 0, 0), (0, 0, 1), 5.0, t0=0.5)]
    ev.photons_end = ev.photons_beg[::2]
    ev.flat_hits = ev.photons_beg[:5]
    ev.flat_hits.channel = np.arange(5, dtype=np.uint32)
    ev.channels = event.Channels(
        hit=np.array([True, False, True]),
        t=np.array([1.5, 1e9, 2.5], np.float32),
        q=np.array([1.0, 0.0, 2.0], np.float32),
        flags=np.array([4, 0, 4], np.uint32))
    return ev


def test_npz_round_trip(tmp_path):
    path = str(tmp_path / 'events.npz')
    with NpzWriter(path) as w:
        for i in range(3):
            w.write_event(make_event(i))

    r = NpzReader(path)
    assert len(r) == 3
    evs = list(r)
    for i, ev in enumerate(evs):
        assert ev.id == i
        assert len(ev.photons_beg) == 50
        assert np.allclose(ev.photons_beg.t, float(i))
        assert len(ev.photons_end) == 25
        assert len(ev.flat_hits) == 5
        assert (ev.flat_hits.channel == np.arange(5)).all()
        assert ev.vertices[0].particle_name == 'e-'
        assert ev.vertices[0].ke == 5.0
        assert ev.channels.hit.sum() == 2
        np.testing.assert_allclose(ev.channels.q, [1.0, 0.0, 2.0])


def test_npz_reader_navigation(tmp_path):
    path = str(tmp_path / 'events.npz')
    with NpzWriter(path) as w:
        for i in range(3):
            w.write_event(make_event(i))
    r = NpzReader(path)
    assert r.next().id == 0
    assert r.next().id == 1
    assert r.prev().id == 0
    assert r.prev().id == 2
