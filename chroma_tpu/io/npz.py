"""Native numpy event format: full Event round trip with zero
dependencies.

Role parity with the reference's ROOT format (reference:
chroma/io/root.py RootReader/RootWriter): photons_beg/photons_end,
flat hits (with channel), channel readout, and vertices survive a
write/read cycle.  One .npz archive holds many events plus a channel
-info block.
"""
import numpy as np

from chroma_tpu import event


_PHOTON_FIELDS = ('pos', 'dir', 'pol', 'wavelengths', 't',
                  'last_hit_triangles', 'flags', 'weights', 'evidx',
                  'channel')


def _pack_photons(prefix, photons, out):
    if photons is None:
        return
    for f in _PHOTON_FIELDS:
        out[prefix + f] = getattr(photons, f)


def _unpack_photons(prefix, data):
    key = prefix + 'pos'
    if key not in data:
        return None
    kwargs = {f: data[prefix + f] for f in _PHOTON_FIELDS
              if prefix + f in data}
    return event.Photons(**kwargs)


def _pack_vertices(prefix, vertices, out):
    if not vertices:
        return
    out[prefix + 'particle'] = np.array(
        [v.particle_name for v in vertices])
    out[prefix + 'pos'] = np.array([v.pos for v in vertices], dtype=float)
    out[prefix + 'dir'] = np.array([v.dir for v in vertices], dtype=float)
    out[prefix + 'ke'] = np.array([v.ke for v in vertices], dtype=float)
    out[prefix + 't0'] = np.array([v.t0 for v in vertices], dtype=float)


def _unpack_vertices(prefix, data):
    key = prefix + 'particle'
    if key not in data:
        return []
    names = data[key]
    return [event.Vertex(str(names[i]), data[prefix + 'pos'][i],
                         data[prefix + 'dir'][i],
                         float(data[prefix + 'ke'][i]),
                         t0=float(data[prefix + 't0'][i]))
            for i in range(len(names))]


class NpzWriter(object):
    """Accumulates events and writes one .npz archive on close."""

    def __init__(self, filename):
        self.filename = filename
        self.blocks = {}
        self.nevents = 0
        self.channel_info = None

    def set_detector(self, detector):
        """Record channel positions/types for downstream analysis."""
        self.channel_info = dict(
            channel_pos=np.asarray(detector.channel_index_to_position),
            channel_type=np.asarray(detector.channel_index_to_channel_type))

    def write_event(self, ev):
        p = 'ev%d_' % self.nevents
        out = {p + 'id': np.asarray(ev.id)}
        _pack_photons(p + 'beg_', ev.photons_beg, out)
        _pack_photons(p + 'end_', ev.photons_end, out)
        _pack_photons(p + 'flat_hits_', ev.flat_hits, out)
        _pack_vertices(p + 'vertex_', ev.vertices, out)
        if ev.channels is not None:
            out[p + 'chan_hit'] = np.asarray(ev.channels.hit)
            out[p + 'chan_t'] = np.asarray(ev.channels.t)
            out[p + 'chan_q'] = np.asarray(ev.channels.q)
            if ev.channels.flags is not None:
                out[p + 'chan_flags'] = np.asarray(ev.channels.flags)
        self.blocks.update(out)
        self.nevents += 1

    def close(self):
        meta = {'nevents': np.asarray(self.nevents)}
        if self.channel_info:
            meta.update(self.channel_info)
        np.savez_compressed(self.filename, **meta, **self.blocks)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NpzReader(object):
    """Iterates events from an archive written by NpzWriter."""

    def __init__(self, filename):
        self.data = np.load(filename, allow_pickle=False)
        self.nevents = int(self.data['nevents'])
        self.index = -1

    def __len__(self):
        return self.nevents

    def __iter__(self):
        for i in range(self.nevents):
            yield self.read_event(i)

    def read_event(self, i):
        p = 'ev%d_' % i
        d = self.data
        ev = event.Event(id=int(d[p + 'id']))
        ev.photons_beg = _unpack_photons(p + 'beg_', d)
        ev.photons_end = _unpack_photons(p + 'end_', d)
        ev.flat_hits = _unpack_photons(p + 'flat_hits_', d)
        ev.vertices = _unpack_vertices(p + 'vertex_', d)
        if p + 'chan_hit' in d:
            flags = d[p + 'chan_flags'] if p + 'chan_flags' in d else None
            ev.channels = event.Channels(d[p + 'chan_hit'],
                                         d[p + 'chan_t'],
                                         d[p + 'chan_q'], flags)
        return ev

    def next(self):
        self.index = (self.index + 1) % self.nevents
        return self.read_event(self.index)

    def prev(self):
        self.index = (self.index - 1) % self.nevents
        return self.read_event(self.index)

    def current(self):
        return self.read_event(max(self.index, 0))
