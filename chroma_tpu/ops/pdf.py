"""PDF accumulation and likelihood estimators.

Re-engineering of the reference PDF machinery (reference:
chroma/gpu/pdf.py + chroma/cuda/pdf.cu):

  * GPUPDF.setup_pdf / add_hits_to_pdf: binned (channel, time, charge)
    histogram — flat scatter-add instead of atomics;
  * GPUPDF.setup_pdf_eval / accumulate_pdf_eval: the variable-bin
    estimator — per-channel counts are dense elementwise ops, and the
    per-hit-channel nearest-neighbor distance list (the reference's
    shared-memory work queue + insertion sort, pdf.cu:152) becomes a
    sorted (nhit, K) table merged with each batch via jnp.sort;
  * GPUKernelPDF: per-channel Gaussian KDE with Silverman-style
    bandwidths, erf-normalized in the PDF time window.
"""
import numpy as np
import jax
import jax.numpy as jnp


class GPUPDF(object):
    """Binned PDFs + variable-bin PDF evaluation (parity:
    chroma/gpu/pdf.py GPUPDF)."""

    def __init__(self):
        pass

    # ---- binned 3D (channel, t, q) PDFs ------------------------------

    def setup_pdf(self, nchannels, tbins, trange, qbins, qrange):
        self.events_in_histogram = 0
        self.nchannels = nchannels
        self.hitcount = jnp.zeros(nchannels, jnp.uint32)
        self.pdf = jnp.zeros((nchannels, tbins, qbins), jnp.uint32)
        self.tbins = tbins
        self.trange = trange
        self.qbins = qbins
        self.qrange = qrange

    def clear_pdf(self):
        self.hitcount = jnp.zeros_like(self.hitcount)
        self.pdf = jnp.zeros_like(self.pdf)

    def add_hits_to_pdf(self, gpuchannels):
        t = gpuchannels.t[:self.nchannels]
        q = gpuchannels.q[:self.nchannels]
        tmin, tmax = self.trange
        qmin, qmax = self.qrange
        ok = (t < 1e8) & (t >= tmin) & (t < tmax) & (q >= qmin) & (q < qmax)
        self.hitcount = self.hitcount + ok.astype(jnp.uint32)
        tbin = ((t - tmin) / (tmax - tmin) * self.tbins).astype(jnp.int32)
        qbin = ((q - qmin) / (qmax - qmin) * self.qbins).astype(jnp.int32)
        flat = jnp.arange(self.nchannels) * (self.tbins * self.qbins) \
            + tbin * self.qbins + qbin
        flat = jnp.where(ok, flat, self.pdf.size)   # dropped when not ok
        self.pdf = self.pdf.reshape(-1).at[flat].add(
            jnp.uint32(1), mode='drop').reshape(self.pdf.shape)
        self.events_in_histogram += 1

    def get_pdfs(self):
        return np.asarray(self.hitcount), np.asarray(self.pdf)

    # ---- variable-bin PDF evaluation ---------------------------------

    def setup_pdf_eval(self, event_hit, event_time, event_charge,
                       min_twidth, trange, min_qwidth, qrange,
                       min_bin_content=10, time_only=True):
        """Variable-bin PDF evaluation at each channel's (t[,q]) point.

        ``time_only=False`` evaluates a true 2D (time, charge) density
        — the reference accepts these arguments but leaves the 2D mode
        unimplemented (reference chroma/gpu/pdf.py get_pdf_eval:
        "Unimplemented 2D (time,charge) mode!"); here the
        nearest-neighbor metric is the box-normalized distance
        max(|dt|/min_twidth, |dq|/min_qwidth) so the adaptive bin is a
        box scaled uniformly in both axes."""
        event_hit = np.asarray(event_hit).astype(bool)
        self.nchannels = len(event_hit)
        self.event_nhit = int(event_hit.sum())
        self.map_hit_offset_to_channel_id = \
            np.where(event_hit)[0].astype(np.int32)
        self.event_hit = jnp.asarray(event_hit)
        self.event_time = jnp.asarray(event_time, dtype=jnp.float32)
        self.event_charge = jnp.asarray(event_charge, dtype=jnp.float32)
        self.min_twidth = min_twidth
        self.trange = trange
        self.min_qwidth = min_qwidth
        self.qrange = qrange
        self.min_bin_content = min_bin_content
        self.time_only = time_only
        self.clear_pdf_eval()

    def clear_pdf_eval(self):
        self.eval_hitcount = jnp.zeros(self.nchannels, jnp.uint32)
        self.eval_bincount = jnp.zeros(self.nchannels, jnp.uint32)
        self.nearest_mc = jnp.full(
            (self.event_nhit, self.min_bin_content), 1e9, jnp.float32)

    def accumulate_pdf_eval(self, gpuchannels):
        """Fold one (possibly multi-DAQ) channel readout into the
        estimator (reference: chroma/cuda/pdf.cu accumulate_bincount +
        accumulate_nearest_neighbor_block)."""
        ndaq = gpuchannels.ndaq
        mc_t = gpuchannels.t.reshape(ndaq, self.nchannels)
        tmin, tmax = self.trange

        in_pdf = (mc_t < 1e8) & (mc_t >= tmin) & (mc_t <= tmax)
        if not self.time_only:
            mc_q = gpuchannels.q.reshape(ndaq, self.nchannels)
            qmin, qmax = self.qrange
            in_pdf = in_pdf & (mc_q >= qmin) & (mc_q <= qmax)
        self.eval_hitcount = self.eval_hitcount + \
            in_pdf.sum(axis=0).astype(jnp.uint32)

        if self.time_only:
            dist = jnp.abs(mc_t - self.event_time[None, :])
            close = in_pdf & (dist < self.min_twidth / 2.0) \
                & self.event_hit[None, :]
        else:
            # box-normalized 2D distance: 0.5 at the min-bin boundary
            dist = jnp.maximum(
                jnp.abs(mc_t - self.event_time[None, :])
                / self.min_twidth,
                jnp.abs(mc_q - self.event_charge[None, :])
                / self.min_qwidth)
            close = in_pdf & (dist < 0.5) & self.event_hit[None, :]
        self.eval_bincount = self.eval_bincount + \
            close.sum(axis=0).astype(jnp.uint32)

        # nearest-neighbor table for hit channels: merge-sort this
        # batch's distances into the running K smallest
        hit_ids = self.map_hit_offset_to_channel_id
        d_hit = jnp.where(in_pdf[:, hit_ids], dist[:, hit_ids], 1e9).T
        merged = jnp.concatenate([self.nearest_mc, d_hit], axis=1)
        self.nearest_mc = jnp.sort(merged, axis=1)[:, :self.min_bin_content]

    def get_pdf_eval(self):
        """(hitcount, pdf_value, pdf_uncertainty) per channel
        (reference: chroma/gpu/pdf.py get_pdf_eval)."""
        evhit = np.asarray(self.event_hit).astype(bool)
        hitcount = np.asarray(self.eval_hitcount)
        bincount = np.asarray(self.eval_bincount)

        pdf_value = np.zeros(len(hitcount), dtype=float)
        pdf_frac_uncert = np.zeros_like(pdf_value)

        bin_measure = self.min_twidth if self.time_only \
            else self.min_twidth * self.min_qwidth
        high_stats = bincount >= self.min_bin_content
        if high_stats.any():
            pdf_value[high_stats] = bincount[high_stats].astype(float) \
                / hitcount[high_stats] / bin_measure
            pdf_frac_uncert[high_stats] = 1.0 / np.sqrt(bincount[high_stats])

        low_stats = ~high_stats & (hitcount > 0) & evhit
        nearest_mc = np.full((len(hitcount), self.min_bin_content), 1e9,
                             dtype=np.float32)
        nearest_mc[self.map_hit_offset_to_channel_id, :] = \
            np.asarray(self.nearest_mc)
        last_valid = np.maximum(0, (nearest_mc < 1e9).sum(axis=1) - 1)
        distance = nearest_mc[np.arange(len(last_valid)), last_valid]
        if low_stats.any():
            k = (last_valid[low_stats] + 1).astype(float)
            if self.time_only:
                # window of width 2*distance around the event time
                measure = 2.0 * distance[low_stats]
            else:
                # box scaled by normalized distance u: area
                # (2u*min_twidth) x (2u*min_qwidth)
                u = distance[low_stats]
                measure = 4.0 * u * u * self.min_twidth * self.min_qwidth
            pdf_value[low_stats] = k / hitcount[low_stats] / measure
            pdf_frac_uncert[low_stats] = 1.0 / np.sqrt(
                last_valid[low_stats] + 1)

        return hitcount, pdf_value, pdf_value * pdf_frac_uncert


class GPUKernelPDF(object):
    """Per-channel Gaussian KDE PDFs (parity: chroma/gpu/pdf.py
    GPUKernelPDF)."""

    def setup_moments(self, nchannels, trange, qrange, time_only=True):
        self.nchannels = nchannels
        self.trange = trange
        self.qrange = qrange
        self.time_only = time_only
        self.clear_moments()

    def clear_moments(self):
        z = jnp.zeros(self.nchannels, jnp.float32)
        self.hitcount = jnp.zeros(self.nchannels, jnp.uint32)
        self.tmom1, self.tmom2 = z, z
        self.qmom1, self.qmom2 = z, z

    def accumulate_moments(self, gpuchannels):
        t = gpuchannels.t[:self.nchannels]
        q = gpuchannels.q[:self.nchannels]
        tmin, tmax = self.trange
        ok = (t >= tmin) & (t <= tmax)
        if not self.time_only:
            qmin, qmax = self.qrange
            ok = ok & (q >= qmin) & (q <= qmax)
        okf = ok.astype(jnp.float32)
        self.hitcount = self.hitcount + ok.astype(jnp.uint32)
        self.tmom1 = self.tmom1 + okf * t
        self.tmom2 = self.tmom2 + okf * t * t
        if not self.time_only:
            self.qmom1 = self.qmom1 + okf * q
            self.qmom2 = self.qmom2 + okf * q * q

    def compute_bandwidth(self, event_hit, event_time, event_charge,
                          scale_factor=1.0):
        """Silverman-style per-channel bandwidths (reference:
        chroma/gpu/pdf.py:61-112)."""
        rho = 1.0
        hitcount = np.asarray(self.hitcount)
        mom0 = np.maximum(hitcount, 1)
        tmean = np.asarray(self.tmom1) / mom0
        tvar = np.maximum(np.asarray(self.tmom2) / mom0 - tmean ** 2, 0.0)
        trms = np.sqrt(tvar)

        d = 1 if self.time_only else 2
        dim_factor = ((4.0 / (d + 2)) / (mom0 / scale_factor)) \
            ** (-1.0 / (d + 4))
        with np.errstate(divide='ignore', invalid='ignore'):
            gauss_density = np.minimum(
                1.0 / trms,
                (1.0 / np.sqrt(2.0 * np.pi))
                * np.exp(-0.5 * ((event_time - tmean) / trms)) / trms)
            time_bw = dim_factor / gauss_density * rho
            inv_time_bw = np.where(time_bw > 0, 1.0 / time_bw, 0.0)
        inv_time_bw = np.nan_to_num(inv_time_bw, nan=0.0, posinf=0.0,
                                    neginf=0.0)
        self.inv_time_bandwidths = jnp.asarray(inv_time_bw,
                                               dtype=jnp.float32)

        if self.time_only:
            self.inv_charge_bandwidths = jnp.zeros(self.nchannels,
                                                   jnp.float32)
        else:
            qmean = np.asarray(self.qmom1) / mom0
            qrms = np.sqrt(np.maximum(
                np.asarray(self.qmom2) / mom0 - qmean ** 2, 0.0))
            with np.errstate(divide='ignore', invalid='ignore'):
                gauss_density = np.minimum(
                    1.0 / qrms,
                    (1.0 / np.sqrt(2.0 * np.pi))
                    * np.exp(-0.5 * ((event_charge - qmean) / qrms)) / qrms)
                charge_bw = dim_factor / gauss_density * rho
                inv_q = np.where(charge_bw > 0, 1.0 / charge_bw, 0.0)
            self.inv_charge_bandwidths = jnp.asarray(
                np.nan_to_num(inv_q), dtype=jnp.float32)

    def setup_kernel(self, event_hit, event_time, event_charge):
        self.event_hit = jnp.asarray(np.asarray(event_hit), dtype=bool)
        self.event_time = jnp.asarray(event_time, dtype=jnp.float32)
        self.event_charge = jnp.asarray(event_charge, dtype=jnp.float32)
        self.clear_kernel()

    def clear_kernel(self):
        self.hitcount = jnp.zeros(self.nchannels, jnp.uint32)
        self.time_pdf_values = jnp.zeros(self.nchannels, jnp.float32)
        self.charge_pdf_values = jnp.zeros(self.nchannels, jnp.float32)

    def accumulate_kernel(self, gpuchannels):
        """erf-normalized Gaussian KDE accumulation (reference:
        chroma/cuda/pdf.cu accumulate_kernel_eval)."""
        invroot2 = 0.70710678118654746
        rootPiBy2 = 1.2533141373155001
        t = gpuchannels.t[:self.nchannels]
        q = gpuchannels.q[:self.nchannels]
        tmin, tmax = self.trange
        ok = (t >= tmin) & (t <= tmax)
        if not self.time_only:
            qmin, qmax = self.qrange
            ok = ok & (q >= qmin) & (q <= qmax)
        self.hitcount = self.hitcount + ok.astype(jnp.uint32)

        contrib = ok & self.event_hit

        inv_bw = self.inv_time_bandwidths
        arg = (t - self.event_time) * inv_bw
        term = jnp.exp(-0.5 * arg * arg) * inv_bw
        loarg = (tmin - t) * inv_bw * invroot2
        hiarg = (tmax - t) * inv_bw * invroot2
        norm = jnp.where(inv_bw > 0,
                         (jax.scipy.special.erf(hiarg)
                          - jax.scipy.special.erf(loarg)) * rootPiBy2,
                         tmax - tmin)
        self.time_pdf_values = self.time_pdf_values + jnp.where(
            contrib, term / jnp.maximum(norm, 1e-30), 0.0)

        if not self.time_only:
            qmin, qmax = self.qrange
            inv_bw = self.inv_charge_bandwidths
            arg = (q - self.event_charge) * inv_bw
            term = jnp.exp(-0.5 * arg * arg)
            loarg = (qmin - q) * inv_bw * invroot2
            hiarg = (qmax - q) * inv_bw * invroot2
            norm = jnp.where(inv_bw > 0,
                             (jax.scipy.special.erf(hiarg)
                              - jax.scipy.special.erf(loarg)) * rootPiBy2,
                             qmax - qmin)
            self.charge_pdf_values = self.charge_pdf_values + jnp.where(
                contrib, term / jnp.maximum(norm, 1e-30), 0.0)

    def get_kernel_eval(self):
        hitcount = np.asarray(self.hitcount)
        tvals = np.asarray(self.time_pdf_values) / np.maximum(1, hitcount)
        if self.time_only:
            pdf_values = tvals
        else:
            qvals = np.asarray(self.charge_pdf_values) \
                / np.maximum(1, hitcount)
            pdf_values = tvals * qvals
        return hitcount, pdf_values, np.zeros_like(pdf_values)
