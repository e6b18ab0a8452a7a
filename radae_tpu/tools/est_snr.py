"""Pilot-statistics SNR estimator prototype + calibration sweep.

Equivalent of the reference est_snr.py (reference: est_snr.py:45-244):
sweeps target SNR, passes pilot symbols through an AWGN (or fading)
channel, estimates SNR from the pilot-row statistics (the same estimator
embedded in the streaming receiver, dsp.py:437-456), and fits the
straight-line correction snr_est = m*snr + c used at runtime.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import flagship_config


def pilot_snr_est(rx_pilots_eq, rx_pilot_row):
    """SNR estimate from one received pilot row: signal power from total,
    noise power from the quadrature component after phase correction."""
    S1 = np.sum(np.abs(rx_pilot_row) ** 2)
    S2 = np.sum(rx_pilots_eq.imag ** 2) + 1e-12
    snr = S1 / (2 * S2) - 1
    return max(snr, 0.1)


def run_sweep(snr_range, nframes=50, fading=False, rng=None, verbose=False):
    """Returns (target_snrdB[], est_snrdB[]) over the sweep."""
    if rng is None:
        rng = np.random.default_rng(0)
    cfg = flagship_config()
    P = cfg.P
    Nc = cfg.Nc
    targets, ests = [], []
    for snrdB in snr_range:
        snr = 10 ** (snrdB / 10)
        # per-symbol noise so that pilot-row SNR = snr
        sigma = np.sqrt(np.mean(np.abs(P) ** 2) / (2 * snr))
        est_acc = []
        for _ in range(nframes):
            h = np.ones(Nc, np.complex64)
            if fading:
                h = ((rng.standard_normal(Nc) + 1j * rng.standard_normal(Nc))
                     / np.sqrt(2)).astype(np.complex64)
            rx_row = h * P + sigma * (rng.standard_normal(Nc)
                                      + 1j * rng.standard_normal(Nc))
            # genie phase correction (perfect channel phase)
            eq = rx_row * np.exp(-1j * np.angle(h * P))
            est_acc.append(pilot_snr_est(eq, rx_row))
        est_dB = 10 * np.log10(np.mean(est_acc))
        targets.append(snrdB)
        ests.append(est_dB)
        if verbose:
            print(f"target: {snrdB:6.2f} est: {est_dB:6.2f}")
    return np.array(targets), np.array(ests)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--first", type=float, default=-5)
    p.add_argument("--last", type=float, default=20)
    p.add_argument("--step", type=float, default=2.5)
    p.add_argument("--fading", action="store_true")
    p.add_argument("--nframes", type=int, default=50)
    args = p.parse_args(argv)
    t, e = run_sweep(np.arange(args.first, args.last, args.step),
                     nframes=args.nframes, fading=args.fading, verbose=True)
    m, c = np.polyfit(t, e, 1)
    print(f"straight line fit: m: {m:.4f} c: {c:.3f}")
    print(f"(runtime correction applies snrdB_est = (est - c)/m;"
          f" deployed constants m=0.8070 c=2.513)")


if __name__ == "__main__":
    main()
