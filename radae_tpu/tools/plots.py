"""Diagnostic plot suite (reference: radae_plots.m).

Matplotlib equivalents of the Octave plot helpers: QPSK scatter, signal
spectrum, PAPR CCDF, 99% power bandwidth, per-frame loss curves, and
loss-vs-epoch comparisons.  All figures are written to PNG (headless).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def scatter_plot(z_path, out_png, latent_dim=80):
    plt = _plt()
    z = np.fromfile(z_path, np.float32)
    sym = z[::2] + 1j * z[1::2]
    plt.figure(figsize=(5, 5))
    plt.plot(sym.real[:20000], sym.imag[:20000], "+", ms=2)
    plt.axis("equal"); plt.grid(True)
    plt.title("QPSK scatter"); plt.savefig(out_png); plt.close()


def spectrum_plot(iq_path, out_png, Fs=8000):
    plt = _plt()
    x = np.fromfile(iq_path, np.complex64)
    n = min(len(x), 1 << 16)
    spec = np.abs(np.fft.fft(x[:n] * np.hanning(n))) ** 2
    f = np.fft.fftfreq(n, 1 / Fs)
    order = np.argsort(f)
    plt.figure(figsize=(8, 4))
    plt.plot(f[order], 10 * np.log10(spec[order] + 1e-12))
    plt.xlabel("Hz"); plt.ylabel("dB"); plt.grid(True)
    # 99% power bandwidth annotation (radae_plots.m)
    psorted = np.sort(spec)[::-1]
    csum = np.cumsum(psorted)
    plt.title(f"spectrum (99% power in top "
              f"{(csum < 0.99 * csum[-1]).sum() * Fs / n:.0f} Hz)")
    plt.savefig(out_png); plt.close()


def papr_plot(iq_path, out_png):
    plt = _plt()
    x = np.fromfile(iq_path, np.complex64)
    p = np.abs(x) ** 2
    mean_p = p.mean()
    papr_db = 10 * np.log10(np.maximum(p, 1e-12) / mean_p)
    thr = np.linspace(0, 12, 200)
    ccdf = [(papr_db > t).mean() for t in thr]
    plt.figure(figsize=(6, 4))
    plt.semilogy(thr, ccdf)
    plt.xlabel("PAPR (dB)"); plt.ylabel("CCDF"); plt.grid(True)
    plt.title(f"PAPR: {10*np.log10(p.max()/mean_p):.2f} dB peak")
    plt.savefig(out_png); plt.close()


def loss_curves_plot(txt_paths, out_png):
    plt = _plt()
    plt.figure(figsize=(7, 4))
    for path in txt_paths:
        y = np.loadtxt(path)
        if y.ndim == 2:
            plt.plot(y[:, 0], y[:, 1], label=path)
        else:
            plt.semilogy(np.arange(1, len(y) + 1), y, label=path)
    plt.grid(True); plt.legend(); plt.xlabel("epoch / EqNo dB")
    plt.ylabel("loss"); plt.savefig(out_png); plt.close()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["scatter", "spectrum", "papr", "loss"])
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)
    if args.kind == "scatter":
        scatter_plot(args.inputs[0], args.out)
    elif args.kind == "spectrum":
        spectrum_plot(args.inputs[0], args.out)
    elif args.kind == "papr":
        papr_plot(args.inputs[0], args.out)
    else:
        loss_curves_plot(args.inputs, args.out)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
