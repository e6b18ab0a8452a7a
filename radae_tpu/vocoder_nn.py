"""Neural vocoder: parallel harmonic + filtered-noise synthesis.

The reference's synthesis back-end is FARGAN, a sample-autoregressive GAN
run on CPU (reference: src/lpcnet_demo.c -fargan-synthesis).  An
autoregressive sample loop is the wrong shape for TPU — 16 k sequential
steps per second of audio starves the MXU — so this is a TPU-first
redesign in the DDSP family: a small frame-rate GRU maps the 20 vocoder
features to harmonic amplitudes and noise band gains; synthesis is then a
fully PARALLEL oscillator bank (cumulative-phase cosines at multiples of
the pitch, linear amplitude upsampling) plus fixed band-pass-filtered
noise — all matmuls, convolutions and elementwise math, no recurrence at
sample rate, no complex dtypes (device FFTs are replaced by framed real
DFT matmuls in the multi-resolution spectral loss).

Same interface contract as vocoder.MelVocoder / FARGANVocoder: 36-float
frames (18 cepstra + pitch + voicing), int16 pcm at 16 kHz.  Analysis is
shared with MelVocoder (the reference likewise splits: lpcnet analysis,
FARGAN synthesis).

Train:  python -m radae_tpu vocoder_nn train CORPUS.npz OUTDIR
Synth:  python -m radae_tpu vocoder_nn synth WEIGHTS.npz FEAT.f32 OUT.pcm
Corpus: python -m radae_tpu vocoder_nn corpus WAVDIR CORPUS.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .data.io import NB_TOTAL_FEATURES
from .vocoder import (FRAME, NCEPS, PITCH_MAX_HZ, PITCH_MIN_HZ, SPEECH_FS,
                      MelVocoder)

N_HARM = 64                  # oscillator bank size (62.5 Hz f0 -> 4 kHz)
N_NOISE = 18                 # noise bands
HID = 192
LAG_MIN = int(SPEECH_FS / PITCH_MAX_HZ)
LAG_MAX = int(SPEECH_FS / PITCH_MIN_HZ)
LAG_GEO = float(np.sqrt(LAG_MIN * LAG_MAX))


# -- fixed noise-band FIR bank (host-precomputed) ---------------------------

def _noise_firs(nb=N_NOISE, taps=129, fs=SPEECH_FS):
    """Mel-spaced band-pass FIRs, (nb, taps)."""
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    edges = imel(np.linspace(mel(80), mel(fs / 2 - 100), nb + 1))
    t = np.arange(taps) - taps // 2
    win = np.hamming(taps)
    firs = np.zeros((nb, taps), np.float32)
    for b in range(nb):
        lo, hi = edges[b], edges[b + 1]
        ideal = (2 * hi / fs * np.sinc(2 * hi * t / fs)
                 - 2 * lo / fs * np.sinc(2 * lo * t / fs))
        firs[b] = (ideal * win).astype(np.float32)
    return firs


# -- model ------------------------------------------------------------------

def init_params(seed: int = 0, hid: int = HID):
    import jax
    rng = np.random.default_rng(seed)

    def dense(i, o):
        return {"w": (rng.standard_normal((i, o)) / np.sqrt(i))
                .astype(np.float32),
                "b": np.zeros(o, np.float32)}

    def gru(i, h):
        return {"w_ih": (rng.standard_normal((3 * h, i)) / np.sqrt(i))
                .astype(np.float32),
                "w_hh": (rng.standard_normal((3 * h, h)) / np.sqrt(h))
                .astype(np.float32),
                "b_ih": np.zeros(3 * h, np.float32),
                "b_hh": np.zeros(3 * h, np.float32)}

    p = {"in": dense(20, hid), "gru": gru(hid, hid),
         "harm": dense(hid, N_HARM + 1), "noise": dense(hid, N_NOISE)}
    return jax.tree_util.tree_map(lambda x: np.asarray(x), p)


def _gru_seq(g, x):
    import jax
    import jax.numpy as jnp
    H = g["w_hh"].shape[1]
    xg = x @ g["w_ih"].T + g["b_ih"]

    def step(h, xg_t):
        hg = h @ g["w_hh"].T + g["b_hh"]
        r = jax.nn.sigmoid(xg_t[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(xg_t[:, H:2 * H] + hg[:, H:2 * H])
        n = jnp.tanh(xg_t[:, 2 * H:] + r * hg[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((x.shape[0], H), x.dtype)
    _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


def frame_net(params, feats):
    """(B, T, 20) features -> (harm_amps (B,T,N_HARM), noise_g (B,T,N_NOISE)).

    Amplitudes come out in linear domain via exp of a bounded pre-
    activation; the cepstral energy term keeps them well-scaled."""
    import jax.numpy as jnp
    x = jnp.tanh(feats @ params["in"]["w"] + params["in"]["b"])
    h = _gru_seq(params["gru"], x)
    ha = h @ params["harm"]["w"] + params["harm"]["b"]
    gain = jnp.exp(jnp.clip(ha[..., :1], -12.0, 6.0))
    harm = jax.nn.softmax(ha[..., 1:], axis=-1) * gain
    noise = jnp.exp(jnp.clip(h @ params["noise"]["w"]
                             + params["noise"]["b"], -12.0, 6.0))
    return harm, noise


import jax  # noqa: E402  (after numpy-only helpers for doc order)
import jax.numpy as jnp  # noqa: E402


def _upsample_linear(x, n=FRAME):
    """(B, T, K) frame values -> (B, (T-1)*n, K) linear interpolation."""
    w = (jnp.arange(n, dtype=jnp.float32) / n)[None, None, :, None]
    a, b = x[:, :-1, None, :], x[:, 1:, None, :]
    up = a * (1.0 - w) + b * w
    B, Tm1, _, K = up.shape
    return up.reshape(B, Tm1 * n, K)


def synth(params, feats, noise_sig):
    """(B, T, 20) features + (B, (T-1)*FRAME) white noise -> pcm float.

    Output covers frames 0..T-2 (one frame of look-ahead, mirroring the
    2-frame analysis window)."""
    f0 = SPEECH_FS / (LAG_GEO * 2.0 ** (1.5 * feats[..., 18]))   # (B, T)
    harm, noiseg = frame_net(params, feats)

    f0_up = _upsample_linear(f0[..., None])[..., 0]     # (B, S)
    phase = 2.0 * jnp.pi * jnp.cumsum(f0_up, axis=1) / SPEECH_FS
    k = jnp.arange(1, N_HARM + 1, dtype=jnp.float32)
    # antialias: zero any harmonic above 0.95 * Nyquist (per sample)
    alias = (f0_up[..., None] * k[None, None, :]) < (0.475 * SPEECH_FS)
    cosines = jnp.cos(phase[..., None] * k[None, None, :]) * alias
    amps = _upsample_linear(harm)                        # (B, S, N_HARM)
    harmonic = jnp.sum(cosines * amps, axis=-1)

    firs = jnp.asarray(_noise_firs())                    # (NB, taps)
    nb, taps = firs.shape
    banded = jax.lax.conv_general_dilated(
        noise_sig[:, None, :], firs[:, None, :],
        window_strides=(1,), padding=((taps // 2, taps // 2),),
        dimension_numbers=("NCH", "OIH", "NCH"))         # (B, NB, S)
    gains = _upsample_linear(noiseg)                     # (B, S, NB)
    noise = jnp.sum(jnp.swapaxes(banded, 1, 2) * gains, axis=-1)
    return harmonic + noise


# -- multi-resolution spectral loss (real matmuls, no device FFT) -----------

def _stft_mats(nfft):
    t = np.arange(nfft)[:, None]
    f = np.arange(nfft // 2 + 1)[None, :]
    w = np.hanning(nfft)[:, None]
    c = (np.cos(2 * np.pi * t * f / nfft) * w).astype(np.float32)
    s = (np.sin(2 * np.pi * t * f / nfft) * w).astype(np.float32)
    return c, s


def _frames(x, nfft, hop):
    B, S = x.shape
    n = (S - nfft) // hop + 1
    idx = (np.arange(n)[:, None] * hop + np.arange(nfft)[None, :])
    return x[:, idx]                                    # (B, n, nfft)


def spectral_loss(pred, target, resolutions=((512, 128), (1024, 256),
                                             (256, 64))):
    total = 0.0
    for nfft, hop in resolutions:
        c, s = _stft_mats(nfft)
        pf, tf = _frames(pred, nfft, hop), _frames(target, nfft, hop)
        pm = jnp.sqrt((pf @ c) ** 2 + (pf @ s) ** 2 + 1e-9)
        tm = jnp.sqrt((tf @ c) ** 2 + (tf @ s) ** 2 + 1e-9)
        total = total + jnp.mean(jnp.abs(pm - tm)) \
            + 0.2 * jnp.mean(jnp.abs(jnp.log(pm) - jnp.log(tm)))
    return total / len(resolutions)


# -- training ---------------------------------------------------------------

def build_corpus(wav_dir: str, out_path: str, seed: int = 0):
    """Augmented (features, pcm) pairs for vocoder training, one npz."""
    from .data.augment import augment_pcm, read_wav
    import os

    voc = MelVocoder()
    rng = np.random.default_rng(seed)
    pcms, featss = [], []
    for name in sorted(os.listdir(wav_dir)):
        if not name.endswith(".wav") or name == "all.wav":
            continue
        pcm = read_wav(os.path.join(wav_dir, name))
        for v in augment_pcm(pcm, rng, speeds=(0.9, 1.0, 1.12),
                             tilts=(0.0, 0.4), reverse=True):
            feats = voc.extract(v.astype(np.int16))
            n = feats.shape[0]
            pcms.append((v[: (n + 1) * FRAME] / 32768.0)
                        .astype(np.float32))
            featss.append(feats[:, :20].astype(np.float32))
        print(f"{name}: {len(pcms)} variants total", file=sys.stderr)
    bounds = np.cumsum([0] + [len(f) for f in featss])
    np.savez(out_path, pcm=np.concatenate(pcms),
             feats=np.concatenate(featss), bounds=bounds)
    print(f"corpus: {bounds[-1]} frames ({bounds[-1] / 100:.0f} s)",
          file=sys.stderr)


def make_train_step(lr=3e-4, decay_steps: int | None = None):
    """decay_steps enables cosine LR decay (to 0.2*lr) over that many
    optimizer steps — the v2 fixture recipe."""
    import optax
    sched = lr if decay_steps is None else         optax.cosine_decay_schedule(lr, decay_steps, alpha=0.2)
    opt = optax.adam(sched)

    def loss_fn(params, feats, pcm, noise_sig):
        pred = synth(params, feats, noise_sig)
        return spectral_loss(pred, pcm)

    @jax.jit
    def step(params, opt_state, feats, pcm, noise_sig):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, pcm,
                                                  noise_sig)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt, step


def clean_metric(params, feats36: np.ndarray) -> float:
    """Clean-corpus round-trip fidelity: synthesize -> re-analyse ->
    cepstral MSE vs the input features (±1 frame alignment slack).  Used
    for checkpoint selection: training loss on the noisy augmented corpus
    keeps falling while this metric peaks early and then degrades."""
    voc = MelVocoder()
    f = jnp.asarray(feats36[None, :, :20])
    nz = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, (len(feats36) - 1) * FRAME)).astype(np.float32))
    y = np.asarray(synth(params, f, nz))[0]
    peak = np.abs(y).max() + 1e-9
    pcm16 = (y / max(peak / 0.7, 1.0) * 29000).astype(np.int16)
    f2 = voc.extract(pcm16)
    n = min(len(f2), len(feats36)) - 2
    best = np.inf
    for d in (-1, 0, 1):
        a = feats36[max(0, -d): n - max(0, d), :18]
        b = f2[max(0, d): n - max(0, -d), :18]
        m = min(len(a), len(b))
        best = min(best, float(np.mean((a[:m] - b[:m]) ** 2)))
    return best


def train(corpus_path: str, out_dir: str, epochs: int = 60, batch: int = 16,
          t_frames: int = 101, lr: float = 3e-4, seed: int = 0,
          hid: int = HID, lr_decay: bool = False, select_on: str = "",
          log=print):
    """select_on: path of a 36-float feature file; every 10 epochs the
    clean metric is evaluated on its first 400 frames and the best
    checkpoint saved as vocoder_best.npz (the shipped-fixture recipe:
    hid=256, lr_decay=True, select_on=fixtures/speech_feats.f32)."""
    import os
    import optax  # noqa: F401

    data = np.load(corpus_path)
    feats, pcm, bounds = data["feats"], data["pcm"], data["bounds"]
    # valid window starts within one utterance.  Each variant's stored pcm
    # is one FRAME longer than its feature count ((n+1)*FRAME vs n, the
    # 2-frame analysis window), so the pcm sample offset of global feature
    # frame i in variant u is (i + u) * FRAME — NOT i * FRAME.
    starts = []
    for u in range(len(bounds) - 1):
        lo, hi = int(bounds[u]), int(bounds[u + 1])
        starts += [(s, (s + u) * FRAME)
                   for s in range(lo, hi - t_frames - 1, t_frames // 2)]
    starts = np.array(starts)
    S = (t_frames - 1) * FRAME

    params = jax.tree_util.tree_map(jnp.asarray, init_params(seed, hid=hid))
    nb = max(1, len(starts) // batch)
    opt, step = make_train_step(
        lr, decay_steps=epochs * nb if lr_decay else None)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed + 1)
    os.makedirs(out_dir, exist_ok=True)
    sel_feats = (np.fromfile(select_on, np.float32).reshape(-1, 36)[:400]
                 if select_on else None)
    best = np.inf
    for ep in range(1, epochs + 1):
        order = rng.permutation(starts)
        tot = 0.0
        for b in range(nb):
            idx = order[b * batch:(b + 1) * batch]
            if len(idx) < batch:
                break
            fb = np.stack([feats[i:i + t_frames] for i, _ in idx])
            pb = np.stack([pcm[p:p + S] for _, p in idx])
            nz = rng.standard_normal((batch, S)).astype(np.float32)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(fb), jnp.asarray(pb),
                                           jnp.asarray(nz))
            tot += float(loss)
        msg = f"vocoder epoch {ep}: loss {tot / nb:.4f}"
        if sel_feats is not None and (ep % 10 == 0 or ep == epochs):
            d = clean_metric(params, sel_feats)
            msg += f" cepdist {d:.4f}"
            if d < best:
                best = d
                save_params(os.path.join(out_dir, "vocoder_best.npz"),
                            params)
        log(msg)
        if ep % 20 == 0 or ep == epochs:
            save_params(os.path.join(out_dir, f"vocoder_ep{ep}.npz"), params)
    return params


def save_params(path, params):
    out = {}
    for k1, d in params.items():
        for k2, v in d.items():
            out[f"{k1}.{k2}"] = np.asarray(v)
    np.savez(path, **out)


def load_params(path):
    data = np.load(path)
    params: dict = {}
    for k, v in data.items():
        k1, k2 = k.split(".")
        params.setdefault(k1, {})[k2] = jnp.asarray(v)
    return params


def envelope_correct(y: np.ndarray, feats: np.ndarray,
                     voc: MelVocoder | None = None) -> np.ndarray:
    """Spectral-envelope post-filter: per-frame band-gain correction of a
    rendered waveform toward the band energies encoded in the cepstral
    features (overlap-add, same filterbank inversion the classical
    synthesis uses).  The neural render contributes the excitation/phase
    structure; this pins its coarse spectrum to the transmitted envelope.
    Measured on the held-out speaker pair it lifts fwSegSNR from ~4-8 dB
    (raw render) to ~17 dB, above the classical MelVocoder's ~13-16 dB
    (tests/test_vocoder_nn.py::test_fwsegsnr_holdout_regression)."""
    if voc is None:
        voc = MelVocoder()
    from .vocoder import NFFT

    y = np.asarray(y, np.float32)
    T = min(feats.shape[0], len(y) // FRAME - 1)
    win = voc.win
    out = np.zeros(len(y), np.float32)
    wsum = np.zeros(len(y), np.float32)
    for t in range(T):
        seg = y[t * FRAME:(t + 2) * FRAME] * win
        E = np.fft.rfft(seg, NFFT)
        eband = voc.fb @ (np.abs(E) ** 2) + 1e-10
        band = 10 ** (voc.idct @ feats[t, :NCEPS])
        gain_bin = voc.fb.T @ np.sqrt(band / eband) / (voc.fb.sum(0) + 1e-6)
        z = np.fft.irfft(E * gain_bin, NFFT)[:2 * FRAME]
        out[t * FRAME:(t + 2) * FRAME] += z * win
        wsum[t * FRAME:(t + 2) * FRAME] += win ** 2
    return out / np.maximum(wsum, 1e-6)


class NeuralVocoder:
    """MelVocoder analysis + trained parallel neural synthesis (36-float
    frame contract, like FARGANVocoder)."""

    def __init__(self, weights_path: str, env_correct: bool = True):
        self.params = load_params(weights_path)
        self.analysis = MelVocoder()
        self.env_correct = env_correct
        self._synth = jax.jit(synth)

    def extract(self, pcm: np.ndarray) -> np.ndarray:
        return self.analysis.extract(pcm)

    def synthesize(self, features: np.ndarray) -> np.ndarray:
        f = np.asarray(features, np.float32)[None, :, :20]
        rng = np.random.default_rng(0)
        S = (f.shape[1] - 1) * FRAME
        nz = rng.standard_normal((1, S)).astype(np.float32)
        y = np.asarray(self._synth(self.params, jnp.asarray(f),
                                   jnp.asarray(nz)))[0]
        if self.env_correct:
            # the post-filter pins absolute band energies to the features
            # (in the analysis' /32768 units): keep that exact gain so the
            # cepstral c0 round-trips, just undo the analysis scaling
            y = envelope_correct(y, f[0], self.analysis)
            return np.clip(y * 32768.0, -32767, 32767).astype(np.int16)
        peak = np.abs(y).max() + 1e-9
        return (y / max(peak / 0.7, 1.0) * 32767 * 0.9).astype(np.int16)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("corpus")
    pc.add_argument("wav_dir")
    pc.add_argument("out")
    pt = sub.add_parser("train")
    pt.add_argument("corpus")
    pt.add_argument("out_dir")
    pt.add_argument("--epochs", type=int, default=60)
    pt.add_argument("--batch", type=int, default=16)
    pt.add_argument("--lr", type=float, default=3e-4)
    pt.add_argument("--hid", type=int, default=HID)
    pt.add_argument("--lr-decay", action="store_true")
    pt.add_argument("--select-on", default="",
                    help="feature file for clean-metric checkpoint "
                         "selection (saves vocoder_best.npz)")
    ps = sub.add_parser("synth")
    ps.add_argument("weights")
    ps.add_argument("feat_f32")
    ps.add_argument("out_pcm")
    args = p.parse_args(argv)

    if args.cmd == "corpus":
        build_corpus(args.wav_dir, args.out)
    elif args.cmd == "train":
        train(args.corpus, args.out_dir, epochs=args.epochs,
              batch=args.batch, lr=args.lr, hid=args.hid,
              lr_decay=args.lr_decay, select_on=args.select_on)
    else:
        v = NeuralVocoder(args.weights)
        feats = np.fromfile(args.feat_f32,
                            np.float32).reshape(-1, NB_TOTAL_FEATURES)
        v.synthesize(feats).tofile(args.out_pcm)
    return 0


if __name__ == "__main__":
    sys.exit(main())
