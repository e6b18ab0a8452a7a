"""Headline benchmark: streaming rx decode throughput, audio-seconds/s/chip.

Batches the 120 ms streaming receiver step (OFDM demod + LS pilot EQ +
stateful core decoder — the radae_rxe hot path) across independent streams
(channel realisations), the serving configuration for TPU.

Baseline: the reference streaming receiver decodes 9.82 s of audio in
6.41 s of CPU time (65.26% of real time on a laptop core; reference
README.md:312-318) = 1.532 audio-seconds/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

REF_AUDIO_SEC_PER_S = 9.82 / 6.41     # reference CPU realtime throughput


def run_bench(batch: int, n_frames: int = 30):
    import jax
    from radae_tpu.config import flagship_config
    from radae_tpu.models.core import CoreDecoder, CoreEncoder
    from radae_tpu.runtime import make_streaming_rx_step, make_streaming_tx_step
    from radae_tpu.utils.hostio import device_put_tree
    from radae_tpu.ops import cplx

    cfg = flagship_config()
    encoder = CoreEncoder(cfg.feature_dim, cfg.latent_dim, cfg.bottleneck)
    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    enc_params = device_put_tree(encoder.init(0))
    dec_params = device_put_tree(decoder.init(1))

    # build one modem frame of real signal, tile across streams + noise
    tx_step = make_streaming_tx_step(cfg, encoder, 1)
    rng = np.random.default_rng(0)
    feats1 = (rng.standard_normal((1, 12, cfg.feature_dim)) * 0.3).astype(np.float32)
    enc_state = encoder.zero_state(1)
    tx_packed, _ = tx_step(enc_params, feats1, enc_state)
    tx1 = np.asarray(tx_packed)[0]                       # (Nmf, 2)

    frame_len = cfg.Nmf + cfg.M + cfg.Ncp
    stream = np.concatenate([tx1, tx1[: cfg.M + cfg.Ncp]], axis=0)  # (len, 2)
    rx = np.broadcast_to(stream[None], (batch,) + stream.shape).copy()
    rx += 0.01 * rng.standard_normal(rx.shape).astype(np.float32)
    rx = np.ascontiguousarray(rx, np.float32)

    rx_step = make_streaming_rx_step(cfg, decoder, batch)
    dec_state = decoder.zero_state(batch)

    # warmup / compile
    feats, dec_state0 = rx_step(dec_params, rx, dec_state)
    jax.block_until_ready(feats)

    state = dec_state0
    t0 = time.time()
    for _ in range(n_frames):
        feats, state = rx_step(dec_params, rx, state)
    jax.block_until_ready(feats)
    dt = (time.time() - t0) / n_frames

    audio_per_step = batch * cfg.Tmf                      # B * 0.12 s
    return audio_per_step / dt


def main():
    value = None
    err = None
    for batch in (256, 64, 8):
        try:
            value = run_bench(batch)
            break
        except Exception as e:            # TPU runtime flake: retry smaller
            err = f"{type(e).__name__}: {e}"
            continue
    if value is None:
        print(json.dumps({"metric": "streaming_rx_decode", "value": 0.0,
                          "unit": "audio-seconds/s/chip", "vs_baseline": 0.0,
                          "error": (err or "")[:200]}))
        return
    print(json.dumps({
        "metric": "streaming_rx_decode",
        "value": round(value, 1),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / REF_AUDIO_SEC_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
