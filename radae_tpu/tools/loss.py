"""Measure feature-domain loss between two feature files, with min-loss time
alignment (acquisition-time measurement) and PASS/FAIL gates.

Equivalent of the reference loss.py (reference: loss.py:58-133): aligns the
shorter decoded file against the original by scanning the start offset for
minimum loss; offset*10ms = acquisition time.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..models.core import distortion_loss
from ..data.io import NB_TOTAL_FEATURES, NUM_USED_FEATURES, read_f32


def load_features(fn):
    f = read_f32(fn, NB_TOTAL_FEATURES)[:, :NUM_USED_FEATURES]
    return f[None]


def find_loss(features_fn, features_hat_fn, clip_start=0, clip_end=0):
    features = load_features(features_fn)
    features_hat = load_features(features_hat_fn)
    features_hat = features_hat[:, clip_start:features_hat.shape[1] - clip_end, :]
    Tf, Th = features.shape[1], features_hat.shape[1]
    assert Th and Tf
    # decoded stream longer than the original (e.g. trailing noise decoded
    # after the signal ends): compare over the original's length
    if Th > Tf:
        features_hat = features_hat[:, :Tf, :]
        Th = Tf

    # vectorised alignment scan: stack all start offsets, one batched loss
    n_off = Tf - Th + 1
    offs = np.arange(n_off)
    windows = np.stack([features[0, s:s + Th, :] for s in offs])
    losses = np.asarray(distortion_loss(windows,
                                        np.broadcast_to(features_hat, windows.shape)))
    min_start = int(np.argmin(losses))
    min_loss = float(losses[min_start])
    print(f"Loss between {features_fn:s} and {features_hat_fn:s}")
    print(f"  loss: {min_loss:5.3f} start: {min_start:d} "
          f"acq_time: {min_start*0.01:5.2f} s")

    per_frame = np.asarray(distortion_loss(
        features[:, min_start:min_start + Th, :].reshape(Th, 1, NUM_USED_FEATURES),
        features_hat.reshape(Th, 1, NUM_USED_FEATURES)))
    return min_loss, min_start, per_frame


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("features", type=str)
    p.add_argument("features_hat", type=str)
    p.add_argument("--features_hat2", type=str, default="")
    p.add_argument("--loss_test", type=float, default=0.0)
    p.add_argument("--acq_time_test", type=float, default=0)
    p.add_argument("--clip_start", type=int, default=0)
    p.add_argument("--clip_end", type=int, default=0)
    p.add_argument("--compare", action="store_true")
    args = p.parse_args(argv)

    min_loss, min_start, _ = find_loss(args.features, args.features_hat,
                                       args.clip_start, args.clip_end)
    if args.loss_test > 0.0 and min_loss > args.loss_test:
        print("FAIL")
        return 1
    if args.acq_time_test > 0 and min_start * 0.01 > args.acq_time_test:
        print("FAIL")
        return 1
    if args.loss_test > 0.0 or args.acq_time_test:
        print("PASS")

    if args.features_hat2:
        min_loss2, _, _ = find_loss(args.features, args.features_hat2,
                                    args.clip_start, args.clip_end)
        if args.compare:
            delta = abs(min_loss - min_loss2)
            print(f"loss1: {min_loss:5.3f} loss2: {min_loss2:5.3f} "
                  f"delta: {delta:5.3f}")
            if delta < 0.01:
                print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
