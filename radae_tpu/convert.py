"""Checkpoint interop: PyTorch reference checkpoints <-> radae_tpu pytrees.

The reference stores checkpoints as a dict with 'state_dict' whose keys
carry 'core_encoder.module.' / 'core_decoder.module.' prefixes (an artifact
of nn.DataParallel wrapping, reference: radae/radae.py:114-118) and
weight-norm parametrizations on the decoder GLU gates.  This module maps
those into the radae_tpu parameter pytree:

  encoder/dense_1/{w,b}, encoder/gru{i}/{w_ih,w_hh,b_ih,b_hh},
  encoder/conv{i}/{w,b}, encoder/z_dense/{w,b}
  decoder/dense_1, decoder/gru{i}, decoder/glu{i}/{v,g},
  decoder/conv{i}, decoder/output

Native checkpoint format: a single .npz of flattened key paths plus a json
metadata blob (model/config args), analogous to the reference's per-epoch
checkpoint dict (reference: train.py:80-101,298-303).
"""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np


def _strip_prefix(k: str) -> str:
    for pre in ("core_encoder.module.", "core_decoder.module.",
                "core_encoder.", "core_decoder.", "module."):
        if k.startswith(pre):
            return k[len(pre):]
    return k


def _split_enc_dec(state_dict) -> Dict[str, Dict[str, np.ndarray]]:
    enc, dec = {}, {}
    for k, v in state_dict.items():
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                         dtype=np.float32)
        if k.startswith("core_encoder"):
            enc[_strip_prefix(k)] = arr
        elif k.startswith("core_decoder"):
            dec[_strip_prefix(k)] = arr
    return {"encoder": enc, "decoder": dec}


def _convert_side(sd: Dict[str, np.ndarray], side: str) -> Dict[str, Any]:
    """Convert one flat torch-named dict to a radae_tpu params subtree."""
    p: Dict[str, Any] = {}

    def dense(name):
        return {"w": sd[f"{name}.weight"], "b": sd[f"{name}.bias"]}

    p["dense_1"] = dense("dense_1")
    for i in range(1, 6):
        g = f"gru{i}"
        # streaming checkpoints nest the GRU one level deeper (gru{i}.gru.*)
        base = g if f"{g}.weight_ih_l0" in sd else f"{g}.gru"
        p[g] = {
            "w_ih": sd[f"{base}.weight_ih_l0"],
            "w_hh": sd[f"{base}.weight_hh_l0"],
            "b_ih": sd[f"{base}.bias_ih_l0"],
            "b_hh": sd[f"{base}.bias_hh_l0"],
        }
        c = f"conv{i}"
        p[c] = {"w": sd[f"{c}.conv.weight"], "b": sd[f"{c}.conv.bias"]}
        if side == "decoder":
            glu = f"glu{i}"
            if f"{glu}.gate.parametrizations.weight.original0" in sd:
                g0 = sd[f"{glu}.gate.parametrizations.weight.original0"]
                v = sd[f"{glu}.gate.parametrizations.weight.original1"]
                p[glu] = {"g": g0.reshape(-1), "v": v}
            elif f"{glu}.gate.weight_g" in sd:   # legacy weight_norm naming
                p[glu] = {"g": sd[f"{glu}.gate.weight_g"].reshape(-1),
                          "v": sd[f"{glu}.gate.weight_v"]}
            else:                                 # already-fused weight
                w = sd[f"{glu}.gate.weight"]
                p[glu] = {"g": np.linalg.norm(w, axis=1), "v": w}
    p["output" if side == "decoder" else "z_dense"] = dense(
        "output" if side == "decoder" else "z_dense")
    return p


def torch_state_dict_to_params(state_dict) -> Dict[str, Any]:
    """Reference torch state_dict -> radae_tpu params pytree (numpy)."""
    split = _split_enc_dec(state_dict)
    out: Dict[str, Any] = {}
    for side, sd in split.items():
        if sd:
            out[side] = _convert_side(sd, side)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint into a radae_tpu params pytree."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return torch_state_dict_to_params(sd)


# ---------------------------------------------------------------------------
# native checkpoint format
# ---------------------------------------------------------------------------

def _flatten(tree: Dict[str, Any], prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path: str, params: Dict[str, Any],
                    meta: Dict[str, Any] | None = None):
    flat = _flatten(params)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_checkpoint(path: str):
    data = dict(np.load(path, allow_pickle=False))
    meta = {}
    if "__meta__" in data:
        meta = json.loads(bytes(data.pop("__meta__")).decode())
    return _unflatten(data), meta
