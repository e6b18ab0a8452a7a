"""Unified CLI dispatcher: `python -m radae_tpu <tool> [args...]`."""

import sys

TOOLS = {
    "train": ("radae_tpu.tools.train", "main"),
    "inference": ("radae_tpu.tools.inference", "main"),
    "rx": ("radae_tpu.tools.rx", "main"),
    "rx_batch": ("radae_tpu.tools.rx_batch", "main"),
    "tx_batch": ("radae_tpu.tools.tx_batch", "main"),
    "loss": ("radae_tpu.tools.loss", "main"),
    "evaluate": ("radae_tpu.tools.evaluate", "main"),
    "txe": ("radae_tpu.apps.txe", "main"),
    "rxe": ("radae_tpu.apps.rxe", "main"),
    "stateful_encoder": ("radae_tpu.tools.stateful", "stateful_encoder"),
    "stateful_decoder": ("radae_tpu.tools.stateful", "stateful_decoder"),
    "bbfm_inference": ("radae_tpu.tools.bbfm", "bbfm_inference"),
    "bbfm_rx": ("radae_tpu.tools.bbfm", "bbfm_rx"),
    "train_bbfm": ("radae_tpu.tools.bbfm", "train_bbfm"),
    "sc_tx": ("radae_tpu.tools.sc_modem", "sc_tx"),
    "sc_rx": ("radae_tpu.tools.sc_modem", "sc_rx"),
    "est_snr": ("radae_tpu.tools.est_snr", "main"),
    "est_cno": ("radae_tpu.tools.chirp", "est_CNo_main"),
    "ch": ("radae_tpu.tools.ch", "main"),
    "chirp": ("radae_tpu.tools.chirp", "chirp_main"),
    "eoo_ber": ("radae_tpu.tools.chirp", "eoo_ber_main"),
    "f32toint16": ("radae_tpu.tools.converters", "f32toint16"),
    "int16tof32": ("radae_tpu.tools.converters", "int16tof32"),
    "ml_pilots": ("radae_tpu.tools.ml_pilots", "main"),
    "export": ("radae_tpu.export", "main"),
    "wav": ("radae_tpu.tools.wav_pipeline", "main"),
    "ota": ("radae_tpu.tools.ota", "main"),
    "ptt_loop": ("radae_tpu.tools.ptt_loop", "main"),
    "webtx": ("radae_tpu.tools.webtx", "main"),
    "vocoder_nn": ("radae_tpu.vocoder_nn", "main"),
    "report": ("radae_tpu.tools.report", "main"),
    "plots": ("radae_tpu.tools.plots", "main"),
    "profile": ("radae_tpu.tools.profile", "main"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m radae_tpu <tool> [args...]\n\ntools:")
        for name in sorted(TOOLS):
            print(f"  {name}")
        return 0
    name = sys.argv[1]
    if name not in TOOLS:
        print(f"unknown tool {name!r}; run with --help for the list",
              file=sys.stderr)
        return 2
    mod_name, fn_name = TOOLS[name]
    import importlib
    fn = getattr(importlib.import_module(mod_name), fn_name)
    return fn(sys.argv[2:]) or 0


if __name__ == "__main__":
    sys.exit(main())
