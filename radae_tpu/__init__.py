"""radae_tpu: a TPU-native (JAX/XLA/Pallas) radio autoencoder framework.

A from-scratch reimplementation of the capabilities of the RADAE ("Radio
Autoencoder") system for sending speech over HF radio channels: a neural
encoder maps vocoder features to analog PSK symbols carried on OFDM with
pilots and a cyclic prefix through a simulated (or real) HF channel, and a
neural decoder recovers the vocoder features.

Design principles (TPU-first, not a port):
  * The core encoder/decoder are *stateful by construction*: one step
    function with explicit carried state, with the batch ("vanilla") path
    defined as a scan of the streaming step.  This collapses the reference's
    vanilla/stateful module split (reference: radae/radae_base.py:97-129,
    223-286) into a single code path.
  * All modem transforms (OFDM mod/demod, pilot EQ, acquisition
    correlation) are expressed as batched matmuls that map onto the MXU.
  * Channel simulation is functional and PRNG-key driven so that training
    shards (batch x channel-realisation) stay independent under pjit.
  * Host-side control flow (sync state machine, timing slips) stays out of
    compiled graphs; device kernels have static shapes.
"""

import os as _os

if _os.environ.get("RADAE_PLATFORM"):
    # Force the jax platform (e.g. RADAE_PLATFORM=cpu to run the CLI apps
    # host-side while a TPU is busy).  The env var JAX_PLATFORMS alone is
    # not reliable here: site customisation may import jax at interpreter
    # startup with its own platform pinned, so set the config explicitly.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RADAE_PLATFORM"])

from .config import RADAEConfig, BBFMConfig
from .models.core import (
    CoreEncoder,
    CoreDecoder,
    distortion_loss,
)
from .models.radae import RADAE
from .models.bbfm import BBFM

__version__ = "0.1.0"
