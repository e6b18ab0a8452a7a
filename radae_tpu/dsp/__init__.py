from .bpf import ComplexBPF
from .acquisition import Acquisition
from .streaming import TransmitterOne, ReceiverOne
from .rrc import gen_rn_coeffs, sample_clock_offset
from .single_carrier import SingleCarrier
