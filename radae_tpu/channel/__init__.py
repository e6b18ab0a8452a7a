from .simulate import rate_fs_channel, rate_rs_channel, draw_EbNodB
from .doppler import doppler_spread, multipath_samples, CHANNEL_PRESETS
