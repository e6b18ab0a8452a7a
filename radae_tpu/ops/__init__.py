from . import ofdm
from . import pilots
