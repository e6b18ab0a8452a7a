from .core import CoreEncoder, CoreDecoder, distortion_loss
from .radae import RADAE
from .bbfm import BBFM
