from .txe import RadaeTx
from .rxe import RadaeRx
