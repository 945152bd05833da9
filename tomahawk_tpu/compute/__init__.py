from .balancer import Balancer
from .engine import CalcSettings, compute_ld
