from .lvd import LVDNet, compute_occ, bg_alpha_buffer, reduce_time, reduce_comp
from .flp import FLPNet
from .wif import WIFNet
from .warper import Warper, WarpGrids
from .synthesizer import Synthesizer
