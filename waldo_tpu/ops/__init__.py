from .grid import get_grid, get_gaussian_kernel, get_circle
from .grid_sample import grid_sample, grid_sample_ref
from .tps import TPSWarp
from .inverse_warp import InverseWarp
from .image import resize, gaussian_blur, EdgeExtractor
from .bias_act import bias_act
from .upfirdn2d import upfirdn2d, setup_filter, filter2d, upsample2d, downsample2d
