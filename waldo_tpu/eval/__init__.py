from .metrics import ssim, psnr, ms_ssim
from .frechet import frechet_distance, frechet_distance_from_acts, fid
