from .metrics import ssim, psnr, ms_ssim
