from .losses import LossConfig, compute_losses, compute_scale_and_shift, \
    annealing_weight, mask_regularize
from .metrics import psnr, mse, ssim
