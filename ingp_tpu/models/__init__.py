from .ngp import (
    NGPConfig, ngp_init, ngp_density, ngp_sigma, ngp_rgb_feat, ngp_grad,
    ngp_forward, ngp_forward_skybox, log_radiance_to_rgb,
)
from .mlp import mlp_init, mlp_apply
from .implicit_mask import mask_init, mask_apply, MASK_GRID_CFG
from .rendering import (
    RenderConfig, render_rays, render_rays_test, MAX_SAMPLES, NEAR_DISTANCE,
)
from .oracle import render_rays_oracle, sample_pdf, stratified_z
