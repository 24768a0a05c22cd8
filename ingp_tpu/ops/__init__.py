from .activations import trunc_exp, trunc_tanh
from .sh import sh_encode
from .hashgrid import (HashGridConfig, hashgrid_init, hashgrid_encode,
                       hashgrid_encode_grad)
from .brickgrid import (BrickGridConfig, brickgrid_init, brickgrid_encode,
                        brickgrid_encode_grad)
from .ref_util import reflect, generate_ide_fn
from .march import march_rays, march_rays_lattice, MarchConfig
from .composite import (
    composite_rays,
    distortion_loss,
    ref_loss,
)
from .pack import compact_samples, scatter_back, packbits_u32, bitfield_lookup
