from .ckpt import save_ckpt, load_ckpt, slim_state, extract_model_state
from .vis import depth2img, semantic2img, save_image, convert_normal
from .filters import box_filter, guided_filter
from .frame_embedding import FrameEmbedding
