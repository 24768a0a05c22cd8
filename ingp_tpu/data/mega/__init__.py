from .dataset import MegaDataset, get_image_metadata, \
    get_image_metadata_partial
from .filesystem_dataset import FilesystemDataset
from .memory_dataset import MemoryDataset
from .image_metadata import ImageMetadata
