from .loader import NativeBatchSampler, native_available
