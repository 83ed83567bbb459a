from gsvc_tpu.compress.quantizers import (  # noqa: F401
    UniformQuantParams,
    VQState,
    fake_quantize_half,
    uniform_quantize,
    uniform_quantizer_init,
    residual_vq_forward,
    residual_vq_init,
)
from gsvc_tpu.compress.entropy import (  # noqa: F401
    compress_matrix_flatten_categorical,
    decompress_matrix_flatten_categorical,
    get_np_size,
    judge_type,
)
