from tokenhawk_tpu.ops.attention import attend_cache, update_kv_cache  # noqa: F401
from tokenhawk_tpu.ops.linear import dense_weight, matmul  # noqa: F401
from tokenhawk_tpu.ops.norms import rms_norm  # noqa: F401
from tokenhawk_tpu.ops.qweight import (  # noqa: F401
    ArrayOrQ,
    QWeight,
    from_quantized_tensor,
    quantize_array,
)
from tokenhawk_tpu.ops.rope import apply_rope, rope_cos_sin  # noqa: F401
