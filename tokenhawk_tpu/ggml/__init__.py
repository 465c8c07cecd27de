from tokenhawk_tpu.ggml.format import GGMLType, GGML_MAGIC, GGML_VERSION  # noqa: F401
from tokenhawk_tpu.ggml.quants import (  # noqa: F401
    QK,
    QuantizedTensor,
    dequantize,
    quantize_q4_0,
    quantize_q4_1,
    quantize_q8_0,
)
from tokenhawk_tpu.ggml.reader import GGMLFile, load_ggml  # noqa: F401
from tokenhawk_tpu.ggml.writer import write_ggml  # noqa: F401
