from tokenhawk_tpu.models.llama import (  # noqa: F401
    KVCache,
    LayerParams,
    LlamaParams,
    forward,
    init_params,
    logits_from_hidden,
    params_from_ggml,
)
