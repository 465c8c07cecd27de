from tokenhawk_tpu.runtime.engine import Engine, GenerationResult  # noqa: F401
